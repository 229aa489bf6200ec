"""Regenerate the committed golden triples parquets that back the
``kg_pipeline_triples`` driver oracle.

The flagship pipeline is not SQL-expressible (surrogate tagger +
Schwartz-Hearst + neural fallback live in Python), so its driver oracle
is a pinned golden: DuckDB reads these parquets while Spark re-runs the
pipeline — any behavior drift breaks the hash match. The goldens are
trustworthy because the pipeline they pin is independently validated:

* tests/test_golden_parity.py — P/R 1.0 against reference-composed
  oracle functions imported from /root/reference,
* tests/test_tagging.py — fused mapInPandas path cross-checked against
  the independent relational (tag_words + bio_decode) implementation,
* tests/test_pipeline.py — determinism across runs.

Run after ANY pipeline-behavior change:
    python tools/make_golden.py
then re-run pytest (tests/test_entry.py compares live output to the
golden for the configured SF) and commit the parquets.

The tool REFUSES to write unless the independent parity tests pass in
the same invocation — otherwise a behavioral regression could be
silently re-pinned into the golden and the driver check would stay
green. Pass --skip-gate only to debug the generator itself.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

SFS = ["sf0.001", "sf0.01"]

GATE_TESTS = ["tests/test_golden_parity.py", "tests/test_tagging.py"]


def run_gate() -> None:
    """The independence gate: the goldens pin pipeline behavior, so the
    pipeline must first prove itself against the reference-derived
    oracles (test_golden_parity) and the independent relational
    cross-check (test_tagging) IN THIS INVOCATION."""
    print(f"gate: pytest {' '.join(GATE_TESTS)}")
    r = subprocess.run([sys.executable, "-m", "pytest", "-x", "-q",
                       *GATE_TESTS], cwd=REPO)
    if r.returncode != 0:
        sys.exit("REFUSING to regenerate goldens: parity/cross-check "
                 "tests failed — fix the pipeline (or the tests) first. "
                 "(--skip-gate overrides, for generator debugging only)")


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bern2_spark.queries import QUERIES
    from bern2_spark.session import get_spark

    if "--skip-gate" not in sys.argv:
        run_gate()
    else:
        print("WARNING: --skip-gate — goldens written without the "
              "parity gate; do not commit these")

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark("make-golden", master="local[8]")
    for sf in SFS:
        df = QUERIES["kg_pipeline_triples"](spark, f"/root/testdata/{sf}")
        rows = sorted(map(tuple, df.collect()))
        table = pa.table({
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        })
        out = os.path.join(GOLDEN_DIR, f"kg_triples_{sf}.parquet")
        pq.write_table(table, out)
        print(f"{out}: {table.num_rows} rows")

        # X1/X3 golden: segmentation word rows (the operator itself is
        # property-tested against the reference module; the golden
        # makes it driver-visible)
        seg = QUERIES["x1_x3_segment"](spark, f"/root/testdata/{sf}")
        srows = sorted(map(tuple, seg.collect()))
        stable = pa.table({
            "doc_id": pa.array([r[0] for r in srows], pa.string()),
            "sent_idx": pa.array([r[1] for r in srows], pa.int32()),
            "word_idx": pa.array([r[2] for r in srows], pa.int32()),
            "tok_idx": pa.array([r[3] for r in srows], pa.int32()),
            "word": pa.array([r[4] for r in srows], pa.string()),
            "start": pa.array([r[5] for r in srows], pa.int32()),
            "end": pa.array([r[6] for r in srows], pa.int32()),
        })
        out = os.path.join(GOLDEN_DIR, f"segment_words_{sf}.parquet")
        pq.write_table(stable, out)
        print(f"{out}: {stable.num_rows} rows")

        # M1-real golden: mentions through the frozen numpy checkpoint
        # (deterministic: constructed weights, argmax provably stable
        # under the bounded context term — tests/test_checkpoint.py)
        m1 = QUERIES["m1_real_mentions"](spark, f"/root/testdata/{sf}")
        mrows = sorted(map(tuple, m1.collect()))
        mtable = pa.table({
            "doc_id": pa.array([r[0] for r in mrows], pa.string()),
            "ent_type": pa.array([r[1] for r in mrows], pa.string()),
            "start": pa.array([r[2] for r in mrows], pa.int32()),
            "end": pa.array([r[3] for r in mrows], pa.int32()),
            "mention": pa.array([r[4] for r in mrows], pa.string()),
            "prob": pa.array([r[5] for r in mrows], pa.float64()),
        })
        out = os.path.join(GOLDEN_DIR, f"m1_real_mentions_{sf}.parquet")
        pq.write_table(mtable, out)
        print(f"{out}: {mtable.num_rows} rows")

        # PubAnnotation golden: flattened output-contract rows (per-doc
        # (begin, obj) ordering as ann_idx, id arrays joined); the
        # nested shape deep-equals the reference's committed server
        # output in tests/test_pubannotation.py
        pub = QUERIES["kg_pubannotation"](spark, f"/root/testdata/{sf}")
        prows = sorted(map(tuple, pub.collect()))
        ptable = pa.table({
            "sourceid": pa.array([r[0] for r in prows], pa.string()),
            "ann_idx": pa.array([r[1] for r in prows], pa.int32()),
            "begin": pa.array([r[2] for r in prows], pa.int32()),
            "end": pa.array([r[3] for r in prows], pa.int32()),
            "obj": pa.array([r[4] for r in prows], pa.string()),
            "ids": pa.array([r[5] for r in prows], pa.string()),
            "mention": pa.array([r[6] for r in prows], pa.string()),
            "prob": pa.array([r[7] for r in prows], pa.float64()),
            "is_neural_normalized": pa.array(
                [r[8] for r in prows], pa.bool_()),
        })
        out = os.path.join(GOLDEN_DIR, f"pubannotation_rows_{sf}.parquet")
        pq.write_table(ptable, out)
        print(f"{out}: {ptable.num_rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()

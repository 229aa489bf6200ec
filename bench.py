"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "triples": n, "triples_per_sec": r}.

--scale mode: run the flagship KG pipeline at two parallelism levels
(local[8] vs local[32] — the sandbox proxy for N vs 4N executors) and
write BENCH/BASELINE.md with throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_pipeline_triples",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "qc_quality_score",
    "tpch_q1ish",
]


def _materialize(df) -> int:
    """Force full execution; returns row count via a cheap agg."""
    return df.count()


def _run_once(spark, sf_dir: str, names) -> tuple[dict, dict]:
    from bern2_spark.queries import QUERIES
    times, counts = {}, {}
    for name in names:
        t0 = time.perf_counter()
        counts[name] = _materialize(QUERIES[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)
    return times, counts


def _session(cpus: int):
    from bern2_spark.session import get_spark
    return get_spark(f"bern2-bench-{cpus}", master=f"local[{cpus}]")


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--scale" in sys.argv:
        scale_report(sf_dir)
        return

    spark = _session(cpus)
    # warm the JVM/Arrow paths so the measurement is steady-state
    _run_once(spark, sf_dir, ["tpch_q1ish"])
    times, counts = _run_once(spark, sf_dir, HEADLINE)
    total = round(sum(times.values()), 3)
    kg_sec = times["kg_pipeline_triples"]
    triples = counts["kg_pipeline_triples"]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "triples": triples,
        "triples_per_sec": round(triples / kg_sec, 1) if kg_sec else None,
    }
    print(json.dumps(out))
    spark.stop()


def scale_report(sf_dir: str, levels=(8, 32)) -> None:
    """Same job, same input, two parallelism levels -> BENCH/BASELINE.md
    (north rule: throughput scaling efficiency >= 0.8 from N to 4N)."""
    results = {}
    for cpus in levels:
        spark = _session(cpus)
        _run_once(spark, sf_dir, ["kg_pipeline_triples"])  # warm-up
        times, counts = _run_once(spark, sf_dir, ["kg_pipeline_triples"])
        sec = times["kg_pipeline_triples"]
        results[cpus] = {
            "sec": sec,
            "triples": counts["kg_pipeline_triples"],
            "triples_per_sec": counts["kg_pipeline_triples"] / sec,
        }
        spark.stop()
    lo, hi = levels
    speedup = results[hi]["triples_per_sec"] / results[lo]["triples_per_sec"]
    efficiency = speedup / (hi / lo)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — scaling evidence\n\n"
            f"Flagship KG pipeline (documents -> triples) at `{sf_dir}`, "
            "same input, two parallelism levels (sandbox proxy for N vs 4N "
            "executors).\n\n"
            "| parallelism | wall sec | triples | triples/sec |\n"
            "|---|---|---|---|\n")
        for cpus in levels:
            r = results[cpus]
            f.write(f"| local[{cpus}] | {r['sec']:.2f} | {r['triples']} "
                    f"| {r['triples_per_sec']:.1f} |\n")
        f.write(
            f"\n**Speedup {lo}->{hi} cores: {speedup:.2f}x** over a "
            f"{hi // lo}x core increase -> **scaling efficiency "
            f"{efficiency:.2f}** (target >= 0.8).\n")
    print(json.dumps({"scale": {str(k): results[k] for k in results},
                      "speedup": round(speedup, 3),
                      "efficiency": round(efficiency, 3)}))


if __name__ == "__main__":
    main()

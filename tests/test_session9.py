"""Session-9 operators: fuzzy linking, gap-fill, Z-order layout,
mojibake QC, k-core."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ------------------------------------------------------------ fuzzy_link

def test_fuzzy_link_picks_nearest(spark):
    from bern2_spark.operators.canonicalize import fuzzy_link
    catalog = spark.createDataFrame(
        [("gene", "G1", "braf"), ("gene", "G2", "kras"),
         ("disease", "D1", "braf")],  # same name, other type
        "ent_type string, cui string, name string")
    unlinked = spark.createDataFrame(
        [("gene", "brafx"),   # dist 1 to braf
         ("gene", "krsa"),    # dist 2 to kras (transposition = 2 edits)
         ("gene", "zzzzzz")],  # nothing in range
        "ent_type string, surface string")
    out = {r["surface"]: r for r in
           fuzzy_link(unlinked, catalog).collect()}
    assert out["brafx"]["cui"] == "G1"
    assert out["brafx"]["edit_dist"] == 1
    assert out["krsa"]["cui"] == "G2"
    assert out["krsa"]["edit_dist"] == 2
    assert "zzzzzz" not in out
    # the disease-typed 'braf' never crosses the type block
    assert all(r["ent_type"] == "gene" for r in out.values())


def test_fuzzy_link_tie_breaks_on_cui(spark):
    from bern2_spark.operators.canonicalize import fuzzy_link
    catalog = spark.createDataFrame(
        [("gene", "G2", "abcd"), ("gene", "G1", "abce")],
        "ent_type string, cui string, name string")
    unlinked = spark.createDataFrame([("gene", "abcf")],
                                     "ent_type string, surface string")
    row = fuzzy_link(unlinked, catalog).collect()[0]
    # both candidates at dist 1 -> smallest cui wins
    assert (row["cui"], row["matched_name"]) == ("G1", "abce")


def test_fuzzy_link_blocking_is_positional(spark):
    """A first char must only ever meet a first char: 'xa' (first x,
    last a) must NOT become a candidate of 'ax' (first a, last x) via
    cross-position key collisions when lengths/distance would pass."""
    from bern2_spark.operators.canonicalize import fuzzy_link
    catalog = spark.createDataFrame(
        [("gene", "G1", "ax")], "ent_type string, cui string, name string")
    unlinked = spark.createDataFrame([("gene", "xa")],
                                     "ent_type string, surface string")
    assert fuzzy_link(unlinked, catalog).count() == 0


# --------------------------------------------------------------- gapfill

def test_gapfill_fills_interior_gaps(spark):
    from bern2_spark.operators.rollup import gapfill
    ts = datetime.datetime
    ev = spark.createDataFrame(
        [(1, ts(2024, 1, 1, 5), 1.5),
         (1, ts(2024, 1, 1, 9), 0.5),   # same day, sums to 2.0
         (1, ts(2024, 1, 4, 0), 7.0),   # 2-day gap before this
         (2, ts(2024, 1, 2, 0), 3.0)],
        "user_id int, ts timestamp, value double")
    out = gapfill(ev, "ts", ["user_id"], "value", grain="day")
    rows = {(r["user_id"], r["bucket"].day): r for r in out.collect()}
    assert len(rows) == 5  # user 1: days 1-4; user 2: day 2
    assert rows[(1, 1)]["value_micros"] == 2_000_000
    assert rows[(1, 2)]["value_micros"] is None
    assert rows[(1, 2)]["filled_micros"] == 2_000_000
    assert rows[(1, 2)]["is_gap"] is True
    assert rows[(1, 3)]["filled_micros"] == 2_000_000
    assert rows[(1, 4)]["value_micros"] == 7_000_000
    assert rows[(1, 4)]["is_gap"] is False
    assert rows[(2, 2)]["filled_micros"] == 3_000_000


# ---------------------------------------------------------------- layout

def test_zorder_key_interleaves_bits(spark):
    from bern2_spark.operators.layout import zorder_key
    df = spark.createDataFrame([(0b1010, 0b0101)], "a long, b long")
    z = df.select(zorder_key([F.col("a"), F.col("b")], bits=4)
                  .alias("z")).collect()[0]["z"]
    # bit b of dim i lands at position 2b+i:
    # a=1010 -> bits 1,3 -> out 2,6 ; b=0101 -> bits 0,2 -> out 1,5
    assert z == (1 << 2) | (1 << 6) | (1 << 1) | (1 << 5)


def test_zorder_layout_prunes_second_dimension(spark):
    from bern2_spark.operators.layout import zorder_layout_stats
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 37) % 64).alias("y"))
    stats = zorder_layout_stats(df, ["x", "y"], bits=6, file_bits=2)
    rows = stats.collect()
    spans = {}
    for lay in ("zorder", "linear"):
        ys = [r["max_y"] - r["min_y"] + 1
              for r in rows if r["layout"] == lay]
        spans[lay] = sum(ys) / len(ys)
    # linear layout (sorted by x) leaves y unclustered: span ~ full
    # range; zorder shrinks it (4 files, 2 dims -> ~half the range)
    assert spans["linear"] > 48
    assert spans["zorder"] <= spans["linear"] / 1.5


# -------------------------------------------------------------- mojibake

def test_mojibake_counts_artifacts(spark):
    from bern2_spark.dataprep.textqc import mojibake_features
    df = spark.createDataFrame(
        [(1, "clean ascii text"),
         (2, "cafÃ© naÃ¯ve"),          # two 'Ã' artifacts
         (3, "donâ€™t â€” dash"),      # two 'â€' artifacts
         (4, "bad � byte"),
         (5, "")],
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in mojibake_features(df).collect()}
    assert out[1]["n_artifacts"] == 0 and out[1]["is_mojibake"] is False
    assert out[2]["n_artifacts"] == 2 and out[2]["is_mojibake"] is True
    assert out[3]["n_artifacts"] == 2
    assert out[4]["n_artifacts"] == 1
    assert out[5]["n_artifacts"] == 0 and out[5]["artifact_ratio"] == 0.0


# ----------------------------------------------------------------- kcore

def test_kcore_peels_cascade(spark):
    from bern2_spark.operators.graph import kcore
    # K4 core {a,b,c,d} + a pendant path e-f hanging off a, plus g-a:
    # peeling k=3 must cascade the tail away and keep exactly the K4
    core = [("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("a", "e"), ("e", "f"), ("a", "g")]
    edges = spark.createDataFrame(core + tail, "cui_a string, cui_b string")
    out = {r["node"]: r["core_degree"] for r in kcore(edges, k=3).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert all(d == 3 for d in out.values())


def test_kcore_empty_when_k_too_large(spark):
    from bern2_spark.operators.graph import kcore
    edges = spark.createDataFrame([("a", "b"), ("b", "c")],
                                  "cui_a string, cui_b string")
    assert kcore(edges, k=2).count() == 0 or \
        set(r["node"] for r in kcore(edges, k=2).collect()) == set()


# ---------------------------------------------------------- range_search

def test_range_search_threshold(spark):
    from bern2_spark.dataprep.similarity import range_search
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.8, 0.6]),
         (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = range_search(vecs, vecs.filter(F.col("vec_id") == 0), tau=0.5)
    got = {r["neighbor_id"]: r["cosine"] for r in out.collect()}
    # cos(0,1)=1.0, cos(0,2)=0.8 pass; 0.0 and -1.0 fail; no self-match
    assert got == {1: 1.0, 2: 0.8}


# -------------------------------------------------------- rolling_zscore

def test_rolling_zscore_flags_spike(spark):
    from bern2_spark.operators.rollup import rolling_zscore
    ts = datetime.datetime
    rows = [(1, ts(2024, 1, d), 10.0) for d in range(1, 8)]
    rows.append((1, ts(2024, 1, 8), 1000.0))  # spike
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {r["bucket"].day: r for r in
           rolling_zscore(ev, "ts", ["user_id"], "value").collect()}
    # days 1-2: not enough baseline
    assert out[1]["z"] is None and out[1]["is_anomaly"] is False
    assert out[2]["z"] is None
    # days 4-7: flat baseline -> zero variance -> no z
    assert out[7]["z"] is None
    # day 8: spike over a flat baseline is still zero-variance -> None;
    # so check with a varied baseline instead
    rows2 = [(2, ts(2024, 1, d), float(v)) for d, v in
             zip(range(1, 8), [10, 12, 9, 11, 10, 13, 10])]
    rows2.append((2, ts(2024, 1, 8), 100.0))
    ev2 = spark.createDataFrame(rows2,
                                "user_id int, ts timestamp, value double")
    out2 = {r["bucket"].day: r for r in
            rolling_zscore(ev2, "ts", ["user_id"], "value").collect()}
    assert out2[8]["is_anomaly"] is True and out2[8]["z"] > 10
    assert out2[5]["is_anomaly"] is False


# ------------------------------------------------------ curriculum_order

def test_curriculum_order_interleaves_domains(spark):
    from bern2_spark.dataprep.mixing import curriculum_order
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 99), (4, "b", 1)],
        "doc_id long, source string, n_chars long")
    out = sorted(curriculum_order(docs, F.col("n_chars")).collect(),
                 key=lambda r: r["global_pos"])
    # easiest of each domain first, domains alternating a,b,a,b
    assert [r["id"] for r in out] == [2, 4, 1, 3]
    assert [r["global_pos"] for r in out] == [0, 1, 2, 3]


# --------------------------------------------------------- token_entropy

def test_token_entropy_extremes(spark):
    import math
    from bern2_spark.dataprep.textqc import token_entropy
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, "one two three four")],
        "doc_id long, text string")
    out = {r["id"]: r for r in token_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0
    assert abs(out[2]["entropy"] - round(math.log(4), 6)) < 1e-9
    assert out[2]["n_distinct"] == 4


# -------------------------------------------------------------- zipf_fit

def test_zipf_fit_recovers_slope(spark):
    import math
    from bern2_spark.dataprep.textqc import zipf_fit
    # construct exact power-law counts: word w_r repeated round(64/r)
    text = " ".join(
        " ".join([f"w{r:02d}"] * round(64 / r)) for r in range(1, 9))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(docs, top_k=100).collect()[0]
    assert row["n_top"] == 8
    assert -1.1 < row["slope"] < -0.9


# -------------------------------------------------------- dead_functions

def test_dead_functions_anti_join(spark):
    from bern2_spark.dataprep.codekg import dead_functions
    defs = spark.createDataFrame(
        [("r1", "used_fn"), ("r1", "dead_fn"), ("r2", "dead_fn")],
        "repo string, fn_name string")
    calls = spark.createDataFrame(
        [("r1", "used_fn"), ("r2", "external_fn")],
        "repo string, callee string")
    out = {r["fn_name"]: r for r in
           dead_functions(defs, calls).collect()}
    assert set(out) == {"dead_fn"}
    assert out["dead_fn"]["n_defs"] == 2
    assert out["dead_fn"]["n_def_repos"] == 2


# ---------------------------------------------------- markov_transitions

def test_markov_transitions_probabilities(spark):
    from bern2_spark.operators.asof import markov_transitions
    ts = datetime.datetime
    ev = spark.createDataFrame(
        [(1, 1, ts(2024, 1, 1, 0), "a"), (2, 1, ts(2024, 1, 1, 1), "b"),
         (3, 1, ts(2024, 1, 1, 2), "a"), (4, 1, ts(2024, 1, 1, 3), "c"),
         (5, 2, ts(2024, 1, 1, 0), "a"), (6, 2, ts(2024, 1, 1, 1), "b")],
        "event_id long, user_id long, ts timestamp, event_type string")
    out = {(r["from_type"], r["to_type"]): r for r in
           markov_transitions(ev).collect()}
    # from 'a': 2x ->b, 1x ->c ; user boundary never creates a c->a edge
    assert out[("a", "b")]["n_transitions"] == 2
    assert out[("a", "b")]["prob"] == round(2 / 3, 6)
    assert out[("a", "c")]["prob"] == round(1 / 3, 6)
    assert out[("b", "a")]["n_transitions"] == 1
    assert ("c", "a") not in out


# ----------------------------------------------------------- readability

def test_readability_simple_text(spark):
    from bern2_spark.dataprep.textqc import readability_features
    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran.")], "doc_id long, text string")
    r = readability_features(docs).collect()[0]
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    assert r["n_syllables"] == 6  # one vowel group per word
    wps, spw = 3.0, 1.0
    assert abs(r["flesch_ease"]
               - round(206.835 - 1.015 * wps - 84.6 * spw, 6)) < 1e-9


# ------------------------------------------------------------ rfm_scores

def test_rfm_scores_range_split(spark):
    from bern2_spark.operators.rollup import rfm_scores
    ts = datetime.datetime
    rows = []
    # user 1: recent + busy + big spender; user 2: stale + quiet
    for d in range(1, 10):
        rows.append((1, ts(2024, 1, 28 + d // 9), 100.0))
    rows.append((2, ts(2024, 1, 1), 1.0))
    ev = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, value double")
    out = {r["user"]: r for r in rfm_scores(ev).collect()}
    assert out[1]["rfm"] == "333"
    assert out[2]["rfm"] == "111"
    assert out[2]["recency_days"] == 28


# -------------------------------------------------- transitive_reduction

def test_transitive_reduction_drops_shortcuts(spark):
    from bern2_spark.operators.graph import transitive_reduction
    edges = spark.createDataFrame(
        [(4, 2), (2, 1), (4, 1),      # 4->1 implied by 4->2->1
         (8, 4), (8, 1)],             # 8->1 implied by 8->4->2->1
        "src long, dst long")
    out = {(r["src"], r["dst"]) for r in
           transitive_reduction(edges).collect()}
    assert out == {(4, 2), (2, 1), (8, 4)}


# ------------------------------------------- clone_license_conflicts

def test_clone_license_conflicts_cross_repo(spark):
    from bern2_spark.dataprep.codeqc import clone_license_conflicts
    body = "def clone_fn():\n    return 1\n"
    files = spark.createDataFrame(
        [("r1", "a.py", "python",
          "SPDX-License-Identifier: MIT\n" + body),
         ("r2", "b.py", "python",
          "GNU General Public License v3\n" + body),
         ("r2", "c.py", "python",
          "GNU General Public License v3\n" + body),  # same-repo pair: excluded
         ("r3", "d.py", "python",
          "SPDX-License-Identifier: MIT\n" + body)],   # same license as r1
        "repo string, path string, lang string, content string")
    out = clone_license_conflicts(files).collect()
    pairs = {(r["repo_a"], r["repo_b"]) for r in out}
    # conflicts only across repos with differing licenses: r1/r3 are
    # both MIT (no pair), r2's two GPL files conflict with each
    assert pairs == {("r1", "r2"), ("r2", "r3")}
    assert all(r["copyleft_mix"] for r in out)


def test_clone_license_conflicts_hub_cap(spark):
    from bern2_spark.dataprep.codeqc import clone_license_conflicts
    body = "def clone_fn():\n    return 1\n"
    rows = [(f"r{i:02d}", f"f{i:02d}.py", "python",
             ("SPDX-License-Identifier: MIT\n" if i % 2 else
              "GNU General Public License v3\n") + body)
            for i in range(40)]
    files = spark.createDataFrame(
        rows, "repo string, path string, lang string, content string")
    # 40 files in one clone class, cap 32: the class is TRUNCATED to
    # its first 32 members in key order, never dropped — pairs exist,
    # none touch r32..r39, and the count is exactly 16x16 MIT-vs-GPL
    out = clone_license_conflicts(files).collect()
    assert len(out) == 16 * 16
    assert max(max(r["repo_a"], r["repo_b"]) for r in out) == "r31"


# --------------------------------------------------------------- ab_lift

def test_ab_lift_detects_shift(spark):
    from bern2_spark.operators.rollup import ab_lift
    rows = []
    for i in range(200):
        # even users (control) ~10, odd users (treatment) ~20
        u = i % 10
        v = (10.0 if u % 2 == 0 else 20.0) + (i % 5) * 0.1
        rows.append((u, v))
    ev = spark.createDataFrame(rows, "user_id long, value double")
    r = ab_lift(ev).collect()[0]
    assert r["n_c"] == 100 and r["n_t"] == 100
    assert 95 < r["lift_pct"] < 105
    assert r["z_score"] > 10


# ---------------------------------------------------- length_bucket_stats

def test_length_bucket_stats_padding(spark):
    from bern2_spark.dataprep.mixing import length_bucket_stats
    docs = spark.createDataFrame(
        [(1, "a b c"),                      # 3 tokens -> bucket 16
         (2, " ".join(["w"] * 20)),        # 20 -> bucket 32
         (3, " ".join(["w"] * 30))],       # 30 -> bucket 32
        "doc_id long, text string")
    out = {r["bucket"]: r for r in length_bucket_stats(docs).collect()}
    assert out[16]["n_docs"] == 1 and out[16]["bucket_padding"] == 13
    assert out[32]["n_docs"] == 2
    assert out[32]["bucket_padding"] == (32 - 20) + (32 - 30)
    # naive waste pads everything to gmax=30
    assert out[16]["naive_waste_ratio"] == round((30 - 3) / 30, 6)


# ------------------------------------------------ predicate_functionality

def test_predicate_functionality_key_detection(spark):
    from bern2_spark.operators.metrics import predicate_functionality
    t = spark.createDataFrame(
        [("d1", "has_key", "k1"), ("d2", "has_key", "k2"),
         ("d1", "has_tag", "t1"), ("d1", "has_tag", "t2"),
         ("d2", "has_tag", "t1")],
        "subj string, pred string, obj string")
    out = {r["pred"]: r for r in predicate_functionality(t).collect()}
    # has_key: every subject one object -> functionality 1.0
    assert out["has_key"]["functionality"] == 1.0
    # has_tag: 2 subjects / 3 pairs
    assert out["has_tag"]["functionality"] == round(2 / 3, 6)
    assert out["has_tag"]["inv_functionality"] == round(2 / 3, 6)


# --------------------------------------------------- domain_js_divergence

def test_domain_js_divergence_bounds(spark):
    import math
    from bern2_spark.dataprep.mixing import domain_js_divergence
    docs = spark.createDataFrame(
        [(1, "a", "x x y"), (2, "b", "x x y"),      # identical dists
         (3, "c", "z z z")],                         # disjoint from both
        "doc_id long, source string, text string")
    out = {(r["domain_a"], r["domain_b"]): r["js_divergence"]
           for r in domain_js_divergence(docs).collect()}
    assert out[("a", "b")] == 0.0
    # disjoint supports -> JS = ln 2
    assert abs(out[("a", "c")] - round(math.log(2), 6)) < 1e-9
    assert abs(out[("b", "c")] - round(math.log(2), 6)) < 1e-9


# --------------------------------------------------------- sliding_counts

def test_sliding_counts_hops(spark):
    from bern2_spark.operators.rollup import sliding_counts
    ts = datetime.datetime
    ev = spark.createDataFrame([(1, ts(2024, 1, 1, 10, 20), "c")],
                               "event_id long, ts timestamp, event_type string")
    out = sorted(r["win_start"] for r in sliding_counts(ev).collect())
    # one event -> member of 4 hops: 09:30, 09:45, 10:00, 10:15
    assert [t.minute for t in out] == [30, 45, 0, 15]
    assert [t.hour for t in out] == [9, 9, 10, 10]


# ----------------------------------------------------- minhash_calibration

def test_minhash_calibration_exact_on_identical(spark):
    from bern2_spark.dataprep.dedup import minhash_calibration
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text),                       # identical pair
         (3, text + " with a small divergent tail here")],
        "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r for r in
           minhash_calibration(docs).collect()}
    r12 = out[(1, 2)]
    # identical docs: estimator and exact both 1.0, error 0
    assert r12["est_jaccard"] == 1.0 and r12["jaccard"] == 1.0
    assert r12["abs_err"] == 0.0
    for r in out.values():
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["abs_err"] == round(abs(r["est_jaccard"] - r["jaccard"]), 6)


# ---------------------------------------------------------- window_audio

def test_window_audio_shape_and_rms(spark):
    from bern2_spark.dataprep.multimodal import (attach_fake_audio,
                                                 window_audio)
    docs = spark.createDataFrame([(1, "x" * 100)],
                                 "doc_id long, text string")
    media = attach_fake_audio(docs)
    m = media.collect()[0]
    # n_chars=100 -> (1 + 100%7)*4096 = 3*4096 samples -> 3 windows
    assert m["n_samples"] == 3 * 4096
    rows = sorted(window_audio(media).collect(),
                  key=lambda r: r["window_idx"])
    assert [r["window_idx"] for r in rows] == [0, 1, 2]
    assert [r["start_sample"] for r in rows] == [0, 4096, 8192]
    for r in rows:
        assert 0.0 <= r["rms"] < 1.0
        assert len(r["window_hash"]) == 64
    # deterministic: same payload+idx -> same hash
    rows2 = sorted(window_audio(media).collect(),
                   key=lambda r: r["window_idx"])
    assert [r["window_hash"] for r in rows] == \
        [r["window_hash"] for r in rows2]


def test_decode_audio_stub_raises(spark):
    from bern2_spark.dataprep.multimodal import (attach_fake_audio,
                                                 window_audio)
    import pytest as _pytest
    docs = spark.createDataFrame([(1, "y" * 50)],
                                 "doc_id long, text string")
    with _pytest.raises(Exception):
        window_audio(attach_fake_audio(docs),
                     deterministic_fake=False).collect()


# ---------------------------------------------------------- dedup_funnel

def test_dedup_funnel_stages(spark):
    from bern2_spark.dataprep.dedup import dedup_funnel
    base = "the quick brown fox jumps over the lazy dog once more today"
    docs = spark.createDataFrame(
        [(1, base), (2, base),                       # exact dup
         (3, base + " tail"),                        # near dup of 1
         (4, "completely different text about spark and parquet files")],
        "doc_id long, text string")
    out = {r["stage"]: r for r in dedup_funnel(docs).collect()}
    assert out["raw"]["n_docs"] == 4 and out["raw"]["retention"] == 1.0
    assert out["exact_dedup"]["n_docs"] == 3
    assert out["exact_dedup"]["n_removed"] == 1
    # doc 3 is a verified near-dup of doc 1 -> dropped
    assert out["near_dedup"]["n_docs"] == 2
    assert out["near_dedup"]["retention"] == 0.5


# --------------------------------------------------------- pq_distortion

def test_pq_distortion_zero_for_codebook_members(spark):
    from bern2_spark.dataprep.similarity import pq_distortion
    # codebooks whose entries include the vectors themselves ->
    # reconstruction error exactly 0
    books = [[[1.0, 0.0], [0.0, 1.0]], [[2.0, 2.0], [0.0, 0.0]]]
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0, 2.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           pq_distortion(vecs, books, dim=4).collect()}
    assert out[1]["recon_err"] == 0.0 and out[2]["recon_err"] == 0.0


def test_pq_distortion_known_error(spark):
    import math
    from bern2_spark.dataprep.similarity import pq_distortion
    books = [[[0.0, 0.0]], [[0.0, 0.0]]]  # everything quantizes to 0
    vecs = spark.createDataFrame(
        [(1, [3.0, 4.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    r = pq_distortion(vecs, books, dim=4).collect()[0]
    # residual = the vector itself -> err = ||v|| = 5, rel = 1
    assert r["recon_err"] == 5.0
    assert r["rel_err"] == 1.0


# --------------------------------------------------------- transe_scores

def test_transe_scores_deterministic_negative(spark):
    from bern2_spark.operators.kgembed import transe_scores
    t = spark.createDataFrame(
        [("d1", "has_gene", "g1"), ("d1", "has_gene", "g2"),
         ("d2", "has_gene", "g3"), ("d1", "has_disease", "m1")],
        "subj string, pred string, obj string")
    out = {(r["subj"], r["pred"], r["obj"]): r
           for r in transe_scores(t).collect()}
    # corrupted tail = next object of the same predicate, wrapping
    assert out[("d1", "has_gene", "g1")]["neg_obj"] == "g2"
    assert out[("d1", "has_gene", "g2")]["neg_obj"] == "g3"
    assert out[("d2", "has_gene", "g3")]["neg_obj"] == "g1"
    # single-object predicate wraps to itself -> margin exactly 0
    solo = out[("d1", "has_disease", "m1")]
    assert solo["neg_obj"] == "m1" and solo["margin"] == 0.0
    assert solo["pos_beats_neg"] is False
    # scores are negative L1 norms
    for r in out.values():
        assert r["score_pos"] <= 0.0
        assert r["margin"] == round(r["score_pos"] - r["score_neg"], 6)


def test_hash_embedding_is_stable(spark):
    from bern2_spark.operators.kgembed import hash_embedding
    df = spark.createDataFrame([("braf",), ("braf",), ("kras",)],
                               "name string")
    import pyspark.sql.functions as F
    comps = hash_embedding(F.col("name"), dim=4)
    rows = df.select(*[c.alias(f"e{d}") for d, c in
                       enumerate(comps)]).collect()
    assert rows[0] == rows[1]          # deterministic
    assert rows[0] != rows[2]          # name-sensitive
    for r in rows:
        for d in range(4):
            assert -0.5 <= r[f"e{d}"] < 0.5


# ---------------------------------------------------- soft_dedup_weights

def test_soft_dedup_weights(spark):
    from bern2_spark.dataprep.mixing import soft_dedup_weights
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, "unique")],
        "doc_id long, text string")
    out = {r["id"]: r for r in soft_dedup_weights(docs).collect()}
    assert out[1]["cluster_size"] == 3
    assert out[1]["weight"] == round(1 / 3, 6)
    assert out[4]["cluster_size"] == 1 and out[4]["weight"] == 1.0
    # total effective mass = number of distinct texts
    assert abs(sum(r["weight"] for r in out.values()) - 2.0) < 1e-5


# ------------------------------------------------------- ivf_cell_balance

def test_ivf_cell_balance(spark):
    from bern2_spark.dataprep.similarity import ivf_cell_balance
    cents = [[0.0, 0.0], [10.0, 10.0]]
    vecs = spark.createDataFrame(
        [(i, [0.1 * i, 0.1 * i]) for i in range(6)]
        + [(10, [10.0, 10.0]), (11, [10.1, 10.0])],
        "vec_id long, embedding array<double>")
    out = {r["cell"]: r for r in
           ivf_cell_balance(vecs, cents, dim=2).collect()}
    assert out[0]["n_vecs"] == 6 and out[1]["n_vecs"] == 2
    assert out[0]["frac"] == 0.75
    # imbalance = max/mean = 6/4 = 1.5, replicated on every row
    assert out[0]["imbalance"] == 1.5 == out[1]["imbalance"]


# -------------------------------------------------------- profile/checks

def test_profile_columns_counts(spark):
    from bern2_spark.dataprep.profile import profile_columns
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None), (3, "a")],
        "id long, s string")
    out = {r["column"]: r for r in profile_columns(df).collect()}
    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 3
    assert out["s"]["n_null"] == 1 and out["s"]["n_empty"] == 1
    assert out["s"]["completeness"] == 0.75


def test_check_constraints_verdicts(spark):
    from bern2_spark.dataprep.profile import check_constraints
    df = spark.createDataFrame([(1, 5), (2, -1), (2, 3)],
                               "id long, x long")
    out = {r["constraint"]: r for r in check_constraints(
        df, [("x_non_negative", F.col("x") >= 0)],
        unique_keys=["id"]).collect()}
    assert out["x_non_negative"]["n_violations"] == 1
    assert out["x_non_negative"]["passed"] is False
    # both rows of the duplicated key count as violations
    assert out["unique(id)"]["n_violations"] == 2
    assert out["unique(id)"]["passed"] is False


# ------------------------------------------------------- entropy_secrets

def test_entropy_secrets_flags_random_not_repetitive(spark):
    from bern2_spark.dataprep.codeqc import entropy_secrets
    files = spark.createDataFrame(
        [("r1", "a.py", 'k = "aB3dE9gH1jK4mN7pQ2sT5vW8yZ0cF6i"'),
         ("r1", "b.py", "wwwwwwwwwwwwwwwwwwwwwwww")],
        "repo string, path string, content string")
    out = {r["path"]: r for r in entropy_secrets(files).collect()}
    assert out["a.py"]["is_high_entropy"] is True
    assert out["b.py"]["entropy_bits"] == 0.0
    assert out["b.py"]["is_high_entropy"] is False
    # redaction: the candidate never appears, only hash + 8-char prefix
    assert len(out["a.py"]["prefix"]) == 8
    assert len(out["a.py"]["cand_hash"]) == 32


# ------------------------------------------------------------ stickiness

def test_stickiness_ratio(spark):
    from bern2_spark.operators.rollup import stickiness
    ts = datetime.datetime
    ev = spark.createDataFrame(
        [(1, ts(2024, 1, 1)), (2, ts(2024, 1, 1)),
         (1, ts(2024, 1, 3))],
        "user_id long, ts timestamp")
    out = {str(r["day"]): r for r in stickiness(ev).collect()}
    # day 1: dau 2, wau 2 -> 1.0 ; day 3: dau 1, trailing week saw 2
    assert out["2024-01-01"]["stickiness"] == 1.0
    assert out["2024-01-03"]["dau"] == 1
    assert out["2024-01-03"]["wau"] == 2
    assert out["2024-01-03"]["stickiness"] == 0.5


# ------------------------------------------------- degree_distribution

def test_degree_distribution_bins_and_hill(spark):
    from bern2_spark.operators.graph import degree_distribution
    # star: hub with 8 spokes -> hub degree 8 (bin 3), spokes 1 (bin 0)
    edges = spark.createDataFrame([("h", f"s{i}") for i in range(8)],
                                  "cui_a string, cui_b string")
    rows = {r["degree_bin"]: r for r in
            degree_distribution(edges, top_k=9).collect()}
    assert rows[0]["n_nodes"] == 8 and rows[0]["min_degree"] == 1
    assert rows[3]["n_nodes"] == 1 and rows[3]["min_degree"] == 8
    # hill alpha present and identical on every row
    alphas = {r["hill_alpha"] for r in rows.values()}
    assert len(alphas) == 1 and alphas.pop() is not None


def test_degree_distribution_flat_tail_guards_null(spark):
    from bern2_spark.operators.graph import degree_distribution
    # all degrees equal -> ln-sum 0 -> hill alpha NULL, not an error
    edges = spark.createDataFrame([("a", "b"), ("c", "d")],
                                  "cui_a string, cui_b string")
    rows = degree_distribution(edges).collect()
    assert all(r["hill_alpha"] is None for r in rows)


# ---------------------------------------------------- boilerplate_lines

def test_boilerplate_lines_cross_doc(spark):
    from bern2_spark.dataprep.textqc import boilerplate_lines
    footer = "All rights reserved by the example collective"
    docs = spark.createDataFrame(
        [(i, f"unique body {i} with enough words here. {footer}.")
         for i in range(6)]
        + [(99, "a single document with its own long line here.")],
        "doc_id long, text string")
    out = boilerplate_lines(docs, min_docs=5).collect()
    assert len(out) == 1
    assert out[0]["sample"].startswith("All rights reserved")
    assert out[0]["n_docs"] == 6
    assert out[0]["doc_frac"] == round(6 / 7, 6)


# ------------------------------------------------------- threshold_curve

def test_threshold_curve_monotone(spark):
    from bern2_spark.dataprep.dedup import threshold_curve
    base = "the quick brown fox jumps over the lazy dog once more today"
    docs = spark.createDataFrame(
        [(1, base), (2, base),                      # jaccard 1.0
         (3, base + " with some tail"),             # high jaccard
         (4, "completely different text about spark parquet files")],
        "doc_id long, text string")
    out = {r["threshold"]: r for r in threshold_curve(docs).collect()}
    # pair counts must be monotone non-increasing in the threshold
    assert out[0.5]["n_pairs"] >= out[0.7]["n_pairs"] \
        >= out[0.9]["n_pairs"]
    assert out[0.9]["n_pairs"] >= 1  # the identical pair survives 0.9
    assert out[0.9]["n_docs_dropped"] >= 1


# ------------------------------------------------------ source_datasheet

def test_source_datasheet_rollup(spark):
    from bern2_spark.dataprep.mixing import source_datasheet
    docs = spark.createDataFrame(
        [(1, "a", "the quick brown fox and the lazy dog", 37),
         (2, "a", "the quick brown fox and the lazy dog", 37),  # dup
         (3, "b", "der hund und die katze sind nicht da", 36)],
        "doc_id long, source string, text string, n_chars long")
    out = {r["source"]: r for r in source_datasheet(docs).collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["dup_rate"] == 1.0
    assert out["b"]["dup_rate"] == 0.0
    assert out["a"]["top_lang"] == "en" and out["b"]["top_lang"] == "de"
    assert out["a"]["top_lang_share"] == 1.0
    assert out["a"]["n_tokens"] == 16  # 8 bpe-ish tokens per copy


# --------------------------------------------------------- shortest_paths

def test_shortest_paths_prefers_strong_edges(spark):
    from bern2_spark.operators.graph import shortest_paths
    # a-b strong (10 docs, cost 1e5); a-c weak (1 doc, cost 1e6);
    # b-c strong: the cheap a->c route goes THROUGH b (2e5 < 1e6)
    edges = spark.createDataFrame(
        [("a", "b", 10), ("a", "c", 1), ("b", "c", 10)],
        "cui_a string, cui_b string, n_docs long")
    roots = spark.createDataFrame([("a",)], "root string")
    out = {r["node"]: r["dist_micros"] for r in
           shortest_paths(edges, roots, rounds=4).collect()}
    assert out["a"] == 0
    assert out["b"] == 100000
    assert out["c"] == 200000  # via b, not the direct weak edge


def test_shortest_paths_bounded_rounds(spark):
    from bern2_spark.operators.graph import shortest_paths
    # chain a-b-c-d: 1 round reaches only b
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
        "cui_a string, cui_b string, n_docs long")
    roots = spark.createDataFrame([("a",)], "root string")
    out = {r["node"] for r in
           shortest_paths(edges, roots, rounds=1).collect()}
    assert out == {"a", "b"}


# ----------------------------------------------------------- schema_drift

def test_schema_drift_flags_null_regression(spark):
    from bern2_spark.dataprep.profile import schema_drift
    base = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z"),
                                  (4, "w")], "id long, s string")
    cur = spark.createDataFrame([(1, "x"), (2, None), (3, None),
                                 (4, "w")], "id long, s string")
    out = {r["column"]: r for r in schema_drift(cur, base).collect()}
    assert out["s"]["completeness_delta"] == -0.5
    assert out["s"]["drifted"] is True
    assert out["id"]["drifted"] is False
    assert out["id"]["distinct_ratio"] == 1.0

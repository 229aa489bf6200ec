"""bench.py fault isolation: one broken query must not erase the
timings of the others (the round-3 BENCH_r03 failure mode, where a
single plan-time AnalysisException zeroed the whole artifact)."""

def test_run_once_isolates_failures(spark, monkeypatch):
    # imports INSIDE the test: a module-level queries import would run
    # at collection time, before conftest's SPARK_GRAFT_TEST_SF pin is
    # visible to later modules' import-time oracle construction
    import bench
    from bern2_spark import queries as q

    def boom(spark_, sf_dir_):
        raise RuntimeError("deliberately broken")

    monkeypatch.setitem(q.QUERIES, "__broken__", boom)
    sf_dir = "/root/testdata/sf0.001"
    times, counts, errs = bench._run_once(
        spark, sf_dir, ["p8_sha256", "__broken__", "dedup_exact"])
    assert times["__broken__"] is None
    assert "deliberately broken" in errs["__broken__"]
    # the healthy neighbors still produced timings and counts
    assert times["p8_sha256"] is not None and counts["p8_sha256"] > 0
    assert times["dedup_exact"] is not None and counts["dedup_exact"] > 0

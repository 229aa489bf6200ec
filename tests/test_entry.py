"""Local twin of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
# sf-dependent oracles (the kg golden) resolve their path from this env
# var at queries.py import time — pin it to the SF this run uses
os.environ["SPARK_GRAFT_TEST_SF"] = SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    try:  # Decimal and ints unify through float/int
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def _normalize(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(srows) >= 0  # rows-only check (driver does the same)
        return
    res = duck.sql(oracle)
    dcols = [c for c in res.columns]
    drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == \
        sorted(c.lower() for c in dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), \
        f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _normalize(srows, scols) == _normalize(drows, dcols), \
        f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) >= 0
    assert df.columns == ["subj", "pred", "obj"]

"""Local mirror of the driver's correctness gate: run each queries() entry
in Spark and its oracle_sql() in DuckDB on the same parquet; compare
row count, schema width, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    """Driver-hash-strict canonicalization: an int64 201 and a float64
    201.0 must NOT collide (that laxness hid the r01 HUGEINT→float64
    oracle mismatches). Floats canonicalize to a repr that always keeps
    a type marker; ints stay bare."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        s = f"{v:.6g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ducks, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ores = ducks.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"{name}: column mismatch {scols} vs {ocols}"
    )
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sset = _rowset([[r[c] for c in scols] for r in srows], [c.lower() for c in scols])
    oset = _rowset(orows, [c.lower() for c in ocols])
    mismatches = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"spark={sset[mismatches[0]]} oracle={oset[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

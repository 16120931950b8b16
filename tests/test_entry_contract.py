"""Emulates the driver's correctness gate: run each queries() entry through
Spark AND its oracle_sql() through DuckDB on the same parquet tables, compare
row count + columns + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"  # driver gate runs sf0.01; see scripts/verify_oracle.py
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    rows = rel.fetchall()
    con.close()
    return cols, rows


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.10g}")
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    cols, duck_rows = _duck(entry_mod.oracle_sql()[name])
    duck_cols = [c.lower() for c in cols]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if repr(x) != repr(y)]
    assert not mism, f"{name}: first mismatches {[(a[i], b[i]) for i in mism[:3]]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"tx", "ty", "n_points"}


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = [k for k in qs if k not in oracles]
    # minhash_neardup graduated to an oracle-backed recall invariant in r3
    assert set(rows_only) == {"hilbert_order", "tile_pipeline_z8"}
    for name in rows_only:
        n = qs[name](spark, SF_DIR).count()
        assert n > 0, name

"""Driver-style correctness gate, run locally: every queries() entry is
executed via Spark (engine path) AND via its DuckDB oracle SQL; row sets
must match exactly (sorted columns, sorted rows).

This replicates what the driver does at sf0.01 — catching any engine/
oracle divergence before the driver does.
"""
import math

import duckdb
import pytest

import os

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    """Column-name-sorted, row-sorted canonical form (driver-style)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            out.append((v is None, str(type(v).__name__) if v is None else "", v))
        return out
    return sorted((tuple(r[i] for i in order) for r in rows), key=key), [cols[i] for i in order]


def compare(spark, ddb, qfn, oracle):
    sdf = qfn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ores = ddb.sql(oracle)
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    got, gcols = _norm(srows, scols)
    want, wcols = _norm(orows, ocols)
    assert gcols == wcols, f"column mismatch: {gcols} vs {wcols}"
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{len(mism)} mismatching rows; first: {mism[:3]}"
    assert len(got) > 0, "empty result proves nothing"


def _all_entries():
    import __spark_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        import sys
        import os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        entries = _all_entries()
        metafunc.parametrize("qname,qfn,oracle",
                             entries, ids=[e[0] for e in entries])


def test_query_against_oracle(spark, ddb, qname, qfn, oracle):
    if oracle is None:
        # rows-only check (non-SQL-expressible op)
        df = qfn(spark, SF_DIR)
        assert df.count() >= 0
        return
    compare(spark, ddb, qfn, oracle)

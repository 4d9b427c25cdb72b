"""Driver-gate parity: every `__spark_entry__.queries()` entry must match its
`oracle_sql()` DuckDB counterpart — row count, schema (column names), and
exact values after column-name sort (the driver's comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    out = con.sql(sql)
    cols = [d[0] for d in out.description]
    return cols, out.fetchall()


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _entries():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    return [(name, fn, sqls.get(name)) for name, fn in qs.items()]


# Gates allowed to return zero rows at a given SF — must be EXPLICIT so a
# broken-oracle pair can never silently "pass" on the empty set (the
# round-2 olap_local_supplier_volume lesson: a 1994 order-date window
# outside the data's range made both engines return nothing and the hash
# "matched"). Currently no gate is allowed to be empty at any SF.
EMPTY_OK: set[str] = set()


@pytest.mark.parametrize("name,fn,sql", _entries(), ids=[n for n, _, _ in _entries()])
def test_gate_entry_matches_duckdb(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) > 0 or name in EMPTY_OK, (
        f"{name}: empty result — a vacuous gate verifies nothing; "
        "add to EMPTY_OK only with a reason"
    )
    if sql is None:
        return  # rows-only check (non-SQL-expressible op); non-empty asserted
    dcols, drows = _duck(sql)
    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    ncols, nsrows = _norm_rows(scols, srows)
    _, ndrows = _norm_rows(dcols, drows)
    assert len(nsrows) == len(ndrows), (name, len(nsrows), len(ndrows))
    mismatches = [
        (a, b) for a, b in zip(nsrows, ndrows) if a != b
    ]
    # floats already rounded by the queries themselves; require exact match
    assert not mismatches, (name, mismatches[:5])


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_callable_signature():
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        assert callable(fn), name
    for name in e.oracle_sql():
        assert name in e.queries(), name


def test_mrr_is_positive_at_gate_sf(spark):
    """Sanity: the embedded gate query set finds its derived qrels."""
    import __spark_entry__ as e

    fn = e.queries()["a5_mrr_at_10"]
    rows = fn(spark, SF_DIR).collect()
    assert {r["method"] for r in rows} == {"dataframe", "serving_dist"}
    for row in rows:
        assert row["n_queries"] >= 8
        assert 0.0 < row["mrr"] <= 1.0
        assert not math.isnan(row["mrr"])


def test_gate_registry_within_driver_cap():
    """The driver records at most DRIVER_GATE_CAP queries() entries (round-3
    observation: the 51st registered entry was silently absent from
    CORRECTNESS_r03.json). The registry must never exceed the cap."""
    import __spark_entry__ as e

    q = e.queries()
    assert len(q) <= e.DRIVER_GATE_CAP
    assert "mm_frame_checksums" in q


def test_m3_round5_tagged_paths_engage(spark):
    """The round-5 tags on the m3 gates must be REAL routing, not comments:
    the disjunctive gate's reader engages the within-query parallel decode
    on every gate query, and the conjunctive gate serves from an
    incremental-merge output (not a from-scratch build). Either regressing
    to the plain path would keep the oracle green while silently dropping
    the round-5 operators from the driver's correctness record."""
    import glob
    import os

    import pyarrow.parquet as pq

    from websearchengine_spark.operators.wand import BlockIndexReader
    from websearchengine_spark.plans import gate_queries as g

    # disjunctive tag: the gate's reader parameters force the parallel route
    root = g._serving_index(spark, SF_DIR)
    reader = BlockIndexReader(root, parallel_workers=2, parallel_df_threshold=1)
    try:
        serial = BlockIndexReader(root)
        for _, q in g.GATE_QUERIES:
            hits = reader.search(q, conjunctive=False, k=10)
            assert reader.last_parallel, q
            assert hits == serial.search(q, conjunctive=False, k=10), q
    finally:
        reader.close()

    # conjunctive tag: the index the gate serves from is a merge output
    mroot = g._serving_index_merged(spark, SF_DIR)
    ckpt = [
        r
        for f in glob.glob(os.path.join(mroot, "checkpoints", "*.parquet"))
        for r in pq.read_table(f).to_pylist()
    ]
    assert ckpt and all("merge" in str(r["build_id"]) for r in ckpt), ckpt
    # ... and it carries LIVE tombstones (the chaff docs merged in and
    # deleted again — late round-5): the reader must be masking and
    # correcting stats, not serving a clean index that happens to match
    from websearchengine_spark.plans.delete_index import has_tombstones

    assert has_tombstones(mroot)
    mreader = BlockIndexReader(mroot)
    sreader = BlockIndexReader(root)
    assert mreader._deleted is not None and len(mreader._deleted) > 0
    assert mreader.n_docs_live == sreader.n_docs < mreader.n_docs
    # the chaff reused real texts, so the avg_dl/df corrections are
    # non-trivial — and the answers must STILL be bitwise-identical to
    # the clean from-scratch index
    assert mreader.avg_dl == sreader.avg_dl
    for _, q in g.GATE_QUERIES:
        assert mreader.search(q, conjunctive=True, k=10) == sreader.search(
            q, conjunctive=True, k=10
        ), q

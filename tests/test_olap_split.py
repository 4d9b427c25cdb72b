"""OLAP production-vs-exact-twin split (VERDICT r2 "What's wrong #3"):

- the PRODUCTION plans (plain F.sum, partial aggregation) must contain no
  collect_list — the ordered-fold determinism device materializes whole
  groups into one task and is an OOM at TPC-H group sizes;
- production values must agree with the exact twin to 2 decimals (the
  fold and the shuffled sum differ only in float associativity ulps);
- the Q5 gate must be NON-VACUOUS: its order-date window sits inside the
  test data's range, so every engine returns rows.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _tables(spark):
    return {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        for t in ["region", "nation", "customer", "orders", "lineitem", "supplier"]
    }


def _pairs(spark):
    from websearchengine_spark.plans import olap

    t = _tables(spark)
    return {
        "q1_pricing_summary": (
            lambda exact: olap.pricing_summary(t["lineitem"], exact=exact),
            ["l_returnflag", "l_linestatus"],
        ),
        "q3_shipping_priority": (
            lambda exact: olap.shipping_priority(
                t["customer"], t["orders"], t["lineitem"], exact=exact
            ),
            ["l_orderkey"],
        ),
        "q5_local_supplier_volume": (
            lambda exact: olap.local_supplier_volume(
                t["region"], t["nation"], t["customer"], t["orders"],
                t["lineitem"], t["supplier"], exact=exact,
            ),
            ["n_name"],
        ),
    }


def test_production_plans_have_no_collect_list(spark):
    for name, (mk, _) in _pairs(spark).items():
        plan = explain_str(mk(False))
        assert "collect_list" not in plan, f"{name}: ordered fold left in production plan"
        # the exact twin deliberately has it — the split is real
        assert "collect_list" in explain_str(mk(True)), name


def test_production_matches_exact_twin_to_2dp(spark):
    for name, (mk, keys) in _pairs(spark).items():
        prod = {tuple(r[k] for k in keys): r for r in mk(False).collect()}
        twin = {tuple(r[k] for k in keys): r for r in mk(True).collect()}
        assert prod.keys() == twin.keys(), name
        assert len(prod) > 0, f"{name}: vacuous comparison"
        for key in prod:
            for col in prod[key].asDict():
                a, b = prod[key][col], twin[key][col]
                if isinstance(a, float):
                    assert round(a, 2) == round(b, 2), (name, key, col, a, b)
                else:
                    assert a == b, (name, key, col)


@pytest.mark.parametrize("conjunctive", [True, False], ids=["conj", "disj"])
def test_bm25_exhaustive_production_twin(spark, conjunctive):
    """The last ordered-fold holdout (VERDICT r3 #5): the exhaustive BM25
    per-doc score fold gets a plain-F.sum production twin — no collect_list
    in the plan, values equal to the exact fold to 2 decimals."""
    from websearchengine_spark.plans.gate_queries import _spark_bm25_scores

    prod_df = _spark_bm25_scores(spark, SF_DIR, conjunctive, exact=False)
    assert "collect_list" not in explain_str(prod_df)
    assert "collect_list" in explain_str(
        _spark_bm25_scores(spark, SF_DIR, conjunctive, exact=True)
    )
    prod = {
        (r["query_id"], r["doc_id"]): r
        for r in prod_df.collect()
    }
    twin = {
        (r["query_id"], r["doc_id"]): r
        for r in _spark_bm25_scores(spark, SF_DIR, conjunctive, exact=True).collect()
    }
    assert prod.keys() == twin.keys() and len(prod) > 0
    for key in prod:
        assert round(prod[key]["score"], 2) == round(twin[key]["score"], 2), key
        assert prod[key]["nhit"] == twin[key]["nhit"], key


def test_q5_window_is_inside_data_range(spark):
    """The round-2 vacuous-gate regression test: the default Q5 window must
    match at least one order, so the six-way join chain is exercised."""
    t = _tables(spark)
    from websearchengine_spark.plans.olap import local_supplier_volume

    rows = local_supplier_volume(
        t["region"], t["nation"], t["customer"], t["orders"],
        t["lineitem"], t["supplier"],
    ).collect()
    assert len(rows) >= 1
    assert all(r["revenue"] > 0 for r in rows)

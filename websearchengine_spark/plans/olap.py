"""General OLAP patterns over the relational test tables (TPC-H-shaped
lineitem/orders/customer): the filter→group→aggregate→sort and
multi-join→top-k shapes every analytics workload reduces to. These are not
reference operators — they demonstrate that the same engine discipline
(broadcast small sides, bounded top-k windows) covers the general
relational surface beside the search core.

Two plans per query — the same production-vs-oracle-twin split the
SimHash/LSH pipeline uses:

- **production** (default, ``exact=False``): plain ``F.sum`` — partial
  aggregation (map-side combine) + one shuffle on the grouping key, the
  plan you run at 100 TB. Float partial-merge order is nondeterministic,
  so two runs can differ in the last ulp; results are rounded but a value
  sitting exactly on a ROUND(x, 6) boundary may flip. That is the normal
  contract of distributed float aggregation.
- **exact twin** (``exact=True``): deterministic ordered fold keyed by the
  row's primary key ((l_orderkey, l_linenumber)), mirrored row-for-row in
  the DuckDB oracles — see the CLAUDE.md invariant on partial-merge order.
  It materializes each group into one task (collect_list) so it is a
  CORRECTNESS oracle for gate hashing, NOT a scale plan: at TPC-H Q1 group
  sizes (~1.5M rows/group at sf1) the array would blow a task's memory.

tests/test_olap_split.py asserts the production plans contain no
collect_list and that production values equal the twin's to 2 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered_sum(value_col, key_cols: list[str], ndigits: int = 6):
    """Deterministic SUM: sequential fold of values in key order (the
    exact-twin device; see module docstring for why not in production)."""
    return F.round(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(*key_cols, value_col.alias("_v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_v"],
        ),
        ndigits,
    )


def _sum(value_col, key_cols: list[str], exact: bool, ndigits: int = 6):
    if exact:
        return _ordered_sum(value_col, key_cols, ndigits)
    return F.round(F.sum(value_col), ndigits)


def pricing_summary(
    lineitem: DataFrame, ship_cutoff: str = "1998-09-01", exact: bool = False
) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) over shipped rows —
    quantity/price sums, discounted revenue, row count. One shuffle on a
    tiny grouping key; partial aggregation handles the fan-in."""
    # parquet naive timestamps read as TIMESTAMP_NTZ; cast through TIMESTAMP
    # (session tz UTC) to compare against the literal, matching DuckDB
    li = lineitem.filter(
        F.col("l_shipdate").cast("timestamp") < F.to_timestamp(F.lit(ship_cutoff))
    )
    keys = ["l_orderkey", "l_linenumber"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum(F.col("l_quantity"), keys, exact).alias("sum_qty"),
            _sum(F.col("l_extendedprice"), keys, exact).alias("sum_base_price"),
            _sum(disc_price, keys, exact).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "count_order",
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
    k: int = 10,
    exact: bool = False,
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (customer ⋈ orders ⋈ lineitem) →
    per-order discounted revenue → top-k. customer is broadcast (small
    dim); orders⋈lineitem is the one real shuffle; top-k is a bounded
    window (TakeOrderedAndProject shape), ties broken by ascending
    orderkey for cross-engine determinism."""
    keys = ["l_orderkey", "l_linenumber"]
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(
        F.col("o_orderdate").cast("timestamp") < F.to_timestamp(F.lit(cutoff))
    ).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(
        F.col("l_shipdate").cast("timestamp") > F.to_timestamp(F.lit(cutoff))
    )
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            _sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), keys, exact
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "l_orderkey", "o_orderdate", "revenue")
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    exact: bool = False,
) -> DataFrame:
    """TPC-H Q5 shape: six-way join — the join-reordering showcase.
    region→nation→supplier collapse into broadcast joins (tiny dims);
    customer⋈orders⋈lineitem carry the data volume; the "local" predicate
    (customer and supplier share a nation) rides the join keys. Revenue per
    nation. Default window is 1996 — INSIDE the test data's o_orderdate
    range (1995-01-01 → 2001-08-01), so the gate is non-vacuous (the
    round-2 1994 window matched zero orders and verified the empty set)."""
    keys = ["l_orderkey", "l_linenumber"]
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = customer.select("c_custkey", "c_nationkey")
    ords = orders.filter(
        (F.col("o_orderdate").cast("timestamp") >= F.to_timestamp(F.lit(year_start)))
        & (F.col("o_orderdate").cast("timestamp") < F.to_timestamp(F.lit(year_end)))
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))  # "local" volume
    )
    return (
        joined.groupBy("n_name")
        .agg(
            _sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), keys, exact
            ).alias("revenue")
        )
        .select("n_name", "revenue")
    )

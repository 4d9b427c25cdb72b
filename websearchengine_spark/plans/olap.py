"""General OLAP patterns over the relational test tables (TPC-H-shaped
lineitem/orders/customer): the filter→group→ordered-aggregate→sort and
multi-join→top-k shapes every analytics workload reduces to. These are not
reference operators — they demonstrate that the same engine discipline
(broadcast small sides, deterministic ordered float folds, bounded top-k
windows) covers the general relational surface beside the search core.

Float determinism: every SUM over doubles is an ordered fold keyed by the
row's primary key ((l_orderkey, l_linenumber)), mirrored in the DuckDB
oracles — see the CLAUDE.md invariant on partial-merge order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordered_sum(value_col, key_cols: list[str], ndigits: int = 6):
    """Deterministic SUM: sequential fold of values in key order."""
    return F.round(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(*key_cols, value_col.alias("_v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_v"],
        ),
        ndigits,
    )


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-01") -> DataFrame:
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
            _ordered_sum(F.col("l_quantity"), keys).alias("sum_qty"),
            _ordered_sum(F.col("l_extendedprice"), keys).alias("sum_base_price"),
            _ordered_sum(disc_price, keys).alias("sum_disc_price"),
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
            _ordered_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), keys
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
    year_start: str = "1994-01-01",
    year_end: str = "1995-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: six-way join — the join-reordering showcase.
    region→nation→supplier collapse into broadcast joins (tiny dims);
    customer⋈orders⋈lineitem carry the data volume; the "local" predicate
    (customer and supplier share a nation) rides the join keys. Revenue per
    nation, deterministic ordered-fold sums keyed by the lineitem PK."""
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
            _ordered_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), keys
            ).alias("revenue")
        )
        .select("n_name", "revenue")
    )

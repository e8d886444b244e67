"""Range join via binning — the scalable form of the interval/theta join
(an operator Spark has no native physical strategy for; naive `lo <= x AND
x < hi` joins plan as BroadcastNestedLoopJoin, O(rows × tiers)).

The pattern: pick a bin width, map the fact row to ONE bin
(floor(x / bin)), expand each interval to EVERY bin it overlaps, equi-join
on the bin, then re-check the exact range as a residual filter. The
equi-join prunes candidates to intervals sharing the row's bin, so cost is
O(rows × avg-intervals-per-bin) — the same trick behind Databricks' range
join optimization and time-interval joins in stream processors. At 100 TB
the bin column also becomes the partition key, turning the join
shuffle-free.

The DuckDB oracle runs the NAIVE theta join — a different plan arriving at
the same rows, certifying the bin+residual rewrite is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exact_sum, sql_exact_sum
from ..tables import load_table
from . import tune

BIN_WIDTH = 10_000.0

# price tiers with boundaries deliberately NOT aligned to the bin width,
# so tiers span multiple bins and bins hold multiple tiers — the general
# case the rewrite must handle
PRICE_TIERS = (
    ("budget", 0.0, 15_000.0),
    ("value", 15_000.0, 32_500.0),
    ("mid", 32_500.0, 48_000.0),
    ("premium", 48_000.0, 75_000.0),
    ("luxury", 75_000.0, 999_999.0),
)


def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier each lineitem by `lo <= l_extendedprice < hi` using the
    bin+residual equi-join rewrite; emit per-tier revenue accounting."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", F.floor(F.col("l_extendedprice") / BIN_WIDTH).alias("bin")
    )
    tiers = spark.createDataFrame(
        list(PRICE_TIERS), "tier string, lo double, hi double"
    )
    # a tier covers bins floor(lo/W) .. floor((hi - ulp)/W); hi is exclusive
    tier_bins = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BIN_WIDTH),
                F.floor((F.col("hi") - 0.01) / BIN_WIDTH),
            )
        ).alias("bin"),
    )
    joined = li.join(F.broadcast(tier_bins), "bin").filter(
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") < F.col("hi"))
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_items"),
        exact_sum("l_extendedprice").alias("total_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


_TIER_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in PRICE_TIERS)

_ORACLE_RANGE_JOIN = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_TIER_VALUES})
SELECT t.tier, count(*) AS n_items,
       {sql_exact_sum('l.l_extendedprice')} AS total_price,
       min(l.l_extendedprice) AS min_price,
       max(l.l_extendedprice) AS max_price
FROM lineitem l
JOIN tiers t ON l.l_extendedprice >= t.lo AND l.l_extendedprice < t.hi
GROUP BY t.tier
"""


QUERIES = {"range_join_binned": q_range_join_binned}
ORACLE = {"range_join_binned": _ORACLE_RANGE_JOIN}

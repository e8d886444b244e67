"""Shared column-expression helpers.

Oracle-parity design: the driver compares Spark results against DuckDB by
order-insensitive value hash, so floating-point aggregates must be
*bit-identical* across engines. Double summation is order-dependent (Spark
sums per-partition then merges; DuckDB sums in scan order), so any double
SUM over enough rows can differ in the last ulps. The fix used throughout
this engine: cast the (deterministic, IEEE-identical) double expression to
DECIMAL before aggregating — decimal addition is exact and associative, so
every partitioning/ordering yields the same result — then round and cast
back to DOUBLE. The DuckDB oracle does the exact same cast dance, and both
engines produce identical doubles.

This also matters at scale: decimal aggregation is still JVM-side,
codegen-friendly, and map-side-combinable; it costs a few cycles per row
but keeps results stable under AQE re-partitioning — a real reproducibility
property for a 100 TB pipeline, not just a test trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(col: Column | str, scale: int = 4, round_to: int = 2) -> Column:
    """Order-independent SUM of a double expression → DOUBLE.

    Spark:  round(sum(cast(x as decimal(25,scale))), round_to)::double
    DuckDB: CAST(ROUND(SUM(CAST(x AS DECIMAL(25,scale))), round_to) AS DOUBLE)
    """
    return F.round(F.sum(_col(col).cast(f"decimal(25,{scale})")), round_to).cast("double")


def exact_avg(col: Column | str, scale: int = 4, round_to: int = 6) -> Column:
    """Order-independent AVG of a double expression → DOUBLE.

    Computed as exact decimal SUM cast to double, divided by COUNT (both
    engine-identical), then rounded. Matching DuckDB SQL::

        ROUND(CAST(SUM(CAST(x AS DECIMAL(25,4))) AS DOUBLE) / COUNT(x), 6)
    """
    c = _col(col)
    return F.round(
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double") / F.count(c), round_to
    )


def sql_exact_sum(expr: str, scale: int = 4, round_to: int = 2) -> str:
    """DuckDB-side twin of :func:`exact_sum`."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,{scale}))), {round_to}) AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 4, round_to: int = 6) -> str:
    """DuckDB-side twin of :func:`exact_avg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {round_to})"
    )


def cosine_similarity(a: Column | str, b: Column | str, round_to: int = 6) -> Column:
    """Cosine similarity between two array<float|double> columns, entirely in
    JVM array expressions (zip_with product + sequential aggregate fold) —
    no Python UDF in the hot path. Both engines fold left-to-right over the
    same element order, and the result is rounded so last-ulp divergence
    cannot reorder ties downstream.

    DuckDB twin: list_cosine_similarity(a, b) rounded identically (or the
    explicit list_sum/list_transform form).
    """
    ca, cb = _col(a).cast("array<double>"), _col(b).cast("array<double>")
    dot = F.aggregate(F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ca, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(cb, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return F.round(dot / (na * nb), round_to)


def dot_product(a: Column | str, b: Column | str) -> Column:
    ca, cb = _col(a).cast("array<double>"), _col(b).cast("array<double>")
    return F.aggregate(F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of a text column → array<string>, dropping
    empty tokens (JVM-side split; matches DuckDB
    ``list_filter(string_split_regex(text,'\\s+'), x -> len(x)>0)``)."""
    return F.filter(F.split(_col(col), r"\s+"), lambda t: F.length(t) > 0)

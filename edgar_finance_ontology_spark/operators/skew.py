"""Skew-safe aggregation helpers (SURVEY §2.4 A8, north_rule).

Head entities (Zipfian mention distributions) make single reduce keys
hot. `salted_agg` runs any algebraic aggregation two-phase:
per-(key, salt) partial on a salted exchange, then per-key final —
the hot key's rows spread over `salt_buckets` reducers.

Supported aggregates are the algebraic ones (sum, count, min, max) —
exactly the class where partial+final composes losslessly. avg is
provided as sum/count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """aggs: out_col -> (fn_name, in_col); e.g.
    {"n": ("count", "*"), "total": ("sum", "value")}.

    Equivalent to df.groupBy(keys).agg(...) but with an explicit
    two-phase salted exchange for hot keys.
    """
    salt = F.pmod(F.crc32(F.concat_ws("§", *[F.col(k).cast("string")
                                             for k in keys],
                                      F.monotonically_increasing_id()
                                      .cast("string"))),
                  F.lit(salt_buckets))
    # NB: salting by a per-row value (not by key) spreads every key's
    # rows uniformly; partial aggregation shrinks them to
    # keys × salt_buckets rows before the final exchange.
    salted = df.withColumn("_salt", salt)
    partials = []
    finals = []
    for out, (fn, col) in aggs.items():
        pfn, ffn = _ALGEBRAIC[fn]
        c = F.lit(1) if col == "*" else F.col(col)
        partials.append(pfn(c).alias(f"_p_{out}"))
        finals.append(ffn(F.col(f"_p_{out}")).alias(out))
    part = salted.groupBy(*keys, "_salt").agg(*partials)
    return part.groupBy(*keys).agg(*finals)


def salted_avg(
    df: DataFrame, keys: list[str], col: str, salt_buckets: int = 32,
    out: str = "avg",
) -> DataFrame:
    two = salted_agg(
        df, keys,
        {"_s": ("sum", col), "_n": ("count", col)},
        salt_buckets,
    )
    return two.select(*keys, (F.col("_s") / F.col("_n")).alias(out))

"""Cardinality sketches — distributed approximate distinct counts
whose result is DETERMINISTIC and engine-replayable.

Spark ships `approx_count_distinct` (a native HLL++), but its result
depends on an engine-internal hash and register encoding — it cannot
be replayed by another engine, asserted in a cross-engine oracle, or
even guaranteed stable across Spark versions. This module rebuilds
classic HyperLogLog (Flajolet et al. 2007) from engine-portable
primitives (the md5 integer idiom shared with `stratified_sample` /
the dedup family):

  * register index = first 32 md5 bits mod m (m = 2^p registers);
  * rank ρ = leading-zero count of the NEXT 32 md5 bits + 1
    (ρ ∈ [1, 33]), via bit-length = floor(log2(w)) + 1 — floor(log2)
    on integers is cross-engine-safe (exact at powers of two, >1 ulp
    from a boundary elsewhere; the `unigram_surprisal` lesson);
  * the harmonic-mean denominator Σ 2^{-M_j} is summed SCALED:
    Σ 2^{33-M_j} — every term is an integer power of two and every
    partial sum an integer < 2^53, so the double sum is EXACT and
    order-free (shuffle-safe, twin-replayable without a decimal trick);
  * small-range (linear-counting) correction when raw ≤ 2.5·m and
    empty registers remain, per the paper.

Accuracy is the standard ~1.04/√m relative error (m=4096 → ~1.6%).

100-TB posture: ONE groupBy (group, register) max-aggregation —
map-side combined, at most m rows per group survive the shuffle —
then a bounded per-group rollup. The sketch never materializes value
sets; memory is O(m) per group regardless of corpus size. This is the
count-distinct you can afford over 10^12 urls per domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hll_idx_rho(value: Column, p: int) -> tuple[Column, Column]:
    m = 1 << p
    h = F.md5(value.cast("string"))
    idx = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m) \
        .cast("int")
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    bitlen = F.when(w > 0, F.floor(F.log2(w)) + 1).otherwise(F.lit(0))
    rho = (F.lit(33) - bitlen).cast("int")
    return idx, rho


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: list[str] | None = None,
                  p: int = 12) -> DataFrame:
    """(…group_cols, idx, M) — the per-group register table, max-
    aggregated. This IS the sketch state: registers of two data
    slices MERGE by max, which is associative / commutative /
    idempotent — the property that makes the sketch shuffle-safe,
    incrementally maintainable, and replay-tolerant (an append-only
    register log max-folds to the same state no matter how often a
    batch is re-delivered; see streaming/sketch_stream.py)."""
    group_cols = group_cols or []
    idx, rho = _hll_idx_rho(F.col(value_col), p)
    base = df.where(F.col(value_col).isNotNull())
    return (
        base.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: list[str] | None = None,
                                p: int = 12) -> DataFrame:
    """Finish a register table (possibly the max-merge of many
    slices) into (…group_cols, n_registers_hit, hll_estimate)."""
    group_cols = group_cols or []
    m = 1 << p
    # Σ 2^(33-M): exact integer-valued double sum (see module doc)
    stats = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(F.pow(F.lit(2.0), F.lit(33) - F.col("M")))
        .cast("long").alias("t_hit"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    t_total = (
        F.col("t_hit")
        + (F.lit(int(m)) - F.col("n_hit")) * F.lit(float(2 ** 33))
    )
    raw = F.lit(alpha * m * m * float(2 ** 33)) / t_total
    v_empty = F.lit(int(m)) - F.col("n_hit")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty),
    ).otherwise(raw)
    return stats.select(
        *group_cols,
        F.col("n_hit").cast("int").alias("n_registers_hit"),
        F.round(est, 3).alias("hll_estimate"),
    )


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 p: int = 12) -> DataFrame:
    """-> per group: (…group_cols, n_registers_hit, hll_estimate)
    where hll_estimate is rounded to 3dp. NULL values are ignored
    (SQL COUNT(DISTINCT ...) semantics)."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def _kmv_frac(value: Column) -> Column:
    """52-bit md5 fraction in [0, 1) — 13 hex digits, so the integer
    is exactly representable in a double and the division by 2^52 is
    exact. 52 bits keeps birthday collisions negligible at ~10^6
    distinct values per set (32 bits would not)."""
    return (
        F.conv(F.substring(F.md5(value.cast("string")), 1, 13), 16, 10)
        .cast("double") / F.lit(float(2 ** 52))
    )


def kmv_sketch(df: DataFrame, value_col: str, set_col: str,
               k: int = 256) -> DataFrame:
    """K-minimum-values sketch per set: the k DISTINCT values with the
    smallest md5 fraction, as rows (set, frac, value, pos). Bounded:
    k rows per set survive. Ties (52-bit collisions) break by value."""
    distinct = df.select(
        F.col(set_col).alias("set"), F.col(value_col).alias("value")
    ).where(F.col("value").isNotNull()).distinct()
    w = Window.partitionBy("set").orderBy(
        _kmv_frac(F.col("value")).asc(), F.col("value").asc()
    )
    return (
        distinct.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("set", _kmv_frac(F.col("value")).alias("frac"),
                "value", F.col("pos").cast("int").alias("pos"))
    )


def kmv_pairwise_jaccard(df: DataFrame, value_col: str, set_col: str,
                         k: int = 256) -> DataFrame:
    """Estimated Jaccard similarity between every unordered pair of
    sets from their KMV sketches (Beyer et al. 2007 / the theta-sketch
    idea): merge the two k-min samples, keep the k smallest distinct
    values of the union, and count how many live in BOTH sketches —
    J ≈ matches / min(k, |merged|). Deterministic (md5 order), so the
    DuckDB twin replays it exactly; standard error ~1/√k.

    Use case at 10^12 rows: estimate cross-source contamination
    overlap from k-row sketches BEFORE paying for the exact
    decontamination join — each set contributes exactly k rows here
    no matter how many billions of values it holds.

    Output: (set_a, set_b, n_merged, n_both, kmv_jaccard 6dp)."""
    # eager localCheckpoint (≤ k rows per set): the pairwise join reads
    # the sketch from both sides; a cache() here would pin blocks with
    # no caller-reachable unpersist, a checkpoint is ContextCleaner-freed
    sk = kmv_sketch(df, value_col, set_col, k).localCheckpoint(eager=True)
    return kmv_jaccard_from_sketch(sk, k)


def kmv_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Fold a union of per-set sketch rows (possibly many generations
    of the same sets) back into one k-min sketch per set. Merge is
    set-union → k smallest: associative, commutative, IDEMPOTENT
    (duplicate (set, value) rows collapse before the top-k), so an
    append-only sketch log folds to the same state no matter how often
    a batch is re-delivered — the same replay-tolerance contract as
    the HLL register log (see streaming/sketch_stream.py)."""
    distinct = sketches.select("set", "frac", "value").distinct()
    w = Window.partitionBy("set").orderBy(
        F.col("frac").asc(), F.col("value").asc()
    )
    return (
        distinct.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("set", "frac", "value", F.col("pos").cast("int").alias("pos"))
    )


def kmv_jaccard_from_sketch(sk: DataFrame, k: int = 256) -> DataFrame:
    """Pairwise-Jaccard finisher over an already-built sketch table
    (rows (set, frac, value[, pos]))."""
    # unordered set pairs — a bounded K×K cross over set LABELS only
    pairs = (
        sk.select(F.col("set").alias("set_a")).distinct()
        .crossJoin(sk.select(F.col("set").alias("set_b")).distinct())
        .where(F.col("set_a") < F.col("set_b"))
    )
    mem_a = sk.select(F.col("set").alias("s"), "frac", "value")
    mem_b = sk.select(F.col("set").alias("s"), "frac", "value")
    union_rows = (
        pairs.join(mem_a, pairs.set_a == mem_a.s)
        .select("set_a", "set_b", "frac", "value")
        .unionByName(
            pairs.join(mem_b, pairs.set_b == mem_b.s)
            .select("set_a", "set_b", "frac", "value")
        )
        .groupBy("set_a", "set_b", "frac", "value")
        .agg(F.count("*").alias("sides"))
    )
    w = Window.partitionBy("set_a", "set_b").orderBy(
        F.col("frac").asc(), F.col("value").asc()
    )
    merged = union_rows.withColumn("pos", F.row_number().over(w)) \
        .where(F.col("pos") <= k)
    return (
        merged.groupBy("set_a", "set_b")
        .agg(
            F.count("*").cast("int").alias("n_merged"),
            F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
            .cast("int").alias("n_both"),
        )
        .select(
            "set_a", "set_b", "n_merged", "n_both",
            F.round(F.col("n_both") / F.col("n_merged"), 6)
            .alias("kmv_jaccard"),
        )
    )


def histogram_quantiles(df: DataFrame, value_col: str,
                        group_cols: list[str] | None = None,
                        lo: float = 0.0, hi: float = 1.0,
                        n_buckets: int = 1024,
                        quantiles: tuple[float, ...] = (0.5, 0.95),
                        ) -> DataFrame:
    """Fixed-width-histogram quantile sketch — the O(B)-memory
    companion to `exact_group_stats` (exact_stats.py), for when a
    range sort over 10^12 rows per group is not worth the answer:
    per group, bucket counts over [lo, hi) (B = `n_buckets` equal
    bins, underflow clamps to bin 0, overflow to bin B−1), then each
    requested quantile q is answered with the UPPER EDGE of the first
    bucket whose cumulative count reaches ceil(q·n). The error bound
    is explicit and data-independent: one bucket width
    (hi−lo)/B — no probabilistic failure mode, unlike mergeable
    rank sketches.

    Engine portability: bucket index floor((v−lo)·B/(hi−lo)) uses one
    correctly-rounded subtract/multiply/divide chain — identical
    input doubles give identical buckets except within 1 ulp of a
    bucket edge (measure-zero for real data, and an edge flip moves
    the estimate by ≤ one bucket = the stated error). Everything
    downstream is integer counts.

    100-TB posture: ONE map-side-combined (group, bucket) count — at
    most B rows per group cross the shuffle — then a bounded rollup
    via a per-group sorted-array fold. `lo`/`hi` come from the
    caller's domain knowledge or one cheap min/max agg."""
    counts = histogram_counts(df, value_col, group_cols, lo, hi,
                              n_buckets)
    return histogram_quantiles_from_counts(
        counts, group_cols, lo, hi, n_buckets, quantiles
    )


def histogram_counts(df: DataFrame, value_col: str,
                     group_cols: list[str] | None = None,
                     lo: float = 0.0, hi: float = 1.0,
                     n_buckets: int = 1024) -> DataFrame:
    """(…group_cols, bucket, c) — the per-group bucket-count table.
    This is the sketch state; two slices MERGE by per-bucket SUM.
    Unlike HLL registers / KMV min-sets, sum-merge is NOT idempotent —
    a re-delivered batch double-counts — so the streaming log for this
    sketch must carry batch identity and dedup before folding (see
    stream_hist_counts in streaming/sketch_stream.py)."""
    group_cols = group_cols or []
    width = (hi - lo) / n_buckets
    v = F.col(value_col).cast("double")
    # Clamp in DOUBLE *before* floor/cast: floor returns LONG and the
    # int cast is ANSI-checked, so one dirty row with
    # (v-lo)/width >= 2^31 (or +Inf) would abort the whole aggregation
    # with CAST_OVERFLOW instead of landing in the overflow bucket.
    # least/greatest also route NaN (sorts greater than any double) to
    # the overflow bucket and -Inf to bucket 0.
    scaled = F.least(
        F.lit(float(n_buckets - 1)),
        F.greatest(F.lit(0.0), (v - F.lit(float(lo))) / F.lit(float(width))),
    )
    bucket = F.floor(scaled).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("c"))
    )


def histogram_quantiles_from_counts(
    counts: DataFrame,
    group_cols: list[str] | None = None,
    lo: float = 0.0, hi: float = 1.0,
    n_buckets: int = 1024,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Finish a bucket-count table (possibly the sum-merge of many
    slices — caller is responsible for merge semantics) into per-group
    quantile estimates."""
    group_cols = group_cols or []
    width = (hi - lo) / n_buckets
    # bounded per-group rollup: collect the ≤B (bucket, c) pairs into
    # a sorted array and walk the CDF with an aggregate fold per
    # requested quantile — no second shuffle, no window
    rolled = counts.groupBy(*group_cols).agg(
        F.sum("c").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("bucket", "c"))
        ).alias("h"),
    )
    cols = list(group_cols) + [F.col("n").cast("long").alias("n_rows")]
    for q in quantiles:
        # rank = ceil(q*n) clamped to >= 1; fold state = (seen, edge)
        rank = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * F.col("n")))
        picked = F.aggregate(
            F.col("h"),
            F.struct(F.lit(0).cast("long").alias("seen"),
                     F.lit(-1).alias("bkt")),
            lambda acc, e: F.struct(
                (acc["seen"] + e["c"]).alias("seen"),
                F.when((acc["bkt"] < 0) & (acc["seen"] + e["c"] >= rank),
                       e["bucket"]).otherwise(acc["bkt"]).alias("bkt"),
            ),
        )["bkt"]
        est = F.lit(float(lo)) + (picked + 1) * F.lit(float(width))
        name = f"p{int(round(q * 100))}"
        cols.append(F.round(est, 6).alias(name))
    return rolled.select(*cols)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — bounded-state
# frequency estimation. Merge algebra = per-cell SUM (associative /
# commutative), so the cell table shuffles map-side-combined, merges
# across slices, and maintains incrementally exactly like the HLL
# register log. Estimates only ever OVER-count (collisions add), with
# err <= e*n/w at depth confidence 1-(1/e)^d. The 100-TB use: word /
# url / entity heavy-hitters where an exact groupBy's key cardinality
# (10^9+) would dwarf the d*w = few-thousand-row sketch — candidates
# come from a deterministic hash-sample, counts from the sketch, and
# the full-cardinality shuffle never happens.
# ---------------------------------------------------------------------------

def _cm_cell(value: Column, depth: Column, w: int) -> Column:
    h = F.md5(F.concat(depth.cast("string"), F.lit(":"),
                       value.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w) \
        .cast("int")


def countmin_cells(df: DataFrame, value_col: str,
                   group_cols: list[str] | None = None,
                   w: int = 1024, d: int = 4) -> DataFrame:
    """(…group_cols, depth, cell, c) — the d×w sketch state. NULLs
    ignored. ONE map-side-combined aggregation; at most d*w rows per
    group cross the wire regardless of value cardinality."""
    group_cols = group_cols or []
    base = df.where(F.col(value_col).isNotNull())
    depth = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth")
    expanded = base.select(*group_cols, F.col(value_col).alias("v"), depth)
    return (
        expanded
        .select(*group_cols, "depth",
                _cm_cell(F.col("v"), F.col("depth"), w).alias("cell"))
        .groupBy(*group_cols, "depth", "cell")
        .agg(F.count("*").cast("long").alias("c"))
    )


def countmin_estimate(cells: DataFrame, keys: DataFrame, key_col: str,
                      group_cols: list[str] | None = None,
                      w: int = 1024, d: int = 4) -> DataFrame:
    """Point-estimate each key: min over the d depths of its cell's
    count (absent cell = 0). `cells` is bounded (d*w rows per group)
    and broadcast; the key side never shuffles."""
    group_cols = group_cols or []
    depth = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("depth")
    probes = (
        keys.select(*group_cols, F.col(key_col).alias("k"), depth)
        .select(*group_cols, "k", "depth",
                _cm_cell(F.col("k"), F.col("depth"), w).alias("cell"))
    )
    joined = probes.join(F.broadcast(cells),
                         on=[*group_cols, "depth", "cell"], how="left")
    return (
        joined.groupBy(*group_cols, "k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
             .alias("cm_estimate"))
        .select(*group_cols, F.col("k").alias(key_col), "cm_estimate")
    )


def countmin_heavy_hitters(df: DataFrame, value_col: str,
                           min_count: int, w: int = 1024, d: int = 4,
                           candidate_rate: float = 0.05) -> DataFrame:
    """Two-pass heavy hitters without a full-cardinality shuffle:
    candidates = distinct values whose md5 hash-fraction falls under
    `candidate_rate` (deterministic — same sample on re-run/retry; a
    value with true count >= min_count misses the sample only with
    prob (1-rate)^count, negligible for real heavy hitters), counts =
    count-min estimates. Returns (value, cm_estimate) with
    cm_estimate >= min_count, over-count-only semantics."""
    vals = df.where(F.col(value_col).isNotNull()) \
             .select(F.col(value_col).alias("v"))
    frac = (
        F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 8),
               16, 10).cast("double") / float(0xFFFFFFFF + 1)
    )
    candidates = vals.where(frac < candidate_rate).distinct()
    cells = countmin_cells(vals, "v", w=w, d=d)
    est = countmin_estimate(cells, candidates, "v", w=w, d=d)
    return (
        est.where(F.col("cm_estimate") >= min_count)
        .select(F.col("v").alias(value_col), "cm_estimate")
    )

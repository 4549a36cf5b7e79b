"""Deduplication operators for web-scale training-data pipelines.

All hashing is md5-based so results are engine-portable (the DuckDB
oracle replays the identical algorithm) and deterministic across
cluster sizes — no JVM-specific hash functions in results.

Scale notes (10^12 docs):
  * exact dedup: one shuffle on the content hash (map-side combine).
  * minhash: narrow per-doc work (explode shingles x seeds is a
    generator inside codegen), then one groupBy(doc) — signatures are
    64-128 bytes/doc.
  * LSH banding: groupBy(band, bucket) with skew-safe two-phase
    counting; candidate pairs come from within-bucket joins, bounded
    by bucket size, not n².
  * exact-jaccard verify runs ONLY on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens_col(text, lowercase: bool = True):
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(t), r"\s+")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) distinct word n-grams."""
    toks = tokens_col(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .where(F.size(F.split(F.col("shingle"), " ")) == n)
        .distinct()
    )


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: (content_md5, n_docs, min_id) for
    groups, n_docs >= 1. One shuffle, map-side combined."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"),
                  F.col(id_col).alias("id"))
        .groupBy("content_md5")
        .agg(F.count("id").alias("n_docs"), F.min("id").alias("keep_id"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """(id, seed, minhash) — minhash_i = min over shingles of
    md5(i || '|' || shingle), compared lexicographically (portable)."""
    sh = word_shingles(df, text_col, shingle_n, id_col)
    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    exploded = sh.select(
        "id", "shingle", F.explode(seeds).alias("seed")
    ).withColumn(
        "h", F.md5(F.concat_ws("|", F.col("seed").cast("string"),
                               F.col("shingle")))
    )
    return exploded.groupBy("id", "seed").agg(F.min("h").alias("minhash"))


def lsh_bands(sigs: DataFrame, bands: int = 4) -> DataFrame:
    """(id, band, bucket): bucket = md5 of the band's concatenated
    minhashes (seeds sorted within band)."""
    b = sigs.withColumn("band", F.col("seed") % bands)
    return (
        b.groupBy("id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(
                        F.concat_ws(":", F.col("seed").cast("string"),
                                    F.col("minhash"))
                    ))
                )
            ).alias("bucket")
        )
    )


def lsh_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """distinct (id_a < id_b) sharing any band bucket."""
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_on_pairs(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """exact |A∩B| / |A∪B| for the given candidate pairs."""
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n"))
    sh_a = shingles.select(F.col("id").alias("id_a"), "shingle")
    sh_b = shingles.select(F.col("id").alias("id_b"),
                           F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(sh_a, "id_a").join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"inter": 0})
        .join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold via inverted shingle
    join (the scalable exact path: pair work bounded by posting-list
    sizes, not n²)."""
    sh = word_shingles(df, text_col, shingle_n, id_col)
    pairs = (
        sh.alias("a").join(sh.alias("b"), "shingle")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    j = jaccard_on_pairs(pairs, sh)
    return j.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def simhash16(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit simhash as a bit-string: bit j = majority over tokens of
    the high bit of md5(token)'s j-th hex nibble (nibble >= '8').
    Portable: pure substring/threshold logic."""
    toks = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .where(F.col("tok") != "")
        .withColumn("h", F.md5("tok"))
    )
    pos = toks.select(
        "id", F.explode(F.sequence(F.lit(1), F.lit(16))).alias("j"), "h"
    ).withColumn(
        "bit", F.when(F.col("h").substr(F.col("j"), F.lit(1)) >= "8", 1).otherwise(-1)
    )
    agg = pos.groupBy("id", "j").agg(F.sum("bit").alias("s"))
    return (
        agg.withColumn("b", F.when(F.col("s") > 0, "1").otherwise("0"))
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("j", "b"))
                    ),
                    lambda x: x["b"],
                ),
            ).alias("simhash")
        )
    )

"""Candidate selection: the reference's per-company fallback ladder as
ONE set-oriented Spark job.

Reference shape (select_xbrl_tags.py:1813-1916): for each company ×
metric, loop widen ∈ (0,60,120,180) × candidates × pick_best_annual
(pass1 fp∈FY/CY/FYR → pass2 qtrs==4 → pass3 lenient, each smart_pick =
argmax(-dist+5·fp_bonus, end)), early-exiting at the first widen level
with any hit, then argmax candidate score.

Set-oriented equivalence (proved by the early-exit structure, not by
score monotonicity — the widen penalty is a flat 0.02):
  1. admit a record iff dist ≤ tol+180 (the widest rung);
  2. w* per (company, metric) = the smallest widen rung admitting ANY
     record — because tolerance windows are nested, the ladder's first
     hit happens exactly at w*;
  3. eligible = records admitted at w*; per-qname pass = min pass rank
     among eligible; per-qname winner = argmax(smart score, end, pool
     order); per-metric winner = argmax(candidate score, end, list ord).

Physical plan: facts ⋈ broadcast(candidates × specs) ⋈
broadcast(companies) → three window functions over
(cik, spec[, qname]). One shuffle on (cik, spec_id, qname) — the
windows share the partition key prefix, so Catalyst reuses a single
exchange; no per-company loops, no UDFs.

At 10^12-row scale: the fact table arrives hash-partitioned by cik
bucket, the candidate/spec/company sides are broadcast, and AQE
handles head-company skew on the window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import fiscal_anchor_cols, fye_month_day, parse_date_col
from ..functions.scoring import clamp01, score_adj_col, typ_bonus_col
from ..vocab.candidates import candidates_df

WIDEN_RUNGS = (0, 60, 120, 180)

# SELECTION RESULT columns every selector emits.
RESULT_COLS = [
    "cik", "spec_id", "metric", "source_type", "qname", "value", "unit",
    "end", "form", "accn", "confidence",
]


def specs_df(spark, specs: list[dict]) -> DataFrame:
    """specs: [{spec_id, metric, fy, tol_days, period_type}]"""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("spec_id", StringType(), False),
        StructField("metric", StringType(), False),
        StructField("fy", IntegerType(), False),
        StructField("tol_days", IntegerType(), False),
        StructField("period_type", StringType(), False),
    ])
    rows = [
        (s["spec_id"], s["metric"], s["fy"], s["tol_days"], s["period_type"])
        for s in specs
    ]
    return spark.createDataFrame(rows, schema)


def _pool_order_cols(prefer_unit: str):
    """Deterministic proxy for the reference's record-pool iteration
    order (prefer_unit first, then unit-map order, then array order —
    select_xbrl_tags.py:1821-1825). Holds exactly when the source JSON
    has sorted unit keys (our readers/fixtures guarantee this);
    otherwise it is our documented deterministic tie-break."""
    return [
        F.when(F.col("unit") == prefer_unit, 0).otherwise(1).asc(),
        F.col("unit").asc(),
        F.col("rec_pos").asc(),
    ]


def _join_candidates(
    facts: DataFrame,
    companies: DataFrame,
    specs: DataFrame,
    sector_gate: bool,
) -> DataFrame:
    spark = facts.sparkSession
    cands = candidates_df(spark)
    cand_specs = specs.join(cands, "metric")  # tiny × tiny
    comp = companies.select("cik", "sector", "fye")
    j = (
        facts.join(F.broadcast(cand_specs), "qname")
        .join(F.broadcast(comp), "cik")
    )
    if sector_gate:
        j = j.where(
            F.col("industry_only").isNull()
            | F.array_contains(F.col("industry_only"), F.col("sector"))
        )
    return j.withColumn("end_d", parse_date_col(F.col("end"))).where(
        F.col("end_d").isNotNull() & F.col("val").isNotNull()
    )


def _passes_and_smart_score(df: DataFrame) -> DataFrame:
    fp_ok = F.upper(F.coalesce(F.col("fp"), F.lit(""))).isin("FY", "CY", "FYR")
    pass_rank = (
        F.when(F.col("period_type") == "instant", F.lit(1))
        .when(fp_ok, F.lit(1))
        .when(F.col("qtrs") == 4, F.lit(2))
        .otherwise(F.lit(3))
    )
    # smart_pick score: -distance + 5 if the record's own fp is FY-like
    # (select_xbrl_tags.py:1517)
    smart = -F.col("dist") + F.when(fp_ok, F.lit(5)).otherwise(F.lit(0))
    typ = F.when(F.col("period_type") == "instant", F.lit("instant")).otherwise(
        F.when(F.col("pass_rank") == 1, "annual")
        .when(F.col("pass_rank") == 2, "ytd-q4")
        .otherwise("lenient")
    )
    out = df.withColumn("fp_ok", fp_ok).withColumn("pass_rank", pass_rank)
    out = out.withColumn("smart_score", smart).withColumn("typ", typ)
    # ytd-q4 selections report fp="FY" downstream (select_xbrl_tags.py:1838)
    out = out.withColumn(
        "fp_eff", F.when(F.col("typ") == "ytd-q4", F.lit("FY")).otherwise(F.col("fp"))
    )
    return out


def _candidate_score(widen_penalty_expr, relaxed_penalty: float = 0.0):
    base = (
        F.col("base_score")
        + F.when(F.col("period_type") == "instant", F.lit(0.0)).otherwise(
            typ_bonus_col(F.col("typ"))
        )
        + score_adj_col(
            F.col("form"), F.col("unit"), F.col("fp_eff"), F.col("has_segment")
        )
        - widen_penalty_expr
        - F.lit(relaxed_penalty)
    )
    return base


def select_standard(
    facts: DataFrame,
    companies: DataFrame,
    specs: DataFrame,
    prefer_unit: str = "USD",
    tol_ladder_steps: tuple[int, ...] = (0,),
) -> DataFrame:
    """select_base_duration / select_base_instant for every (company,
    spec) pair at once. `tol_ladder_steps` generalizes the prior-year
    fallback's escalating base tolerances
    (select_xbrl_tags.py:2190-2195): the first step admitting any
    record is used, then the widen ladder runs inside it.
    """
    j = _join_candidates(facts, companies, specs, sector_gate=True)

    a1, a2 = fiscal_anchor_cols(F.col("fy"), F.col("fye"))
    j = j.withColumn(
        "dist",
        F.least(F.abs(F.datediff("end_d", a1)), F.abs(F.datediff("end_d", a2))),
    )

    # Admission: dist <= max_step + tol + 180; d_min drives (step*, w*).
    max_step = max(tol_ladder_steps)
    j = j.where(F.col("dist") <= F.col("tol_days") + max_step + 180)

    w_spec = Window.partitionBy("cik", "spec_id")
    j = j.withColumn("d_min", F.min("dist").over(w_spec))

    # step* = first ladder step whose widest rung admits d_min
    step_expr = None
    for s in tol_ladder_steps:
        cond = F.col("d_min") <= F.col("tol_days") + F.lit(s) + 180
        step_expr = (
            F.when(cond, F.lit(s)) if step_expr is None else step_expr.when(cond, F.lit(s))
        )
    j = j.withColumn("step_star", step_expr)

    # w* = first widen rung admitting d_min within step*
    w_expr = None
    for w in WIDEN_RUNGS:
        cond = F.col("d_min") <= F.col("tol_days") + F.col("step_star") + F.lit(w)
        w_expr = F.when(cond, F.lit(w)) if w_expr is None else w_expr.when(cond, F.lit(w))
    j = j.withColumn("w_star", w_expr)

    j = j.where(
        F.col("dist") <= F.col("tol_days") + F.col("step_star") + F.col("w_star")
    )

    j = _passes_and_smart_score(j)

    # per-qname: keep only the best pass present, then smart_pick argmax
    w_qname = Window.partitionBy("cik", "spec_id", "qname")
    j = j.withColumn("min_pass", F.min("pass_rank").over(w_qname)).where(
        F.col("pass_rank") == F.col("min_pass")
    )
    rec_rank = F.row_number().over(
        w_qname.orderBy(
            F.col("smart_score").desc(), F.col("end_d").desc(),
            *_pool_order_cols(prefer_unit),
        )
    )
    j = j.withColumn("rec_rank", rec_rank).where(F.col("rec_rank") == 1)

    # candidate score + per-spec argmax (round to absorb float-order
    # noise; the reference compares with math.isclose,
    # select_xbrl_tags.py:1890)
    widen_pen = F.when(F.col("w_star") > 0, F.lit(0.02)).otherwise(F.lit(0.0))
    j = j.withColumn("score", _candidate_score(widen_pen))
    cand_rank = F.row_number().over(
        w_spec.orderBy(
            F.round(F.col("score"), 9).desc(),
            F.col("end_d").desc(),
            F.col("cand_ord").asc(),
        )
    )
    j = j.withColumn("cand_rank", cand_rank).where(F.col("cand_rank") == 1)

    return j.select(
        "cik", "spec_id", "metric",
        F.col("typ").alias("source_type"),
        "qname",
        F.col("val").alias("value"),
        "unit", "end", "form", "accn",
        clamp01(F.col("score")).alias("confidence"),
    )


def select_prior_relaxed(
    facts: DataFrame,
    companies: DataFrame,
    specs: DataFrame,
    prefer_unit: str = "USD",
) -> DataFrame:
    """_pick_prior_year_relaxed + _select_prior_year_with_fallback
    (select_xbrl_tags.py:2030-2195) set-oriented.

    Relaxed phase: NO sector gate, candidates tried in list order and
    the FIRST candidate with any record in the ±180d prior-year window
    wins (not best-score); within it, pass1/2/3 then min distance to
    the prior fiscal anchor (ties keep pool order). Fallback phase:
    standard selection at fy-1 over the escalating tolerance ladder.
    """
    # ---- relaxed phase ----
    j = _join_candidates(facts, companies, specs, sector_gate=False)
    mm, dd = fye_month_day(F.col("fye"))
    prior_fye = F.coalesce(
        F.make_date(F.col("fy") - 1, mm, dd),
        F.make_date(F.col("fy") - 1, F.lit(12), F.lit(31)),
    )
    win_start = F.date_add(
        F.coalesce(
            F.make_date(F.col("fy") - 2, mm, dd),
            F.make_date(F.col("fy") - 2, F.lit(12), F.lit(31)),
        ),
        1 - 180,
    )
    win_end = F.date_add(
        F.coalesce(
            F.make_date(F.col("fy"), mm, dd),
            F.make_date(F.col("fy"), F.lit(12), F.lit(31)),
        ),
        180,
    )
    j = j.where(F.col("end_d").between(win_start, win_end))
    j = j.withColumn("dist", F.abs(F.datediff("end_d", prior_fye)))

    w_spec = Window.partitionBy("cik", "spec_id")
    j = j.withColumn("cand_win", F.min("cand_ord").over(w_spec)).where(
        F.col("cand_ord") == F.col("cand_win")
    )
    j = _passes_and_smart_score(j)
    w_qname = Window.partitionBy("cik", "spec_id", "qname")
    j = j.withColumn("min_pass", F.min("pass_rank").over(w_qname)).where(
        F.col("pass_rank") == F.col("min_pass")
    )
    # strict min-dist pick; ties keep the earliest pool record
    rec_rank = F.row_number().over(
        w_qname.orderBy(F.col("dist").asc(), *_pool_order_cols(prefer_unit))
    )
    j = j.withColumn("rec_rank", rec_rank).where(F.col("rec_rank") == 1)
    j = j.withColumn("score", _candidate_score(F.lit(0.0), relaxed_penalty=0.05))

    relaxed = j.select(
        "cik", "spec_id", "metric",
        F.col("typ").alias("source_type"),
        "qname",
        F.col("val").alias("value"),
        "unit", "end", "form", "accn",
        clamp01(F.col("score")).alias("confidence"),
    )

    # ---- fallback phase: standard at fy-1, tol ladder +180..+540 ----
    specs_prev = specs.withColumn("fy", F.col("fy") - 1)
    fallback = select_standard(
        facts, companies, specs_prev, prefer_unit,
        tol_ladder_steps=(180, 240, 300, 360, 420, 540),
    )
    fallback = fallback.join(
        relaxed.select("cik", "spec_id"), ["cik", "spec_id"], "left_anti"
    )
    return relaxed.unionByName(fallback)


def select_direct_growth(
    facts: DataFrame,
    companies: DataFrame,
    fy: int,
    fy_tol_days: int = 90,
    prefer_unit: str = "USD",
) -> DataFrame:
    """Direct-growth QName mining + best-record pick
    (_mine_direct_growth_candidates / _direct_growth_pick,
    select_xbrl_tags.py:1757-1766, 2197-2213).

    Output: one row per (cik, growth_metric) with the best direct tag:
    (cik, gmetric, qname, value, unit, end, form, accn, score).
    """
    from ..vocab.growth_patterns import (
        DIRECT_GROWTH_BLACKLIST, DIRECT_GROWTH_PATTERNS,
    )

    spark = facts.sparkSession
    pat_rows = [
        (gm, "(?i)" + "|".join(f"(?:{p})" for p in pats),
         fy_tol_days + 30 if gm != "AssetGrowthRate" else 120)
        for gm, pats in DIRECT_GROWTH_PATTERNS.items()
    ]
    pats = spark.createDataFrame(pat_rows, "gmetric string, pattern string, tol int")

    qnames = facts.select("cik", "qname").distinct()
    mined = (
        qnames.crossJoin(F.broadcast(pats))
        .where(F.expr("qname rlike pattern"))
    )
    bl = F.upper(F.col("qname"))
    for kw in DIRECT_GROWTH_BLACKLIST:
        mined = mined.where(~bl.contains(kw.upper()))

    comp = companies.select("cik", "fye")
    j = (
        facts.join(mined.select("cik", "qname", "gmetric", "tol"), ["cik", "qname"])
        .join(F.broadcast(comp), "cik")
        .withColumn("end_d", parse_date_col(F.col("end")))
        .where(F.col("end_d").isNotNull() & F.col("val").isNotNull())
        .withColumn("period_type", F.lit("duration"))
    )
    a1, a2 = fiscal_anchor_cols(F.lit(fy), F.col("fye"))
    j = j.withColumn(
        "dist",
        F.least(F.abs(F.datediff("end_d", a1)), F.abs(F.datediff("end_d", a2))),
    ).where(F.col("dist") <= F.col("tol"))

    j = _passes_and_smart_score(j)
    w_qname = Window.partitionBy("cik", "gmetric", "qname")
    j = j.withColumn("min_pass", F.min("pass_rank").over(w_qname)).where(
        F.col("pass_rank") == F.col("min_pass")
    )
    rec_rank = F.row_number().over(
        w_qname.orderBy(
            F.col("smart_score").desc(), F.col("end_d").desc(),
            *_pool_order_cols(prefer_unit),
        )
    )
    j = j.withColumn("rec_rank", rec_rank).where(F.col("rec_rank") == 1)

    # score 0.90 + typ bonus + score_adj (select_xbrl_tags.py:2208-2209)
    score = (
        F.lit(0.90)
        + typ_bonus_col(F.col("typ"))
        + score_adj_col(F.col("form"), F.col("unit"), F.col("fp_eff"),
                        F.col("has_segment"))
    )
    j = j.withColumn("score", score)
    # strict > argmax over mined qnames; mined order == facts-dict order
    # == sorted qname in our fixtures -> qname asc tie-break
    w_g = Window.partitionBy("cik", "gmetric")
    g_rank = F.row_number().over(
        w_g.orderBy(F.round(F.col("score"), 9).desc(), F.col("qname").asc())
    )
    j = j.withColumn("g_rank", g_rank).where(F.col("g_rank") == 1)

    return j.select(
        "cik", "gmetric", "qname",
        F.col("val").alias("value"),
        "unit", "end", "form", "accn", "score",
    )

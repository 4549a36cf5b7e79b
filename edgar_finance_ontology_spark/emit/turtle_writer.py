"""Distributed Turtle writer — the scale path of emit/turtle.py.

The observation family is the only block family proportional to data
volume, so it renders per-partition (mapInPandas over the canonically
range-partitioned observations) into ordered part files; the bounded
families (header, companies, entity dims, benchmarks, rankings) render
once on the driver. Concatenating header + entity part + observation
parts + tail part in order reproduces turtle_text() byte-for-byte.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .turtle import observation_block


def observation_lines_df(obs_csv_frame: DataFrame, seen_entities: dict,
                         order_cols=("cik", "metric")) -> DataFrame:
    """(sort_key..., block text) per observation, rendered in executors.

    `seen_entities` must already contain the company-emission state
    (sector/industry maps) — observation rendering only APPENDS to the
    unit/currency/concept sets, which are re-derived deterministically
    downstream, so executors render with throwaway local state.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            local_seen = {
                "units": set(), "currencies": set(), "concepts": {},
                "sectors": set(), "industries": set(), "industry_sector": {},
            }
            texts = []
            for rec in pdf.to_dict("records"):
                texts.append("\n".join(observation_block(rec, local_seen)))
            out = pdf[[*order_cols]].copy()
            out["block"] = texts
            yield out

    fields = ", ".join(f"{c} string" for c in order_cols)
    return obs_csv_frame.mapInPandas(run, f"{fields}, block string")


def write_turtle_parts(
    out_dir: str,
    obs_csv_frame: DataFrame,
    order_cols=("cik", "metric"),
) -> str:
    """Observation blocks as ordered text part-files (the 10^12-scale
    sink: one .txt per partition, range-partitioned by the canonical
    order, concatenable)."""
    lines = observation_lines_df(obs_csv_frame, {}, order_cols)
    (
        lines.select("block")
        .write.mode("overwrite")
        .text(out_dir)
    )
    return out_dir

"""Minimizer sketch binning: inverted index + per-record minimizer sets.

The engine form of the reference's m2s/s2m drivers
(misc/src/minimisers.rs:11-85 bin_sequences, :87-160 seq_to_min):
exploded minimizer runs -> groupBy(minimiser) with salted collect for
bucket skew (low-complexity minimizers collect huge posting lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minimizers import exploded_minimisers
from .skew import salted_collect_list


def minimiser_index(
    df: DataFrame,
    text_col: str = "text",
    w: int = 0,
    m: int = 10,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    salted: bool = True,
    n_salts: int = 16,
) -> DataFrame:
    """Inverted index: minimiser -> list of (keys..., win_start, win_end).

    J3/A7 of the survey: groupBy(minimiser).agg(collect_list(struct)),
    with two-phase salted collection because minimizer frequency is
    Zipf-skewed at corpus scale.
    """
    runs = exploded_minimisers(df, text_col=text_col, w=w, m=m, keys=keys)
    entry = F.struct(*keys, "win_start", "win_end").alias("posting")
    posted = runs.select("mmer", entry)
    if salted:
        return salted_collect_list(posted, keys=["mmer"], col="posting", n_salts=n_salts)
    return posted.groupBy("mmer").agg(F.collect_list("posting").alias("postings"))


def record_minimisers(
    df: DataFrame,
    text_col: str = "text",
    w: int = 31,
    m: int = 7,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """s2m surface: one row per record WITH AT LEAST ONE minimizer run,
    carrying its ordered runs. Records whose text is shorter than ``m``
    (or NULL) produce no runs and therefore no row — the same records
    the reference's seq_to_min writer skips and the q28 oracle omits;
    left-join against the source table if empty records must survive
    (code-review r5 aligned this contract note with the behavior)."""
    runs = exploded_minimisers(df, text_col=text_col, w=w, m=m, keys=keys)
    return (
        runs.groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("win_start", "win_end", "mmer"))
            ).alias("runs")
        )
    )

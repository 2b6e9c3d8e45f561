"""Inactivity-gap sessionization + lag/lead turn features.

All built-in window expressions (JVM-side). The cumulative-flag-sum
pattern mirrors the reference's ambiguous-char run splitting (F1,
kmer/src/kmer.rs:96-99): a gap event resets the "run" exactly like an
OOV character resets a k-mer run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import epoch_ms


def _conv_window():
    # asc_nulls_last on ts: Spark's default is NULLS FIRST while the
    # DuckDB oracle's identical ORDER BY defaults to NULLS LAST — NULL
    # ts rows would shift session_seq/lag for every later turn on the
    # Spark side only (code-review r4; no NULL ts exists in the driver
    # derivation, so gate hashes are unchanged)
    return Window.partitionBy("conv_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("turn_idx")
    )


def sessionize(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign per-conversation session sequence numbers (0-based).

    A new session starts when the inter-turn gap strictly exceeds
    ``gap_seconds``. Gap math uses integer epoch-millis (exact,
    engine-portable). Adds ``session_seq`` (int) and ``session_id``
    (conv_id '#' session_seq).
    """
    w = _conv_window()
    gap_ms = int(gap_seconds * 1000)
    prev_ms = F.lag(epoch_ms(ts_col)).over(w)
    is_new = (
        F.when(prev_ms.isNull(), F.lit(0))
        .when(epoch_ms(ts_col) - prev_ms > gap_ms, F.lit(1))
        .otherwise(F.lit(0))
    )
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # F.concat, not concat_ws: the oracle's `conv_id || '#' || seq`
    # NULL-propagates, while concat_ws SKIPS a NULL conv_id and would
    # emit '0','1',... as session ids on the Spark side only
    # (code-review r5 — cross-engine divergence on NULL-key corpora)
    return df.withColumn(out_col, seq.cast("int")).withColumn(
        "session_id",
        F.concat(F.col("conv_id"), F.lit("#"), F.col(out_col).cast("string")),
    )


def lag_lead_features(
    df: DataFrame,
    cols: dict[str, int] | None = None,
) -> DataFrame:
    """Standard lag/lead turn features, ordered by (ts, turn_idx)
    within each conversation — event-time order, the same ordering the
    q04 oracle uses (NOT raw turn_idx order: a turn stamped out of
    order follows its timestamp; code-review r5 fixed the docstring,
    the behavior was always event-time).

    ``cols`` maps output names to offsets, e.g. {"prev_len": -1,
    "next_len": 1} over length(text). Also adds prev_role and
    gap_ms (millis since previous turn).
    """
    w = _conv_window()
    out = df
    ln = F.length(F.col("text"))
    for name, off in (cols or {"prev_len": -1, "next_len": 1}).items():
        expr = F.lag(ln, -off) if off < 0 else F.lead(ln, off)
        out = out.withColumn(name, expr.over(w))
    out = out.withColumn("prev_role", F.lag("role").over(w))
    out = out.withColumn(
        "gap_ms", (epoch_ms("ts") - F.lag(epoch_ms("ts")).over(w))
    )
    return out

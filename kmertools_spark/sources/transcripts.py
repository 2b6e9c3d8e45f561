"""Transcript input sources.

Two ways to obtain the engine's authoritative input table
(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp):

1. ``TRANSCRIPTS_SQL`` — a *dialect-shared* derivation from the driver's
   deterministic `events` parquet table. The exact same SQL runs in
   Spark SQL and DuckDB, so the correctness harness compares the two
   engines over byte-identical inputs (the per-turn text-equality
   invariant is itself one of the checked queries).

2. ``synth_transcripts`` — a seeded standalone generator (numpy ->
   Arrow -> Spark) for benches and property tests, with explicit skew
   knobs (one conversation N x the median turns) and OOV/case/empty
   text fixtures per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BASE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Character quantization map for deriving ACGT-rich text from event
# fields. 36 source chars -> 36 target chars; unmapped chars (':', '"',
# '{', '}', ' ', lowercase) pass through and act as OOV run splitters.
_TR_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_TR_TO = "ACGTUacgtNACGTacgtACGNAcGtACGTACGTGC"  # V->N: OOV mid-text fixture

# Shared Spark-SQL / DuckDB derivation of the transcripts table from
# `events`. Deterministic: row_number ordered by (ts, event_id) with
# unique event_id tiebreak. Includes empty texts, shorter-than-k texts,
# mixed case, U chars, and OOV mid-text (FIXTURES.md §1 requirements).
# NULLS LAST is explicit (valid in both dialects): Spark's ASC default
# is NULLS FIRST while DuckDB's is NULLS LAST, so a NULL events.ts —
# permitted by the schema — would renumber every turn differently on
# the two engines without it (code-review r5; the same divergence
# sessionize patched for its own window in r4).
TRANSCRIPTS_SQL = f"""
SELECT
  'conv_' || CAST(user_id AS STRING) AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id) - 1
       AS INT) AS turn_idx,
  CASE MOD(event_id, 4) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  CASE
    WHEN MOD(event_id, 97) = 0 THEN ''
    WHEN MOD(event_id, 97) = 1 THEN 'AC'
    WHEN MOD(event_id, 11) = 3 THEN translate(
      CAST(event_id * 1009 AS STRING) || CAST(event_id * 31 AS STRING)
        || CAST(1000 + MOD(event_id, 8999) AS STRING),
      '{_TR_FROM}', '{_TR_TO}')
    ELSE translate(
      repeat(
        upper(event_type) || ':' || CAST(event_id AS STRING)
          || CAST(MOD(event_id * 7919, 1000003) AS STRING)
          || substr(props, 1, 9),
        CAST(2 + MOD(event_id, 4) AS INT)
      ) || CAST(1000 + MOD(event_id * 31, 8999) AS STRING),
      '{_TR_FROM}', '{_TR_TO}')
  END AS text,
  CASE WHEN MOD(event_id, 5) = 2 THEN event_type ELSE NULL END AS tool,
  ts
FROM events
"""

# As-of probe set derived from the same events: a mix of exact-tie
# timestamps (strict-< leakage fixture), shifted timestamps, and
# never-seen conv_ids (FIXTURES.md §2).
PROBES_SQL = """
SELECT
  CASE WHEN MOD(event_id, 3) = 0 THEN 'conv_' || CAST(user_id AS STRING)
       WHEN MOD(event_id, 3) = 1 THEN 'conv_' || CAST(user_id + 1 AS STRING)
       ELSE 'conv_unknown_' || CAST(event_id AS STRING) END AS conv_id,
  ts AS probe_ts
FROM events
WHERE MOD(event_id, 37) = 0
"""


def register_base_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views (idempotent
    per (session, sf_dir)) and pin the session timezone to UTC.

    The UTC pin makes TIMESTAMP_NTZ -> TIMESTAMP casts a pure
    reinterpretation (operators/timeutil.py), so epoch-millis math
    matches DuckDB regardless of the host timezone of the session the
    driver hands us.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ONE fixed key holding the last-registered dir: a per-dir tag let
    # A -> B -> A return early on A's stale tag while the shared temp
    # views still pointed at B's files (code-review r4)
    key = "spark.__kt_registered_sf_dir"
    if spark.conf.get(key, None) == sf_dir:
        return
    for t in BASE_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    spark.conf.set(key, sf_dir)


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transcripts table for a scale-factor dir (shared derivation)."""
    register_base_tables(spark, sf_dir)
    return spark.sql(TRANSCRIPTS_SQL)


def probes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_tables(spark, sf_dir)
    return spark.sql(PROBES_SQL)


_ROLES = np.array(["user", "assistant", "tool", "system"])
_WORDS = np.array(
    [
        "ACGTACGT",
        "acgtacgt",
        "GATTACA",
        "TTTTAAAA",
        "CCGGCCGG",
        "run tool",
        "N",
        "AC GT",
        "uuuu",
        "AAAACCCCGGGGTTTT",
    ]
)


def synth_transcripts_pdf(
    n_convs: int = 100,
    mean_turns: int = 20,
    skew_factor: int = 0,
    seed: int = 42,
    gap_seconds: float = 1800.0,
) -> pd.DataFrame:
    """Deterministic synthetic transcripts as a pandas frame.

    ``skew_factor`` > 0 gives conversation 0 ``skew_factor * mean_turns``
    turns (the heavy-tail fixture). Timestamps are monotone per conv
    with gaps drawn to straddle ``gap_seconds`` so sessionization splits
    deterministically; ~5% of turns repeat the PREVIOUS turn's timestamp
    WITHIN a conversation (the leakage tie-break fixture). Equal
    timestamps across different conversations are possible but only
    coincidental — tests needing a cross-conversation tie must build it
    explicitly (code-review r5 corrected the overstated claim).
    """
    rng = np.random.RandomState(seed)
    turns = rng.poisson(mean_turns, size=n_convs).clip(min=1)
    if skew_factor > 0:
        turns[0] = mean_turns * skew_factor
    conv = np.repeat(np.arange(n_convs), turns)
    n = conv.size
    tidx = np.concatenate([np.arange(t) for t in turns])
    # inter-turn gaps: mostly short, ~20% beyond the session threshold
    gaps = np.where(
        rng.random(n) < 0.2,
        rng.randint(int(gap_seconds) + 1, int(gap_seconds * 4), size=n),
        rng.randint(1, max(2, int(gap_seconds // 4)), size=n),
    ).astype("int64")
    gaps[tidx == 0] = 0
    # duplicate-ts fixture: ~5% of turns repeat the previous timestamp
    dup = (rng.random(n) < 0.05) & (tidx > 0)
    gaps[dup] = 0
    base = rng.randint(0, 10_000, size=n_convs)[conv] * 1000
    # grouped cumsum in O(n): the old per-conversation mask loop was
    # O(n_convs * n) — minutes of single-threaded generation at
    # scaling-bench shapes (code-review r5); integer math, so this is
    # bit-identical to np.cumsum(gaps[conv == c]) per conversation
    cs = np.cumsum(gaps)
    first = np.concatenate([[0], np.cumsum(turns)])[:-1]
    ts_s = base + (cs - (cs - gaps)[first][conv])
    nwords = rng.randint(0, 6, size=n)
    widx = rng.randint(0, len(_WORDS), size=(n, 5))
    texts = [
        " ".join(_WORDS[widx[i, : nwords[i]]]) if nwords[i] else ""
        for i in range(n)
    ]
    roles = _ROLES[tidx % 4]
    tools = np.where(rng.random(n) < 0.15, "search", None)
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv_", conv.astype(str)),
            "turn_idx": tidx.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts_s, unit="s", utc=True).tz_localize(None),
        }
    )


def synth_transcripts(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(synth_transcripts_pdf(**kw))

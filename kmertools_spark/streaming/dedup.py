"""Streaming MinHash -> LSH candidate generation.

The incremental twin of operators.dedup (minhash_signatures +
lsh_candidate_pairs): documents arrive as a stream, signatures are
computed per micro-batch with the same shared-constant MinHash kernel,
and a stateful per-(band, bucket) operator emits each candidate pair
exactly once per band as soon as its second member arrives — this is
how a 100 TB corpus that arrives incrementally gets deduplicated
without re-banding the history every day.

State-schema versioning: _BUCKET_STATE is part of the checkpoint
contract — changing it (as the r3 max_bucket hardening did: 2 -> 3
fields) makes existing checkpoints unrestorable; ship such changes with
a fresh checkpoint location and a backfill of the batch operator over
the history boundary.

State per (band, bucket) is the bucket's member ids — HARD-bounded at
``max_bucket`` ids plus the star hub (post-cap arrivals are not
retained: their replay dedup degrades to at-least-once, but the emitted
pair SET is unchanged), evicted by event-time timeout once the bucket
has been idle past ``state_horizon``. Never the documents or
signatures.

Semantics vs batch lsh_candidate_pairs (equality-tested):

* pairs are exactly-once within a band; a pair whose docs collide in
  several bands is emitted once per colliding band (cross-band DISTINCT
  would need a second stateful shuffle, which Spark does not allow
  after applyInPandasWithState — consumers either dropDuplicates in the
  sink or rely on the downstream Jaccard verify being idempotent). The
  distinct pair SET equals the batch output for data within the
  horizon.
* ``max_bucket``: once a bucket reaches the cap, later members emit a
  single star edge to the bucket minimum instead of all pairs — the
  streaming form cannot retract the pre-cap pairs the batch cap would
  have suppressed, so the capped edge set is a superset of the batch
  star edges and a subset of the uncapped pairs: connectivity-exact
  either way (same guarantee docs/SCALE.md documents for the batch
  cap).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..functions.hashing import minhash_sig
from ..oracle.hashing import N_PERMS

_PAIRS = StructType(
    [StructField("id_a", LongType()), StructField("id_b", LongType())]
)
_BUCKET_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),  # <= max_bucket members
        StructField("min_id", LongType()),  # star hub once capped
        StructField("last_ts", LongType()),
    ]
)


def streaming_lsh_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    bands: int = 4,
    rows_per_band: int | None = None,
    width: int = 8,
    watermark: str = "1 hour",
    state_horizon_ms: int = 3_600_000,
    max_bucket: int | None = 256,
) -> DataFrame:
    """stream(doc_id, text, ts) -> append stream of (id_a, id_b) pairs.

    Same banding as the batch operator: signature split into ``bands``
    bands of ``rows_per_band`` values; the band key is the identical
    string fold, so a batch replay over the same rows produces the same
    buckets bit-for-bit.

    ``max_bucket`` defaults to a FINITE cap (256, matching the batch
    job) because this is the unattended path: with no cap, one flooded
    boilerplate bucket grows state and pair emission O(n^2) until the
    state store OOMs (driver ADVICE r3). Passing ``None`` explicitly
    opts into exact all-pairs semantics for bounded corpora.
    """
    r = rows_per_band or N_PERMS // bands

    sigs = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(ts_col).alias("ts"),
            minhash_sig(width)(F.col(text_col)).alias("sig"),
        )
        # NULL (or non-castable) ids must not reach the stateful stage:
        # pandas' astype('int64') on the resulting NaN raises
        # IntCastingNaNError inside fn and one bad document would kill
        # the whole unattended query (code-review r5)
        .where(F.col("sig").isNotNull() & F.col("doc_id").isNotNull())
    )
    from ..functions.hashing import band_key_struct

    banded = sigs.select(
        "doc_id", "ts", band_key_struct(bands, r).alias("bk")
    ).select("doc_id", "ts", "bk.band", "bk.key")

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=["id_a", "id_b"])
            return
        ids, min_id, last_ts = (state.get if state.exists else ([], None, 0))
        members = list(ids or [])
        seen = set(members)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            yield pd.DataFrame(columns=["id_a", "id_b"])
            return
        pdf = pd.concat(frames).sort_values("doc_id")
        out_a, out_b = [], []
        for doc, ts in zip(
            pdf["doc_id"].astype("int64"),
            pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64"),
        ):
            doc = int(doc)
            last_ts = max(int(last_ts), int(ts))
            if doc in seen:
                continue  # replay of a retained doc: exactly-once
            if max_bucket is not None and len(members) >= max_bucket:
                # capped bucket: state stays at max_bucket ids + the hub.
                # Post-cap docs are NOT retained, so their replay dedup
                # degrades to at-least-once — the emitted star edge is
                # identical either way (pair SET unchanged).
                mn = min_id if min_id is not None else min(members)
                if doc != mn:
                    out_a.append(min(mn, doc))
                    out_b.append(max(mn, doc))
                min_id = min(mn, doc)
            else:
                for m in members:
                    out_a.append(min(m, doc))
                    out_b.append(max(m, doc))
                members.append(doc)
                seen.add(doc)
                min_id = doc if min_id is None else min(min_id, doc)
        state.update((members, min_id, int(last_ts)))
        # clamp above the current watermark: a bucket whose horizon
        # already passed (idle bucket receiving a late straggler while
        # OTHER buckets advanced the watermark) would otherwise set an
        # illegal timeout and kill the query (same hazard fixed in
        # streaming_asof, code-review r4)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(last_ts) + state_horizon_ms, wm + 1))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return banded.groupBy("band", "key").applyInPandasWithState(
        fn,
        outputStructType=_PAIRS,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

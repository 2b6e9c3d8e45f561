"""Streaming point-in-time (as-of) join — the incremental twin of
operators/asof.asof_join, for online feature serving: probes arriving
on a stream pick up the latest strictly-earlier feature row per entity
without re-scanning history.

Shape: features and probes are unioned into one marked stream (the
same union-marker idea as the batch plan), grouped by entity, and an
applyInPandasWithState operator keeps ONE feature row per live entity
as state — the latest seen. Each micro-batch is sorted by (event time,
probe-before-event, ord) at FULL timestamp precision, so the batch tie
rules hold exactly: a probe at ts sees only features strictly earlier
(same-instant features sort after it), and equal-ts features resolve
to the largest ord. The staleness check truncates to milliseconds on
both sides, matching the batch plan's epoch_ms comparison bit-for-bit.

Arrival contract (same as rolling_vectors_stream): rows must arrive in
event-time order ACROSS micro-batches (within a batch they are
sorted). A feature arriving in a later batch than a probe it should
have served cannot retract that probe's emitted row — append-mode
streaming cannot un-emit. The watermark bounds how stale such a
violation can be; the batch asof_join is the recovery/backfill tool.

State per entity: one (event µs, ord, payload) tuple — O(1) regardless
of history length, evicted by event-time timeout after
``state_horizon_ms`` idle. An entity whose state was evicted serves
NULLs until its next feature row (exactly what a feature store serves
after a retention window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.asof import _union_marker


def streaming_asof(
    features: DataFrame,
    probes: DataFrame,
    on: str = "conv_id",
    ts_col: str = "ts",
    probe_ts_col: str = "probe_ts",
    value_cols: tuple[str, ...] = ("turn_idx",),
    tolerance_ms: int | None = None,
    watermark: str = "1 hour",
    state_horizon_ms: int = 86_400_000,
) -> DataFrame:
    """(features stream, probes stream) -> append stream of probe rows
    (on, probe_ts, asof_<c>...), null-valued when nothing strictly
    earlier (or fresher than ``tolerance_ms``) has been seen.

    Both inputs must be streaming DataFrames with event-time columns;
    NULL-key or NULL-ts probes emit null-valued rows (the batch
    contract), and NULL-key/NULL-ts features are dropped (they are
    unmatchable in every plan and the SQL oracle).
    """
    u = _union_marker(features, probes, on, ts_col, probe_ts_col, value_cols)
    u = u.withColumn("__t", F.col("__t").cast("timestamp")).withWatermark(
        "__t", watermark
    )

    payload_t = u.schema["__payload"].dataType
    pfields = [f.name for f in payload_t.fields]
    out_cols = [on, probe_ts_col, *pfields]
    out_schema = StructType(
        [
            StructField(on, u.schema[on].dataType),
            StructField(probe_ts_col, TimestampType()),
            *[StructField(f.name, f.dataType) for f in payload_t.fields],
        ]
    )
    state_schema = StructType(
        [
            StructField("us", LongType()),
            StructField("ord", LongType()),
            StructField("payload", payload_t),
        ]
    )

    def _as_tuple(payload):
        if payload is None:
            return None
        if isinstance(payload, tuple):
            return payload
        if isinstance(payload, dict):
            return tuple(payload[n] for n in pfields)
        return tuple(payload[n] for n in pfields)  # Row supports [name]

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=out_cols)
            return
        last = tuple(state.get) if state.exists else None  # (us, ord, payload)
        if last is not None:
            last = (last[0], last[1], _as_tuple(last[2]))
        frames = [p for p in pdfs if len(p)]
        if not frames:
            yield pd.DataFrame(columns=out_cols)
            return
        pdf = pd.concat(frames)
        # full-precision sort: probes (is_event=0) before same-instant
        # events -> strict '<'; NaT (null-ts probes) first, nulled below
        pdf = pdf.sort_values(
            ["__t", "__is_event", "__ord"], na_position="first", kind="mergesort"
        )
        ts_vals = pdf["__t"].to_numpy()  # datetime64[us]
        us_vals = ts_vals.astype("datetime64[us]").astype("float64")  # NaT->nan
        ev_vals = pdf["__is_event"].to_numpy()
        ord_vals = pdf["__ord"].to_numpy()
        pl_vals = pdf["__payload"].tolist()
        out = {c: [] for c in out_cols}
        for t_orig, t_us, is_ev, ordv, pl in zip(
            pdf["__t"], us_vals, ev_vals, ord_vals, pl_vals
        ):
            r_us = None if pd.isna(t_us) else int(t_us)
            if is_ev == 1:
                cand = (r_us, int(ordv), _as_tuple(pl))
                if last is None or (cand[0], cand[1]) >= (last[0], last[1]):
                    last = cand
            else:
                picked = None if r_us is None else last
                if (
                    picked is not None
                    and tolerance_ms is not None
                    # ms truncation on BOTH sides = the batch epoch_ms rule
                    and picked[0] // 1000 < r_us // 1000 - tolerance_ms
                ):
                    picked = None
                out[on].append(key[0])
                out[probe_ts_col].append(None if r_us is None else t_orig)
                for i, name in enumerate(pfields):
                    out[name].append(None if picked is None else picked[2][i])
        if last is not None:
            state.update((int(last[0]), int(last[1]), last[2]))
            state.setTimeoutTimestamp(int(last[0]) // 1000 + state_horizon_ms)
        yield pd.DataFrame(out)

    return u.groupBy(on).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

"""Streaming point-in-time (as-of) join — the incremental twin of
operators/asof.asof_join, for online feature serving: probes arriving
on a stream pick up the latest strictly-earlier feature row per entity
without re-scanning history.

Shape: features and probes are unioned into one marked stream (the
same union-marker idea as the batch plan), grouped by entity, and an
applyInPandasWithState operator keeps TWO feature rows per live entity
as state — the latest, plus the latest at a strictly earlier instant.
The second row exists for the strict-'<' rule across micro-batches: a
probe at exactly the latest feature's timestamp must be served the
previous instant's row (the batch tie rule), which O(1)-latest-only
state would have discarded. Each micro-batch is sorted by (event time,
probe-before-event, ord) at FULL timestamp precision, so the batch tie
rules hold exactly; the staleness check truncates to milliseconds on
both sides, matching the batch plan's epoch_ms comparison bit-for-bit.

Arrival contract (same as rolling_vectors_stream): rows must arrive in
event-time order ACROSS micro-batches (within a batch they are
sorted). A feature arriving in a later batch than a probe it should
have served cannot retract that probe's emitted row — append-mode
streaming cannot un-emit. The watermark bounds how stale such a
violation can be; the batch asof_join is the recovery/backfill tool.

Numeric payload fields are exact end to end: the input boundary rides
a JVM-side to_json twin past pandas' float64 widening, and the OUTPUT
boundary emits int/double fields as strings (full int64 digits;
repr(double) shortest round-trip, 'nan'/'inf' for specials) that are
cast back to their exact types JVM-side — so a genuine NaN double is
served as NaN, not NULL (pandas->Arrow would otherwise use NaN as the
null sentinel).

State is O(1) regardless of history length, evicted by event-time
timeout after ``state_horizon_ms`` idle (the timeout timestamp is
clamped above the current watermark — Spark rejects a timeout below
it, and an entity whose horizon already passed must still serve its
current probes before evicting). An entity whose state was evicted
serves NULLs until its next feature row (exactly what a feature store
serves after a retention window).
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.asof import _union_marker

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


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
    # Arrow->pandas widens a struct's integral children to float64 when
    # the batch mixes events with NULL-payload probe rows — lossy above
    # 2^53 (xxhash64-scale ids) and unable to distinguish a double's
    # genuine NaN from NULL (code-review r4 findings 1/7/8). A JVM-side
    # to_json twin of the payload rides along: integral fields parse
    # back EXACTLY (json carries full int64 digits), double fields keep
    # the null-vs-NaN distinction ("NaN" string vs omitted key); other
    # types (strings, timestamps — json truncates ts to ms) still read
    # from the pandas dict, which is exact for them.
    u = u.withColumn("__pj", F.to_json("__payload"))
    numeric_kind = [
        "int"
        if isinstance(f.dataType, _INT_TYPES)
        else ("float" if isinstance(f.dataType, (DoubleType, FloatType)) else "")
        for f in payload_t.fields
    ]
    out_cols = [on, probe_ts_col, *pfields]
    # the EMITTED schema carries numeric payload fields as strings — the
    # pandas->Arrow boundary would widen int64 and fold NaN into NULL;
    # the final select casts them back to exact types JVM-side
    emit_schema = StructType(
        [
            StructField(on, u.schema[on].dataType),
            StructField(probe_ts_col, TimestampType()),
            *[
                StructField(f.name, StringType() if k else f.dataType)
                for f, k in zip(payload_t.fields, numeric_kind)
            ],
        ]
    )
    state_schema = StructType(
        [
            StructField("us", LongType()),
            StructField("ord", LongType()),
            StructField("payload", payload_t),
            StructField("pus", LongType()),
            StructField("pord", LongType()),
            StructField("ppayload", payload_t),
        ]
    )

    def _clean(v):
        # scalar NULL markers pandas may hand us for non-numeric fields
        if v is None or v is pd.NaT:
            return None
        return v

    def _from_batch(payload, pjson):
        """Exact payload tuple for an event row of a micro-batch."""
        if pjson is None or (isinstance(pjson, float) and math.isnan(pjson)):
            return None
        parsed = json.loads(pjson)
        vals = []
        for name, kind in zip(pfields, numeric_kind):
            if kind == "int":
                vals.append(parsed.get(name))  # exact int64 or None
            elif kind == "float":
                v = parsed.get(name)
                if isinstance(v, str):
                    v = float(v)  # "NaN" / "Infinity" / "-Infinity"
                vals.append(v)
            else:
                vals.append(_clean(payload[name]))
        return tuple(vals)

    def _from_state(payload):
        """State rows round-trip row-wise (no pandas widening): the
        Row's values are already exact — just normalize to a tuple."""
        if payload is None:
            return None
        if isinstance(payload, tuple):
            return payload
        return tuple(payload[n] for n in pfields)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=out_cols)
            return
        last = prev = None  # (us, ord, payload-tuple)
        if state.exists:
            us, ordv, pl, pus, pord, ppl = state.get
            last = (us, ordv, _from_state(pl))
            if pus is not None:
                prev = (pus, pord, _from_state(ppl))
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
        t64 = pdf["__t"].to_numpy().astype("datetime64[us]")
        # NaT must be detected on the datetime64 array: an int64/float64
        # cast turns it into the INT64_MIN sentinel, which pd.isna would
        # never flag (r4 ADVICE — the null-probe path was only working
        # by the sentinel preceding every event)
        nat_mask = np.isnat(t64)
        us_vals = t64.astype("int64")
        out = {c: [] for c in out_cols}
        for t_orig, t_us, is_nat, is_ev, ordv, pl, pj in zip(
            pdf["__t"],
            us_vals,
            nat_mask,
            pdf["__is_event"].to_numpy(),
            pdf["__ord"].to_numpy(),
            pdf["__payload"].tolist(),
            pdf["__pj"].tolist(),
        ):
            r_us = None if is_nat else int(t_us)
            if is_ev == 1:
                cand = (r_us, int(ordv), _from_batch(pl, pj))
                if last is None:
                    last = cand
                elif (cand[0], cand[1]) >= (last[0], last[1]):
                    if cand[0] > last[0]:
                        prev = last  # new instant: old latest backs it
                    last = cand
                elif cand[0] < last[0] and (
                    prev is None or (cand[0], cand[1]) >= (prev[0], prev[1])
                ):
                    prev = cand  # contract violation: best-effort backfill
            else:
                # strict '<' at full us precision, across batches too
                # (code-review r4 finding 4): a probe tied with the
                # retained latest instant falls back to the previous one
                if r_us is None:
                    picked = None
                elif last is not None and last[0] < r_us:
                    picked = last
                elif prev is not None and prev[0] < r_us:
                    picked = prev
                else:
                    picked = None
                if (
                    picked is not None
                    and tolerance_ms is not None
                    # ms truncation on BOTH sides = the batch epoch_ms rule
                    and picked[0] // 1000 < r_us // 1000 - tolerance_ms
                ):
                    picked = None
                out[on].append(key[0])
                out[probe_ts_col].append(None if r_us is None else t_orig)
                for i, (name, kind) in enumerate(zip(pfields, numeric_kind)):
                    v = None if picked is None else picked[2][i]
                    if v is not None and kind == "int":
                        v = str(int(v))  # full int64 digits
                    elif v is not None and kind == "float":
                        v = repr(float(v))  # round-trip; 'nan'/'inf' OK
                    out[name].append(v)
        if last is not None:
            state.update(
                (
                    int(last[0]),
                    int(last[1]),
                    last[2],
                    None if prev is None else int(prev[0]),
                    None if prev is None else int(prev[1]),
                    None if prev is None else prev[2],
                )
            )
            # the timeout may not sit below the current watermark
            # (code-review r4 finding 2): an entity idle past its
            # horizon still serves this batch, then evicts at wm+1
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(int(last[0]) // 1000 + state_horizon_ms, wm + 1)
            )
        yield pd.DataFrame(out)

    res = u.groupBy(on).applyInPandasWithState(
        fn,
        outputStructType=emit_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # cast the stringified numeric fields back to their exact types
    # (Spark's string->double cast parses 'nan'/'inf'/'-inf' specials)
    return res.select(
        on,
        probe_ts_col,
        *[
            (F.col(f.name).cast(f.dataType) if k else F.col(f.name)).alias(f.name)
            for f, k in zip(payload_t.fields, numeric_kind)
        ],
    )

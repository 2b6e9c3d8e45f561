"""Point-in-time (as-of) join with strict zero-leakage semantics.

Not present in the reference (SURVEY §2.4) — required by the engine's
north rule. Implemented with the union-marker pattern: probes and
feature rows are unioned, sorted (ts, is_event) within each entity, and
each probe picks up the last non-null feature strictly before it.

Leakage guarantee (structural): a probe at ``probe_ts`` sees only rows
with ``ts < probe_ts`` — at equal timestamps the probe sorts BEFORE the
feature row, so same-instant features are excluded (strict <).

Scale notes: a single shuffle on the entity key co-partitions probes
and features; AQE handles mild skew. For tiny probe sets prefer
``asof_join_broadcast`` (range join against broadcast probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EV = "__is_event"


def asof_join(
    features: DataFrame,
    probes: DataFrame,
    on: str = "conv_id",
    ts_col: str = "ts",
    probe_ts_col: str = "probe_ts",
    value_cols: tuple[str, ...] = ("turn_idx",),
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Attach the latest strictly-earlier feature row to each probe.

    Returns one row per probe: (on, probe_ts, asof_<value_col>...),
    null-valued when no feature row precedes the probe.

    ``tolerance_ms`` bounds staleness (pandas merge_asof semantics): a
    probe whose latest preceding feature is older than the tolerance
    gets nulls instead — the guard real feature stores need so a
    decommissioned entity's years-old row is not served as "current".
    Because tolerance is a lower bound on ts, nulling the picked row is
    equivalent to filtering candidates before the pick.
    """
    # the whole candidate row travels as ONE struct so the probe picks a
    # consistent latest row (no torn columns when a value is null), and
    # ties at equal ts break deterministically by turn_idx (largest wins
    # — matching ORDER BY ts DESC, turn_idx DESC semantics)
    ord_col = (
        F.col("turn_idx").cast("long")
        if "turn_idx" in features.columns
        else F.lit(0).cast("long")
    )
    payload = F.struct(*[F.col(c).alias(f"asof_{c}") for c in value_cols])
    # NULL-key / NULL-ts feature rows are never matchable in the
    # broadcast plan or the SQL oracle (equality joins skip NULLs, and
    # ts < probe_ts is NULL); drop them here too so the window plan
    # cannot pick them through NULL-grouping partitions
    features = features.where(
        F.col(on).isNotNull() & F.col(ts_col).isNotNull()
    )
    ev = features.select(
        F.col(on),
        F.col(ts_col).alias("__t"),
        F.lit(1).alias(_EV),
        ord_col.alias("__ord"),
        payload.alias("__payload"),
    )
    pr = probes.select(
        F.col(on),
        F.col(probe_ts_col).alias("__t"),
        F.lit(0).alias(_EV),
        F.lit(-1).cast("long").alias("__ord"),
        F.lit(None).cast(ev.schema["__payload"].dataType).alias("__payload"),
    )
    u = ev.unionByName(pr)
    # probes (0) sort before events (1) at equal ts -> strict '<'
    w = (
        Window.partitionBy(on)
        .orderBy("__t", _EV, "__ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    picked = F.last("__payload", ignorenulls=True).over(w).alias("__picked")
    if tolerance_ms is not None:
        from .timeutil import epoch_ms

        # the picked struct's own event time rides in the payload via a
        # second last() over the SAME window/order (same row picked)
        tms = F.last(
            F.when(F.col(_EV) == 1, epoch_ms("__t")), ignorenulls=True
        ).over(w)
        out = (
            u.select(on, "__t", _EV, picked, tms.alias("__picked_tms"))
            .where(F.col(_EV) == 0)
            .withColumn(
                "__fresh",
                F.col("__picked_tms") >= epoch_ms("__t") - F.lit(tolerance_ms),
            )
        )
        return out.select(
            on,
            F.col("__t").alias(probe_ts_col),
            *[
                F.when(F.col("__fresh"), F.col(f"__picked.asof_{c}")).alias(
                    f"asof_{c}"
                )
                for c in value_cols
            ],
        )
    out = u.select(on, "__t", _EV, picked).where(F.col(_EV) == 0)
    return out.select(
        on,
        F.col("__t").alias(probe_ts_col),
        *[F.col(f"__picked.asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_broadcast(
    features: DataFrame,
    probes: DataFrame,
    on: str = "conv_id",
    ts_col: str = "ts",
    probe_ts_col: str = "probe_ts",
    value_cols: tuple[str, ...] = ("turn_idx",),
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Alternative plan for small probe sets: broadcast range join +
    per-probe top-1 (row_number). Same strict-< semantics (incl. null
    rows for probes no feature precedes) and the same ``tolerance_ms``
    staleness bound as asof_join (here an extra range-join predicate:
    stale probes fall into the missed branch and emit nulls).

    Spark cannot broadcast the preserved side of an outer join (the
    hint is silently dropped for `build left / left outer`), so the
    match step is an INNER join — genuinely broadcastable both ways —
    and unmatched probes are re-added with a broadcast anti-join. Both
    joins are BroadcastHashJoins (plan-asserted).

    Duplicate probe rows are preserved (same multiplicity as
    asof_join): the core runs on DISTINCT (on, probe_ts) keys and the
    result is fanned back out by a final broadcast join against the
    original probe rows (r2 ADVICE item 3 — the matched branch used to
    collapse duplicates while the missed branch kept them).
    """
    probe_keys = probes.select(F.col(on), F.col(probe_ts_col))
    probes = probe_keys.distinct()
    conds = [
        F.col(f"p.{on}") == F.col(f"f.{on}"),
        F.col(f"f.{ts_col}") < F.col(f"p.{probe_ts_col}"),
    ]
    if tolerance_ms is not None:
        from .timeutil import epoch_ms

        conds.append(
            epoch_ms(f"f.{ts_col}")
            >= epoch_ms(f"p.{probe_ts_col}") - F.lit(tolerance_ms)
        )
    j = F.broadcast(probes.alias("p")).join(
        features.alias("f"), on=conds, how="inner"
    )
    w = Window.partitionBy(f"p.{on}", f"p.{probe_ts_col}").orderBy(
        F.col(f"f.{ts_col}").desc(), F.col("f.turn_idx").desc()
    )
    matched = (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col(f"p.{on}").alias(on),
            F.col(f"p.{probe_ts_col}").alias(probe_ts_col),
            *[F.col(f"f.{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )
    hit_keys = matched.select(on, probe_ts_col)
    missed = (
        probes.select(F.col(on), F.col(probe_ts_col))
        .join(F.broadcast(hit_keys), [on, probe_ts_col], "left_anti")
        .select(
            on,
            probe_ts_col,
            *[
                F.lit(None)
                .cast(features.schema[c].dataType)
                .alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    )
    per_key = matched.unionByName(missed)
    # restore original probe multiplicity (one output row per input row);
    # null-safe equality so NULL-key/NULL-ts probe rows survive the fan-
    # out (they always land in the missed branch) instead of vanishing
    pk = probe_keys.alias("pk")
    k = per_key.alias("k")
    return pk.join(
        F.broadcast(k),
        on=[
            F.col(f"pk.{on}").eqNullSafe(F.col(f"k.{on}")),
            F.col(f"pk.{probe_ts_col}").eqNullSafe(F.col(f"k.{probe_ts_col}")),
        ],
        how="inner",
    ).select(
        F.col(f"k.{on}").alias(on),
        F.col(f"k.{probe_ts_col}").alias(probe_ts_col),
        *[F.col(f"k.asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )

"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-stable only per partitioning; these samplers gate
on a hash of the ROW KEY, so membership is a pure function of the data
— reproducible across engines, partitionings, retries, and days, and
expressible in plain SQL (the constants are the engine's shared
oracle-hashing parameters, so the DuckDB twin matches bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..oracle.hashing import MOD, PERM_A, PERM_B

# the first MinHash permutation doubles as the sampling hash: fixed
# forever, mirrored into oracle SQL
SAMPLE_A = int(PERM_A[0])
SAMPLE_B = int(PERM_B[0])


def affine_hash(id_col: Column, a: int, b: int) -> Column:
    """((a * (id mod P) + b) mod P) — the id is folded into [0, P)
    FIRST so a * id can never overflow int64 for ANY int64 id (a, id'
    < P = 1e9+7 keeps the product < 2^63 exactly; r2 ADVICE: the old
    unreduced form wrapped silently in Spark past id ~2^33 while DuckDB
    raised, so engine and oracle could diverge without error). The ONE
    implementation of the engine's affine pmod-fold — sampling and
    packing both draw from it so the overflow invariant lives in one
    place (code-review r5)."""
    return F.pmod(
        F.lit(int(a)) * F.pmod(id_col.cast("long"), F.lit(MOD)) + F.lit(int(b)),
        F.lit(MOD),
    )


def _hash_col(id_col: Column) -> Column:
    return affine_hash(id_col, SAMPLE_A, SAMPLE_B)


def sample_gate(id_col: Column, pct: float) -> Column:
    """Boolean column: deterministic ``pct``-fraction membership.

    gate(id) = ((A*(id mod P) + B) mod P) < pct * P over the engine's
    shared hash constants; exact int64 for all int64 ids — the SQL twin
    folds with ((id % P + P) % P), matching Spark's pmod for NEGATIVE
    ids too (code-review r4; `%` alone is sign-preserving in DuckDB).
    """
    return _hash_col(id_col) < F.lit(int(pct * MOD))


def deterministic_sample(
    df: DataFrame, id_col: str, pct: float
) -> DataFrame:
    """Keep a deterministic ``pct`` fraction of rows keyed by ``id_col``.

    Pure filter — pushes down to the scan, no shuffle, no RNG state;
    disjoint samples compose ([0.0-0.1) vs [0.1-0.2)) via sample_slice.
    """
    return df.where(sample_gate(F.col(id_col), pct))


def sample_slice(df: DataFrame, id_col: str, lo: float, hi: float) -> DataFrame:
    """Rows whose hash falls in [lo, hi) — disjoint, composable slices
    (train/val/test splits that never leak into each other)."""
    h = _hash_col(F.col(id_col))
    return df.where((h >= F.lit(int(lo * MOD))) & (h < F.lit(int(hi * MOD))))


def sample_sql_hash(id_expr: str) -> str:
    """The DuckDB twin of _hash_col — the ONE source of the oracle-side
    gate hash (oracle/sql_queries builds its WHERE clauses from this,
    so engine and oracle cannot drift; code-review r5). The
    ((x % P + P) % P) fold matches Spark's pmod for negative ids."""
    return (
        f"(({SAMPLE_A} * ((({id_expr}) % {MOD} + {MOD}) % {MOD}) + {SAMPLE_B}) % {MOD})"
    )


def sample_sql_gate(id_expr: str, pct: float) -> str:
    """The DuckDB twin of sample_gate (same constants, same math)."""
    return f"{sample_sql_hash(id_expr)} < {int(pct * MOD)}"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. per-language quotas:
    keep 100% of low-resource languages, 10% of English boilerplate).

    Same hash gate as deterministic_sample, but the threshold is chosen
    by the row's stratum: keep iff hash(id) < rate[stratum] * P. Strata
    absent from ``rates`` (and NULL strata) use ``default_rate``. Still
    a pure filter — the rate table compiles to a literal map LOOKUP
    (pushes to the scan, no join, no shuffle), so the strata expression
    is referenced exactly ONCE. The old per-stratum CASE chain
    re-inlined the strata expression into every WHEN branch after
    projection collapse; with lang_guess as the stratum that blew the
    generated method past janino's 64 KB limit and disabled whole-stage
    codegen for the filter stage (r3 VERDICT item 1 / driver ADVICE).
    Membership stays a pure function of (id, stratum), so re-runs,
    engines, and partitionings agree, and a row's membership is
    MONOTONE in the rate (raising a stratum's rate only ADDS rows —
    stable incremental re-quota).
    """
    default_thr = F.lit(int(default_rate * MOD))
    if rates:
        lits: list[Column] = []
        for stratum, rate in sorted(rates.items()):
            lits += [F.lit(stratum), F.lit(int(rate * MOD))]
        # try_element_at: NULL (-> default) on a missing key even under
        # ANSI mode, where element_at/[] raise MAP_KEY_DOES_NOT_EXIST
        thr = F.coalesce(
            F.try_element_at(F.create_map(*lits), F.col(strata_col)),
            default_thr,
        )
    else:
        thr = default_thr
    return df.where(_hash_col(F.col(id_col)) < thr)

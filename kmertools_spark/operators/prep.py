"""The training-data prep pipeline as ONE reusable operator.

normalize -> quality/repetition/token filters -> per-language
stratified sampling -> deterministic shuffle + fixed-capacity sequence
packing. The gate query (q52) and the deployable job (jobs/prep_job.py)
both call this function, so the oracle-checked pipeline and the shipped
pipeline cannot drift.

Plan shape (guarded by tests/test_plan_shape.py): no single-partition
stage, exactly one Exchange — packing's ~24 B/doc (id, tok, key)
shuffle — and the only Window is packing's __part-partitioned JVM
cumsum (r7; never a global window). All filters are codegen'd Catalyst
expressions, but they deliberately evaluate ABOVE the feature
projection, not in the scan stage: prep_filter's __gate column is a
pushdown barrier so the (regex-heavy) feature struct computes exactly
once per row and stays behind the parallelizing exchange — see the
barrier comment in prep_filter for the measured 43.6s-vs-3s failure
the old push-everything-to-the-scan shape caused (r6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    lang_guess,
    normalize_text,
    quality_score,
    repetition_ratio,
    token_count,
)
from .packing import pack_documents
from .sampling import stratified_sample


def prep_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_rep: float = 0.3,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """The STATELESS prefix of training_prep: normalize -> per-document
    quality/repetition/token features -> threshold filters ->
    deterministic per-language sampling. Returns (id, n_tok, q, rep,
    lang) for the surviving documents.

    Every expression is a per-row Catalyst expression with no state, no
    window, and no shuffle — so this exact function runs unchanged on a
    STREAMING DataFrame (readStream -> prep_filter -> writeStream; the
    availableNow twin is equality-tested against the batch run). Only
    the packing stage needs a batch boundary (global offsets), which is
    why training_prep = prep_filter + pack_documents.

    Two stacked projections (r7): the normalizer materializes as a
    COLUMN (__nn) in the first, and every feature references that
    attribute in the second. CollapseProject cannot merge them (__nn is
    a non-cheap expression referenced many times), so the 2-regex
    normalizer runs exactly once per row — 2 regexp_replace nodes in
    the optimized plan — and the features evaluate over a plain
    attribute. The r4-r6 shape bound everything in ONE lambda struct
    (F.transform(F.array(nn), feats)) for the same single-evaluation
    guarantee, but that made the ENTIRE feature tree a CodegenFallback
    island (higher-order functions do not compile); with the attribute
    formulation only lang_guess's fold and repetition's gram transform
    remain interpreted islands and the rest of the stage compiles
    (measured ~2.9s -> ~2.4s at 100k docs, rows identical).
    """
    nn = F.col("__nn")
    p1 = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__nn"))
    feats = p1.select(
        F.col(id_col),
        token_count(nn).alias("n_tok"),
        quality_score(nn).alias("q"),
        repetition_ratio(nn, 4).alias("rep"),
        lang_guess(nn).alias("lang"),
        F.rand(0).alias("__gate"),
    )
    # a threshold of 0 must be a true no-op: repetition_ratio (and
    # quality_score on degenerate inputs) can be NULL, and `NULL >= 0.0`
    # silently drops the row (code-review r5) — so zero thresholds skip
    # the predicate instead of comparing
    cond = F.col("n_tok") >= min_tokens
    if min_quality > 0:
        cond &= F.col("q") >= min_quality
    if min_rep > 0:
        cond &= F.col("rep") >= min_rep
    # __gate is a predicate-pushdown BARRIER (r6): without it Catalyst
    # splits the threshold conjuncts (and the later stratified-sample
    # gate) and substitutes each through the feature projection — and
    # then through the normalize projection — re-inlining the whole
    # feature tree into a scan-stage Filter: the features then evaluate
    # TWICE per surviving row, and after a single-file scan +
    # repartition() the entire computation serializes onto the one
    # pre-exchange task (measured 43.6s vs ~3s at 100k docs). A
    # nondeterministic column in the project list fails Catalyst's
    # fields.forall(_.deterministic) push-through test for EVERY filter
    # above it, so the features evaluate exactly once per row; the
    # always-true __gate conjunct keeps the column referenced (column
    # pruning would otherwise drop it and re-enable the push).
    kept = feats.where(cond & (F.col("__gate") >= F.lit(-1.0))).select(
        id_col, "n_tok", "q", "rep", "lang"
    )
    if rates or default_rate < 1.0:
        kept = stratified_sample(kept, id_col, "lang", rates or {}, default_rate)
    return kept


def training_prep(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_rep: float = 0.3,
    min_tokens: int = 5,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    n_parts: int | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """docs -> (doc_id, bin, tok_start, pos_in_bin, n_tok) window map.

    ``rates`` maps language (the engine's lang_guess heuristic over the
    NORMALIZED text) to a deterministic keep fraction; languages absent
    from the map keep ``default_rate``. ``rates=None`` with
    ``default_rate=1.0`` skips the sampling gate entirely.
    ``checkpoint`` forwards to pack_documents ("reliable" for
    executor-loss-safe cluster runs — code-review r5: the documented
    fault-tolerant mode was unreachable from this entry point).
    """
    kept = prep_filter(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        min_rep=min_rep,
        min_tokens=min_tokens,
        rates=rates,
        default_rate=default_rate,
    )
    return pack_documents(
        kept,
        capacity=capacity,
        id_col=id_col,
        tokens_col="n_tok",
        order="hash",
        n_parts=n_parts,
        checkpoint=checkpoint,
    )

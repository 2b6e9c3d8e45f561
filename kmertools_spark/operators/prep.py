"""The training-data prep pipeline as ONE reusable operator.

normalize -> quality/repetition/token filters -> per-language
stratified sampling -> deterministic shuffle + fixed-capacity sequence
packing. The gate query (q52) and the deployable job (jobs/prep_job.py)
both call this function, so the oracle-checked pipeline and the shipped
pipeline cannot drift.

Plan shape (guarded by tests/test_plan_shape.py): no Window, no
single-partition stage, exactly one Exchange — packing's ~24 B/doc
(id, tok, key) shuffle; every filter is a codegen'd expression
evaluated in the scan stage.
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
) -> DataFrame:
    """docs -> (doc_id, bin, tok_start, pos_in_bin, n_tok) window map.

    ``rates`` maps language (the engine's lang_guess heuristic over the
    NORMALIZED text) to a deterministic keep fraction; languages absent
    from the map keep ``default_rate``. ``rates=None`` with
    ``default_rate=1.0`` skips the sampling gate entirely.
    """
    norm = normalize_text(F.col(text_col))
    feats = docs.select(
        F.col(id_col),
        token_count(norm).alias("n_tok"),
        quality_score(norm).alias("q"),
        repetition_ratio(norm, 4).alias("rep"),
        lang_guess(norm).alias("lang"),
    )
    kept = feats.where(
        (F.col("q") >= min_quality)
        & (F.col("rep") >= min_rep)
        & (F.col("n_tok") >= min_tokens)
    )
    if rates or default_rate < 1.0:
        kept = stratified_sample(kept, id_col, "lang", rates or {}, default_rate)
    return pack_documents(
        kept,
        capacity=capacity,
        id_col=id_col,
        tokens_col="n_tok",
        order="hash",
        n_parts=n_parts,
    )

"""Deterministic shuffle + sequence packing (concat-and-chunk).

The standard LLM-pretraining data-prep step: order documents by a
deterministic hash (the training shuffle), concatenate their token
streams, and chunk the stream into fixed-``capacity`` context windows.
Output is one row per (document, window) overlap, so a downstream
tokenizer/writer knows exactly which token span of which document fills
which position of which window — every window except the last is
exactly full, documents straddle windows (no padding waste).

The global token offset is a distributed prefix sum, NOT a
single-partition global window (the naive ``sum() OVER (ORDER BY ...)``
serializes the whole corpus through one task):

  1. every row gets an order key and an ORDER-ALIGNED partition id
     computed analytically from the key (hash keys are uniform in
     [0, MOD), so partition = h * P / MOD — no sampled range
     boundaries, fully deterministic across retries);
  2. one tiny aggregation job returns the P per-partition token sums;
     their exclusive prefix is broadcast back;
  3. each partition computes its local cumsum + base offset with a JVM
     window (sum OVER (PARTITION BY part ORDER BY key) — partitioned by
     the analytic part id, never a global window) over (id, tokens)
     only — the text never moves and no Python worker runs (r7: the
     former applyInPandas kernel did the identical sort+cumsum outside
     the JVM, paying Arrow transposes + python task startup per task).

The bin explosion afterwards is pure Catalyst (sequence + explode).
Shuffle traffic: two exchanges of (id, tok, key) triples — ~24 bytes a
document regardless of document size.

The SQL oracle (q46) replays the same ordering with a window cumsum —
fine at gate scale, the single-task plan this operator exists to avoid
at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..oracle.hashing import MOD, PACK_A, PACK_B
from .sampling import affine_hash


def pack_documents(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    order: str = "hash",
    n_parts: int | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """df -> (doc_id, bin, tok_start, pos_in_bin, n_tok), all BIGINT.

    ``order="hash"``: documents are shuffled by the shared PACK hash of
    their id (deterministic across engines, partitionings, retries —
    the training shuffle). ``order="id"``: documents pack in id order
    (reproducible corpus concatenation). Zero-token documents emit no
    rows. ``tokens_col`` supplies a precomputed token count (e.g. a
    real tokenizer's); default is the engine's whitespace token_count.

    For each document at global token offset o with t tokens, one row
    per window bin in [o // capacity, (o+t-1) // capacity]:
      tok_start   first token of the document inside this bin
      pos_in_bin  position of that token within the bin
      n_tok       tokens of this document inside this bin
    Invariants (property-tested): per-document n_tok sums to t; every
    bin except the last sums to exactly ``capacity``.

    ``checkpoint`` pins the (doc_id, tok) relation between the two
    passes that read it (the per-partition-sum job and the offsets
    stage): "local" (default) lazily localCheckpoints it, so the
    upstream plan — via training_prep the full
    normalize/quality/repetition/lang scan — executes exactly ONCE and
    any upstream nondeterminism cannot desync the broadcast base
    offsets from the second pass (driver ADVICE r3). "reliable" uses a
    fault-tolerant checkpoint instead (requires
    ``spark.sparkContext.setCheckpointDir``; survives executor loss —
    localCheckpoint blocks do not, costing a stage retry). "none"
    keeps the legacy double-scan lineage (only safe when the upstream
    is deterministic and cheap). The pinned relation is ~16 B/doc
    regardless of document size.
    """
    if order not in ("hash", "id"):
        raise ValueError(f"order must be 'hash' or 'id', got {order!r}")
    if int(capacity) < 1:
        # capacity=0 would run the whole upstream pipeline and then
        # silently explode to ZERO rows (div 0 -> NULL -> sequence NULL
        # -> explode drops) — fail before the expensive stages
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if checkpoint not in ("local", "reliable", "none"):
        raise ValueError(f"checkpoint must be local|reliable|none, got {checkpoint!r}")
    if n_parts is not None and int(n_parts) < 1:
        # 0 would silently mean "unset" through `or`, negatives would
        # surface as Spark's generic repartition error after the
        # expensive upstream already ran (code-review r5)
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    spark = df.sparkSession
    P = n_parts or spark.sparkContext.defaultParallelism

    tok = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"), tok.alias("tok")
    ).where(F.col("tok") > 0)
    if checkpoint == "local":
        base = base.localCheckpoint(eager=False)
    elif checkpoint == "reliable":
        base = base.checkpoint(eager=False)

    if order == "hash":
        # the shared overflow-safe affine fold (sampling.affine_hash)
        # with the packing constants
        key = affine_hash(F.col("doc_id"), PACK_A, PACK_B)
        keyed = base.withColumn("__ord", key).withColumn(
            "__part", ((F.col("__ord") * P) / MOD).cast("int")
        )
    else:
        lo, hi = base.agg(F.min("doc_id"), F.max("doc_id")).first()
        if lo is None:  # empty / all-zero-token input
            lo, hi = 0, 0
        span = max(1.0, float(hi) - float(lo) + 1.0)
        # double math THROUGHOUT: for ids spanning more than +-2^62 the
        # int64 SUBTRACTION (id - lo) itself wraps before any cast
        # (code-review r4) — cast the operand first; double precision
        # only coarsens the partition boundaries, and the kernel sorts
        # by __ord within partitions, so monotonicity (the CLAUDE.md
        # prefix-sum invariant) is preserved
        keyed = base.withColumn("__ord", F.col("doc_id")).withColumn(
            "__part",
            ((F.col("__ord").cast("double") - float(lo)) * P / span).cast("int"),
        )

    # tiny job: P per-partition token sums -> exclusive prefix offsets
    rows = keyed.groupBy("__part").agg(F.sum("tok")).collect()
    if any(r[0] is None for r in rows):
        # a NULL id (or an id_col value that cast to NULL) hashes to a
        # NULL partition; it cannot be ordered deterministically, and
        # letting it through used to die as an opaque TypeError here
        # (code-review r5) — name the actual cause
        raise ValueError(
            f"pack_documents: {id_col} contains NULL (or values that "
            "cast to NULL as long); filter or re-key upstream"
        )
    psums = {int(r[0]): int(r[1]) for r in rows}
    bases, acc = {}, 0
    for p in sorted(psums):
        bases[p] = acc
        acc += psums[p]

    # explicit exchange on the partitioning key (AQE would coalesce this
    # small-by-bytes shuffle onto one task — see BENCH/BASELINE.md).
    # 4*P physical partitions, not P: Spark hash-routes the P dense
    # part ids balls-in-bins style, and at exactly P bins ~1/e of the
    # pinned tasks would sit empty while others carry 2-3 groups
    # (code-review r5); 4x the bins cuts expected collisions to ~11%
    # and empty partitions cost nothing in this cheap cumsum stage.
    # The window reuses the exchange (HashPartitioning on __part
    # satisfies its clustering requirement at any partition count).
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__part")
        .orderBy("__ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keyed = keyed.repartition(4 * P, "__part")
    # a __part value absent from the collected bases (only possible if
    # the input changed between the offsets pass and this one, e.g. a
    # nondeterministic source with checkpoint='none') must FAIL, not
    # resolve to a NULL offset that F.sequence/explode would silently
    # drop — the old python kernel raised KeyError here (code-review r7)
    desync = F.raise_error(
        F.concat(
            F.lit("pack_documents: partition "),
            F.col("__part").cast("string"),
            F.lit(
                " missing from the base-offset map — input changed "
                "between passes? (use checkpoint unless the source is "
                "deterministic)"
            ),
        )
    )
    if len(bases) <= 4096:
        # per-partition base offsets as a literal map — a pure projection,
        # no extra join; P is the task parallelism, so the map stays small
        args: list = []
        for part_id, base_off in bases.items():
            args += [F.lit(int(part_id)), F.lit(int(base_off))]
        base_col = (
            F.coalesce(F.element_at(F.create_map(*args), F.col("__part")), desync)
            if args
            else F.lit(0)
        )
    else:  # pragma: no cover - very large explicit n_parts
        bdf = spark.createDataFrame(
            [(int(p_), int(b_)) for p_, b_ in bases.items()],
            "__part int, __base long",
        )
        keyed = keyed.join(F.broadcast(bdf), "__part", "left")
        base_col = F.coalesce(F.col("__base"), desync)
    offs = keyed.select(
        "doc_id",
        "tok",
        (base_col + F.sum("tok").over(w) - F.col("tok"))
        .cast("long")
        .alias("off"),
    )

    cap = int(capacity)
    ex = offs.select(
        "doc_id",
        "tok",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {cap}"), F.expr(f"(off + tok - 1) div {cap}")
            )
        ).alias("bin"),
    )
    seg_start = F.greatest(F.col("off"), F.col("bin") * cap)
    seg_end = F.least(F.col("off") + F.col("tok"), (F.col("bin") + 1) * cap)
    return ex.select(
        "doc_id",
        F.col("bin").cast("long").alias("bin"),
        (seg_start - F.col("off")).cast("long").alias("tok_start"),
        (seg_start - F.col("bin") * cap).cast("long").alias("pos_in_bin"),
        (seg_end - seg_start).cast("long").alias("n_tok"),
    )

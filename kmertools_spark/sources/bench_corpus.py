"""Right-sized synthetic document/embedding corpora for the bench.

The driver's sf0.1 side tables (5k docs / 2k embeddings) are so small
that the dedup/ann/tokenize/pack/prep bench legs measure fixed overhead
(task rounds, JIT), not data work — a 3x kernel regression would be
invisible (r5 VERDICT item 1 / "What's wrong" 3). This module
synthesizes sf1-shaped corpora DETERMINISTICALLY (seeded numpy, no
external data) with the same schemas and the same statistical shape as
the driver's documents/embeddings tables:

  documents:  (doc_id BIGINT, text VARCHAR, lang VARCHAR,
               source VARCHAR, n_chars BIGINT)
              ~300-char texts from a small word pool with embedded
              language-marker words (so lang_guess stratification does
              real work) and a controlled duplicate structure (exact +
              near dups off shared base texts, small multiplicities —
              the LSH banding finds real candidates without hot-bucket
              blowup).
  embeddings: (vec_id BIGINT, embedding FLOAT[], label INT)
              16 Gaussian clusters + a 5%% near-duplicate tail (the
              shape embedding-dedup expects).

Corpora are cached as parquet under a size-keyed directory so repeat
bench runs (and the scaling harness) pay generation once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# word pool: the transcripts generator's data-engineering flavor — the
# testdata documents draw from a similar ~30-word vocabulary, which is
# what gives shingles/minhash realistic collision rates
_DOC_WORDS = np.array(
    [
        "batch", "part", "spark", "line", "column", "order", "small",
        "sort", "fast", "value", "scan", "hash", "slow", "group",
        "agg", "filter", "query", "big", "key", "window", "row",
        "table", "stream", "merge", "data", "join", "shuffle", "skew",
        "plan", "cache", "stage", "task", "broadcast", "limit", "a",
    ]
)

# one marker word per language (functions/text.LANG_MARKERS match
# ' word ' padded); inserting these makes lang_guess produce a real
# language distribution for the stratified-sampling stage
_LANG_WORDS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "y"],
    "it": ["il", "che", "di"],
    "pt": ["uma", "para", "os"],
    "nl": ["het", "een", "van"],
}
_LANGS = list(_LANG_WORDS)
# en-dominant, like a web crawl — the shape the rates={'en': 0.8}
# bench stratification expects
_LANG_P = np.array([0.42, 0.10, 0.10, 0.10, 0.06, 0.06, 0.06])
_P_UND = 1.0 - _LANG_P.sum()

_MAX_WORDS = 80


def synth_documents_pdf(n_docs: int = 100_000, seed: int = 7) -> pd.DataFrame:
    """Deterministic synthetic documents with dedup structure.

    ~10% of docs are EXACT copies of a shared base text, ~15% near
    dups (base text with 1-3 word substitutions), the rest unique.
    n_base = n_docs//8 keeps per-text multiplicities small (~2), so
    LSH buckets stay shallow — flood control is exercised by its own
    unit tests, not the bench.
    """
    rng = np.random.RandomState(seed)
    n_base = max(1, n_docs // 8)
    V = len(_DOC_WORDS)

    base_words = rng.randint(0, V, size=(n_base, _MAX_WORDS))
    base_len = rng.randint(20, _MAX_WORDS + 1, size=n_base)

    kind = rng.random(n_docs)  # <0.10 exact, <0.25 near, else unique
    base_of = rng.randint(0, n_base, size=n_docs)

    words = rng.randint(0, V, size=(n_docs, _MAX_WORDS))
    lens = rng.randint(20, _MAX_WORDS + 1, size=n_docs)
    dup = kind < 0.25
    words[dup] = base_words[base_of[dup]]
    lens[dup] = base_len[base_of[dup]]
    near = (kind >= 0.10) & dup
    n_near = int(near.sum())
    if n_near:
        # 1-3 in-bounds substitutions per near-dup, vectorized: 3 draws,
        # later ones masked off with probability 1/3 each
        rows = np.flatnonzero(near)
        for j in range(3):
            take = rng.random(n_near) < (1.0 if j == 0 else 0.66)
            pos = rng.randint(0, lens[rows])  # per-row in-bounds position
            sub = rng.randint(0, V, size=n_near)
            r = rows[take]
            words[r, pos[take]] = sub[take]

    # language assignment + marker injection (dup rows inherit the base
    # doc's language/markers via base-derived draws so exact dups stay
    # byte-identical)
    lang_draw = rng.random(n_docs)
    base_lang_draw = rng.random(n_base)
    lang_draw[dup] = base_lang_draw[base_of[dup]]
    marker_pos = rng.randint(0, _MAX_WORDS, size=(n_docs, 3))
    base_marker_pos = rng.randint(0, _MAX_WORDS, size=(n_base, 3))
    marker_pos[dup] = base_marker_pos[base_of[dup]]

    cum = np.cumsum(_LANG_P)
    lang_idx = np.searchsorted(cum, lang_draw)  # == len(_LANGS) -> und

    texts: list[str] = []
    vocab = _DOC_WORDS
    for i in range(n_docs):
        L = lens[i]
        ws = list(vocab[words[i, :L]])
        li = lang_idx[i]
        if li < len(_LANGS):
            mk = _LANG_WORDS[_LANGS[li]]
            for j, p in enumerate(marker_pos[i]):
                ws[p % L] = mk[j % len(mk)]
        texts.append(" ".join(ws))

    # searchsorted yields len(_LANGS) for draws past the last cumsum
    # edge — that index IS the 'und' slot
    langs = np.array(_LANGS + ["und"])[lang_idx]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype="int64"),
            "text": texts,
            "lang": langs,
            "source": np.char.add(
                "src", (rng.randint(0, 10, size=n_docs)).astype(str)
            ),
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        }
    )


def synth_embeddings_pdf(
    n_vecs: int = 50_000, dim: int = 64, seed: int = 11
) -> pd.DataFrame:
    """16 Gaussian clusters; the last 5% of vectors are near-copies of
    earlier ones (the semantic-dedup tail)."""
    rng = np.random.RandomState(seed)
    n_centers = 16
    centers = rng.standard_normal((n_centers, dim))
    label = rng.randint(0, n_centers, size=n_vecs)
    vecs = centers[label] + 0.35 * rng.standard_normal((n_vecs, dim))
    n_dup = n_vecs // 20
    if n_dup:
        src = rng.randint(0, n_vecs - n_dup, size=n_dup)
        vecs[-n_dup:] = vecs[src] + 0.01 * rng.standard_normal((n_dup, dim))
        label[-n_dup:] = label[src]
    vecs = vecs.astype("float32")
    return pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype="int64"),
            "embedding": list(vecs),
            "label": label.astype("int32"),
        }
    )


def _write_parts(tbl, path: str, n_files: int) -> None:
    """Write a pyarrow table as a DIRECTORY of n_files part files.

    A single-file parquet table under maxPartitionBytes yields ONE scan
    partition, and Catalyst pushes deterministic Projects/Filters BELOW
    a later repartition() — so every Catalyst-expression leg (prep
    features, HOF cosine) silently serializes onto one task (measured:
    training_prep 39s single-file vs 3s parallel at 100k docs). Multi-
    file input is how a real table parallelizes its scan; mimic that.
    """
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    n = tbl.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))


def ensure_bench_corpus(
    root: str, n_docs: int, n_emb: int, seed: int = 7
) -> str:
    """Write (once) and return a size-keyed corpus directory containing
    documents.parquet and embeddings.parquet (each a directory of part
    files — see _write_parts) with the driver schemas."""
    import pyarrow as pa

    # zero/negative sizes would write an EMPTY parquet dir, stamp _DONE,
    # and permanently poison the cache ('Unable to infer schema' on
    # every later read until the dir is hand-deleted, code-review r6);
    # the documented disable switch is SPARK_GRAFT_BENCH_DOCS=0 in
    # bench.py, which never reaches this function
    if n_docs <= 0 or n_emb <= 0:
        raise ValueError(
            f"ensure_bench_corpus needs positive sizes, got "
            f"n_docs={n_docs}, n_emb={n_emb}"
        )
    out = os.path.join(root, f"docs{n_docs}_emb{n_emb}_s{seed}")
    dp = os.path.join(out, "documents.parquet")
    ep = os.path.join(out, "embeddings.parquet")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    docs = synth_documents_pdf(n_docs, seed=seed)
    _write_parts(
        pa.Table.from_pandas(docs, preserve_index=False),
        dp,
        n_files=max(1, min(32, n_docs // 2000)),
    )

    emb = synth_embeddings_pdf(n_emb, seed=seed + 4)
    tbl = pa.table(
        {
            "vec_id": pa.array(emb["vec_id"].to_numpy(), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in emb["embedding"]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(emb["label"].to_numpy(), pa.int32()),
        }
    )
    _write_parts(tbl, ep, n_files=max(1, min(16, n_emb // 2000)))
    with open(done, "w") as f:
        f.write("ok\n")
    return out

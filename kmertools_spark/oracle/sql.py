"""DuckDB oracle-SQL builders.

Each helper emits a SQL fragment re-deriving an engine kernel in plain
(DuckDB 1.0) SQL over the driver's parquet views. These are the
side-by-side correctness twins for `__spark_entry__.queries()` — the
numbers (hash constants, code tables) are imported from the same
modules the Spark UDFs use, so the two sides cannot drift.
"""

from __future__ import annotations

from .hashing import BASE, MOD, N_PERMS, PERM_A, PERM_B, pow_vector

# ---------------------------------------------------------------- k-mers

CODE_CASE = (
    "CASE upper(substr({g}, {j}, 1)) WHEN 'A' THEN 0 WHEN 'C' THEN 1 "
    "WHEN 'G' THEN 2 WHEN 'T' THEN 3 WHEN 'U' THEN 3 ELSE 4 END"
)


def gram_cte(k: int, src: str = "t", keys: str = "conv_id, turn_idx") -> str:
    """CTE body exploding every k-char window with its start offset.

    pos is 0-based (matches the engine's exploded_kmers). Texts shorter
    than k drop out (empty range).
    """
    return f"""
  SELECT {keys}, CAST(i - 1 AS BIGINT) AS pos,
         substr(text, CAST(i AS INT), {k}) AS g
  FROM (SELECT {keys}, text,
               unnest(range(1, CAST(length(text) - {k - 1} AS BIGINT) + 1)) AS i
        FROM {src}) _g
"""


def kmer_cte(k: int, keys: str = "conv_id, turn_idx") -> str:
    """From `grams` -> (keys, pos, fwd, rc, kmer) for valid windows only.

    fwd/rc are the 2-bit packed values (kmer/src/kmer.rs:77-107 math);
    kmer = least(fwd, rc) is the canonical form.
    """
    codes = [CODE_CASE.format(g="g", j=j + 1) for j in range(k)]
    decl = ", ".join(f"({c}) AS c{j}" for j, c in enumerate(codes))
    fwd = " + ".join(f"c{j} * {4 ** (k - 1 - j)}" for j in range(k))
    rc = " + ".join(f"(3 - c{j}) * {4 ** j}" for j in range(k))
    valid = " AND ".join(f"c{j} < 4" for j in range(k))
    return f"""
  SELECT {keys}, pos, fwd, rc, least(fwd, rc) AS kmer FROM (
    SELECT {keys}, pos, {fwd} AS fwd, {rc} AS rc
    FROM (SELECT {keys}, pos, {decl} FROM grams) _c
    WHERE {valid}
  ) _k
"""


def decode_expr(col: str, k: int) -> str:
    """ACGT decode of a packed k-mer (numeric_to_kmer, kmer/src/lib.rs:19-34)."""
    parts = [
        f"substr('ACGT', CAST(({col} // {4 ** (k - 1 - j)}) % 4 AS INT) + 1, 1)"
        for j in range(k)
    ]
    return " || ".join(parts)


# --------------------------------------------------------------- hashing


def strhash_expr(g: str, width: int) -> str:
    """Polynomial shingle hash == oracle.hashing.shingle_hashes."""
    pows = pow_vector(width)
    terms = " + ".join(
        f"CAST(ascii(substr({g}, {j + 1}, 1)) AS BIGINT) * {int(pows[j])}"
        for j in range(width)
    )
    return f"(({terms}) % {MOD})"


def shingle_cte(width: int, src: str = "documents", id_col: str = "doc_id") -> str:
    """(id, h) for every width-char shingle of every doc."""
    return f"""
  SELECT {id_col}, {strhash_expr("g", width)} AS h FROM (
    SELECT {id_col}, substr(text, CAST(i AS INT), {width}) AS g
    FROM (SELECT {id_col}, text,
                 unnest(range(1, CAST(length(text) - {width - 1} AS BIGINT) + 1)) AS i
          FROM {src}) _s
  ) _h
"""


def minhash_sig_cte() -> str:
    """The ``sig`` CTE alone (MinHash signature per (doc, perm)) — the
    ONE copy of the permutation formula, shared by the banding chain
    and q16 (code-review r5: q16 used to re-inline it)."""
    return f"""sig AS (
  SELECT doc_id, perm, min((a * h + b) % {MOD}) AS sig
  FROM sh CROSS JOIN {perm_values()}
  GROUP BY doc_id, perm
)"""


def minhash_banded_ctes(rows_per_band: int = 4) -> str:
    """``sig`` + ``banded`` + ``cand`` CTEs over a ``sh`` shingle CTE —
    the MinHash banding chain shared by the LSH queries (q17/q19/q32).
    ``cand`` is the distinct (id_a, id_b) candidate-pair set."""
    return f"""
{minhash_sig_cte()},
banded AS (
  SELECT doc_id, perm // {rows_per_band} AS band,
    string_agg(CAST(sig AS VARCHAR), '_' ORDER BY perm) AS key
  FROM sig GROUP BY doc_id, perm // {rows_per_band}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""


def minimiser_spans_ctes(w: int, m: int) -> str:
    """CTE chain deriving the windowed (w>0) minimizer runs in pure SQL.

    SQL twin of oracle.kernels.minimiser_runs/_segment_runs (itself a
    re-derivation of kmer/src/minimiser.rs:58-176), with every quirk:
    value-RLE of the sliding-window minimum per OOV-free segment, run
    spans anchored at segment start / change char / OOV flush / text
    end, the lost-final-run rule (change at the very last char), and the
    never-filled-window sentinel (-1) at end of text.

    Requires ``t`` (transcripts), ``kmers`` (kmer_cte at k=m), and
    ``ch``/``st`` (per-char codes + stats) CTEs in scope. Emits a final
    ``spans`` CTE: (conv_id, turn_idx, mmer, win_start, win_end).
    """
    W = w - m + 1
    return f"""
chseg AS (
  -- 0-based [s0, s1) bounds of the OOV-free segment containing char i
  SELECT c.conv_id, c.turn_idx, c.i, s.len,
    coalesce(max(CASE WHEN c.c >= 4 THEN c.i END) OVER
      (PARTITION BY c.conv_id, c.turn_idx ORDER BY c.i
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s0,
    coalesce(min(CASE WHEN c.c >= 4 THEN c.i END) OVER
      (PARTITION BY c.conv_id, c.turn_idx ORDER BY c.i
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), s.len + 1) - 1 AS s1
  FROM ch c JOIN st s ON s.conv_id = c.conv_id AND s.turn_idx = c.turn_idx
),
mm AS (
  -- canonical m-mer values tagged with their segment bounds
  SELECT k.conv_id, k.turn_idx, k.pos, least(k.fwd, k.rc) AS mval,
         c2.s0, c2.s1, c2.len
  FROM kmers k
  JOIN chseg c2 ON c2.conv_id = k.conv_id AND c2.turn_idx = k.turn_idx
               AND c2.i = k.pos + 1
),
sw AS (
  -- a: segment-local window index; kk: m-mers in segment;
  -- swmin: sliding min over {W} consecutive m-mer values
  SELECT conv_id, turn_idx, s0, s1, len,
    row_number() OVER seg - 1 AS a,
    count(*) OVER (PARTITION BY conv_id, turn_idx, s0) AS kk,
    min(mval) OVER (PARTITION BY conv_id, turn_idx, s0 ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS swmin
  FROM mm
  WINDOW seg AS (PARTITION BY conv_id, turn_idx, s0 ORDER BY pos)
),
wins AS (
  -- keep full windows only; flag value changes (RLE boundaries)
  SELECT *, CASE WHEN a = 0 OR swmin <> lag(swmin) OVER seg
                 THEN 1 ELSE 0 END AS chg
  FROM sw WHERE a <= kk - {W}
  WINDOW seg AS (PARTITION BY conv_id, turn_idx, s0 ORDER BY a)
),
runsg AS (
  SELECT conv_id, turn_idx, s0, s1, len, rid,
         min(swmin) AS val, min(a) AS a_first
  FROM (
    SELECT *, sum(chg) OVER (PARTITION BY conv_id, turn_idx, s0 ORDER BY a
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
    FROM wins
  ) _r
  GROUP BY conv_id, turn_idx, s0, s1, len, rid
),
runsx AS (
  SELECT *, lead(a_first) OVER seg AS next_a,
         count(*) OVER (PARTITION BY conv_id, turn_idx, s0) AS rr
  FROM runsg
  WINDOW seg AS (PARTITION BY conv_id, turn_idx, s0 ORDER BY a_first)
),
spans AS (
  SELECT conv_id, turn_idx, CAST(val AS BIGINT) AS mmer,
    CAST(s0 + a_first AS BIGINT) AS win_start,
    CAST(CASE WHEN next_a IS NOT NULL THEN s0 + next_a + {w} - 1
              WHEN s1 = len THEN len
              ELSE s1 END AS BIGINT) AS win_end
  FROM runsx
  -- lost-final-run quirk: change detected at the very last char
  WHERE NOT (next_a IS NULL AND s1 = len AND rr >= 2
             AND a_first + {w} - 1 = s1 - s0 - 1)
  UNION ALL
  -- never-filled window reaching end of text: sentinel record
  SELECT conv_id, turn_idx, CAST(-1 AS BIGINT),
         CAST(s0 AS BIGINT), CAST(len AS BIGINT)
  FROM (SELECT conv_id, turn_idx, s0, s1, len, count(*) AS kk
        FROM mm GROUP BY conv_id, turn_idx, s0, s1, len) _s
  WHERE kk < {W} AND s1 = len
)"""


def perm_values() -> str:
    """VALUES list (perm, a, b) mirroring PERM_A/PERM_B exactly."""
    rows = ", ".join(
        f"({i}, {int(PERM_A[i])}, {int(PERM_B[i])})" for i in range(N_PERMS)
    )
    return f"(VALUES {rows}) perms(perm, a, b)"


__all__ = [
    "BASE",
    "MOD",
    "N_PERMS",
    "CODE_CASE",
    "gram_cte",
    "kmer_cte",
    "decode_expr",
    "strhash_expr",
    "shingle_cte",
    "perm_values",
]

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

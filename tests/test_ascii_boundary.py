"""Engine kernels window over UTF-8 BYTES (reference semantics:
Sequence.seq is Vec<u8>); the DuckDB oracle SQL windows over CHARACTERS.
The two agree exactly on ASCII corpora — this guard fails loudly if the
driver corpus ever grows non-ASCII text so the boundary is re-examined
instead of silently mismatching."""

import os

import duckdb
import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_driver_corpora_are_ascii(sf):
    d = f"/root/testdata/{sf}"
    if not os.path.isdir(d):
        pytest.skip("sf dir absent")
    con = duckdb.connect()
    for table, col in [("documents", "text"), ("events", "props"), ("events", "event_type")]:
        bad = con.execute(
            f"SELECT count(*) FROM '{d}/{table}.parquet' "
            f"WHERE {col} IS NOT NULL AND octet_length(encode({col})) <> length({col})"
        ).fetchone()[0]
        assert bad == 0, f"non-ASCII rows in {sf}/{table}.{col}: {bad}"


def test_byte_vs_char_divergence_is_understood():
    """Document the divergence concretely: byte-windows on a non-ASCII
    text differ from char-windows — the engine (bytes) is the reference
    semantics; the SQL oracle (chars) is only valid on ASCII."""
    from kmertools_spark.oracle.hashing import batch_shingle_hashes

    rows, h = batch_shingle_hashes(["abcdefé"], 4)  # 8 bytes -> 5 windows
    assert h.size == 5  # char-based would give 4

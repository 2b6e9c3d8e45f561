"""Oracle codec truth tables, ported from the reference's unit tests.

Expected values are language-independent facts taken from
kmer/src/kmer.rs:109-177 and kmer/src/lib.rs:52-72 (cited per test).
"""

import numpy as np
import pytest

from kmertools_spark.oracle import (
    kmer_pos_maps,
    kmer_to_numeric,
    numeric_to_kmer,
    rev_comp,
    rev_comp_scalar,
)
from kmertools_spark.oracle.kernels import concat_codes, kmer_windows
from kmertools_spark.oracle.reference import kmer_iter


def windows_of(text: str, k: int):
    codes, _, _ = concat_codes([text])
    _, f, r = kmer_windows(codes, k)
    return list(zip(f.tolist(), r.tolist()))


def test_kmers_generated():
    # kmer/src/kmer.rs:113-128: "ACGT" k=2 -> (1,11), (6,6), (11,1)
    assert windows_of("ACGT", 2) == [(1, 11), (6, 6), (11, 1)]
    assert kmer_iter("ACGT", 2) == [(1, 11), (6, 6), (11, 1)]


def test_kmers_ambiguous_skips_straddling():
    # kmer/src/kmer.rs:130-145: "ACNGTT" k=2 -> N-straddling k-mers dropped
    assert windows_of("ACNGTT", 2) == [(1, 11), (11, 1), (15, 0)]
    assert kmer_iter("ACNGTT", 2) == [(1, 11), (11, 1), (15, 0)]


def test_case_insensitive_and_u():
    # SEQ_NT4 maps lowercase and U/u==T (kmer/src/kmer.rs:6-15)
    assert windows_of("acgu", 2) == [(1, 11), (6, 6), (11, 1)]


def test_rev_comp():
    # kmer/src/kmer.rs:147-153
    assert rev_comp_scalar(0b00011011, 4) == 0b00011011
    assert rev_comp_scalar(0b001101101011, 6) == 0b000101100011
    out = rev_comp(np.array([0b00011011, 0b001101101011], dtype=np.uint64), 6)
    assert out[1] == 0b000101100011


def test_pos_map():
    # kmer/src/kmer.rs:155-176: 136 canonical slots for k=4
    pos_map, pos_to_kmer, count = kmer_pos_maps(4)
    assert count == 136
    assert pos_to_kmer.size == 136
    assert pos_map.max() < 136
    assert (pos_map >= 0).all()
    assert pos_map[0] == 0  # AAAA -> 0
    assert pos_map[0b11111111] == 0  # TTTT -> canonical AAAA -> 0
    assert pos_map[0b11] == 0b11  # AAAT -> 11
    # count of positions > 0 is 135 over the distinct canonical values
    assert np.unique(pos_map).size == 136


def test_codec_roundtrip():
    # kmer/src/lib.rs:52-72
    assert numeric_to_kmer(0b0001101111, 5) == "ACGTT"
    assert numeric_to_kmer(0b0000011011, 5) == "AACGT"
    assert kmer_to_numeric("ACGTT") == (0b0001101111, 0b0000011011)


def test_codec_errors_and_oov_parity():
    # pybindings/src/kmer.rs:56-65: ValueError ONLY for k > 32
    with pytest.raises(ValueError):
        kmer_to_numeric("A" * 33)
    # OOV characters fold code 4 into the u64 bit math exactly like the
    # reference (kmer/src/lib.rs:36-50) — the old ValueError deviation
    # broke the drop-in contract (code-review r4). Values verified
    # against an independent replication of the Rust arithmetic.
    assert kmer_to_numeric("AXGT") == (75, 31)
    # fwd stays under the 2k mask; the rc OOV code 7 carries past it,
    # faithful to the unmasked Rust rval
    f, r = kmer_to_numeric("NNNN")
    assert f == ((((4 << 2 | 4) << 2 | 4) << 2 | 4) & 0xFF)
    assert r > 0xFF


def test_batch_concat_no_cross_row_windows():
    codes, starts, lens = concat_codes(["ACGT", "ACGT"])
    pos, f, r = kmer_windows(codes, 4)
    # only one valid 4-mer per row; the separator kills spanning windows
    assert pos.tolist() == [0, 5]
    assert starts.tolist() == [0, 5]
    assert lens.tolist() == [4, 4]


def test_empty_and_none_rows():
    codes, starts, lens = concat_codes(["", None, "AC"])
    pos, f, r = kmer_windows(codes, 2)
    assert pos.tolist() == [2]
    assert f.tolist() == [1]


def test_seq_nt4_minimap2_raw_byte_quirk():
    """code-review r5: the reference's SEQ_NT4_TABLE (minimap2) maps
    raw bytes 0x00-0x03 to codes 0-3 (pre-encoded input accepted
    as-is); the engine table must carry the same quirk or composition
    vectors silently diverge on such inputs."""
    from kmertools_spark.oracle.codec import SEQ_NT4, kmer_to_numeric

    assert SEQ_NT4[:4].tolist() == [0, 1, 2, 3]
    assert kmer_to_numeric("\x00\x01\x02\x03") == kmer_to_numeric("ACGT")


def test_kmer_to_numeric_reference_unit_mix():
    """code-review r5: the reference computes shift/mask/length from
    kmer.len() (BYTES) while iterating chars() — for U+0080-U+00FF
    these diverge on purpose, and a char past U+00FF raises (the Rust
    table index panics)."""
    import pytest

    from kmertools_spark.oracle.codec import kmer_to_numeric

    # 'é' = 2 utf-8 bytes: shift=2, mask=0b1111, ONE char iteration of
    # OOV code 4 -> fval=4, rval=(4^3)<<2=28 (hand-checked vs lib.rs)
    assert kmer_to_numeric("é") == (4, 28)
    with pytest.raises(ValueError, match="invalid k-mer character"):
        kmer_to_numeric("中")
    # byte-length guard: 17 two-byte chars = 34 bytes > 32
    with pytest.raises(ValueError, match="<= 32"):
        kmer_to_numeric("é" * 17)
    assert kmer_to_numeric("") == (0, 0)  # documented non-panic edge

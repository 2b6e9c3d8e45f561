"""Composition / coverage / CGR oracle kernels vs reference goldens.

The two 72 bp reads below are the reference's whole test corpus
(test_data/reads.fq, ktio/src/seq.rs:168-181); expected numbers come
from the checked-in golden files and in-code assertions (cited).
"""

import os

import numpy as np
import pytest

from kmertools_spark.oracle import (
    SortedCountLookup,
    cgr_trajectory,
    composition_matrix,
    coverage_matrix,
    kmer_pos_maps,
)
from kmertools_spark.oracle.kernels import concat_codes, kmer_windows

READ_1 = "GGGTGATGGCCGCTGCCGATGGCGTCAAATCCCACCAAGTTACCCTTAACAACTTAAGGGTTTTCAAATAGA"
READ_2 = "GTTCAGGGATACGACGTTTGTATTTTAAGAATCTGAAGCAGAAGTCGATGATAATACGCGTCGTTTTATCAT"

REF_TESTDATA = "/root/reference/test_data"


def test_composition_norm_golden_scalar():
    # composition/src/oligo.rs:286-295: vectorise_one("AAAANGAGA", k=4, norm) -> v[0]==0.5
    mat = composition_matrix(["AAAANGAGA"], 4, canonical=True, norm=True)
    assert mat.shape == (1, 136)
    assert mat[0, 0] == 0.5


def test_composition_unnorm_golden_scalar():
    # composition/src/oligo.rs:297-309: unnorm -> v[0]==1.0, sum==2.0
    mat = composition_matrix(["AAAANGAGA"], 4, canonical=True, norm=False)
    assert mat[0, 0] == 1.0
    assert mat[0].sum() == 2.0


def test_composition_raw_mode_size():
    # composition/src/oligo.rs:270-283: raw counts over 4^k slots
    mat = composition_matrix(["AAAANGAGA"], 4, canonical=False, norm=False)
    assert mat.shape == (1, 256)


def test_binding_quirk_raw_norm():
    # pybindings/src/oligo.rs:59-63: python-binding raw mode normalizes by 2x
    cli = composition_matrix(["AAAANGAGA"], 4, canonical=False, norm=True)
    binding = composition_matrix(
        ["AAAANGAGA"], 4, canonical=False, norm=True, binding_quirk=True
    )
    nz = cli[0] > 0
    assert np.allclose(binding[0][nz] * 2.0, cli[0][nz])


def test_empty_text_norm_divides_by_one():
    # composition/src/oligo.rs:255-257: v /= max(1, total)
    mat = composition_matrix([""], 4)
    assert mat.sum() == 0.0


@pytest.mark.skipif(not os.path.isdir(REF_TESTDATA), reason="reference corpus absent")
def test_composition_vs_reference_golden_file():
    # expected_fa.kmers: 2 rows x 136 floats at 6 dp (composition/src/oligo.rs:311-324)
    with open(os.path.join(REF_TESTDATA, "expected_fa.kmers")) as f:
        expected = [np.array([float(x) for x in line.split()]) for line in f]
    mat = composition_matrix([READ_1, READ_2], 4, canonical=True, norm=True)
    for row, exp in zip(mat, expected):
        assert row.size == exp.size == 136
        assert np.abs(row - exp).max() <= 5e-7  # golden file is rounded to 6 dp


def global_counts(texts, k):
    codes, starts, _ = concat_codes(texts)
    _, f, r = kmer_windows(codes, k)
    canon = np.minimum(f, r).astype(np.int64)
    kmers, counts = np.unique(canon, return_counts=True)
    return kmers, counts


@pytest.mark.skipif(not os.path.isdir(REF_TESTDATA), reason="reference corpus absent")
def test_global_counts_vs_reference_golden():
    # counter golden: reads.fq k=15 -> expected_counts.part_0_chunk_0
    # (counter/src/lib.rs:252-277, debug mode forces a single partition)
    kmers, counts = global_counts([READ_1, READ_2], 15)
    got = {int(k): int(c) for k, c in zip(kmers, counts)}
    exp = {}
    with open(os.path.join(REF_TESTDATA, "expected_counts.part_0_chunk_0")) as f:
        for line in f:
            a, b = line.split()
            exp[int(a)] = int(b)
    assert got == exp


def test_coverage_histogram_golden():
    # coverage/src/lib.rs:187-242: reads.fq k=4 bin_size=2 bin_count=3
    # norm rows: [0.318841 0.637681 0.043478], [0.188406 0.797101 0.014493]
    # unnorm:    [22 44 3], [13 55 1]   (expected_counts{_unnorm}.vectors)
    kmers, counts = global_counts([READ_1, READ_2], 4)
    lookup = SortedCountLookup(kmers, counts)
    un = coverage_matrix([READ_1, READ_2], 4, lookup, 2, 3, norm=False)
    assert un.tolist() == [[22.0, 44.0, 3.0], [13.0, 55.0, 1.0]]
    no = coverage_matrix([READ_1, READ_2], 4, lookup, 2, 3, norm=True)
    exp = np.array([[0.318841, 0.637681, 0.043478], [0.188406, 0.797101, 0.014493]])
    assert np.abs(no - exp).max() <= 5e-7


def test_coverage_missing_kmer_defaults_zero():
    # coverage/src/lib.rs:171: counts.get(&min_mer).unwrap_or(&0)
    lookup = SortedCountLookup(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    mat = coverage_matrix(["ACGTACGT"], 4, lookup, 2, 3, norm=False)
    assert mat[0, 0] == 5.0  # all 5 k-mers have count 0 -> bin 0


def test_cgr_trajectory_golden():
    # composition/src/cgr.rs:154-187: 23 exact points for
    # "atgatgaaatagagagactttat", vecsize=1
    exp = [
        (0.25, 0.25),
        (0.625, 0.125),
        (0.8125, 0.5625),
        (0.40625, 0.28125),
        (0.703125, 0.140625),
        (0.8515625, 0.5703125),
        (0.42578125, 0.28515625),
        (0.212890625, 0.142578125),
        (0.1064453125, 0.0712890625),
        (0.55322265625, 0.03564453125),
        (0.276611328125, 0.017822265625),
        (0.6383056640625, 0.5089111328125),
        (0.31915283203125, 0.25445556640625),
        (0.659576416015625, 0.627227783203125),
        (0.3297882080078125, 0.3136138916015625),
        (0.6648941040039062, 0.6568069458007812),
        (0.3324470520019531, 0.3284034729003906),
        (0.16622352600097656, 0.6642017364501953),
        (0.5831117630004883, 0.33210086822509766),
        (0.7915558815002441, 0.16605043411254883),
        (0.8957779407501221, 0.08302521705627441),
        (0.44788897037506104, 0.04151260852813721),
        (0.7239444851875305, 0.020756304264068604),
    ]
    got = cgr_trajectory("atgatgaaatagagagactttat", 1.0)
    assert got is not None and got.shape == (23, 2)
    assert np.allclose(got, np.array(exp), rtol=1e-12, atol=1e-15)


def test_cgr_invalid_char_is_none():
    # composition/src/cgr.rs:139: bad nucleotide errors
    assert cgr_trajectory("ACGTN", 1.0) is None


def test_cgr_long_text_stable():
    got = cgr_trajectory("ACGT" * 500, 1.0)
    assert got is not None
    assert np.isfinite(got).all()
    assert (got >= 0).all() and (got <= 1).all()


def test_cgr_batch_bucketed_bit_parity_and_skew():
    """The geometric length-bucket batch path is bit-identical to the
    per-row reference recurrence, including rows that land in different
    buckets, empties, and OOV rows; one huge row among short rows must
    not change any short row's values (padding is bucket-local)."""
    import numpy as np

    from kmertools_spark.oracle.kernels import cgr_batch, cgr_trajectory

    rng = np.random.RandomState(7)
    texts = [
        "".join(rng.choice(list("ACGTUacgtu"), L))
        for L in (1, 2, 3, 7, 8, 50, 63, 64, 65, 500, 4000)
    ] + ["", None, "ACGTN"]
    got = cgr_batch(texts, 16.0)
    for t, g in zip(texts, got):
        if not t:
            assert g is not None and g.shape == (0, 2)
        elif "N" in t:
            assert g is None
        else:
            ref = cgr_trajectory(t, 16.0)
            assert (g == ref).all()

    short = ["ACGTAC"] * 64
    alone = cgr_batch(short)
    with_giant = cgr_batch(["ACGT" * 25000] + short)
    for a, b in zip(alone, with_giant[1:]):
        assert (a == b).all()

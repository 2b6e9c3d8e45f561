"""Minimizer run semantics vs the reference's span tables, plus a
property test: vectorized RLE derivation == imperative deque machine.

Golden spans from kmer/src/minimiser.rs:183-305 and
misc/src/minimisers.rs:162-188 / test_data expected files.
"""

import numpy as np
import pytest

from kmertools_spark.oracle import minimiser_runs, numeric_to_kmer
from kmertools_spark.oracle.reference import minimiser_runs_imperative

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

BLOG_SEQ = (
    "ATGCGATATCGTAGGCGTCGATGGAGAGCTAGATCGATCGATCTAAATCCCGATCGATTCCGAGCGCGATC"
    "AAAGCGCGATAGGCTAGCTAAAGCTAGCA"
)

READ_1 = "GGGTGATGGCCGCTGCCGATGGCGTCAAATCCCACCAAGTTACCCTTAACAACTTAAGGGTTTTCAAATAGA"
READ_2 = "GTTCAGGGATACGACGTTTGTATTTTAAGAATCTGAAGCAGAAGTCGATGATAATACGCGTCGTTTTATCAT"


def spans(text, w, m):
    return [
        (numeric_to_kmer(v, m), text[s:e]) for v, s, e in minimiser_runs(text, w, m)
    ]


def test_blog_sequence_w31_m7():
    # kmer/src/minimiser.rs:183-280: 7 runs with exact substrings
    exp = [
        ("ACGATAT", "ATGCGATATCGTAGGCGTCGATGGAGAGCTAGATCG"),
        ("ACGCCTA", "TATCGTAGGCGTCGATGGAGAGCTAGATCGATCGAT"),
        ("AGAGCTA", "AGGCGTCGATGGAGAGCTAGATCGATCGATCTAAATCC"),
        ("AAATCCC", "ATGGAGAGCTAGATCGATCGATCTAAATCCCGATCGATTCCGAGCGCGATCAAAG"),
        ("AATCCCG", "AATCCCGATCGATTCCGAGCGCGATCAAAGC"),
        ("AATCGAT", "ATCCCGATCGATTCCGAGCGCGATCAAAGCG"),
        ("AAAGCGC", "TCCCGATCGATTCCGAGCGCGATCAAAGCGCGATAGGCTAGCTAAAGCTAGCA"),
    ]
    assert spans(BLOG_SEQ, 31, 7) == exp


def test_with_error_w8_m5():
    # kmer/src/minimiser.rs:282-305: OOV char flushes the open window
    exp = [
        ("ATCGC", "ATGCGATA"),
        ("ATATC", "TGCGATATCG"),
        ("ACGCC", "TAGGCGTCGA"),
        ("ATCGA", "GCGTCGATGGA"),
    ]
    assert spans("ATGCGATATCGNTAGGCGTCGATGGA", 8, 5) == exp


def test_whole_record_binning_w0():
    # misc/src/minimisers.rs:162-177 + expected_minimisers:
    # Read_1 -> AAAACCCTTA [0,72); Read_2 -> AAAACGACGC [0,72)
    (r1,) = minimiser_runs(READ_1, 0, 10)
    (r2,) = minimiser_runs(READ_2, 0, 10)
    assert (numeric_to_kmer(r1[0], 10), r1[1], r1[2]) == ("AAAACCCTTA", 0, 72)
    assert (numeric_to_kmer(r2[0], 10), r2[1], r2[2]) == ("AAAACGACGC", 0, 72)


def test_seq_to_min_w31_m7():
    # expected_seq_minimisers (misc/src/minimisers.rs:180-187)
    exp1 = [
        ("ACGCCAT", 0, 32),
        ("AAATCCC", 2, 57),
        ("AACAACT", 27, 62),
        ("AAACCCT", 32, 63),
        ("AAAACCC", 33, 72),
    ]
    got1 = [(numeric_to_kmer(v, 7), s, e) for v, s, e in minimiser_runs(READ_1, 31, 7)]
    assert got1 == exp1
    exp2 = [
        ("AAAATAC", 0, 50),
        ("AAGAATC", 20, 57),
        ("AAGCAGA", 27, 64),
        ("AACGACG", 34, 65),
        ("AAACGAC", 35, 66),
        ("AAAACGA", 36, 72),
    ]
    got2 = [(numeric_to_kmer(v, 7), s, e) for v, s, e in minimiser_runs(READ_2, 31, 7)]
    assert got2 == exp2


def test_short_segment_emits_nothing_midtext():
    # a segment shorter than w between OOV chars emits nothing
    assert minimiser_runs("ACGTN" + "ACGTACGTACGT", 8, 5) == minimiser_runs(
        "ACGTNACGTACGTACGT", 8, 5
    )


def test_vectorized_matches_imperative_on_edges():
    cases = [
        ("", 8, 5),
        ("ACGT", 8, 5),
        ("ACGTACG", 8, 5),  # exactly one m-mer short of a window
        ("ACGTACGT", 8, 5),  # exactly one window
        ("NNNNNNNN", 8, 5),
        ("ACGTNNNNACGTACGTT", 8, 5),
        ("ACGTACGTN", 8, 5),  # OOV at very end
        (BLOG_SEQ, 31, 7),
        (BLOG_SEQ, 0, 10),
        (READ_1, 12, 4),
        (READ_2, 5, 5),  # w == m (single m-mer windows)
    ]
    for text, w, m in cases:
        assert minimiser_runs(text, w, m) == minimiser_runs_imperative(text, w, m), (
            text,
            w,
            m,
        )


def test_whole_record_batch_matches_per_row():
    from kmertools_spark.oracle.kernels import whole_record_minimisers

    texts = [
        READ_1,
        READ_2,
        "",
        "AC",
        "ACGTNNNN",  # trailing OOV
        "NNNNACGTACGT",  # leading OOV, valid tail
        "ACGTXACG",  # OOV mid, tail too short for m=5
        "acgtacgtu",
        None,
    ]
    m = 5
    rr, vv, ss, ee = whole_record_minimisers(texts, m)
    got = {}
    for i in range(rr.size):
        got.setdefault(int(rr[i]), []).append((int(vv[i]), int(ss[i]), int(ee[i])))
    for i, t in enumerate(texts):
        exp = minimiser_runs(t or "", 0, m) if t and len(t) >= m else []
        assert got.get(i, []) == exp, (i, t)


if HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ACGTNacgt x", min_size=0, max_size=60), max_size=8
        ),
        m=st.integers(min_value=2, max_value=6),
    )
    def test_property_whole_record_batch(texts, m):
        from kmertools_spark.oracle.kernels import whole_record_minimisers

        rr, vv, ss, ee = whole_record_minimisers(texts, m)
        got = {}
        for i in range(rr.size):
            got.setdefault(int(rr[i]), []).append((int(vv[i]), int(ss[i]), int(ee[i])))
        for i, t in enumerate(texts):
            exp = minimiser_runs(t, 0, m) if len(t) >= m else []
            assert got.get(i, []) == exp

    @settings(max_examples=300, deadline=None)
    @given(
        text=st.text(alphabet="ACGTNacgtu x", min_size=0, max_size=120),
        m=st.integers(min_value=2, max_value=7),
        extra=st.integers(min_value=0, max_value=20),
        whole=st.booleans(),
    )
    def test_property_vectorized_equals_imperative(text, m, extra, whole):
        w = 0 if whole else m + extra
        assert minimiser_runs(text, w, m) == minimiser_runs_imperative(text, w, m)


def test_batch_windowed_matches_per_text():
    from kmertools_spark.oracle.kernels import minimiser_runs_batch

    texts = [
        READ_1, READ_2, "", "AC", "ACGTNNNN", "NNNNACGTACGT",
        "ACGTXACG", "acgtacgtu", None, BLOG_SEQ,
        "ACGTACGT",  # exactly one window at w=8
        "ACGTACGTN",  # OOV at very end (flush path)
    ]
    for w, m in [(8, 5), (12, 4), (5, 5), (31, 7), (0, 5), (3, 5)]:
        rr, vv, ss, ee = minimiser_runs_batch(texts, w, m)
        got = {}
        for i in range(rr.size):
            got.setdefault(int(rr[i]), []).append((int(vv[i]), int(ss[i]), int(ee[i])))
        for i, t in enumerate(texts):
            exp = minimiser_runs(t or "", w, m)
            if w == 0 and (not t or len(t) < m):
                exp = []
            assert got.get(i, []) == exp, (i, t, w, m)


if HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ACGTNacgtu x", min_size=0, max_size=80), max_size=6
        ),
        m=st.integers(min_value=2, max_value=6),
        extra=st.integers(min_value=0, max_value=12),
    )
    def test_property_batch_windowed(texts, m, extra):
        from kmertools_spark.oracle.kernels import minimiser_runs_batch

        w = m + extra
        rr, vv, ss, ee = minimiser_runs_batch(texts, w, m)
        got = {}
        for i in range(rr.size):
            got.setdefault(int(rr[i]), []).append((int(vv[i]), int(ss[i]), int(ee[i])))
        for i, t in enumerate(texts):
            assert got.get(i, []) == minimiser_runs(t, w, m), (i, t, w, m)

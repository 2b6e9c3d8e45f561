"""W3 KmerMinimiserGenerator parity (kmer/src/kmer_minimisers.rs:208-331)."""

from kmertools_spark.oracle import numeric_to_kmer
from kmertools_spark.oracle.kernels import kmer_minimiser_runs

BLOG_SEQ = (
    "ATGCGATATCGTAGGCGTCGATGGAGAGCTAGATCGATCGATCTAAATCCCGATCGATTCCGAGCGCGATC"
    "AAAGCGCGATAGGCTAGCTAAAGCTAGCA"
)


def flat(text, w, m):
    out = []
    for v, _s, _e, ks in kmer_minimiser_runs(text, w, m):
        for k in ks:
            out.append((numeric_to_kmer(k, w), numeric_to_kmer(v, m)))
    return out


def test_with_error_w8_m5_full_enumeration():
    # kmer/src/kmer_minimisers.rs:300-330 expected table
    exp = [
        ("ATGCGATA", "ATCGC"),
        ("ATATCGCA", "ATCGC"),
        ("GATATCGC", "ATATC"),
        ("CGATATCG", "ATATC"),
        ("GACGCCTA", "ACGCC"),
        ("AGGCGTCG", "ACGCC"),
        ("GGCGTCGA", "ACGCC"),
        ("ATCGACGC", "ACGCC"),
        ("CATCGACG", "ATCGA"),
        ("CCATCGAC", "ATCGA"),
        ("TCCATCGA", "ATCGA"),
    ]
    assert flat("ATGCGATATCGNTAGGCGTCGATGGA", 8, 5) == exp


def test_blog_sequence_w31_m7_spot_checks():
    # kmer/src/kmer_minimisers.rs:213-298: first rows + totals
    got = flat(BLOG_SEQ, 31, 7)
    assert got[0] == ("ATGCGATATCGTAGGCGTCGATGGAGAGCTA", "ACGATAT")
    assert got[1] == ("CTAGCTCTCCATCGACGCCTACGATATCGCA", "ACGATAT")
    assert got[6] == ("TATCGTAGGCGTCGATGGAGAGCTAGATCGA", "ACGATAT")
    assert got[7] == ("ATCGATCTAGCTCTCCATCGACGCCTACGAT", "ACGCCTA")
    assert got[-1] == ("TCAAAGCGCGATAGGCTAGCTAAAGCTAGCA", "AAAGCGC")
    # every w-mer of the sequence appears exactly once (no losses here)
    assert len(got) == len(BLOG_SEQ) - 31 + 1

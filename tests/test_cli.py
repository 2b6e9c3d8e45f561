"""CLI golden parity: every `kmertools` subcommand reproduces the
reference's checked-in golden outputs (byte- or sorted-line-identical).

Runs in-process (cli.main) against the session Spark fixture to avoid
one JVM per subcommand.
"""

import os

import pytest

from kmertools_spark.cli import main
from kmertools_spark.oracle.codec import numeric_to_kmer

REF = "/root/reference/test_data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus absent"
)
FQ = f"{REF}/reads.fq"


def _sorted_lines(path):
    return sorted(open(path).read().splitlines())


def test_cli_oligo_goldens(spark, tmp_path):
    out = str(tmp_path / "o.kmers")
    assert main(["comp", "oligo", "-i", FQ, "-o", out, "-k", "4"]) == 0
    assert open(out, "rb").read() == open(f"{REF}/expected_fa.kmers", "rb").read()

    assert main(["comp", "oligo", "-i", FQ, "-o", out, "-k", "4", "-H"]) == 0
    assert open(out, "rb").read() == open(f"{REF}/expected_fa_header.kmers", "rb").read()

    assert main(["comp", "oligo", "-i", FQ, "-o", out, "-k", "4", "-c"]) == 0
    assert (
        open(out, "rb").read()
        == open(f"{REF}/expected_fa_batch_unnorm.kmers", "rb").read()
    )


def test_cli_cgr_goldens(spark, tmp_path):
    out = str(tmp_path / "r.cgr")
    assert main(["comp", "cgr", "-i", FQ, "-o", out, "-v", "1"]) == 0
    assert open(out, "rb").read() == open(f"{REF}/expected_reads.cgr", "rb").read()

    out2 = str(tmp_path / "r.k4.cgr")
    assert main(["comp", "cgr", "-i", FQ, "-o", out2, "-k", "4", "-v", "16", "-c"]) == 0
    assert open(out2, "rb").read() == open(f"{REF}/expected_reads.k4.cgr", "rb").read()


def test_cli_ctr_golden(spark, tmp_path):
    # reads.fq k=15 global counts == expected_counts.part_0_chunk_0
    # (counter/src/lib.rs:252-277, debug single-partition golden)
    out = str(tmp_path / "ctr")
    assert main(["ctr", "-i", FQ, "-o", out, "-k", "15"]) == 0
    got = _sorted_lines(f"{out}/kmers.counts")
    exp = _sorted_lines(f"{REF}/expected_counts.part_0_chunk_0")
    assert got == exp

    # ACGT variant: decode of the same table
    out2 = str(tmp_path / "ctr_acgt")
    assert main(["ctr", "-i", FQ, "-o", out2, "-k", "15", "-a"]) == 0
    exp_acgt = sorted(
        f"{numeric_to_kmer(int(line.split()[0]), 15)}\t{line.split()[1]}"
        for line in exp
    )
    assert _sorted_lines(f"{out2}/kmers.counts") == exp_acgt


def test_cli_cov_goldens(spark, tmp_path):
    out = str(tmp_path / "cov")
    assert main(["cov", "-i", FQ, "-o", out, "-k", "4", "-s", "2", "-c", "3"]) == 0
    assert (
        open(f"{out}/kmers.vectors", "rb").read()
        == open(f"{REF}/expected_counts.vectors", "rb").read()
    )
    out2 = str(tmp_path / "cov_un")
    assert main(
        ["cov", "-i", FQ, "-o", out2, "-k", "4", "-s", "2", "-c", "3", "--counts"]
    ) == 0
    assert (
        open(f"{out2}/kmers.vectors", "rb").read()
        == open(f"{REF}/expected_counts_unnorm.vectors", "rb").read()
    )


def test_cli_min_goldens(spark, tmp_path):
    m2s = str(tmp_path / "m2s")
    assert main(["min", "-i", FQ, "-o", m2s, "-m", "10", "-w", "0", "-p", "m2s"]) == 0
    assert _sorted_lines(m2s) == _sorted_lines(f"{REF}/expected_minimisers")

    s2m = str(tmp_path / "s2m")
    assert main(["min", "-i", FQ, "-o", s2m, "-m", "7", "-w", "31", "-p", "s2m"]) == 0
    assert _sorted_lines(s2m) == _sorted_lines(f"{REF}/expected_seq_minimisers")


def test_cli_arg_validation(spark, tmp_path):
    # F2: range/consistency validation parity (kmertools/src/args.rs:327-334)
    out = str(tmp_path / "x")
    assert main(["min", "-i", FQ, "-o", out, "-m", "10", "-w", "5", "-p", "s2m"]) == 2
    assert main(["min", "-i", FQ, "-o", out, "-m", "31", "-w", "40", "-p", "s2m"]) == 2
    assert main(["comp", "oligo", "-i", FQ, "-o", out, "-k", "9"]) == 2
    assert main(["ctr", "-i", FQ, "-o", out, "-k", "5"]) == 2

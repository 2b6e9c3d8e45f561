"""`kmertools`-compatible command-line surface.

Mirrors the reference CLI (kmertools/src/args.rs): `comp oligo`,
`comp cgr`, `cov`, `min`, `ctr` with the same flags, defaults, argument
ranges and output file formats — so a reference user can run the same
commands against Spark:

    python -m kmertools_spark comp oligo -i reads.fq -o out.kmers -k 4
    python -m kmertools_spark ctr -i reads.fq -o outdir -k 15
    python -m kmertools_spark min -i reads.fq -o out.mins -m 10 -p m2s

Outputs are byte/line-compatible with the reference's golden files
(vectors at 6 dp, counts as `kmer\\tcount` TSV, minimizer m2s/s2m text
formats, CGR tuple text with Rust f64 Display formatting).
"""

from __future__ import annotations

import argparse
import os
import sys
from decimal import Decimal

from pyspark.sql import functions as F


def rust_f64(v: float) -> str:
    """Format a double exactly like Rust's `{}` Display: shortest
    roundtrip decimal, never scientific, no trailing `.0`."""
    r = repr(float(v))
    if "e" in r or "E" in r:
        r = format(Decimal(r), "f")
    if r.endswith(".0"):
        r = r[:-2]
    return r


_DELIM = {"csv": ",", "tsv": "\t", "spc": " "}


def _spark():
    from .session import get_spark

    return get_spark("kmertools-cli")


def _read(spark, path):
    from .sources.fastx import read_fastx

    return read_fastx(spark, path)


def cmd_comp_oligo(a) -> int:
    # dispatch parity: kmertools/src/args.rs:242-263
    from .functions import composition_vector, vector_header
    from .sources.fastx import write_vectors_text

    if not (3 <= a.k_size <= 7):
        print("error: k_size must be in 3..=7", file=sys.stderr)
        return 2
    spark = _spark()
    df = _read(spark, a.input)
    norm = not a.counts
    udf = composition_vector(a.k_size, canonical=not a.raw_count, norm=norm)
    out = df.withColumn("vec", udf(F.col("seq")))
    header = None
    if a.header:
        header = _DELIM[a.preset].join(
            vector_header(a.k_size, canonical=not a.raw_count)
        )
    write_vectors_text(
        out, a.output, vec_col="vec", order_col="n",
        delim=_DELIM[a.preset], norm=norm, header=header,
    )
    return 0


def cmd_comp_cgr(a) -> int:
    # kmertools/src/args.rs:264-297: k set -> oligo-CGR, else whole-seq CGR
    from .oracle.codec import kmer_pos_maps, numeric_to_kmer
    from .oracle.kernels import cgr_batch, cgr_trajectory, composition_matrix

    # validate BEFORE open(): the reference rejects these without
    # touching the output file — open-first truncated a pre-existing
    # output on the error path (code-review r4); clap range parity for
    # k (args.rs:120 3..=7)
    if a.k_size is not None and not (3 <= a.k_size <= 7):
        print("error: k_size must be in 3..=7", file=sys.stderr)
        return 2
    if a.k_size is None and a.counts:
        print("Error: cannot use counts in whole sequence CGR!", file=sys.stderr)
        return 2
    spark = _spark()
    rows = _read(spark, a.input).orderBy("n").select("seq").collect()
    seqs = [r.seq for r in rows]
    with open(a.output, "w") as f:
        if a.k_size is not None:
            vecsize = a.vec_size if a.vec_size is not None else int(
                (float(a.k_size) ** 4.0) ** 0.5
            )
            pos_map, pos_kmer, kcount = kmer_pos_maps(a.k_size)
            # per-slot CGR coords of the k-mer string (k steps from center)
            coords = []
            for v in pos_kmer:
                tr = cgr_trajectory(numeric_to_kmer(int(v), a.k_size), float(vecsize))
                coords.append(tuple(tr[-1]))
            freqs = composition_matrix(
                seqs, a.k_size, canonical=True, norm=not a.counts,
                pos_map=pos_map, kcount=kcount,
            )
            for row in freqs:
                items = [
                    f"({rust_f64(x)},{rust_f64(y)},{rust_f64(fr)})"
                    for (x, y), fr in zip(coords, row)
                ]
                f.write(" ".join(items) + "\n")
        else:
            vecsize = a.vec_size if a.vec_size is not None else 1
            for tr in cgr_batch(seqs, float(vecsize)):
                if tr is None:
                    print("Error: Bad nucleotide, unable to proceed", file=sys.stderr)
                    return 1
                f.write(
                    " ".join(f"({rust_f64(x)},{rust_f64(y)})" for x, y in tr) + "\n"
                )
    return 0


def cmd_ctr(a) -> int:
    # kmertools/src/args.rs:353-366; output <out>/kmers.counts
    from .operators import global_kmer_counts
    from .oracle.codec import numeric_to_kmer

    if not (10 <= a.k_size <= 31):
        print("error: k_size must be in 10..32", file=sys.stderr)
        return 2
    spark = _spark()
    df = _read(spark, a.input).withColumnRenamed("seq", "text")
    counts = global_kmer_counts(df, k=a.k_size).orderBy("kmer").collect()
    os.makedirs(a.output, exist_ok=True)
    with open(os.path.join(a.output, "kmers.counts"), "w") as f:
        for r in counts:
            key = numeric_to_kmer(r.kmer, a.k_size) if a.acgt else str(r.kmer)
            f.write(f"{key}\t{r.cnt}\n")
    return 0


def cmd_cov(a) -> int:
    # kmertools/src/args.rs:299-325; <out>/kmers.counts + <out>/kmers.vectors
    from .operators import coverage_features, global_kmer_counts
    from .sources.fastx import write_vectors_text

    # clap range parity (args.rs:148 k 7..=31, :156/:160 bins 5..); the
    # LIBRARY accepts any k — the reference's own unit tests drive
    # coverage/src/lib.rs at k=4 below the CLI range
    if not (7 <= a.k_size <= 31):
        print("error: k_size must be in 7..=31", file=sys.stderr)
        return 2
    if a.bin_size < 5 or a.bin_count < 5:
        print("error: bin_size and bin_count must be >= 5", file=sys.stderr)
        return 2
    spark = _spark()
    df = _read(spark, a.input).withColumnRenamed("seq", "text")
    kmer_src = (
        _read(spark, a.alt_input).withColumnRenamed("seq", "text")
        if a.alt_input
        else df
    )
    # cache: the count aggregation (the dominant scan at large k) is
    # consumed twice — the kmers.counts dump AND coverage_features'
    # broadcast/join — and used to recompute in full (code-review r5)
    counts = global_kmer_counts(kmer_src, k=a.k_size).cache()
    os.makedirs(a.output, exist_ok=True)
    with open(os.path.join(a.output, "kmers.counts"), "w") as f:
        for r in counts.orderBy("kmer").collect():
            f.write(f"{r.kmer}\t{r.cnt}\n")
    norm = not a.counts
    # the fastx frame is keyed by record ordinal `n`, not transcript
    # keys — pass it so the k>12 join strategy works through the CLI
    cov = coverage_features(
        df, counts, k=a.k_size, bin_size=a.bin_size, bin_count=a.bin_count,
        norm=norm, keys=("n",),
    )
    write_vectors_text(
        cov, os.path.join(a.output, "kmers.vectors"),
        vec_col="cov_vec", order_col="n", delim=_DELIM[a.preset], norm=norm,
    )
    counts.unpersist()
    return 0


def cmd_min(a) -> int:
    # kmertools/src/args.rs:326-352; m2s/s2m text formats
    # (misc/src/minimisers.rs:78-84, :125-137)
    from .functions import exploded_minimisers
    from .oracle.codec import numeric_to_kmer

    # clap range parity first (args.rs:188 m 7..=28), then the runtime
    # consistency checks (args.rs:327-334 order)
    if not (7 <= a.m_size <= 28):
        print("error: m_size must be in 7..=28", file=sys.stderr)
        return 2
    if a.w_size < 0:
        # clap parses w as u64: a negative value is a usage error, and
        # letting it through bypassed the w>m check (code-review r4)
        print("error: w_size must be >= 0", file=sys.stderr)
        return 2
    if a.w_size <= a.m_size and a.w_size > 0:
        print("Window size must be longer than minimiser size!", file=sys.stderr)
        return 2
    spark = _spark()
    df = _read(spark, a.input).withColumnRenamed("seq", "text")
    runs = exploded_minimisers(
        df, w=a.w_size, m=a.m_size, keys=("n", "id")
    ).orderBy("n", "win_start").collect()
    if a.preset == "m2s":
        postings: dict[str, list[tuple[str, int, int]]] = {}
        for r in runs:
            postings.setdefault(
                numeric_to_kmer(r.mmer, a.m_size), []
            ).append((r.id, r.win_start, r.win_end))
        with open(a.output, "w") as f:
            for key in postings:  # reference order is map-iteration (unordered)
                body = ", ".join(f'("{i}", {s}, {e})' for i, s, e in postings[key])
                f.write(f"{key}\t[{body}]\n")
    else:  # s2m
        by_rec: dict[int, list[str]] = {}
        for r in runs:
            by_rec.setdefault(r.n, []).append(
                f"{numeric_to_kmer(r.mmer, a.m_size)}:{r.win_start}-{r.win_end}"
            )
        # one line per RECORD: the reference's seq_to_min pushes every
        # record id unconditionally (misc/src/minimisers.rs), so a read
        # too short for any minimiser still gets its id line
        # (code-review r4 — zero-minimiser records were dropped)
        recs = df.select("n", "id").orderBy("n").collect()
        with open(a.output, "w") as f:
            for rec in recs:
                # checked-in golden has no trailing tab (expected_seq_minimisers)
                f.write("\t".join([rec.id, *by_rec.get(rec.n, [])]) + "\n")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kmertools_spark",
        description="kmertools-compatible CLI over the PySpark engine",
    )
    sub = p.add_subparsers(dest="command", required=True)

    comp = sub.add_parser("comp", help="generate sequence composition")
    csub = comp.add_subparsers(dest="comp_command", required=True)

    oligo = csub.add_parser("oligo", help="oligo frequency vectors")
    oligo.add_argument("-i", "--input", required=True)
    oligo.add_argument("-o", "--output", required=True)
    oligo.add_argument("-c", "--counts", action="store_true")
    oligo.add_argument("-k", "--k-size", type=int, default=3)
    oligo.add_argument("-r", "--raw-count", action="store_true")
    oligo.add_argument("-p", "--preset", choices=list(_DELIM), default="spc")
    oligo.add_argument("-H", "--header", action="store_true")
    oligo.add_argument("-t", "--threads", type=int, default=0)
    oligo.set_defaults(fn=cmd_comp_oligo)

    cgr = csub.add_parser("cgr", help="chaos game representations")
    cgr.add_argument("-i", "--input", required=True)
    cgr.add_argument("-o", "--output", required=True)
    cgr.add_argument("-c", "--counts", action="store_true")
    cgr.add_argument("-k", "--k-size", type=int, default=None)
    cgr.add_argument("-v", "--vec-size", type=int, default=None)
    cgr.add_argument("-t", "--threads", type=int, default=0)
    cgr.set_defaults(fn=cmd_comp_cgr)

    cov = sub.add_parser("cov", help="coverage histograms")
    cov.add_argument("-i", "--input", required=True)
    cov.add_argument("-o", "--output", required=True)
    cov.add_argument("-a", "--alt-input", default=None)
    cov.add_argument("-k", "--k-size", type=int, default=15)
    cov.add_argument("-p", "--preset", choices=list(_DELIM), default="spc")
    cov.add_argument("-s", "--bin-size", type=int, default=16)
    cov.add_argument("-c", "--bin-count", type=int, default=16)
    cov.add_argument("-m", "--memory", type=int, default=6)
    cov.add_argument("--counts", dest="counts", action="store_true")
    cov.add_argument("-t", "--threads", type=int, default=0)
    cov.set_defaults(fn=cmd_cov)

    mn = sub.add_parser("min", help="minimizer binning")
    mn.add_argument("-i", "--input", required=True)
    mn.add_argument("-o", "--output", required=True)
    mn.add_argument("-m", "--m-size", type=int, default=10)
    mn.add_argument("-w", "--w-size", type=int, default=0)
    mn.add_argument("-p", "--preset", choices=["m2s", "s2m"], default="s2m")
    mn.add_argument("-t", "--threads", type=int, default=0)
    mn.set_defaults(fn=cmd_min)

    ctr = sub.add_parser("ctr", help="global k-mer counting")
    ctr.add_argument("-i", "--input", required=True)
    ctr.add_argument("-o", "--output", required=True)
    ctr.add_argument("-k", "--k-size", type=int, required=True)
    ctr.add_argument("-m", "--memory", type=int, default=6)
    ctr.add_argument("-a", "--acgt", action="store_true")
    ctr.add_argument("-t", "--threads", type=int, default=0)
    ctr.set_defaults(fn=cmd_ctr)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (OSError, ValueError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())

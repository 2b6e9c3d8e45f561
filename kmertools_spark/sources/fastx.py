"""FASTA/FASTQ sources + delimited vector sink (S1/S2/S5/S6 parity).

The engine's primary input is a transcripts table, but for golden-file
parity with the reference these readers load its native formats into
the Sequence{n, id, seq} shape (ktio/src/seq.rs:12-16) as a DataFrame
(n:long, id:string, seq:string).

Format resolution mirrors SeqFormat::get (ktio/src/seq.rs:30-42):
extension with optional .gz suffix; '-' reads stdin with first-byte
format sniffing (get_reader ktio/src/seq.rs:141-155 +
composition/src/oligo.rs:96-106).

Scale note: FASTA records span lines, so a plain line-based reader
cannot split files safely; this reader is driver-side for golden
corpora (the reference's test corpus is 2 reads). A production-scale
FASTA source would use a custom Hadoop InputFormat or chunked
mapPartitions with boundary handshaking — out of scope because the
engine's real input is the transcripts table.
"""

from __future__ import annotations

import gzip
import io
import os
import sys

from pyspark.sql import DataFrame, SparkSession

SCHEMA = "n long, id string, seq string"


def _open(path: str):
    """File / gzip / stdin ('-') reader — get_reader parity
    (ktio/src/seq.rs:141-155)."""
    if path == "-":
        return sys.stdin
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path)


def infer_format(path: str) -> str:
    """'fasta' | 'fastq' from extension, .gz stripped (ktio/src/seq.rs:30-42)."""
    base = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(base)[1].lower()
    if ext in (".fasta", ".fa", ".fna"):
        return "fasta"
    if ext in (".fastq", ".fq"):
        return "fastq"
    raise ValueError(f"cannot infer sequence format from {path!r}")


def read_fastx(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Load a FASTA/FASTQ file (or stdin via '-') as (n, id, seq) rows.

    For stdin the format is sniffed from the first byte — '>' means
    FASTA, anything else FASTQ — exactly like the reference's batch
    path (composition/src/oligo.rs:96-106).
    """
    f = _open(path)
    if path == "-":
        buffered = io.StringIO(f.read())
        fmt = fmt or ("fasta" if buffered.getvalue()[:1] == ">" else "fastq")
        f = buffered
    else:
        fmt = fmt or infer_format(path)
    rows: list[tuple[int, str, str]] = []
    with f:
        if fmt == "fastq":
            n = 0
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().strip()
                f.readline()  # +
                f.readline()  # quality
                rows.append((n, header.strip()[1:].split()[0], seq))
                n += 1
        else:
            n = -1
            rid, parts = "", []
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if n >= 0:
                        rows.append((n, rid, "".join(parts)))
                    n += 1
                    rid = line[1:].split()[0]
                    parts = []
                else:
                    parts.append(line)
            if n >= 0:
                rows.append((n, rid, "".join(parts)))
    return spark.createDataFrame(rows, SCHEMA)


def seq_stats(df: DataFrame) -> tuple[int, int]:
    """(seq_count, total_length) — Sequences::seq_stats parity
    (ktio/src/seq.rs:69-94)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("c"), F.sum(F.length("seq")).alias("l")
    ).first()
    return int(row["c"]), int(row["l"] or 0)


def write_vectors_text(
    df: DataFrame,
    path: str,
    vec_col: str = "vec",
    order_col: str = "n",
    delim: str = " ",
    norm: bool = True,
) -> None:
    """Delimited text sink with the reference's float format (S5/S6).

    Lines ordered by ``order_col`` (the determinism the reference gets
    from mmap offsets, composition/src/oligo.rs:215-218, we get from a
    sort); floats printed {:.6f} (NUMBER_SIZE-2, oligo.rs:134),
    raw counts printed bare. Driver-side writer — used only for
    byte-identical golden comparisons against the reference corpus.
    """
    rows = df.orderBy(order_col).select(vec_col).collect()
    with open(path, "w") as f:
        for r in rows:
            vals = r[0]
            if norm:
                f.write(delim.join(f"{v:.6f}" for v in vals) + "\n")
            else:
                f.write(delim.join(f"{int(v)}" for v in vals) + "\n")

"""FASTA/FASTQ sources + delimited vector sink (S1/S2/S5/S6 parity).

The engine's primary input is a transcripts table, but for golden-file
parity with the reference these readers load its native formats into
the Sequence{n, id, seq} shape (ktio/src/seq.rs:12-16) as a DataFrame
(n:long, id:string, seq:string).

Format resolution mirrors SeqFormat::get (ktio/src/seq.rs:30-42):
extension with optional .gz suffix; '-' reads stdin with first-byte
format sniffing (get_reader ktio/src/seq.rs:141-155 +
composition/src/oligo.rs:96-106).

Two readers: ``read_fastx`` is driver-side (golden corpora — the
reference's test corpus is 2 reads; also the stdin path), and
``read_fastx_distributed`` is the corpus-scale source: Spark text
splits + a two-phase per-partition scan that assigns global record
ordinals and handshakes FASTA records across partition boundaries
without a custom InputFormat (equality-tested against the driver-side
reader under forced multi-partition splits).
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


def read_fastx_distributed(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Distributed FASTA/FASTQ source — the corpus-scale reader.

    The driver-side reader above exists for byte-golden parity on the
    reference's 2-read corpus; this one streams arbitrarily large
    inputs (ktio/src/seq.rs:97-139's role) through Spark's text source:

      * records are assigned GLOBAL ordinals with the classic two-phase
        scan: one distributed pass counts records per partition, the
        tiny per-partition totals come back to the driver, and their
        exclusive prefix sum is broadcast so a second pass labels every
        record without any shuffle or global sort;
      * FASTA records span lines, so pass 1 also carries each
        partition's dangling tail (the lines after its last '>') to be
        prepended to the next partition — boundary handshaking without
        a custom InputFormat;
      * FASTQ is strictly 4 lines/record, so record id = line_no // 4
        over the same per-partition line-count prefix.

    Plain-text inputs split into many partitions; .gz inputs are one
    partition per file (gzip is not splittable — use many files at
    corpus scale). Output schema/order matches read_fastx exactly.

    Splits come from ``sc.textFile`` (Hadoop TextInputFormat), whose
    partition order is per-file offset order with files in listing
    order — the stitching below depends on that. The DataFrame text
    source is NOT usable here: its FilePartition packing sorts splits
    by length descending, which would scramble multi-file ordinals and
    corrupt cross-partition record assembly.
    """
    fmt = fmt or infer_format(path)
    sc = spark.sparkContext
    lines = (
        sc.textFile(path, min_partitions) if min_partitions else sc.textFile(path)
    )

    if fmt == "fastq":
        counts = lines.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        offs = [0]
        for c in counts[:-1]:
            offs.append(offs[-1] + c)
        boffs = sc.broadcast(offs)

        def label_fq(pi, it):
            base = boffs.value[pi]
            for j, line in enumerate(it):
                ln = base + j
                yield ln // 4, ln % 4, line

        def assemble_fq(kv):
            d = dict(kv[1])
            if 0 not in d:  # truncated leading fragment: no header line
                return None
            # missing seq line (truncated trailing record) -> empty seq,
            # matching the driver-side reader's readline() behavior
            return kv[0], d[0].strip()[1:].split()[0], d.get(1, "").strip()

        recs = (
            lines.mapPartitionsWithIndex(label_fq)
            .filter(lambda t: t[1] < 2)  # header + seq lines only
            .map(lambda t: (t[0], (t[1], t[2])))
            .groupByKey()
            .map(assemble_fq)
            .filter(lambda t: t is not None)
        )
        return spark.createDataFrame(recs, SCHEMA)

    # FASTA: pass 1 — per partition: header count + the "head" lines
    # that precede its first '>' (they belong to a record owned by an
    # earlier partition)
    def scan_fa(pi, it):
        n_headers = 0
        head: list[str] = []
        for line in it:
            if line.startswith(">"):
                n_headers += 1
            elif n_headers == 0:
                head.append(line)
        yield pi, n_headers, head

    parts = sorted(lines.mapPartitionsWithIndex(scan_fa).collect())
    offs = [0]
    for _, c, _ in parts[:-1]:
        offs.append(offs[-1] + c)
    meta = {pi: (c, head) for pi, c, head in parts}
    b = sc.broadcast((offs, meta))

    def label_fa(pi, it):
        # items keyed by global record id; (pi, line_no) orders the
        # record's lines across partition boundaries at assembly
        offs, meta = b.value
        rid = offs[pi] - 1  # last record of an earlier partition
        own = offs[pi]  # first record this partition owns
        for j, line in enumerate(it):
            if line.startswith(">"):
                rid += 1
                yield rid, (pi, j, 0, line[1:].split()[0])
            elif rid >= own:
                yield rid, (pi, j, 1, line.strip())
            # lines with rid < own are this partition's head: the owner
            # partition emits them below
        if meta[pi][0] == 0:
            return  # no header here: nothing owned, no carry to claim
        # my last record continues through the head lines of following
        # partitions, crossing any partition that has no header at all
        j = pi + 1
        while j in meta:
            nh, head = meta[j]
            for i, line in enumerate(head):
                yield rid, (j, i, 1, line.strip())
            if nh > 0:
                break
            j += 1

    def assemble(kv):
        rid, items = kv
        items = sorted(items, key=lambda t: (t[0], t[1]))
        name = next(v for _, _, o, v in items if o == 0)
        seq = "".join(v for _, _, o, v in items if o == 1)
        return rid, name, seq

    recs = (
        lines.mapPartitionsWithIndex(label_fa)
        .filter(lambda t: t[0] >= 0)
        .groupByKey()
        .map(assemble)
    )
    return spark.createDataFrame(recs, SCHEMA)

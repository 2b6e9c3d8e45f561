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
``read_fastx_distributed`` is the corpus-scale source: driver-planned
byte-range splits + a tiny count pass for global record ordinals +
mapInPandas assembly with overscan across split boundaries — ZERO
shuffle of record data (plan-asserted; equality-tested against the
driver-side reader under forced multi-partition splits).
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
                hs = header.strip()
                seq = f.readline().strip()
                f.readline()  # +
                f.readline()  # quality
                if not hs and not seq:
                    continue  # trailing blank line(s): not a record
                toks = hs[1:].split()
                # bare '@' header: id "" (matches the distributed reader;
                # the old [0] indexing crashed on it — code-review r4)
                rows.append((n, toks[0] if toks else "", seq))
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
    header: str | None = None,
) -> None:
    """Delimited text sink with the reference's float format (S5/S6).

    Lines ordered by ``order_col`` (the determinism the reference gets
    from mmap offsets, composition/src/oligo.rs:215-218, we get from a
    sort); floats printed {:.6f} (NUMBER_SIZE-2, oligo.rs:134),
    raw counts printed bare. ``header`` (the -H line) is written first,
    streamed with the body — the CLI used to rewrite the whole file to
    prepend it (code-review r5). Driver-side writer — used only for
    byte-identical golden comparisons against the reference corpus.
    """
    rows = df.orderBy(order_col).select(vec_col).collect()
    with open(path, "w") as f:
        if header is not None:
            f.write(header + "\n")
        for r in rows:
            vals = r[0]
            if norm:
                f.write(delim.join(f"{v:.6f}" for v in vals) + "\n")
            else:
                f.write(delim.join(f"{int(v)}" for v in vals) + "\n")


# --------------------------------------------------------------------
# Distributed byte-range reader (zero-shuffle corpus-scale ingest)
# --------------------------------------------------------------------

_SCAN_CHUNK = 1 << 20


def _parse_bytes(v: str) -> int:
    """'1024' / '134217728b' / '128m' / '128MB' / '64kb' -> bytes
    (the full Spark byte-size conf syntax: optional k/m/g/t prefix,
    optional trailing 'b')."""
    s = str(v).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if s.endswith(suf):
            s = s[: -len(suf)]
            mult = m
            break
    return int(float(s) * mult)


def _list_fastx_files(path: str) -> list[str]:
    """Expand a file / directory / glob into a sorted file list — the
    same lexicographic listing order Hadoop's FileInputFormat uses, so
    global record ordinals are stable across engines."""
    import glob as _glob

    matches = sorted(_glob.glob(path)) or ([path] if os.path.exists(path) else [])
    files: list[str] = []
    for m in matches:
        if os.path.isdir(m):
            files.extend(
                sorted(
                    os.path.join(m, f)
                    for f in os.listdir(m)
                    if not f.startswith((".", "_"))
                    and os.path.isfile(os.path.join(m, f))
                )
            )
        else:
            files.append(m)
    if not files:
        raise FileNotFoundError(path)
    return files


def _plan_splits(files: list[str], split_bytes: int) -> list[tuple[str, int, int, bool]]:
    """(path, start, end, is_gz) byte-range splits, file-listing order.

    .gz files are one whole-file split (gzip is not splittable — ship
    many files at corpus scale, exactly like Hadoop)."""
    splits: list[tuple[str, int, int, bool]] = []
    for p in files:
        size = os.path.getsize(p)
        if size == 0:
            continue
        if p.endswith(".gz"):
            splits.append((p, 0, size, True))
            continue
        s = 0
        while s < size:
            splits.append((p, s, min(s + split_bytes, size), False))
            s += split_bytes
    return splits


def _count_fasta_split(path: str, start: int, end: int, gz: bool) -> int:
    """Headers OWNED by this split: '>' at a line start whose byte
    offset is in [start, end) (BOF counts as a line start)."""
    if gz:
        n = 0
        prev = b"\n"  # BOF is a line start
        with gzip.open(path, "rb") as f:
            while True:
                chunk = f.read(_SCAN_CHUNK)
                if not chunk:
                    return n
                n += (prev + chunk).count(b"\n>")
                prev = chunk[-1:]
    with open(path, "rb") as f:
        if start == 0:
            f.seek(0)
            buf = f.read(end)
            return (1 if buf[:1] == b">" else 0) + buf.count(b"\n>")
        f.seek(start - 1)
        # pairs found here have '>' at offsets [start, end) exactly
        return f.read(end - start + 1).count(b"\n>")


def _count_fastq_split(path: str, start: int, end: int, gz: bool) -> int:
    """Lines STARTING in this split (BOF or the byte after a '\\n')."""
    if gz:
        return _count_gz_lines_exact(path)
    with open(path, "rb") as f:
        if start == 0:
            f.seek(0)
            buf = f.read(end)
            return (1 if buf else 0) + buf.count(b"\n", 0, max(0, len(buf) - 1))
        f.seek(start - 1)
        buf = f.read(end - start + 1)
        # '\n' at [start-1, end-1) start lines at [start, end)
        return buf.count(b"\n", 0, max(0, len(buf) - 1))


def _count_gz_lines_exact(path: str) -> int:
    """Lines in a .gz file under the 'starts' convention (no phantom
    line after a trailing newline)."""
    n = 0
    last = b""
    empty = True
    with gzip.open(path, "rb") as f:
        while True:
            chunk = f.read(_SCAN_CHUNK)
            if not chunk:
                break
            empty = False
            n += chunk.count(b"\n")
            last = chunk[-1:]
    if empty:
        return 0
    return n + (0 if last == b"\n" else 1)


def _fasta_owned_bytes(f, start: int, end: int) -> bytes:
    """Bytes of every record whose header starts in [start, end): from
    the first owned '>' through the char before the first '>' at offset
    >= end (overscan — records spanning split boundaries are completed
    by reading into the next splits' byte ranges, never shuffled)."""
    if start == 0:
        f.seek(0)
        buf = f.read(end)
        if buf[:1] == b">":
            h0 = 0
        else:
            i = buf.find(b"\n>")
            if i == -1:
                return b""
            h0 = i + 1
    else:
        f.seek(start - 1)
        buf = f.read(end - start + 1)
        i = buf.find(b"\n>")
        if i == -1:
            return b""
        h0 = i + 1
    # overscan: finish the last owned record — read until the next
    # header ('\n>' whose '>' is at absolute offset >= end) or EOF
    parts = [buf[h0:]]
    carry = buf[-1:]
    while True:
        chunk = f.read(_SCAN_CHUNK)
        if not chunk:
            break
        s = carry + chunk
        i = s.find(b"\n>")
        if i != -1:
            parts.append(chunk[: i + 1 - len(carry)])
            break
        parts.append(chunk)
        carry = chunk[-1:]
    return b"".join(parts)


def _parse_fasta_records(data: bytes):
    """data starts at a '>' — yields (name, seq) per record, matching
    the driver-side reader's per-line strip + first-token semantics.

    Fast path: when a body contains no space/tab/CR, per-line strip is
    the identity, so the line join collapses to one replace(b'\\n') —
    measured 2x the per-line loop; bodies with intra-line whitespace
    (rare, but semantically meaningful) take the exact per-line path.
    """
    if not data:
        return
    for rec in data[1:].split(b"\n>"):
        nl = rec.find(b"\n")
        if nl == -1:
            header, body = rec, b""
        else:
            header, body = rec[:nl], rec[nl + 1 :]
        toks = header.strip().split()
        name = toks[0].decode("utf-8", "replace") if toks else ""
        # bytes.strip() removes all six ASCII whitespace bytes — the
        # fast path is valid only when none besides '\n' is present
        if not (
            b" " in body
            or b"\t" in body
            or b"\r" in body
            or b"\x0b" in body
            or b"\x0c" in body
        ):
            seq = body.replace(b"\n", b"")
        else:
            seq = b"".join(ln.strip() for ln in body.split(b"\n"))
        yield name, seq.decode("utf-8", "replace")


def _tail_lines(f, carry: bytes):
    """Lazy line stream for the (at most one) boundary record whose
    lines continue past the split's byte range; ``carry`` is the unread
    prefix of the first such line."""
    while True:
        chunk = f.read(_SCAN_CHUNK)
        if not chunk:
            if carry:
                yield carry
            return
        carry += chunk
        sub = carry.split(b"\n")
        carry = sub.pop()
        yield from sub


def _fq_span_lines(f, start: int, end: int, whole: bool) -> tuple[list, bytes]:
    """(complete owned lines, carry) for a FASTQ split: one read of the
    byte range, one vectorized split — no per-line buffer copying.
    ``carry`` is the in-range prefix of the last started line (finished
    lazily via _tail_lines only when a boundary record needs it)."""
    if whole:
        f.seek(0)
        buf = f.read()
    else:
        pos0 = max(0, start - 1)
        f.seek(pos0)
        buf = f.read(end - pos0)
    parts = buf.split(b"\n")
    if not whole and start > 0:
        parts = parts[1:]  # tail of a line owned by the previous split
    carry = parts.pop() if parts else b""
    return parts, carry


def read_fastx_distributed(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    min_partitions: int | None = None,
    split_bytes: int | None = None,
) -> DataFrame:
    """Distributed FASTA/FASTQ source — the zero-shuffle corpus reader.

    The driver-side reader above exists for byte-golden parity on the
    reference's 2-read corpus; this one streams arbitrarily large
    inputs (ktio/src/seq.rs:97-139's role) as planned byte-range splits:

      * the driver lists files (sorted) and plans [start, end) splits of
        ``split_bytes`` (default spark.sql.files.maxPartitionBytes);
      * pass 1 (tiny): one task per split counts owned record starts
        (FASTA: '>' at a line start in-range; FASTQ: lines starting
        in-range, records being strictly 4 lines). Only per-split WORD
        COUNTS return to the driver — never record content — so a
        record body of any size (chromosome-scale FASTA) never touches
        driver memory;
      * pass 2: ``mapInPandas`` over one-split-per-partition descriptor
        rows. Each task reads its byte range directly, assembles owned
        records locally, and OVERSCANS past its end to complete the
        last record (reading into the following splits' ranges — the
        boundary handshake is sequential file I/O, not a shuffle).
        Global ordinals come from the broadcast pass-1 prefix sums.

    NOTHING shuffles: the only exchange-free plan is Scan(descriptors)
    -> MapInPandas (plan-asserted in tests), record bytes move straight
    from storage to Arrow batches. .gz files are one split each (gzip
    is not splittable — ship many files at corpus scale). Output
    schema/order matches read_fastx exactly.

    Local paths here; on a cluster the per-task ``open`` swaps for an
    fsspec/Hadoop-FS handle — the split planning and ownership math are
    storage-agnostic.
    """
    import pandas as pd

    try:
        fmt = fmt or infer_format(path.rstrip("*"))
    except ValueError:
        fmt = None
    files = _list_fastx_files(path)
    fmt = fmt or infer_format(files[0])

    if split_bytes is None:
        total = sum(os.path.getsize(p) for p in files)
        if min_partitions:
            split_bytes = max(1, -(-total // min_partitions))
        else:
            split_bytes = _parse_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
            )
    splits = _plan_splits(files, split_bytes)
    if not splits:
        return spark.createDataFrame([], SCHEMA)

    sc = spark.sparkContext

    if fmt == "fasta":
        counts = (
            sc.parallelize(list(enumerate(splits)), len(splits))
            .map(lambda t: (t[0], _count_fasta_split(*t[1])))
            .collect()
        )
        base = 0
        rec0 = {}
        for i, c in sorted(counts):
            rec0[i] = base
            base += c
        desc = [
            (i, p, s, e, gz, rec0[i]) for i, (p, s, e, gz) in enumerate(splits)
        ]
        ddf = spark.createDataFrame(
            sc.parallelize(desc, len(desc)),
            "sid int, path string, start long, end long, gz boolean, rec0 long",
        )

        def gen_fa(batches):
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    if row.gz:
                        with gzip.open(row.path, "rb") as f:
                            data = f.read()
                        if data[:1] != b">":
                            i = data.find(b"\n>")
                            data = data[i + 1 :] if i != -1 else b""
                    else:
                        with open(row.path, "rb") as f:
                            data = _fasta_owned_bytes(f, row.start, row.end)
                    ns, ids, seqs = [], [], []
                    rid = row.rec0
                    for name, seq in _parse_fasta_records(data):
                        ns.append(rid)
                        ids.append(name)
                        seqs.append(seq)
                        rid += 1
                    if ns:
                        yield pd.DataFrame({"n": ns, "id": ids, "seq": seqs})

        return ddf.mapInPandas(gen_fa, SCHEMA)

    # FASTQ: line-count prefix sums give exact record ownership with no
    # header-sniffing heuristic (records are strictly 4 lines).
    counts = (
        sc.parallelize(list(enumerate(splits)), len(splits))
        .map(lambda t: (t[0], _count_fastq_split(*t[1])))
        .collect()
    )
    cmap = dict(counts)
    # per-file line prefix sums; record ordinals accumulate across files
    desc = []
    rec_base = 0
    i = 0
    while i < len(splits):
        fpath = splits[i][0]
        j = i
        file_lines = 0
        while j < len(splits) and splits[j][0] == fpath:
            file_lines += cmap[j]
            j += 1
        cur = 0
        for k in range(i, j):
            nxt = cur + cmap[k]
            p, s, e, gz = splits[k]
            desc.append((k, p, s, e, gz, cur, nxt if k < j - 1 else file_lines, rec_base))
            cur = nxt
        rec_base += -(-file_lines // 4)  # ceil: trailing partial record counts
        i = j
    ddf = spark.createDataFrame(
        sc.parallelize(desc, len(desc)),
        "sid int, path string, start long, end long, gz boolean,"
        " line0 long, line_end long, rec_base long",
    )

    def gen_fq(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                f = gzip.open(row.path, "rb") if row.gz else open(row.path, "rb")
                with f:
                    lines, carry = _fq_span_lines(f, row.start, row.end, row.gz)
                    n_lines = len(lines)
                    tail = None
                    ns, ids, seqs = [], [], []
                    # header line numbers: first multiple of 4 at/after
                    # line0, stepping 4, strictly below line_end
                    for h in range(
                        row.line0 + (-row.line0) % 4, row.line_end, 4
                    ):
                        i = h - row.line0  # local index into `lines`
                        if i + 1 < n_lines:
                            header, seq = lines[i], lines[i + 1]
                        else:
                            # boundary record: finish it past the range
                            if tail is None:
                                tail = _tail_lines(f, carry)
                            header = lines[i] if i < n_lines else next(tail, None)
                            if header is None:
                                break
                            seq = next(tail, b"")
                        hs = header.strip()
                        toks = hs[1:].split()
                        sq = seq.strip().decode("utf-8", "replace")
                        if not hs and not sq:
                            continue  # trailing blank line: phantom
                        ids.append(toks[0].decode("utf-8", "replace") if toks else "")
                        seqs.append(sq)
                        ns.append(row.rec_base + h // 4)
                    if ns:
                        yield pd.DataFrame({"n": ns, "id": ids, "seq": seqs})

    return ddf.mapInPandas(gen_fq, SCHEMA)

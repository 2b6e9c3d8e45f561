"""Throughput bench for the distributed fastx reader (one JSON line).

Synthesizes a multi-hundred-MB FASTA and FASTQ corpus in /tmp, then
times ``read_fastx_distributed`` end-to-end (split planning + count
pass + mapInPandas assembly + a full count() that forces every record
through Arrow to the JVM). Env: SPARK_GRAFT_CPUS (default 8),
SPARK_GRAFT_FASTX_MB (default 256 per format).

The r2->r3 structural change this tracks: the reader went from a
full-corpus groupByKey (every line pickled through a shuffle) to
byte-range splits with overscan — zero Exchange in the plan
(tests/test_plan_shape.py::test_fastx_distributed_zero_shuffle).
"""

from __future__ import annotations

import json
import os
import sys
import time


def synth(tmp: str, mb: int) -> tuple[str, str]:
    import numpy as np

    rng = np.random.RandomState(9)
    chars = np.array(list("ACGT"))
    fa = os.path.join(tmp, f"bench_{mb}.fa")
    if not os.path.exists(fa):
        block = "".join(rng.choice(chars, 60 * 14))
        rec = ">rec_{i} meta\n" + "\n".join(
            block[j * 60 : (j + 1) * 60] for j in range(14)
        ) + "\n"
        per = len(rec)
        with open(fa, "w") as f:
            for i in range(mb * (1 << 20) // per):
                f.write(rec.format(i=i))
    fq = os.path.join(tmp, f"bench_{mb}.fq")
    if not os.path.exists(fq):
        seq = "".join(rng.choice(chars, 150))
        rec = "@read_{i} meta\n" + seq + "\n+\n" + "I" * 150 + "\n"
        per = len(rec)
        with open(fq, "w") as f:
            for i in range(mb * (1 << 20) // per):
                f.write(rec.format(i=i))
    return fa, fq


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    mb = int(os.environ.get("SPARK_GRAFT_FASTX_MB", "256"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kmertools_spark.session import get_spark
    from kmertools_spark.sources.fastx import read_fastx_distributed

    spark = get_spark(
        "kmertools-fastx-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    fa, fq = synth("/tmp", mb)
    out = {"queries": {}, "unit": "sec", "sf": mb, "extras": {"cpus": cpus}}
    # warm python workers (module import stampede)
    read_fastx_distributed(spark, fa, split_bytes=16 << 20).count()
    for name, path in (("fasta", fa), ("fastq", fq)):
        size = os.path.getsize(path)
        t0 = time.time()
        n = read_fastx_distributed(spark, path, split_bytes=16 << 20).count()
        dt = time.time() - t0
        out["queries"][name] = round(dt, 3)
        out["extras"][f"{name}_mb_per_sec"] = round(size / 1e6 / dt, 1)
        out["extras"][f"{name}_records"] = n
    out["metric"] = "distributed fastx ingest wall time (MB/s in extras)"
    out["value"] = round(sum(out["queries"].values()), 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

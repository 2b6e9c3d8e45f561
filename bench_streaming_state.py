"""Streaming state-store scale probe (r5 VERDICT item 5).

The bounded-state claims for streaming_asof (O(1) state per entity)
and streaming_lsh_candidates (<= max_bucket ids per band-bucket) are
functionally tested but were never MEASURED. This probe runs both as
availableNow jobs over right-sized synthetic inputs — ~1M entities for
the as-of store, ~500k docs for the LSH store — split into
SPARK_GRAFT_STREAM_BATCHES event-time-ordered parquet files
(maxFilesPerTrigger=1 => one micro-batch each), and records, per
micro-batch, the driver-reported state-store metrics:

  numRowsTotal       state rows (as-of: live entities; LSH: buckets)
  memoryUsedBytes    provider-reported resident state size
  durationMs         triggerExecution wall per batch
  allUpdatesTimeMs / commitTimeMs   state write + checkpoint cost

plus the derived bytes/state-row at the final batch. The design note
being checked: as-of state is TWO feature rows per entity regardless
of history length, so memory grows linearly in ENTITIES (never in
turns), and LSH state is member-id arrays, linear in retained docs x
bands with the max_bucket cap. Results go to docs/SCALE.md.

Env: SPARK_GRAFT_STREAM_ENTITIES (default 1_000_000),
SPARK_GRAFT_STREAM_DOCS (default 500_000), SPARK_GRAFT_STREAM_BATCHES
(default 10), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_STREAM_PROVIDER (default 'hdfs'; 'rocksdb' switches to
RocksDBStateStoreProvider — the 100 TB deployment choice, state
spills to local SSD instead of executor heap),
SPARK_GRAFT_STREAM_POOL (default 4096 — word-pool size of the doc
corpus; 8 reproduces the near-dup FLOOD regime where every bucket
hits the max_bucket star cap), SPARK_GRAFT_STREAM_PHASE
(asof|lsh|both, default both).

Prints ONE JSON line. The workdir lives under .bench_stream/ in the
repo (gitignored) and is recreated per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _mk_asof_inputs(base: str, entities: int, batches: int) -> tuple[str, str]:
    """Event-time-ordered feature/probe parquet files: batch b holds a
    fresh slice of entities (state grows to `entities` by the end),
    one feature + one probe per entity, probe 1s after its feature."""
    import numpy as np
    import pandas as pd

    fdir, pdir = os.path.join(base, "feat"), os.path.join(base, "probe")
    os.makedirs(fdir), os.makedirs(pdir)
    per = entities // batches
    t0 = 1_700_000_000
    for b in range(batches):
        ids = np.arange(b * per, (b + 1) * per, dtype=np.int64)
        conv = np.char.add("e", ids.astype(str))
        fts = pd.to_datetime((t0 + b * 3600) * 1_000_000_000 + ids % per, utc=False)
        feat = pd.DataFrame(
            {
                "conv_id": conv,
                "ts": fts.astype("datetime64[us]"),
                "turn_idx": (ids % 1000).astype("int32"),
            }
        )
        probe = pd.DataFrame(
            {
                "conv_id": conv,
                "probe_ts": (fts + pd.Timedelta(seconds=1)).astype("datetime64[us]"),
            }
        )
        feat.to_parquet(os.path.join(fdir, f"b{b:03d}.parquet"))
        probe.to_parquet(os.path.join(pdir, f"b{b:03d}.parquet"))
        # FileStreamSource orders by mtime (ms resolution): pin strictly
        # increasing mtimes so batch order == event-time order
        for d in (fdir, pdir):
            os.utime(os.path.join(d, f"b{b:03d}.parquet"), (b + 1, b + 1))
    return fdir, pdir


def _mk_doc_inputs(base: str, docs: int, batches: int, pool: int) -> str:
    """Doc stream: ~2% of docs are exact repeats of an earlier doc in
    the same batch (so some buckets hold >1 member and pairs flow);
    the rest draw 16 words from a `pool`-word vocabulary. pool=4096
    gives genuinely distinct docs (the linear-in-docs state regime);
    pool=8 makes every doc a near-dup of every other (the flood regime
    that exercises the max_bucket star cap)."""
    import numpy as np
    import pandas as pd

    ddir = os.path.join(base, "docs")
    os.makedirs(ddir)
    per = docs // batches
    t0 = 1_700_000_000
    rng = np.random.RandomState(7)
    words = np.array([f"w{i:04d}" for i in range(pool)])
    for b in range(batches):
        ids = np.arange(b * per, (b + 1) * per, dtype=np.int64)
        # 16 words per doc drawn deterministically per id -> distinct texts
        w = words[rng.randint(0, len(words), size=(per, 16))]
        texts = np.array([" ".join(r) + f" uid{int(i)}" for r, i in zip(w, ids)])
        dup = rng.rand(per) < 0.02
        src = rng.randint(0, per, size=per)
        texts[dup] = texts[src[dup]]
        ts = pd.to_datetime((t0 + b * 3600) * 1_000_000_000 + ids % per)
        pd.DataFrame(
            {"doc_id": ids, "text": texts, "ts": ts.astype("datetime64[us]")}
        ).to_parquet(os.path.join(ddir, f"b{b:03d}.parquet"))
        os.utime(os.path.join(ddir, f"b{b:03d}.parquet"), (b + 1, b + 1))
    return ddir


def _progress_rows(query) -> list[dict]:
    rows = []
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        so = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so.get("numRowsTotal"),
                "state_mem_bytes": so.get("memoryUsedBytes"),
                "updates_ms": so.get("allUpdatesTimeMs"),
                "commit_ms": so.get("commitTimeMs"),
            }
        )
    return [r for r in rows if r["state_rows"] is not None]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    entities = int(os.environ.get("SPARK_GRAFT_STREAM_ENTITIES", "1000000"))
    docs = int(os.environ.get("SPARK_GRAFT_STREAM_DOCS", "500000"))
    batches = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "10"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    provider = os.environ.get("SPARK_GRAFT_STREAM_PROVIDER", "hdfs")
    pool = int(os.environ.get("SPARK_GRAFT_STREAM_POOL", "4096"))
    phase = os.environ.get("SPARK_GRAFT_STREAM_PHASE", "both")  # asof|lsh|both

    from kmertools_spark.session import get_spark
    from kmertools_spark.streaming import streaming_asof, streaming_lsh_candidates

    extra = {}
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    spark = get_spark(
        "kmertools-streaming-state-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_stream")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    results: dict[str, object] = {}

    # ---- streaming_asof over `entities` live entities -----------------
    asof_rows, asof_wall, n_served = [], 0.0, 0
    if phase in ("asof", "both"):
        fdir, pdir = _mk_asof_inputs(base, entities, batches)
        fschema = spark.read.parquet(fdir).schema
        pschema = spark.read.parquet(pdir).schema
        t0 = time.time()
        q = (
            streaming_asof(
                spark.readStream.schema(fschema)
                .option("maxFilesPerTrigger", "1")
                .parquet(fdir),
                spark.readStream.schema(pschema)
                .option("maxFilesPerTrigger", "1")
                .parquet(pdir),
                value_cols=("turn_idx",),
            )
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "asof_out"))
            .option("checkpointLocation", os.path.join(base, "asof_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        asof_rows = _progress_rows(q)
        asof_wall = round(time.time() - t0, 1)
        n_served = spark.read.parquet(os.path.join(base, "asof_out")).count()

    # ---- streaming_lsh_candidates over `docs` documents ---------------
    lsh_rows, lsh_wall, n_pairs = [], 0.0, 0
    if phase in ("lsh", "both"):
        ddir = _mk_doc_inputs(base, docs, batches, pool)
        dschema = spark.read.parquet(ddir).schema
        t0 = time.time()
        q2 = (
            streaming_lsh_candidates(
                spark.readStream.schema(dschema)
                .option("maxFilesPerTrigger", "1")
                .parquet(ddir)
            )
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "lsh_out"))
            .option("checkpointLocation", os.path.join(base, "lsh_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        lsh_rows = _progress_rows(q2)
        lsh_wall = round(time.time() - t0, 1)
        n_pairs = spark.read.parquet(os.path.join(base, "lsh_out")).count()
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)

    def summarize(rows: list[dict], unit_rows: int) -> dict:
        last = rows[-1] if rows else {}
        return {
            "batches": rows,
            "final_state_rows": last.get("state_rows"),
            "final_state_mem_bytes": last.get("state_mem_bytes"),
            "bytes_per_state_row": (
                round(last["state_mem_bytes"] / last["state_rows"], 1)
                if last.get("state_rows")
                else None
            ),
            "input_units": unit_rows,
        }

    results = {
        "metric": "streaming state-store scale probe (state bytes/row, batch latency)",
        "value": (asof_rows[-1]["state_mem_bytes"] if asof_rows else 0),
        "unit": "bytes",
        "queries": {
            f"asof_b{r['batch']}": round((r["duration_ms"] or 0) / 1000, 3)
            for r in asof_rows
        }
        | {
            f"lsh_b{r['batch']}": round((r["duration_ms"] or 0) / 1000, 3)
            for r in lsh_rows
        },
        "sf": f"entities={entities},docs={docs},batches={batches}",
        "extras": {
            "provider": provider,
            "cpus": cpus,
            "word_pool": pool,
            "phase": phase,
            "asof": summarize(asof_rows, entities) | {
                "wall_s": asof_wall, "rows_served": n_served
            },
            "lsh": summarize(lsh_rows, docs) | {
                "wall_s": lsh_wall, "pairs_emitted": n_pairs
            },
        },
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()

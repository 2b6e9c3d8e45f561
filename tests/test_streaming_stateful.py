"""applyInPandasWithState rolling vectors: two incremental micro-batches
must equal the batch engine over the full prefix (state carry works)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmertools_spark.operators import backfill_features_stream
from kmertools_spark.sources import synth_transcripts_pdf
from kmertools_spark.streaming.stateful import rolling_vectors_stream


def test_stateful_rolling_matches_batch(spark, tmp_path):
    pdf = synth_transcripts_pdf(n_convs=8, mean_turns=12, seed=13)
    df = spark.createDataFrame(pdf)

    # two chronological chunks per conversation -> two micro-batches
    src = str(tmp_path / "src")
    half = df.where("turn_idx < 6")
    rest = df.where("turn_idx >= 6")
    # single ordered file per micro-batch: the operator requires
    # in-order arrival per conversation (documented contract)
    half.orderBy("conv_id", "turn_idx").coalesce(1).write.mode("overwrite").parquet(f"{src}/b0")

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/b*")
    # two availableNow runs sharing a checkpoint: state carries across
    # restarts exactly like a long-lived incremental job
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            rolling_vectors_stream(stream, k=4, n_turns=3)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = spark.read.parquet(sink).toPandas()
    assert len(first) == half.count()
    rest.orderBy("conv_id", "turn_idx").coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    run_once()
    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    exp = (
        backfill_features_stream(df, k=4, n_turns=3)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["session_seq"].to_numpy() == exp["session_seq"].to_numpy()).all()
    assert np.allclose(np.vstack(got["vec"]), np.vstack(exp["vec"]), rtol=1e-9)
    assert np.allclose(
        np.vstack(got["roll_vec"]), np.vstack(exp["roll_vec"]), rtol=1e-9
    )


def test_stateful_reorder_buffer_out_of_order_batches(spark, tmp_path):
    """reorder=True: the LATER half of each conversation arrives FIRST;
    the buffer holds it until the prefix arrives, then output equals
    the batch engine exactly."""
    pdf = synth_transcripts_pdf(n_convs=5, mean_turns=10, seed=31)
    df = spark.createDataFrame(pdf)
    src = str(tmp_path / "src")
    # reversed arrival: b0 = turns >= 5, b1 = turns < 5
    df.where("turn_idx >= 5").orderBy("conv_id", "turn_idx").coalesce(1).write.parquet(f"{src}/b0")
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/b*")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def run_once():
        q = (
            rolling_vectors_stream(stream, k=4, n_turns=3, reorder=True)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    try:
        held = spark.read.parquet(sink).count()
    except Exception:
        held = 0  # empty streaming sink (only metadata)
    df.where("turn_idx < 5").orderBy("conv_id", "turn_idx").coalesce(1).write.parquet(f"{src}/b1")
    run_once()
    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        backfill_features_stream(df, k=4, n_turns=3)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert held == 0  # nothing emitted while the prefix was missing
    assert len(got) == len(exp)
    assert (got["session_seq"].to_numpy() == exp["session_seq"].to_numpy()).all()
    assert np.allclose(np.vstack(got["roll_vec"]), np.vstack(exp["roll_vec"]), rtol=1e-9)


def test_streaming_exact_dedup_first_seen(spark, tmp_path):
    """Streaming digest dedup keeps the first arrival per distinct text
    across micro-batches and matches the batch digest dedup's keep set."""
    import pandas as pd

    from kmertools_spark.streaming import streaming_exact_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    b1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha", "beta", "alpha"],
            "ts": [base, base, base + pd.Timedelta(seconds=1)],
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": [4, 5],
            "text": ["beta", "gamma"],  # beta is a cross-batch duplicate
            "ts": [base + pd.Timedelta(seconds=2)] * 2,
        }
    )
    b1["ts"] = b1["ts"].astype("datetime64[us]")
    b2["ts"] = b2["ts"].astype("datetime64[us]")
    b1.to_parquet(src / "b1.parquet")
    df_schema = spark.read.parquet(str(src)).schema
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(df_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src)).withColumn("ts", F.col("ts").cast("timestamp"))
    out = tmp_path / "out"
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b2.to_parquet(src / "b2.parquet")
    q2 = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 2, 5]  # first-seen of alpha/beta/gamma only


def test_streaming_lsh_candidates_matches_batch(spark, tmp_path):
    """Watermarked streaming MinHash->LSH: the distinct candidate-pair
    set across two checkpointed availableNow runs (state carries
    buckets across the restart) equals the batch lsh_candidate_pairs
    over the full corpus; exactly-once within a band (no dup rows for
    single-band collisions on replayed state)."""
    import pandas as pd

    from kmertools_spark.operators import lsh_candidate_pairs, minhash_signatures
    from kmertools_spark.streaming import streaming_lsh_candidates

    base_texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long journey",
        "structured streaming keeps state across micro batches by key",
    ]
    rows = []
    for i in range(24):
        t = base_texts[i % 3]
        if i >= 12:
            t = t + f" v{i % 4}"  # near-duplicates of the three bases
        rows.append((i, t))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf["ts"] = (base + pd.to_timedelta(pdf["doc_id"], unit="s")).astype(
        "datetime64[us]"
    )
    b1, b2 = pdf.iloc[:15], pdf.iloc[15:]

    src = tmp_path / "docs_in"
    src.mkdir()
    b1.to_parquet(src / "b1.parquet")
    schema = spark.read.parquet(str(src)).schema
    out = tmp_path / "pairs_out"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            streaming_lsh_candidates(stream, bands=4)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    n_first = spark.read.parquet(str(out)).count()
    assert n_first > 0  # pairs already flow from the first batch
    b2.to_parquet(src / "b2.parquet")
    run()

    got_rows = spark.read.parquet(str(out)).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    want = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(minhash_signatures(docs), bands=4).collect()
    }
    assert got == want and want
    # within-band exactly-once: duplicates can only come from multi-band
    # collisions, so row count is bounded by 4x the distinct set
    assert len(got_rows) <= 4 * len(got)


def test_streaming_lsh_candidates_max_bucket_star(spark, tmp_path):
    """Streaming hot-bucket cap: edges form a superset of the batch
    star edges and a subset of the uncapped pairs (connectivity-exact,
    as documented)."""
    import pandas as pd

    from kmertools_spark.operators import lsh_candidate_pairs, minhash_signatures
    from kmertools_spark.streaming import streaming_lsh_candidates

    flood = "identical boilerplate document body repeated across the corpus"
    pdf = pd.DataFrame({"doc_id": range(8), "text": [flood] * 8})
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf["ts"] = (base + pd.to_timedelta(pdf["doc_id"], unit="s")).astype(
        "datetime64[us]"
    )
    src = tmp_path / "flood_in"
    src.mkdir()
    pdf.to_parquet(src / "b1.parquet")
    schema = spark.read.parquet(str(src)).schema
    out = tmp_path / "flood_out"
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_lsh_candidates(stream, bands=4, max_bucket=2)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.id_a, r.id_b) for r in spark.read.parquet(str(out)).collect()}
    docs = spark.createDataFrame(pdf[["doc_id", "text"]])
    sigs = minhash_signatures(docs)
    star = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, bands=4, max_bucket=2).collect()
    }
    full = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, bands=4).collect()
    }
    assert star <= got <= full
    # every doc is connected to the component (star edges reach all)
    nodes = {n for e in got for n in e}
    assert nodes == set(range(8))


def test_sampling_filters_are_streaming_compatible(spark, tmp_path):
    """Pure hash-gate filters (deterministic/stratified sampling) run
    unchanged on a readStream source — no state, no watermark, and the
    streamed keep set equals the batch keep set."""
    import pandas as pd

    from kmertools_spark.operators import sample_slice, stratified_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(500),
            "lang": [["en", "fr"][i % 2] for i in range(500)],
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    pdf.to_parquet(src / "b1.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = tmp_path / "out"
    q = (
        stratified_sample(
            sample_slice(stream, "doc_id", 0.0, 0.8), "doc_id", "lang", {"en": 0.5}, 0.2
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    batch = spark.createDataFrame(pdf)
    want = {
        r.doc_id
        for r in stratified_sample(
            sample_slice(batch, "doc_id", 0.0, 0.8), "doc_id", "lang", {"en": 0.5}, 0.2
        ).collect()
    }
    assert got == want and want


def test_prep_filter_streaming_equals_batch(spark, tmp_path):
    """r3 VERDICT item 8: the SHIPPED prep_filter (training_prep's
    normalize -> quality/repetition/token filters -> stratified-sample
    prefix) runs unchanged on a readStream source via availableNow and
    keeps exactly the batch rows — only packing needs a batch boundary.
    """
    import pandas as pd

    from kmertools_spark.operators import prep_filter

    texts = []
    for i in range(300):
        if i % 7 == 0:
            texts.append("zz zz zz zz zz zz zz zz")  # repetitive -> dropped
        elif i % 3 == 0:
            texts.append(f"le chat et la maison numero {i} et le jardin")
        else:
            texts.append(f"the quick brown fox {i} and the lazy dog of doom")
    pdf = pd.DataFrame({"doc_id": range(300), "text": texts})
    src = tmp_path / "in"
    src.mkdir()
    pdf.iloc[:150].to_parquet(src / "b1.parquet")
    pdf.iloc[150:].to_parquet(src / "b2.parquet")
    schema = spark.read.parquet(str(src)).schema
    kw = dict(rates={"en": 0.6}, default_rate=0.9)
    out = tmp_path / "out"
    q = (
        prep_filter(spark.readStream.schema(schema).parquet(str(src)), **kw)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_tok, r.lang)
        for r in spark.read.parquet(str(out)).collect()
    }
    want = {
        (r.doc_id, r.n_tok, r.lang)
        for r in prep_filter(spark.createDataFrame(pdf), **kw).collect()
    }
    assert got == want and want


def test_text_feature_columns_are_streaming_compatible(spark, tmp_path):
    """normalize/quality/repetition/lang are pure codegen expressions —
    they run unchanged on a readStream source and equal the batch values
    (the prep pipeline's filter stage works on incremental ingest)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kmertools_spark.functions import (
        lang_guess,
        normalize_text,
        quality_score,
        repetition_ratio,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(50),
            "text": [f"the quick brown fox {i}\tand the dog" for i in range(50)],
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    pdf.to_parquet(src / "b.parquet")
    schema = spark.read.parquet(str(src)).schema

    def features(df):
        n = normalize_text(F.col("text"))
        return df.select(
            "doc_id",
            n.alias("norm"),
            quality_score(n).alias("q"),
            repetition_ratio(n, 4).alias("rep"),
            lang_guess(n).alias("lang"),
        )

    out = tmp_path / "out"
    q = (
        features(spark.readStream.schema(schema).parquet(str(src)))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    want = sorted(map(tuple, features(spark.createDataFrame(pdf)).collect()))
    assert got == want and got


def test_streaming_asof_matches_batch(spark, tmp_path):
    """streaming_asof must emit exactly asof_join's rows when data
    arrives respecting the event-time-ordered contract: same strict-<
    leakage rule, same equal-ts largest-ord tie-break, same tolerance
    truncation, nulls for probes nothing precedes."""
    import numpy as np
    import pandas as pd

    from kmertools_spark.operators import asof_join
    from kmertools_spark.streaming import streaming_asof

    rng = np.random.RandomState(23)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for c in range(30):
        t = base
        for i in range(int(rng.randint(2, 12))):
            t = t + pd.Timedelta(seconds=int(rng.randint(1, 300)))
            rows.append((f"c{c}", i, t))
    feat = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    # tie case: two features at the SAME instant (largest turn_idx wins)
    tie_ts = base + pd.Timedelta(hours=2)
    feat = pd.concat(
        [feat, pd.DataFrame({"conv_id": ["c0", "c0"], "turn_idx": [90, 91], "ts": [tie_ts, tie_ts]})]
    )
    probes = feat.sample(60, random_state=5)[["conv_id", "ts"]].rename(
        columns={"ts": "probe_ts"}
    )
    # probe AT the tie instant (strict '<': must NOT see the tie rows),
    # probe after it (must see turn 91), and a no-history probe
    probes = pd.concat(
        [
            probes,
            pd.DataFrame(
                {
                    "conv_id": ["c0", "c0", "zz", None],
                    "probe_ts": [tie_ts, tie_ts + pd.Timedelta(seconds=1), base, base],
                }
            ),
        ]
    )

    cut = base + pd.Timedelta(minutes=20)
    # cross-batch strict-< tie (code-review r4 finding 4): cq's latest
    # feature arrives in batch 1 at exactly `cut`; the probe at `cut`
    # arrives in batch 2 and must be served the EARLIER feature (turn
    # 1), not the same-instant one — the O(1)+prev state path
    feat = pd.concat(
        [
            feat,
            pd.DataFrame(
                {
                    "conv_id": ["cq", "cq"],
                    "turn_idx": [1, 7],
                    "ts": [cut - pd.Timedelta(minutes=10), cut],
                }
            ),
        ]
    )
    probes = pd.concat(
        [probes, pd.DataFrame({"conv_id": ["cq"], "probe_ts": [cut]})]
    )
    feat["ts"] = feat["ts"].astype("datetime64[us]")
    probes["probe_ts"] = probes["probe_ts"].astype("datetime64[us]")
    fsrc = tmp_path / "feat"; psrc = tmp_path / "pr"
    fsrc.mkdir(); psrc.mkdir()
    # two event-time-ordered batches (the arrival contract); probes at
    # the cut go to batch 2 so the tie crosses the state boundary
    feat[feat.ts <= cut].to_parquet(fsrc / "b1.parquet")
    feat[feat.ts > cut].to_parquet(fsrc / "b2.parquet")
    probes[probes.probe_ts < cut].to_parquet(psrc / "b1.parquet")
    probes[probes.probe_ts >= cut].to_parquet(psrc / "b2.parquet")
    # FileStreamSource orders by mtime at ms resolution — pin distinct
    # mtimes so b1 ALWAYS processes before b2 (review r4 round 2)
    import os
    for src in (fsrc, psrc):
        os.utime(src / "b1.parquet", (1, 1))
        os.utime(src / "b2.parquet", (2, 2))

    fschema = spark.read.parquet(str(fsrc)).schema
    pschema = spark.read.parquet(str(psrc)).schema

    for tol in (None, 120_000):
        out = tmp_path / f"out{tol}"
        q = (
            streaming_asof(
                spark.readStream.schema(fschema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(fsrc)),
                spark.readStream.schema(pschema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(psrc)),
                value_cols=("turn_idx",),
                tolerance_ms=tol,
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / f"ck{tol}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        key = lambda x: (x[0] or "", str(x[1]), -1 if x[2] is None else x[2])
        got = sorted(
            (
                (r.conv_id, r.probe_ts, r.asof_turn_idx)
                for r in spark.read.parquet(str(out)).collect()
            ),
            key=key,
        )
        want = sorted(
            (
                (r.conv_id, r.probe_ts, r.asof_turn_idx)
                for r in asof_join(
                    spark.createDataFrame(feat),
                    spark.createDataFrame(probes),
                    value_cols=("turn_idx",),
                    tolerance_ms=tol,
                ).collect()
            ),
            key=key,
        )
        assert got == want, (tol, got[:5], want[:5])


def test_streaming_asof_exact_int64_and_nan_payloads(spark, tmp_path):
    """code-review r4 round 2: integral payload values must survive
    the Arrow float-widening path EXACTLY — an int64 above 2^53
    (xxhash64-scale) served from state must not round through float64.
    Double fields: NaN stays distinct from NULL end to end (r5: the
    output boundary now emits numerics as strings and casts back
    JVM-side, so a genuine NaN is served as NaN like the batch plan —
    the former NaN->NULL limitation is gone)."""
    import math

    import pandas as pd

    from kmertools_spark.operators import asof_join
    from kmertools_spark.streaming import streaming_asof

    base = pd.Timestamp("2024-01-01")
    big = 9007199254740993  # 2^53 + 1: float64 cannot represent it
    # genuine NaN must be built JVM-side: pandas/Arrow ingestion treats
    # a float column's NaN as the NULL sentinel
    feat_df = spark.sql(
        f"""SELECT * FROM VALUES
        ('a', 0, CAST({big} AS BIGINT), CAST('NaN' AS DOUBLE),
         TIMESTAMP '2024-01-01 00:00:00'),
        ('b', 0, CAST(7 AS BIGINT), CAST(1.5 AS DOUBLE),
         TIMESTAMP '2024-01-01 00:00:00')
        AS t(conv_id, turn_idx, big, nanv, ts)"""
    )
    probes = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "probe_ts": pd.Series(
                [base + pd.Timedelta(minutes=5)] * 2
            ).astype("datetime64[us]"),
        }
    )
    fsrc = tmp_path / "f"; psrc = tmp_path / "p"
    psrc.mkdir()
    feat_df.coalesce(1).write.parquet(str(fsrc))
    probes.to_parquet(psrc / "b2.parquet")
    import glob
    import os
    # pin file order: features strictly before probes
    for fp in glob.glob(str(fsrc / "*.parquet")):
        os.utime(fp, (1, 1))

    out = tmp_path / "out"
    q = (
        streaming_asof(
            spark.readStream.schema(
                spark.read.parquet(str(fsrc)).schema
            ).option("maxFilesPerTrigger", "1").parquet(str(fsrc)),
            spark.readStream.schema(
                spark.read.parquet(str(psrc)).schema
            ).option("maxFilesPerTrigger", "1").parquet(str(psrc)),
            value_cols=("big", "nanv"),
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.conv_id: (r.asof_big, r.asof_nanv) for r in spark.read.parquet(str(out)).collect()}
    want = {
        r.conv_id: (r.asof_big, r.asof_nanv)
        for r in asof_join(
            feat_df, spark.createDataFrame(probes),
            value_cols=("big", "nanv"),
        ).collect()
    }
    assert want["a"][0] == big and math.isnan(want["a"][1])
    assert got["a"][0] == big, got["a"]          # exact, not 2^53
    # NaN round-trips: streaming matches the batch plan (r5 fix)
    assert math.isnan(got["a"][1]), got["a"]
    assert got["b"] == want["b"] == (7, 1.5)


def test_streaming_asof_checkpoint_restart(spark, tmp_path):
    """State must survive a full query stop/start on one checkpoint
    (the long-lived incremental job shape): probes arriving in a SECOND
    availableNow run are served features from the FIRST run via
    restored state, matching the batch join over the union."""
    import pandas as pd

    from kmertools_spark.operators import asof_join
    from kmertools_spark.streaming import streaming_asof

    base = pd.Timestamp("2024-01-01")
    feat1 = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "turn_idx": [3, 9],
            "ts": pd.Series([base, base + pd.Timedelta(minutes=1)]).astype(
                "datetime64[us]"
            ),
        }
    )
    probes2 = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "probe_ts": pd.Series([base + pd.Timedelta(minutes=10)] * 3).astype(
                "datetime64[us]"
            ),
        }
    )
    fsrc = tmp_path / "f"; psrc = tmp_path / "p"
    fsrc.mkdir(); psrc.mkdir()
    feat1.to_parquet(fsrc / "b1.parquet")
    # run 1: features + one no-history sentinel probe (an EMPTY pandas
    # parquet would infer a wrong conv_id type for the stream schema)
    pd.DataFrame(
        {
            "conv_id": ["zz"],
            "probe_ts": pd.Series([base]).astype("datetime64[us]"),
        }
    ).to_parquet(psrc / "b0.parquet")
    fschema = spark.read.parquet(str(fsrc)).schema
    pschema = spark.read.parquet(str(psrc)).schema
    out = tmp_path / "out"

    def run_once():
        q = (
            streaming_asof(
                spark.readStream.schema(fschema).parquet(str(fsrc)),
                spark.readStream.schema(pschema).parquet(str(psrc)),
                value_cols=("turn_idx",),
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # run 2 (restart from checkpoint): only probes arrive
    probes2.to_parquet(psrc / "b1.parquet")
    run_once()
    got = {
        r.conv_id: r.asof_turn_idx
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {"a": 3, "b": 9, "c": None, "zz": None}

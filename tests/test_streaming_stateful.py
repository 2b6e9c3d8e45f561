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

"""Backfill kill/resume equivalence, streaming surface, multimodal stubs."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmertools_spark.plans import BackfillDriver
from kmertools_spark.sources import synth_transcripts_pdf
from kmertools_spark.sources.multimodal import frame_sample, media_features, synth_media


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        synth_transcripts_pdf(n_convs=24, mean_turns=6, seed=3)
    )


def _collect_sorted(df):
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pdf


def test_backfill_resume_equals_single_shot(spark, tdf, tmp_path):
    # single-shot run
    d1 = BackfillDriver(str(tmp_path / "one"), n_buckets=8)
    entries = d1.run(tdf)
    assert len(entries) == 8
    full = _collect_sorted(d1.result(spark))

    # killed after 3 buckets, then resumed
    d2 = BackfillDriver(str(tmp_path / "two"), n_buckets=8)
    first = d2.run(tdf, max_buckets=3)
    assert len(first) == 3
    assert len(d2.pending()) == 5
    d3 = BackfillDriver(str(tmp_path / "two"), n_buckets=8)  # fresh driver, same dir
    rest = d3.run(tdf)
    assert len(rest) == 5
    resumed = _collect_sorted(d3.result(spark))

    assert len(full) == len(tdf.toPandas())
    assert full["conv_id"].tolist() == resumed["conv_id"].tolist()
    assert full["turn_idx"].tolist() == resumed["turn_idx"].tolist()
    a = np.vstack(full["vec"].to_numpy())
    b = np.vstack(resumed["vec"].to_numpy())
    assert np.array_equal(a, b)

    # lineage metrics recorded per partition
    m = d3.metrics()
    assert {e["bucket"] for e in m} == set(range(8))
    assert all(e["rows_out"] == e["rows_in"] for e in m)
    assert all(e["wall_ms"] >= 0 and e["checksum"] is not None for e in m)


def test_backfill_rerun_is_noop(spark, tdf, tmp_path):
    d = BackfillDriver(str(tmp_path / "noop"), n_buckets=4)
    d.run(tdf)
    again = d.run(tdf)
    assert again == []


def test_streaming_sessionize_available_now(spark, tdf, tmp_path):
    """Streaming session windows over a file source, availableNow trigger."""
    from kmertools_spark.streaming import streaming_sessionize

    src = str(tmp_path / "stream_src")
    tdf.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(tdf.schema).parquet(src)
    sessions = streaming_sessionize(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out")
    assert got.count() > 0
    # total turns across session windows == input rows
    assert got.agg(F.sum("n_turns")).first()[0] == tdf.count()


def test_streaming_kmer_counts_match_batch(spark, tdf, tmp_path):
    from kmertools_spark.operators import global_kmer_counts
    from kmertools_spark.streaming import streaming_kmer_counts

    src = str(tmp_path / "stream_src2")
    tdf.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(tdf.schema).parquet(src)
    counts = streaming_kmer_counts(stream, k=4)
    q = (
        counts.writeStream.format("memory")
        .queryName("kc_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM kc_out").toPandas().sort_values("kmer")
    exp = global_kmer_counts(tdf, k=4).toPandas().sort_values("kmer")
    assert got["kmer"].tolist() == exp["kmer"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_media_features_deterministic(spark):
    media = synth_media(spark, n=12)
    f1 = media_features(media).toPandas().sort_values("media_id")
    f2 = media_features(media).toPandas().sort_values("media_id")
    assert len(f1) == 12
    for a, b in zip(f1["feat"], f2["feat"]):
        assert list(a) == list(b)
        assert len(a) == 3 + 8
        assert abs(sum(a[3:]) - 1.0) < 1e-9  # histogram part normalized


def test_frame_sample(spark):
    media = synth_media(spark, n=12)
    frames = frame_sample(media, every=2).toPandas()
    vids = media.where("kind = 'video'").select("media_id", "meta.n_frames").toPandas()
    exp = sum(len(range(0, int(n), 2)) for n in vids["n_frames"])
    assert len(frames) == exp


def test_media_resize_shapes_and_determinism(spark):
    import numpy as np

    from kmertools_spark.sources.multimodal import media_resize, synth_media

    media = synth_media(spark, n=12)
    out = {r.media_id: r for r in media_resize(media, out_w=16, out_h=8).collect()}
    assert len(out) == 12
    for r in out.values():
        assert r.width == 16 and r.height == 8
        assert len(bytes(r.payload)) == 16 * 8 * 3
    # deterministic across runs
    again = {r.media_id: bytes(r.payload) for r in media_resize(media, 16, 8).collect()}
    assert {k: bytes(v.payload) for k, v in out.items()} == again


def test_media_features_nonstandard_bins_row_isolation(spark):
    """n_bins != 8 must keep histograms row-local (review finding:
    the shift-based bin index spilled into the neighbor's slots)."""
    import numpy as np
    import pandas as pd

    from kmertools_spark.sources.multimodal import MEDIA_SCHEMA, media_features

    rows = [
        (0, "image", bytearray(b"\xff" * 64), (4, 4, 1, "x")),
        (1, "image", bytearray(b"\x00" * 64), (4, 4, 1, "x")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: list(r.feat) for r in media_features(df, n_bins=4).collect()}
    # image 0: all bytes 255 -> last bin only; image 1: all 0 -> first bin
    assert out[0][3:] == [0.0, 0.0, 0.0, 1.0]
    assert out[1][3:] == [1.0, 0.0, 0.0, 0.0]
    assert out[0][:3] == [1.0, 1.0, 1.0] and out[1][:3] == [0.0, 0.0, 0.0]


def test_decode_rgb_real_codec_when_available(spark):
    """With Pillow installed, a genuine PNG payload decodes through the
    real codec (true pixels win over the metadata hint); without it the
    deterministic fallback is used. Both modes keep the pipeline green:
    the pipeline assertions below run in either environment."""
    import numpy as np
    import pytest

    from kmertools_spark.sources.multimodal import _HAS_PIL, _decode_rgb

    if _HAS_PIL:
        import io

        from PIL import Image

        arr = (np.arange(5 * 4 * 3, dtype=np.uint8) * 3).reshape(4, 5, 3)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        got = _decode_rgb(buf.getvalue(), width=99, height=99)  # hint ignored
        assert got.shape == (4, 5, 3) and (got == arr).all()
    else:
        pytest.skip("Pillow not installed: fallback mode covered below")


def test_decode_rgb_fallback_deterministic():
    import numpy as np

    from kmertools_spark.sources.multimodal import _decode_rgb

    payload = bytes(range(7)) * 3  # no image magic -> fallback tiling
    a = _decode_rgb(payload, width=6, height=4)
    b = _decode_rgb(payload, width=6, height=4)
    assert a.shape == (4, 6, 3) and (a == b).all()
    assert a.ravel()[: len(payload)].tolist() == list(payload)


def test_audio_features_python_oracle_and_batch_independence(spark):
    """audio_features must equal a per-clip python replay (int16-PCM
    interpretation, windowed RMS, boundary-masked zero crossings) and be
    independent of Arrow batch slicing (the concat/bincount fusion must
    never bleed across clips)."""
    import numpy as np

    from kmertools_spark.sources.multimodal import audio_features, synth_media

    media = synth_media(spark, n=24)
    got = {
        r.media_id: (r.n_samples, r.zcr, list(r.rms))
        for r in audio_features(media, n_windows=4).collect()
    }
    clips = media.where("kind = 'audio'").select("media_id", "payload").collect()
    assert set(got) == {r.media_id for r in clips} and got
    for r in clips:
        b = bytes(r.payload)
        w = np.frombuffer(b[: len(b) & ~1], dtype="<i2").astype(np.float64) / 32768.0
        n = w.size
        rms = []
        for k in range(4):
            seg = w[(np.arange(n) * 4 // max(1, n)) == k]
            rms.append(float(np.sqrt((seg * seg).sum() / max(1, seg.size))))
        sign = w >= 0
        zcr = float((sign[1:] != sign[:-1]).sum() / max(1, n - 1))
        gn, gz, gr = got[r.media_id]
        assert gn == n
        assert abs(gz - zcr) < 1e-12
        assert np.allclose(gr, rms, atol=1e-12)
    # batch-size independence: 1-row batches == default batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        got1 = {
            r.media_id: (r.n_samples, r.zcr, list(r.rms))
            for r in audio_features(media, n_windows=4).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    assert got1 == {k: (a, b, c) for k, (a, b, c) in got.items()} or all(
        got1[k][0] == got[k][0]
        and abs(got1[k][1] - got[k][1]) < 1e-12
        and np.allclose(got1[k][2], got[k][2], atol=1e-12)
        for k in got
    )


def test_streaming_sessionize_ntz_and_exact_gap_boundary(spark, tmp_path):
    """code-review r4: streaming_sessionize must accept a TIMESTAMP_NTZ
    source (cast before withWatermark) and must MERGE two events exactly
    gap_seconds apart, matching batch sessionize's strict `diff > gap`
    rule. This test IS the empirical evidence that Spark's raw
    session_window merges inclusively at diff == gap (the operator
    passes the gap through unmodified and the boundary event lands in
    the same session) — the sessions.py docstring cites it
    (code-review r5 resolved the two files' contradictory claims)."""
    import pandas as pd

    from kmertools_spark.operators import sessionize
    from kmertools_spark.streaming import streaming_sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": [0, 1, 2],
            "text": ["aa", "bb", "cc"],
            # gaps: exactly 1800s (merge), 1800.001s (split)
            "ts": [
                base,
                base + pd.Timedelta(seconds=1800),
                base + pd.Timedelta(seconds=3600, milliseconds=1),
            ],
        }
    )
    # flush row: advances the watermark past conv c's sessions so the
    # append-mode aggregation finalizes and emits them
    pdf = pd.concat(
        [
            pdf,
            pd.DataFrame(
                {
                    "conv_id": ["flush"],
                    "turn_idx": [0],
                    "text": ["zz"],
                    "ts": [base + pd.Timedelta(days=2)],
                }
            ),
        ]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # NTZ in parquet
    src = tmp_path / "in"; src.mkdir()
    pdf.to_parquet(src / "b.parquet")
    schema = spark.read.parquet(str(src)).schema
    assert "timestamp_ntz" in schema["ts"].dataType.typeName()
    out = tmp_path / "out"
    q = (
        streaming_sessionize(
            spark.readStream.schema(schema).parquet(str(src)), gap_seconds=1800
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = [r for r in spark.read.parquet(str(out)).collect() if r.conv_id == "c"]
    # batch rule: turns 0,1 one session (diff == gap merges); turn 2 new
    assert sorted(r.n_turns for r in got) == [1, 2]
    batch = sessionize(spark.createDataFrame(pdf)).select("turn_idx", "session_seq").collect()
    assert {r.turn_idx: r.session_seq for r in batch} == {0: 0, 1: 0, 2: 1}

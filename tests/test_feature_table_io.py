"""Partitioned feature-table layout: roundtrip + partition pruning."""

from kmertools_spark.sources import synth_transcripts_pdf
from kmertools_spark.sources.io import read_feature_table, write_feature_table


def test_roundtrip_and_pruning(spark, tmp_path):
    pdf = synth_transcripts_pdf(n_convs=12, mean_turns=8, seed=17)
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "features")
    write_feature_table(df, path, n_buckets=4)

    back = read_feature_table(spark, path)
    assert back.count() == len(pdf)
    assert set(back.columns) == set(df.columns)

    probe = read_feature_table(spark, path, conv_id="conv_3")  # modulus from table meta
    got = probe.toPandas().sort_values("turn_idx")
    exp = pdf[pdf.conv_id == "conv_3"].sort_values("turn_idx")
    assert got["turn_idx"].tolist() == exp["turn_idx"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()

    # pruning is visible in the plan: the bucket predicate reaches the scan
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__bucket" in plan

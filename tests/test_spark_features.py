"""Spark kernels vs the numpy oracle on synthetic transcripts."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kmertools_spark.functions import (
    composition_vector,
    exploded_kmers,
    exploded_minimisers,
    kmer_count_pairs,
)
from kmertools_spark.operators import coverage_features, global_kmer_counts
from kmertools_spark.oracle import (
    SortedCountLookup,
    composition_matrix,
    coverage_matrix,
    minimiser_runs,
)
from kmertools_spark.oracle.kernels import concat_codes, kmer_windows
from kmertools_spark.sources import synth_transcripts_pdf


@pytest.fixture(scope="module")
def tdf(spark):
    pdf = synth_transcripts_pdf(n_convs=30, mean_turns=8, skew_factor=10, seed=7)
    return spark.createDataFrame(pdf), pdf


def test_composition_udf_matches_oracle(spark, tdf):
    df, pdf = tdf
    got = (
        df.select("conv_id", "turn_idx", composition_vector(4)("text").alias("v"))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    exp_rows = pdf.sort_values(["conv_id", "turn_idx"])
    exp = composition_matrix(exp_rows["text"].tolist(), 4)
    got_mat = np.vstack(got["v"].to_numpy())
    assert got_mat.shape == exp.shape
    assert np.allclose(got_mat, exp, rtol=1e-9, atol=0)


def test_global_counts_match_oracle(spark, tdf):
    df, pdf = tdf
    got = global_kmer_counts(df, k=4).toPandas().sort_values("kmer")
    codes, _, _ = concat_codes(pdf["text"].tolist())
    _, f, r = kmer_windows(codes, 4)
    canon = np.minimum(f, r).astype(np.int64)
    kk, cc = np.unique(canon, return_counts=True)
    assert got["kmer"].to_numpy().tolist() == kk.tolist()
    assert got["cnt"].to_numpy().tolist() == cc.tolist()


def test_salted_counts_equal_plain(spark, tdf):
    df, _ = tdf
    plain = global_kmer_counts(df, k=3).toPandas().sort_values("kmer").reset_index(drop=True)
    salted = (
        global_kmer_counts(df, k=3, salt=8).toPandas().sort_values("kmer").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_coverage_features_match_oracle(spark, tdf):
    df, pdf = tdf
    counts = global_kmer_counts(df, k=4)
    got = (
        coverage_features(df, counts, k=4, bin_size=2, bin_count=4)
        .select("conv_id", "turn_idx", "cov_vec")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    codes, _, _ = concat_codes(pdf["text"].tolist())
    _, f, r = kmer_windows(codes, 4)
    canon = np.minimum(f, r).astype(np.int64)
    kk, cc = np.unique(canon, return_counts=True)
    lk = SortedCountLookup(kk, cc)
    exp_rows = pdf.sort_values(["conv_id", "turn_idx"])
    exp = coverage_matrix(exp_rows["text"].tolist(), 4, lk, 2, 4)
    assert np.allclose(np.vstack(got["cov_vec"].to_numpy()), exp, rtol=1e-9)


def test_exploded_kmers_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": [0, 0],
            "text": ["ACNGTT", "ACGT"],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        exploded_kmers(df, k=2)
        .toPandas()
        .sort_values(["conv_id", "pos"])
        .reset_index(drop=True)
    )
    # ACNGTT k=2 -> (1,11)@0, (11,1)@3, (15,0)@4 (kmer/src/kmer.rs:130-145)
    c1 = got[got.conv_id == "c1"]
    assert list(zip(c1["pos"], c1["fwd"], c1["rc"])) == [(0, 1, 11), (3, 11, 1), (4, 15, 0)]


def test_exploded_minimisers_matches_oracle(spark, tdf):
    df, pdf = tdf
    for w, m in [(0, 5), (8, 4)]:
        got = (
            exploded_minimisers(df, w=w, m=m)
            .toPandas()
            .sort_values(["conv_id", "turn_idx", "win_start"])
        )
        exp = []
        for _, row in pdf.sort_values(["conv_id", "turn_idx"]).iterrows():
            for v, s, e in minimiser_runs(row["text"], w, m):
                exp.append((row["conv_id"], row["turn_idx"], v, s, e))
        got_t = list(
            zip(got.conv_id, got.turn_idx, got.mmer, got.win_start, got.win_end)
        )
        exp.sort()
        got_t.sort()
        assert got_t == exp, (w, m)


def test_kmer_count_pairs_partial_agg(spark):
    pdf = pd.DataFrame({"conv_id": ["a"] * 3, "turn_idx": [0, 1, 2], "text": ["ACGT"] * 3})
    df = spark.createDataFrame(pdf)
    got = kmer_count_pairs(df, k=4).groupBy("kmer").agg(F.sum("cnt").alias("cnt")).collect()
    # ACGT k=4: fwd=0b00011011=27, rc=27 -> canonical 27, three occurrences
    assert [(r["kmer"], r["cnt"]) for r in got] == [(27, 3)]


@pytest.mark.parametrize("k,norm", [(4, True), (4, False), (15, True)])
def test_coverage_join_strategy_matches_broadcast(spark, tdf, k, norm):
    """The exploded-join coverage path (the k>12 scale formulation, no
    driver-side count table) must equal the broadcast probe bit-for-bit
    — including rows with no valid k-mer (zero vectors, F3 rule)."""
    df, _ = tdf
    counts = global_kmer_counts(df, k=k)
    kw = dict(k=k, bin_size=2, bin_count=4, norm=norm)
    b = coverage_features(df, counts, strategy="broadcast", **kw)
    j = coverage_features(df, counts, strategy="join", **kw)

    def as_map(d):
        return {
            (r.conv_id, int(r.turn_idx)): list(r.cov_vec)
            for r in d.select("conv_id", "turn_idx", "cov_vec").collect()
        }

    bm, jm = as_map(b), as_map(j)
    assert bm.keys() == jm.keys()
    for kk in bm:
        assert bm[kk] == jm[kk], (kk, bm[kk], jm[kk])


def test_coverage_auto_strategy_cutover_is_count_based(spark, tdf):
    """'auto' keys on the MEASURED distinct count, not k (r5 VERDICT
    item 4): a count table over the broadcast_max_rows cap must route
    to the join plan (no driver-side collect) even at small k, and the
    dense-side result must still equal the broadcast probe."""
    df, _ = tdf
    counts = global_kmer_counts(df, k=4)
    n_distinct = counts.count()
    assert n_distinct > 1
    kw = dict(k=4, bin_size=2, bin_count=4, norm=False)

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    # under the cap -> broadcast probe (scalar UDF, no Join operator)
    under = coverage_features(
        df, counts, strategy="auto", broadcast_max_rows=n_distinct, **kw
    )
    assert "Join" not in plan(under)
    # one over the cap -> exploded-join plan (a real Join on kmer)
    over = coverage_features(
        df, counts, strategy="auto", broadcast_max_rows=n_distinct - 1, **kw
    )
    assert "Join" in plan(over)
    # and the routed join plan is value-identical to the broadcast one
    key = lambda d: {
        (r.conv_id, int(r.turn_idx)): list(r.cov_vec)
        for r in d.select("conv_id", "turn_idx", "cov_vec").collect()
    }
    assert key(under) == key(over)


def test_coverage_join_strategy_rejects_duplicate_keys(spark):
    """Non-unique keys would fan out the hist join-back with mixed
    histograms — the join path must raise, not silently corrupt
    (r2 ADVICE item 5). Unique keys still pass with validation on."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"conv_id": ["a", "a", "b"], "turn_idx": [0, 0, 1], "text": ["ACGT"] * 3}
    )
    df = spark.createDataFrame(pdf)
    counts = global_kmer_counts(df, k=4)
    with pytest.raises(ValueError, match="uniquely identify"):
        coverage_features(df, counts, k=4, strategy="join").collect()
    ok = coverage_features(
        df.where("turn_idx = 1"), counts, k=4, strategy="join"
    )
    assert ok.count() == 1


def test_cgr_error_column_surface(spark):
    """Per-row CGR error semantics: the reference raises
    'Bad nucleotide, unable to proceed' (composition/src/cgr.rs:139);
    the column surface carries that exact string per failing row."""
    from kmertools_spark.functions import cgr_points_with_error
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "ACGT"), (1, "ACXGT"), (2, ""), (3, "acgtu")], "i int, s string"
    )
    out = {
        r.i: (r.r["cgr"], r.r["err"])
        for r in df.select("i", cgr_points_with_error(1.0)("s").alias("r")).collect()
    }
    assert out[1] == (None, "Bad nucleotide, unable to proceed")
    assert out[0][1] is None and len(out[0][0]) == 4
    assert out[2] == ([], None)
    assert out[3][1] is None and len(out[3][0]) == 5
    # parity with the raising pyapi surface
    from kmertools_spark.pyapi import CgrComputer

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Bad nucleotide"):
        CgrComputer(vecsize=1.0).vectorise_one("ACXGT")


def test_repetition_ratio_kernel_matches_catalyst_expression(spark):
    """r7: repetition_ratio is the vectorized batch kernel
    (oracle/kernels.repetition_batch); its values must equal the former
    transform + array_distinct + size Catalyst expression — the shape
    the DuckDB oracle twin mirrors relationally — bit-for-bit, across
    n, NULLs, empty/short rows, NUL separator bytes (the kernel joins
    rows on \\x00 and must mask, not scan), multi-byte UTF-8 (the
    python fallback path), and long repeats."""
    import random
    import string

    from pyspark.sql import functions as F

    from kmertools_spark.functions import repetition_ratio

    def old_expr(col, n):
        total = F.length(col) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), total), lambda i: F.substring(col, i, F.lit(n))
        )
        return F.when(
            total > 0,
            F.round(
                F.size(F.array_distinct(grams)).cast("double")
                / total.cast("double"),
                6,
            ),
        )

    rng = random.Random(11)
    rows = []
    for i in range(400):
        length = rng.choice([0, 1, 2, 3, 4, 5, 7, 10, 50, 300])
        alpha = rng.choice(
            ["ab", "abc ", string.printable, "aaaa", "ab\x00\t", "αβγ abc"]
        )
        rows.append((i, "".join(rng.choice(alpha) for _ in range(length))))
    rows += [
        (9001, None),
        (9002, ""),
        (9003, "aaaa"),
        (9004, "ab\x00cd\x00ab"),
        (9005, "é" * 10),
        (9006, "abcdefgh" * 500),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    for n in (1, 2, 4, 6, 8):
        cmp = df.select(
            repetition_ratio(F.col("text"), n).alias("new"),
            old_expr(F.col("text"), n).alias("old"),
        )
        bad = cmp.where(~F.col("new").eqNullSafe(F.col("old"))).count()
        assert bad == 0, f"n={n}: {bad} mismatching rows"


def test_repetition_batch_survives_oversized_batches():
    """r7 code-review: at n=6 the packed (row, gram) int64 key only has
    headroom for 32767 local rows — a >= 32768-row batch (reachable via
    get_spark(arrow_batch=...)) used to wrap negative and crash
    bincount. The kernel now row-chunks; values must stay exact across
    the chunk boundaries."""
    import random

    from kmertools_spark.oracle.kernels import _round6_half_up, repetition_batch

    def ref(t, n):
        tot = len(t) - n + 1
        if tot <= 0:
            return None
        return _round6_half_up(len({t[j : j + n] for j in range(tot)}) / tot)

    rng = random.Random(7)
    # 40k uniform rows (the review's exact repro) ...
    texts = ["abcdef" * 3] * 40000
    assert repetition_batch(texts, 6) == [ref(t, 6) for t in texts]
    # ... and 70k mixed rows (3 chunks at n=6), ragged lengths
    texts = [
        "".join(chr(rng.randrange(1, 128)) for _ in range(rng.randrange(0, 20)))
        for _ in range(70000)
    ]
    for n in (1, 6):
        assert repetition_batch(texts, n) == [ref(t, n) for t in texts], n


def test_normalize_text_and_repetition_ratio(spark):
    """Cleaning normalizer + repetition filter on adversarial inputs:
    control chars, tabs/newlines, repeats, short and empty texts —
    values must also match a plain-Python replay of the spec."""
    import re

    import pandas as pd
    from pyspark.sql import functions as F

    from kmertools_spark.functions import normalize_text, repetition_ratio

    texts = [
        "  hello\tworld\n\nfoo  bar  ",
        "\x00\x01abc\x1f",
        "aaaaaaaaaaaaaaaa",          # fully repetitive
        "abcdefghij",                # fully unique
        "ab",                        # shorter than n -> NULL ratio
        "",
        "x \x0b y",                  # \x0b IS a control char (0x0B)
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = (
        df.select(
            "doc_id",
            normalize_text(F.col("text")).alias("norm"),
            repetition_ratio(F.col("text"), 4).alias("rep"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def py_norm(t):
        t = re.sub("[\x00-\x1f]", " ", t)
        return re.sub(" +", " ", t).strip()

    def py_rep(t):
        total = len(t) - 3
        if total <= 0:
            return None
        grams = {t[i : i + 4] for i in range(total)}
        return round(len(grams) / total, 6)

    for i, t in enumerate(texts):
        assert got.loc[i, "norm"] == py_norm(t), (i, t)
        want = py_rep(t)
        if want is None:
            assert pd.isna(got.loc[i, "rep"]), i
        else:
            assert abs(got.loc[i, "rep"] - want) < 1e-12, (i, t)
    # the repetitive text scores far below the unique one
    assert got.loc[2, "rep"] < 0.1 < 0.9 < got.loc[3, "rep"]


def test_coverage_join_null_key_matches_broadcast(spark):
    """code-review r4: a NULL-key row must get its TRUE histogram from
    the join strategy (null-safe join-back), not the zero vector —
    identical to the broadcast strategy."""
    import pandas as pd

    from kmertools_spark.operators import coverage_features, global_kmer_counts

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": [None, "c1", "c1"],
                "turn_idx": [0, 0, 1],
                "text": ["ACGTACGTACGT", "ACGTACGTACGT", "TTTTACGT"],
            }
        ).astype({"turn_idx": "int32"})
    )
    counts = global_kmer_counts(df, k=4)
    kw = dict(k=4, bin_size=2, bin_count=4, norm=False)
    b = {
        (r.conv_id, r.turn_idx): list(r.cov_vec)
        for r in coverage_features(df, counts, strategy="broadcast", **kw).collect()
    }
    j = {
        (r.conv_id, r.turn_idx): list(r.cov_vec)
        for r in coverage_features(df, counts, strategy="join", **kw).collect()
    }
    assert b == j
    assert sum(b[(None, 0)]) > 0  # the NULL-key row has a real histogram


def test_k32_canonical_consistent_between_counts_and_explode(spark):
    """code-review r4: at k=32 a top-bit k-mer wraps negative as int64;
    the canonical choice must be made in UNSIGNED space on both sides —
    the exploded `canon` column must key-match the count table exactly
    (a signed least(fwd, rc) picked the wrong strand and missed joins)."""
    import pandas as pd

    from kmertools_spark.functions import exploded_kmers, kmer_count_pairs
    from pyspark.sql import functions as F

    # T-runs force fwd values with the top bit set at k=32
    df = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c"], "turn_idx": [0], "text": ["T" * 40 + "ACGT" * 10]})
    )
    counts = {r.kmer: r.cnt for r in kmer_count_pairs(df, k=32).collect()}
    ex = exploded_kmers(df, k=32).select("canon", "fwd", "rc").collect()
    assert ex and counts
    assert any(r.fwd < 0 for r in ex)  # the wrap case is actually present
    for r in ex:
        assert r.canon in counts, (r.canon, r.fwd, r.rc)
    # and the exploded multiset reproduces the counts exactly
    from collections import Counter
    assert Counter(r.canon for r in ex) == Counter(counts)

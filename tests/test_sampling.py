"""Deterministic sampling + frequency operators: stability, disjointness,
rate accuracy on the real events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from sports_data_integration_and_forecasting_pipeline_spark.operators.frequency import heavy_hitters
from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_holdout_split,
)


TESTDATA_SMOKE = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{TESTDATA_SMOKE}/events.parquet")


def test_hash_sample_is_deterministic_and_partition_stable(spark):
    ev = _events(spark)
    a = {r["event_id"] for r in hash_sample(ev, "event_id", 0.1).collect()}
    b = {
        r["event_id"]
        for r in hash_sample(ev.repartition(7), "event_id", 0.1).collect()
    }
    assert a == b and a  # same sample regardless of partitioning
    # rate lands near the target (binomial, n=1000, p=0.1)
    assert 60 <= len(a) <= 140


def test_hash_sample_salt_decorrelates(spark):
    ev = _events(spark)
    a = {r["event_id"] for r in hash_sample(ev, "event_id", 0.2, salt="x").collect()}
    b = {r["event_id"] for r in hash_sample(ev, "event_id", 0.2, salt="y").collect()}
    assert a != b
    overlap = len(a & b) / max(1, len(a))
    assert overlap < 0.5  # independent samples overlap ~ fraction, not ~1


def test_hash_sample_monotone_in_fraction(spark):
    ev = _events(spark)
    small = {r["event_id"] for r in hash_sample(ev, "event_id", 0.05).collect()}
    big = {r["event_id"] for r in hash_sample(ev, "event_id", 0.2).collect()}
    assert small <= big  # nested samples: same hash, bigger cut


def test_stratified_fractions_respected(spark):
    ev = _events(spark)
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    t0 = sorted(types)[0]
    got = stratified_hash_sample(
        ev, "event_type", {t0: 1.0}, "event_id", default_fraction=0.0
    )
    rows = got.collect()
    assert {r["event_type"] for r in rows} == {t0}  # others fully dropped
    assert len(rows) == ev.filter(ev.event_type == t0).count()  # frac 1.0 keeps all


def test_train_holdout_split_disjoint_and_total(spark):
    ev = _events(spark)
    train, hold = train_holdout_split(ev, "event_id", holdout_fraction=0.25)
    t = {r["event_id"] for r in train.collect()}
    h = {r["event_id"] for r in hold.collect()}
    assert not (t & h)
    assert len(t) + len(h) == ev.count()
    assert 150 <= len(h) <= 350


def test_heavy_hitters_threshold_exact(spark):
    df = spark.createDataFrame(
        [("g", "a")] * 50 + [("g", "b")] * 49 + [("g", "c")],
        "grp string, item string",
    )
    got = {
        r["item"]: (r["cnt"], r["n_group"])
        for r in heavy_hitters(df, ["grp"], "item", threshold=0.02).collect()
    }
    # c covers exactly 1% -> dropped at 2%; a and b kept
    assert set(got) == {"a", "b"}
    assert got["a"] == (50, 100)


def test_mixture_sample_hits_target_mix(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{TESTDATA_SMOKE}/documents.parquet")
    weights = {"en": 0.25, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.15}
    out = mixture_sample(docs, "lang", weights, "doc_id").toPandas()
    n_in = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    t_max = min(n_in[d] / w for d, w in weights.items())
    got = out["lang"].value_counts().to_dict()
    for d, w in weights.items():
        expected = w * t_max  # expected kept count before hash noise
        assert abs(got.get(d, 0) - expected) <= max(6, 0.35 * expected), (d, got.get(d), expected)
    # scarcest domain keeps ~everything (rate 1.0: hash coin < 1 always)
    scarcest = min(weights, key=lambda d: n_in[d] / weights[d])
    assert got[scarcest] == n_in[scarcest]
    # unlisted domains dropped
    assert set(got) <= set(weights)


def test_mixture_sample_is_rerun_stable(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{TESTDATA_SMOKE}/documents.parquet")
    w = {"en": 0.5, "zh": 0.5}
    a = sorted(r["doc_id"] for r in mixture_sample(docs, "lang", w, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(docs.repartition(7), "lang", w, "doc_id").collect()
    )
    assert a == b and a


def test_kfold_is_stable_and_partitions_keys(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import kfold_assign

    ev = _events(spark)
    a = {r["event_id"]: r["fold"] for r in kfold_assign(ev, "event_id", k=5).collect()}
    b = {r["event_id"]: r["fold"] for r in kfold_assign(ev.repartition(7), "event_id", k=5).collect()}
    assert a == b
    assert set(a.values()) == set(range(5))
    # folds are a partition: together they cover everything exactly once
    assert len(a) == ev.count()
    # roughly balanced (hash uniformity)
    from collections import Counter
    sizes = Counter(a.values())
    assert max(sizes.values()) < 1.4 * min(sizes.values())


def test_shard_assignment_stable_under_repartitioning(spark):
    """Shard membership is a pure key function — identical across
    partitionings and reruns, and the manifest checksums agree with a
    direct recomputation."""
    from pyspark.sql import functions as F

    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        shard_by_key,
        shard_manifest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["shard"] for r in shard_by_key(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in shard_by_key(docs.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert set(a.values()) == set(range(16))  # all shards populated

    man = shard_manifest(docs, "doc_id").collect()
    assert sum(r["n_docs"] for r in man) == docs.count()
    # manifest counts match the assignment
    from collections import Counter

    counts = Counter(a.values())
    assert {r["shard"]: r["n_docs"] for r in man} == dict(counts)


def test_weighted_systematic_sample_exact_picks(spark):
    """Hand-computed intervals: weights laid end to end, one pick per
    step of cumulative weight; heavy rows always kept."""
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        weighted_systematic_sample,
    )

    rows = [(1, 5), (2, 995), (3, 1000), (4, 3000), (5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"]: r["w_start"] for r in
           weighted_systematic_sample(df, "w", step=1000).collect()}
    # cum intervals (start, end]: 1:(0,5] 2:(5,1000] 3:(1000,2000]
    # 4:(2000,5000] 5:(5000,5010] — picks at 1000k: doc2 owns k=1, doc3
    # k=2, doc4 k=3..5; doc5's interval contains no multiple. Every pick
    # point is owned by exactly one doc, so |sample| == total // step.
    assert got == {2: 5, 3: 1000, 4: 2000}


def test_weighted_systematic_sample_repartition_stable(spark):
    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        weighted_systematic_sample,
    )
    import pyspark.sql.functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_toks"),
    )
    a = {r["doc_id"] for r in
         weighted_systematic_sample(docs, "n_toks").collect()}
    b = {r["doc_id"] for r in
         weighted_systematic_sample(docs.repartition(11), "n_toks").collect()}
    assert a == b and a
    # sample size ~= total_weight / step (PPS design invariant; heavy
    # docs can add at most their own extra picks)
    total = docs.agg(F.sum("n_toks")).collect()[0][0]
    assert abs(len(a) - total // 1000) <= 1


def test_leakage_safe_split_keeps_clusters_together(spark):
    # the whole guarantee: a near-duplicate of a train doc can never
    # land in val/test, because split assignment hashes the CLUSTER id
    from sports_data_integration_and_forecasting_pipeline_spark.plans.battery import QUERIES

    pdf = (
        QUERIES["leakage_safe_split"]
        .fn(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert len(pdf) == 500  # one row per document
    spanning = (pdf.groupby("cluster_id")["split"].nunique() > 1).sum()
    assert spanning == 0
    # all three splits populated, with train the large bucket
    counts = pdf.groupby("split").size()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]


def test_temperature_mixture_weights_model(spark):
    """q = p^0.3 / Z against a pure-Python model; alpha < 1 must
    up-weight the tail domain and down-weight the head; Σq = 1."""
    import math

    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    counts = {"en": 70, "de": 20, "zh": 10}
    rows = [(f"{d}{i}", d) for d, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    got = {
        r["lang"]: (r["n_docs"], r["p"], r["q"], r["per_doc_weight"])
        for r in temperature_mixture_weights(df, "lang").collect()
    }
    n_tot = sum(counts.values())
    pas = {d: (n / n_tot) ** 0.3 for d, n in counts.items()}
    z = sum(pas.values())
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    for d, n in counts.items():
        p = n / n_tot
        q = pas[d] / z
        assert got[d] == (n, r6(p), r6(q), r6(q / p)), d
    # alpha < 1 flattens: head down-weighted, tail up-weighted
    assert got["en"][3] < 1.0 < got["zh"][3]
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-5


def test_temperature_mixture_weights_alpha_guard(spark):
    import pytest

    from sports_data_integration_and_forecasting_pipeline_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    df = spark.createDataFrame([("a", "en")], "doc_id string, lang string")
    with pytest.raises(ValueError, match="alpha must be in"):
        temperature_mixture_weights(df, "lang", alpha=0.0)

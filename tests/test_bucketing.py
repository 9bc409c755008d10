"""Scale techniques with plan-level assertions: bucketed co-located
joins (no Exchange) and mergeable HLL sketch algebra."""

import pytest
from pyspark.sql import functions as F

from kgspark import dataops


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the shuffle
    entirely — the Iceberg `bucket(N, key)` layout the SCALE.md input
    design relies on, demonstrated with Spark's native bucketing."""
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("vb")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    (
        left.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "bkt_left"))
        .saveAsTable("bkt_left")
    )
    (
        right.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "bkt_right"))
        .saveAsTable("bkt_right")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert j.count() == 5_000
        # same result as the plain (shuffling) join
        plain = left.join(right, "k")
        assert j.exceptAll(plain).count() == 0
        assert plain.exceptAll(j).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_hll_merge_equals_direct_and_bounds_error(spark):
    ev = spark.range(20_000).select(
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 1237).alias("user_id"),
    )
    out = {
        r["partition"]: r["distinct_est"]
        for r in dataops.hll_merged_distinct(ev).collect()
    }
    exact_all = 1237
    # merged-from-sketches global estimate within HLL error (<5%)
    assert abs(out["__all__"] - exact_all) / exact_all < 0.05
    # merging partials must agree with sketching the whole table
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint")
    ).first()[0]
    assert out["__all__"] == direct
    # per-partition estimates also bounded
    for p in ("0", "1", "2", "3", "4"):
        exact = ev.filter(F.col("event_type") == p).select(
            "user_id"
        ).distinct().count()
        assert abs(out[p] - exact) / exact < 0.05


def test_hll_sketch_rows_are_fixed_size(spark):
    """The sketch column must stay small regardless of row count —
    that is the whole point of persisting sketches not data."""
    ev = spark.range(50_000).select(
        F.lit("a").alias("event_type"), F.col("id").alias("user_id")
    )
    sk = dataops.hll_partition_sketches(ev).select(
        F.length("sketch").alias("len")
    ).first()
    assert sk["len"] < 64 * 1024


def test_aqe_skew_join_split_engages(spark):
    """The AQE skew-join backstop the ingest stages rely on must
    actually fire: on a 95%-hot-key join with test-sized thresholds,
    the FINAL adaptive plan's SortMergeJoin must carry skew=true
    (the hot partition was split across tasks instead of funneling
    through one)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(
                F.lit("x" * 100), F.col("id").cast("string")
            ).alias("pad"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), F.lit("r").alias("v")
        )
        agg = left.join(right, "k").agg(
            F.sum(F.length("pad")).alias("s")
        )
        got = agg.collect()[0]["s"]
        # every key-0 left row matches (k=0 exists on the right); the
        # multiples of 20 match their own id when < 5000
        assert got > 0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

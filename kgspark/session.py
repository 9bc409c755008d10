"""SparkSession factory with the engine's pinned configs.

Scale posture (SURVEY.md §4.2): AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (every Python stage is
vectorized), shuffle partitions sized to the machine rather than the
200 default. On a real cluster the same builder is driven by
spark-submit --conf overrides; nothing here is local-mode-specific
except the master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("KGSPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("KGSPARK_SHUFFLE_PARTITIONS", "32")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE initial shuffle granularity. Two measured regimes
        # (BENCH/profile_cluster.md): on MEMORY-BOUNDED executors
        # (4-6 GB), partitions == cores makes a wide agg hold 1/cores
        # of the data per task and spill (the inverted-index agg
        # spilled 1.3 GB of a 1.4 GB shuffle at 8 partitions) — there,
        # 4x-cores initial partitions eliminated the spill entirely.
        # On the single-JVM 128 GB local bench nothing ever spills and
        # fine initial partitions instead tax the many-small-job
        # iterative segments 2-5x (A/B: kg_analytics 12.1s vs 26.8s).
        # Default = cores (the no-spill regime); the scaling protocols
        # and any bounded-memory deployment export
        # KGSPARK_AQE_INITIAL_FACTOR=4 KGSPARK_AQE_INITIAL_MIN=64.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(
                shuffle_partitions
                * int(os.environ.get("KGSPARK_AQE_INITIAL_FACTOR", "1")),
                int(os.environ.get("KGSPARK_AQE_INITIAL_MIN", "1")),
                shuffle_partitions,
            )),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle/broadcast compression codec. Default stays Spark's
        # lz4 (fastest; right for CPU-bound single-node runs). On
        # deployments where shuffle WRITE BANDWIDTH is the bottleneck —
        # the r4 cluster profile pinned ~2.4 GB of index shuffle
        # landing on ONE shared /tmp disk (BENCH/scaling_cluster.md) —
        # zstd roughly halves the bytes hitting disk for this engine's
        # text-heavy shuffles at a small CPU premium: export
        # KGSPARK_IO_CODEC=zstd (the cluster scaling protocol does).
        .config(
            "spark.io.compression.codec",
            os.environ.get("KGSPARK_IO_CODEC", "lz4"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

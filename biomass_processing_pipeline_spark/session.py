"""SparkSession factory tuned for the local[N] sandbox while keeping the
settings that matter on a real multi-executor cluster (AQE, skew join,
Arrow batches). On a cluster the same builder is used by spark-submit
entrypoints; only ``master`` comes from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biomass_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to the core count — on a real cluster
    this would be ~2-3x total executor cores; AQE coalesces the rest.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]"))
        except (IndexError, ValueError):
            n = os.cpu_count() or 8
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # 24g, not "as much as possible": oversized heaps (48g+) showed 3-4x
        # GC-pause spikes on the shuffle-heavy benchmark jobs
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # ZGC: G1 showed multi-second pause storms at 32 mutator threads on
        # shuffle-heavy jobs (measured medians: ZGC 1.5s, ParallelGC 2.4s,
        # G1 4.5-8.8s for the same warm job).
        # AlwaysPreTouch (round 6): this guest charges a large one-time
        # page-fault cost to whichever job first touches fresh heap — the
        # CLAUDE.md 226/35/15/8/9 s first-touch decay showed up as 25-55 s
        # FIRST reps on the knn/zonal/minhash legs in otherwise healthy
        # windows. Pre-touching the heap at JVM start pays it once,
        # before any timer runs (alternating fresh-JVM A/B: zonal first
        # rep 48.9/54.4 -> 8.9/9.4 s, knn first rep 48.9 -> 16.0 s, warm
        # minima unchanged or better). Same practice as pre-touching
        # executor heaps on a real cluster; override via BPP_GC.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("BPP_GC", "-XX:+UseZGC -XX:+AlwaysPreTouch"))
        .config("spark.ui.enabled", "false")
        # broadcast threshold: polygon/code dictionaries are small; let
        # Catalyst broadcast up to 64 MB before falling back to sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # local mode: shuffle files through tmpfs — with 32 concurrent shuffle
    # writers a disk-backed /tmp serializes the job (observed 3x slowdown);
    # on a real cluster this is the executors' local NVMe instead.
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/bpp-spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

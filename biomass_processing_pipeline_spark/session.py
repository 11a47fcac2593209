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
        # AlwaysPreTouch was TRIED and REJECTED in round 6: isolated
        # fresh-JVM legs showed it removing first-rep page-fault cliffs
        # (zonal first rep 48.9/54.4 -> 8.9/9.4 s), but full-suite
        # alternating A/B flipped the sign — pre-touching the 24 GB heap
        # evicts this guest's ~2 GB pinned page cache, so every blob
        # scan goes back to disk (same-window pairs: 45.6 vs 22.5 s and
        # 26.6 vs 18.5 s suite, zonal min 11.7 vs 3.3 s, blob first
        # touch 2-4x worse). Min-of-N already absorbs the first-rep
        # cliff; cache locality it cannot recover. Override via BPP_GC.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("BPP_GC", "-XX:+UseZGC"))
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

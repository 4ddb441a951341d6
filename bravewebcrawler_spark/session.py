"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (runtime
re-planning + skew-join handling), Arrow transport for pandas UDFs, UTC session
timezone (oracle comparisons), shuffle partitions sized to cores rather than the
200 default. On a 1000-executor cluster the same builder is used with
``master`` unset (picked up from spark-submit) and ``shuffle.partitions``
scaled to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bravewebcrawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    same entry points serve tests, bench at two parallelism levels, and a real
    spark-submit deployment (where master is injected externally).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_exec = int(os.environ.get("SPARK_GRAFT_EXECUTORS", "0"))
    if master is None:
        if n_exec > 0:
            # Multi-executor mode: N SEPARATE executor JVMs on this host
            # (Spark's local-cluster). This is the faithful stand-in for the
            # north rule's "N vs 4N executors": each executor has its own
            # heap and GC, so scaling does not funnel every task thread's
            # allocation rate through one shared heap the way local[K] does.
            # cores/exec fixed at 2 (a common small-executor shape); memory
            # per executor from SPARK_GRAFT_EXEC_MEM_MB (default 12288).
            mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "12288"))
            master = f"local-cluster[{n_exec},2,{mem_mb}]"
            cpus = n_exec * 2
        else:
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Default ~1x cores locally; SPARK_GRAFT_SHUFFLE_MULT raises it (2-3x
        # cores gives multi-wave stages whose stragglers rebalance — what a
        # real cluster runs; on one pass 2-3x total executor cores).
        if master.startswith("local-cluster["):
            n = cpus
        else:
            n = int(master[master.index("[") + 1 : -1]) if "[" in master else cpus
        mult = int(os.environ.get("SPARK_GRAFT_SHUFFLE_MULT", "1"))
        shuffle_partitions = max(n * mult, 8)

    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") == "1"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if aqe else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-optimize (coalesce/size) the output partitioning of
        # plans feeding a persist: off (the default) a cached intermediate
        # freezes its shuffle at the static partition count, so a tiny
        # cached table (LSH band/candidate lists: ~100k rows over 128
        # partitions) fans every downstream union/join into hundreds of
        # near-empty tasks. With AQE sizing the cache, partition count
        # follows DATA size at any scale — the same rule a 100-TB cache
        # wants (measured at sf1.0/local[32]: the 4-query refined-dedup
        # chain 89s -> 60s; results unaffected — partitioning only).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true" if os.environ.get("SPARK_GRAFT_CACHED_AQE", "1") == "1" else "false",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime-sized intermediates (the crawl's per-round key deltas)
        # convert to broadcast only when genuinely small; a bigger delta
        # keeps the parallel shuffle join instead of paying a driver-serial
        # multi-MB broadcast build every round. Statically-known small dims
        # still broadcast under the 64 MB planner threshold above.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        # In executor mode the driver runs no tasks — keep it small so
        # driver + N executor heaps fit the host together.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", "16g" if n_exec > 0 else "90g"),
        )
        # Headroom over the 1g default: a CollectLimit probe's per-task
        # results can transiently exceed 1g before the driver truncates at
        # the limit (seen with the >1M-row simhash pair list at sf1.0); the
        # driver heap above is sized far past this.
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_DRIVER_MAX_RESULT", "8g"))
        # Throughput GC: G1's pause-time goal thrashes under 32 task threads'
        # allocation rate (measured: 226s -> 102s on the crawl bench at
        # local[32]); batch analytics prefers ParallelGC throughput.
        .config("spark.driver.extraJavaOptions", os.environ.get("BWC_JVM_OPTS", "-XX:+UseParallelGC"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if master.startswith("local-cluster["):
        # Executor JVMs are separate processes: same GC policy as the driver,
        # and the engine package on the Python workers' path (the production
        # analog is spark-submit --py-files; here the repo dir suffices).
        # spark.executor.memory MUST be set explicitly: the master string's
        # third field is only the WORKER's offered memory; executors would
        # otherwise request the 1g default and OOM on the heavy stages.
        worker_mem_mb = master[len("local-cluster[") : -1].split(",")[2].strip()
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config("spark.executor.extraJavaOptions", os.environ.get("BWC_JVM_OPTS", "-XX:+UseParallelGC"))
            .config("spark.executor.memory", f"{worker_mem_mb}m")
            .config("spark.executorEnv.PYTHONPATH", repo_root)
        )
    # Ad-hoc conf overrides for benchmarking (e.g. AQE advisory partition
    # size A/B runs): BWC_EXTRA_CONF="k1=v1;k2=v2".
    for kv in filter(None, os.environ.get("BWC_EXTRA_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

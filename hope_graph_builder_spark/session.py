"""SparkSession factory tuned for the local[N] sandbox while keeping the
settings that matter on a 1000-executor cluster (AQE, skew-join,
Arrow batching, explicit shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "hope_graph_builder_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    executors: str | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``cpus`` controls local parallelism (``local[cpus]``); the same code
    runs unchanged under ``spark-submit --py-files`` on a real cluster,
    where ``master`` comes from the submitter instead.

    ``executors`` (or env SPARK_GRAFT_EXECUTORS) = "NxCxM" switches to
    ``local-cluster[N, C, M]`` — N real executor JVMs with C cores and
    M MB each. This is the multi-executor stand-in for the N-vs-4N
    scaling evidence: separate heaps avoid the single-JVM memory-manager
    and GC contention that caps local[32].
    """
    executors = executors or os.environ.get("SPARK_GRAFT_EXECUTORS") or None
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    if executors:
        n, c, m = (executors.split("x") + ["8", "12288"])[:3]
        master = f"local-cluster[{n},{c},{m}]"
        cpus = int(n) * int(c)
    else:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # 4× cores: large hash aggregations measured 3× faster at 128
        # vs 32 partitions on 32 cores (smaller per-task hash maps, less
        # spill); AQE coalesces the small ones back down
        shuffle_partitions = max(int(cpus) * 4, 32)

    aqe = "false" if os.environ.get("SPARK_GRAFT_AQE", "1") in ("0", "false") else "true"
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Spark's 1g default predates 32g drivers; AQE broadcast
        # materialization counts against it (measured: a ~1.1 GiB
        # adaptive broadcast aborted the 2-core dupsub leg while the
        # plan itself was fine)
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill to tmpfs: the sandbox's /tmp is a slow virtual disk
    # and shuffle I/O was the measured bottleneck (CPU idle at 10-40%
    # during shuffles). On a real cluster this is NVMe-backed local
    # storage; /dev/shm is the sandbox stand-in.
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    if executors:
        # real executor JVMs spawn their own python workers — ship the
        # repo path (the spark-submit --py-files twin for the sandbox)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

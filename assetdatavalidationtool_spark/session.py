"""SparkSession factory tuned for the validation engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster: AQE on (runtime skew-join splitting + shuffle coalescing),
shuffle partitions sized to cores, Arrow enabled for the vectorized
image UDFs.  On a multi-executor cluster the same builder is used from
``spark-submit --py-files``; only ``master`` and memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "advt_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cores=None`` → ``local[*]``.  ``shuffle_partitions`` defaults to
    2× cores: big enough for AQE to coalesce down, small enough to avoid
    tiny-task overhead in local mode.  At cluster scale the same ratio
    (2–3× total executor cores) holds; AQE adjusts at runtime.
    """
    cpus = cores or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 8
    master = f"local[{cpus}]"
    sp = shuffle_partitions or max(8, 2 * cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffle reads aggressively: violation/verdict
        # aggregates are tiny relative to the scan; without this the
        # default parallelismFirst keeps cores×N near-empty reduce tasks
        # alive and scheduling overhead dominates (observed 448-task
        # stages counting 24 rows)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image bytes are large; keep Arrow batches bounded so executor
        # memory holds decode buffers (input_hint: no per-row Python)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

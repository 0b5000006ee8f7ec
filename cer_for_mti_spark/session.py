"""SparkSession factory tuned for the engine.

Local-mode settings mirror what we'd set on a real cluster: AQE on (runtime
shuffle coalescing + skew-join splitting), Arrow transport for pandas UDFs,
shuffle partitions sized to cores (the 200 default over-parallelizes small
local runs and under-parallelizes 100 TB ones — at cluster scale this is set
to ~2-3x total cores via spark.sql.adaptive.coalescePartitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cer_for_mti_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Merged-layout hot postings are multi-MB binary cells (a
        # df=500k term's doc_ids+tfs+doclens row, and the collect_list
        # arrays feeding the merge UDF are tens of MB). Under G1's
        # default region sizing those are humongous allocations;
        # measured on the skew bench corpus they cause 1.5-2x
        # run-to-run swings (region fragmentation -> unpredictable full
        # GCs). A 32m region makes only >=16MB allocations humongous:
        # the skew/uniform build ratio drops from 1.4-2.0 (volatile) to
        # 1.06-1.25 (stable) and absolute build times improve ~10%.
        # Same flag applies to spark.executor.extraJavaOptions on a
        # real cluster (local mode: driver == executor).
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory tuned for the extraction workload.

Settings chosen for 100 TB-scale behavior (and harmless locally):

- AQE on: runtime partition coalescing + skew-join splitting.
- Arrow batches of 10k rows: the extraction kernel amortizes Python
  call overhead per batch; 10k HTML docs ~ tens of MB per batch keeps
  the Python worker's peak memory bounded.
- shuffle partitions default to cores (local) — on a real cluster this
  would be ~2-3x total executor cores; AQE coalesces the excess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1:master.find("]")]
        shuffle_partitions = 32 if n == "*" else max(int(n), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("TL_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the appStatus/SQL listeners retain per-execution plan graphs
        # even with the UI off; at defaults (1000 executions) a long
        # session of large-plan queries (curation combos, the driver
        # battery) can OOM the driver heap on bookkeeping alone
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "400")
        .config("spark.ui.retainedTasks", "20000")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

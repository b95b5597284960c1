"""SparkSession factory with scale-oriented defaults.

The defaults mirror what we would ship for a 1000-executor cluster run via
``spark-submit --py-files kgspark.zip``: AQE on (runtime re-planning +
skew-join splitting), explicit shuffle parallelism, Arrow transfers for the
pandas-UDF kernels. Tests/bench run on ``local[N]`` but nothing here assumes
local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    master: str | None = None,
    app_name: str = "kgspark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("KGSPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local-mode driver hosts all executor threads; default 1g thrashes GC
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # explicit: reused python workers amortize interpreter startup +
        # the per-process automaton build across UDF stages
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill dir: a sandbox local[N] run bottlenecks on /tmp disk
    # bandwidth long before 32 threads saturate CPU; cluster nodes would
    # have NVMe arrays. KGSPARK_LOCAL_DIR=/dev/shm/... restores the
    # CPU-bound regime for scaling measurements.
    local_dir = os.environ.get("KGSPARK_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""SparkSession builder with the configuration the pipeline assumes.

Scale design notes (100 TB / 1000 executors):
- AQE on, with skew-join splitting: the blocking self-join is the dominant
  shuffle and real web data has mega-blocks (dominant metro pincodes).
- Arrow batching on for every pandas UDF; extraction cost is bounded per
  batch, so maxRecordsPerBatch keeps Python-worker memory flat.
- shuffle.partitions is a knob, not a constant — local runs use the core
  count; a cluster run should target ~2-3× total cores with AQE coalescing
  the remainder.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "indian_address_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    prefer_tmpfs_scratch: bool = False,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else os.cpu_count() or 8
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # don't let AQE coalesce below the core count: mid-size shuffles
        # (e.g. the CC iterations) otherwise collapse to ~8 partitions and
        # leave the rest of the machine idle
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize the JVM↔Python round trip; measured
        # 20% faster extraction at 16 cores vs the 4096 default
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = driver only. Heap size is a measured trade-off: 24g
        # was GC-bound on the wide pair join at 16 threads (round 1), while
        # 64g made 32-thread python extraction ~27% SLOWER than 32g (G1
        # region/footprint effects at high worker counts). 32g is the
        # sweet spot on this 128 GiB box.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill scratch. OPT-IN, not a library default (a silent
    # /dev/shm default would fail with ENOSPC/OOM on any consumer whose
    # shuffle outgrows the tmpfs, and spilled shuffle data competes with
    # the executor heap for physical memory): the bench/scaling harnesses
    # pass prefer_tmpfs_scratch=True (or set SPARK_GRAFT_TMPFS_SCRATCH=1)
    # because this sandbox's /tmp is a SHARED virtual disk whose co-tenant
    # IO-contention episodes showed up as 2× block/link stage swings while
    # CPU calibration stayed flat. Even opted in, tmpfs is used only when
    # its free space clears a floor well above bench shuffle volume. On a
    # real cluster set spark.local.dir to executor-local NVMe instead.
    # SPARK_GRAFT_LOCAL_DIR always wins; Spark removes its scratch subdir
    # on normal JVM exit.
    scratch = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    opt_in = prefer_tmpfs_scratch or os.environ.get(
        "SPARK_GRAFT_TMPFS_SCRATCH", ""
    ).lower() in ("1", "true", "yes")
    if scratch is None and opt_in and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            free_gib = st.f_bavail * st.f_frsize / 2**30
        except OSError:
            free_gib = 0.0
        if free_gib >= 32.0:  # bench-scale shuffles are a few GiB
            scratch = "/dev/shm/spark_graft_scratch"
    if scratch:
        builder = builder.config("spark.local.dir", scratch)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

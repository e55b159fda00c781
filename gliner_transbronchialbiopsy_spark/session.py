"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the engine's execution profile (heavy Arrow UDF
stages + a handful of wide shuffles; see SURVEY.md §4):

- AQE on (runtime coalesce + skew-join split) — the backstop for the
  hot-key skew the reference works around with its prediction cache
  (reference: src/streamlit/app/models/model_handler.py:111-121).
- Arrow on for every pandas-UDF boundary.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle.partitions sized to cores for local runs; on a real cluster
  AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_local_dir() -> str:
    """Prefer tmpfs for shuffle/spill: this host's disk serializes
    concurrent shuffle writers (measured: the same 16-thread join+write
    ran 5x faster with spark.local.dir on /dev/shm). Overridable via
    SPARK_LOCAL_DIRS; real clusters use instance-local NVMe."""
    override = os.environ.get("SPARK_LOCAL_DIRS")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        try:
            os.makedirs(d, exist_ok=True)
            return d
        except OSError:
            pass
    return "/tmp"


def get_spark(
    app_name: str = "gliner_tbb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # split even modest parquet files across tasks: a 200 MB
        # single-file input must not become a 1-2 task scan when the
        # first stage is an expensive per-row UDF
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", _default_local_dir())
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_python_workers(spark, cpus)
    return spark


_WARMED: set[int] = set()


def _warm_python_workers(spark: SparkSession, cpus: int) -> None:
    """Pre-fork the Python worker pool (one per core) and pay the
    pandas/pyarrow/numpy import once, at session creation, instead of
    inside the first Python-stage query. spark.python.worker.reuse
    (default on) keeps the warmed workers alive for every later
    mapInPandas/pandas_udf stage. Measured at sf1.0/local[32]: the
    first Python-stage query after an otherwise-warm session ran 7.6s
    cold vs 5.5s with a warmed pool — ~2s of interpreter forking and
    imports that belongs to session setup, not to whichever operator
    happens to run first. Skippable via SPARK_GRAFT_NO_WORKER_WARMUP=1
    (e.g. pure-JVM batch jobs that never cross the Python boundary)."""
    if os.environ.get("SPARK_GRAFT_NO_WORKER_WARMUP"):
        return
    key = id(spark)
    if key in _WARMED:
        return
    _WARMED.add(key)

    def _touch(batches):
        import numpy  # noqa: F401 — imported for side effect (cache)

        yield from batches

    try:
        (
            spark.range(cpus)
            .repartition(cpus)
            .mapInPandas(_touch, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception:
        # warm-up is best-effort: a worker-spawn hiccup here must not
        # fail session creation (the real stage will retry its own)
        pass

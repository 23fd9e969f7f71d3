"""SparkSession factory tuned for this engine.

Scale notes (100 TB design, tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting means
  the same plan survives a 1000x scale-up without re-tuning
  ``spark.sql.shuffle.partitions`` by hand.
- Arrow on: every pandas UDF (embedders, multimodal decoders) moves data in
  columnar batches, not pickled rows.
- Session timezone pinned to UTC so event-time semantics match the DuckDB
  oracle (which treats parquet timestamps as UTC instants).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vectolite-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "4"
    shuffle = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()

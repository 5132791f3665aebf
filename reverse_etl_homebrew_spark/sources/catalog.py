"""Table catalog over the driver's parquet testdata.

The reference reads sources with generated ``SELECT *`` strings and
materializes every row in driver memory (reference main.py:534-549).
Here a scan is a lazy ``spark.read.parquet`` — Catalyst prunes columns
and pushes predicates down to the parquet footers, and nothing is ever
collected to the driver.

Scale note: each table is one parquet file locally; at 100 TB the same
loader points at a partitioned directory (e.g. date-partitioned
``orders/o_orderdate=.../``) and partition pruning composes with the
same code path — the engine never assumes single-file sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import normalize_session

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one catalog table.

    ``events`` needs special handling: its ``ts`` column is parquet
    timestamp[ns], which Spark's vectorized reader rejects outright.
    With ``spark.sql.legacy.parquet.nanosAsLong`` the raw int64
    surfaces as LongType and is converted to a microsecond
    TIMESTAMP_NTZ here — identical truncation to what DuckDB performs
    on the same file, so oracle comparisons agree.
    """
    normalize_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs truncation (values are post-1970, so floor == trunc),
        # then reinterpret as naive timestamp. timestamp_micros returns
        # TIMESTAMP; cast to NTZ via UTC so downstream semantics match
        # the other (NTZ) tables. Session tz is pinned UTC, so the cast
        # is instant-preserving.
        # integer `div`, not `/`: float division of int64 nanos loses
        # microsecond precision past 2^53
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every catalog table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

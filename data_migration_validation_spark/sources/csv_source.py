"""CSV ingestion matching the reference's loader semantics
(src/validate.py:52-53: ``pd.read_csv(dtype=str)`` — every column as
string; validators run afterwards as predicates). For the engine proper we
prefer typed Parquet/Iceberg scans; this source exists for parity with the
reference's validation inputs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv_all_string(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """All columns as StringType, header row as names (no inferSchema —
    a second pass over 100 TB of CSV just to guess types is never worth
    it; and inference would diverge from the reference's semantics)."""
    return spark.read.csv(path, header=header, inferSchema=False)

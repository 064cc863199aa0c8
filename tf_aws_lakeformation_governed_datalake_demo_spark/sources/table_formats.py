"""Optional table-format connectors (Delta Lake / Iceberg / Hudi).

The reference stores plain Parquet (main.tf:312-328); ACID table formats
are the north-star option (BASELINE.json "Parquet/Delta/Iceberg"). Their
jars are not in this image, so each connector is gated behind an
import/config probe and raises a clear error when absent — the read/write
API surface is defined now so callers can code against it. MERGE/upsert
does not need the jars at all: ``sources.lake.merge_into`` implements the
Delta-MERGE semantics on plain Parquet via partition-pruned dynamic
overwrite, and is what these connectors' merge would delegate to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableFormatUnavailable(RuntimeError):
    """The format's jars/extensions are not on this cluster's classpath."""


def _probe(spark: SparkSession, classname: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(classname)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def delta_available(spark: SparkSession) -> bool:
    return _probe(spark, "org.apache.spark.sql.delta.catalog.DeltaCatalog")


def iceberg_available(spark: SparkSession) -> bool:
    return _probe(spark, "org.apache.iceberg.spark.SparkCatalog")


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available(spark):
        raise TableFormatUnavailable(
            "Delta Lake jars not on classpath; add io.delta:delta-spark and "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        )
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not delta_available(df.sparkSession):
        raise TableFormatUnavailable("Delta Lake jars not on classpath")
    df.write.format("delta").mode(mode).save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not iceberg_available(spark):
        raise TableFormatUnavailable(
            "Iceberg jars not on classpath; add org.apache.iceberg:"
            "iceberg-spark-runtime and a SparkCatalog configuration"
        )
    return spark.table(table)

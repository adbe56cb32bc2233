"""CSV ingestion — the engine analogue of the reference's
CSVReaderPrimitive (tods/data_processing/CSVReader.py, a D3M wrapper around
pandas.read_csv) and ColumnParser's type coercion.

Spark-first: a `spark.read.text` scan + `from_csv` with an EXPLICIT schema
(never inferSchema on a 100 TB directory — inference is a full extra
scan). Parsing failures land in a corrupt-record column per row instead of
failing the job — and because the parse is an ordinary projection over a
text scan (not the CSV source's lazily-parsed internal column), the
quarantine filter is legal in any query shape, including corrupt-only
counts that the native CSV reader refuses (SPARK's "referencing internal
corrupt record column" restriction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    ts_cols: tuple[str, ...] = (),
    ts_format: str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-first CSV scan. `schema` is DDL ("a int, ts timestamp, ...");
    malformed rows carry the raw line in the corrupt-record column and are
    dropped unless keep_corrupt=True — the caller can route them to a
    quarantine sink instead of failing the job. With header=True the
    header line (recognized as the comma-joined field names) is dropped."""
    field_names = [f.strip().split()[0].strip("`")
                   for f in schema.split(",") if f.strip()]
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    if ts_format:
        opts["timestampFormat"] = ts_format
        opts["timestampNTZFormat"] = ts_format
    lines = spark.read.text(path)
    if header:
        lines = lines.filter(F.col("value") != ",".join(field_names))
    parsed = lines.select(
        F.from_csv(
            "value", f"{schema}, `{CORRUPT_COL}` string", opts
        ).alias("r")
    ).select("r.*")
    for c in ts_cols:
        parsed = parsed.withColumn(c, F.col(c).cast("timestamp"))
    if keep_corrupt:
        return parsed
    return parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) pair from a keep_corrupt=True scan — corrupt rows
    carry the raw line for the quarantine sink."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad

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
    quarantine sink instead of failing the job.

    With header=True a line is recognized as a header by PARSED-FIELD
    comparison: the line is CSV-parsed as strings and dropped iff every
    trimmed field equals the corresponding schema column name — so
    quoted/whitespace header variants (`"a","b"` / ` a , b`) are dropped
    wherever they appear (multi-file scans have one per file), while a
    typed data row can only match if ALL its fields are string-equal to
    ALL column names in order. Reordered-column headers do NOT match and
    surface as corrupt rows in the quarantine — by design, since silently
    accepting them would mis-assign every column in that file. The check
    is a single-scan projection: no shuffle, no extra jobs, no
    per-file-min bookkeeping — it survives a 100 TB directory."""
    field_names = [f.strip().split()[0].strip("`")
                   for f in schema.split(",") if f.strip()]
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    if ts_format:
        opts["timestampFormat"] = ts_format
        opts["timestampNTZFormat"] = ts_format
    lines = spark.read.text(path)
    if header:
        # probe one column PAST the schema arity: a line with extra
        # trailing fields (e.g. a 3-column variant's header against a
        # 2-column schema) must NOT be swallowed here — it belongs in the
        # corrupt-record quarantine where the schema drift is visible
        hdr_schema = ", ".join(
            f"`__h{i}__` string" for i in range(len(field_names) + 1)
        )
        hdr = F.from_csv("value", hdr_schema)
        is_header = hdr.getField(f"__h{len(field_names)}__").isNull()
        for i, name in enumerate(field_names):
            is_header = is_header & (
                F.trim(hdr.getField(f"__h{i}__")) == F.lit(name)
            )
        # cheap short-circuit prefilter: codegen's && skips the header
        # from_csv parse for lines that cannot be a header — one that
        # must start with the first column name, a quote, or whitespace
        # (the quoted/space variants the parsed comparison exists for)
        probe = (
            F.col("value").startswith(field_names[0])
            | F.col("value").startswith('"')
            | F.col("value").startswith(" ")
        )
        lines = lines.filter(
            ~F.coalesce(probe & is_header, F.lit(False))
        )
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

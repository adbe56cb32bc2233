"""tods_spark — a PySpark-native time-series rollup / downsample / retention
engine with the query and data-processing capabilities of datamllab/tods,
re-expressed Spark-first (DataFrame/SQL + Catalyst + Arrow UDFs).

Built from scratch against the public PySpark API; the reference at
/root/reference defines WHAT is computed (operator semantics, edge rules,
output naming — see SURVEY.md), never HOW.

Layout:
  session      — SparkSession builder tuned for the engine
  datagen      — deterministic synthetic token-table generator (FIXTURES.md F0)
  operators/   — rollup tiers, window stats, gap-fill, dedup, segmentation,
                 smoothing, detection plumbing, text/token/similarity ops
  functions/   — Gorilla XOR + delta-of-delta codec, mergeable quantile digest
  sources/     — Iceberg-style partition-overwrite storage over Parquet
  plans/       — checkpoint / lineage table, idempotent resume
  streaming/   — Structured Streaming tier-0 rollup
"""

__version__ = "0.1.0"

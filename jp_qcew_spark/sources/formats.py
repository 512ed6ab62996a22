"""JSONL and ORC source/sink surface (extension of SURVEY §2.A).

The reference consumes parquet/CSV/xlsx only; a training-data engine also
meets JSON-lines (the de-facto interchange format for LLM corpora — one
document object per line, gzip-shardable, append-friendly) and ORC (the
other columnar format large warehouses hand over).

Scale rules encoded here rather than left to callers:

- **Schema is declared, never inferred.** ``inferSchema``/sampling on a
  100 TB JSONL lake is a full extra pass over the data before the real job
  starts. Callers pass a DDL string or StructType; malformed lines land in
  ``_corrupt_record`` (PERMISSIVE) instead of failing the job, and can be
  quarantined with ``quarantine_corrupt``.
- **JSONL is splittable only uncompressed or with block codecs.** Plain
  ``.jsonl`` and bzip2 split fine; a single 1 TB ``.jsonl.gz`` becomes ONE
  task — shard upstream. (Documented here because it is the #1 JSONL
  ingestion foot-gun; Spark hides it until the stage graph shows one task.)
- **ORC round-trips with predicate pushdown + column pruning** just like
  parquet — same load_table discipline applies downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced JSON-lines scan (one object per line).

    PERMISSIVE mode: well-formed lines parse into the declared columns,
    malformed lines yield nulls plus the raw line in ``_corrupt_record`` —
    ingestion never aborts mid-100-TB because one shard has a bad row."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, T.StringType(), True)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_jsonl(
    spark: SparkSession, path: str, schema: str | T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSONL scan split into (clean, quarantined).

    Implemented as ``read.text`` + ``from_json`` rather than the JSON data
    source's ``_corrupt_record``: Spark disallows queries whose projection
    reaches the raw scan with ONLY the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    documented workaround — ``.cache()`` the parsed frame — is exactly what
    a 100 TB ingest cannot do. Here both branches are plain filters over a
    text scan: unparseable lines yield a null struct → quarantined with the
    raw line for replay; parseable lines with wrong-typed fields keep
    PERMISSIVE semantics (field-level nulls, row stays clean). Lazy
    end-to-end, no caching, splittable like any text scan."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    data_cols = schema.fieldNames()
    # the corrupt field must live INSIDE the from_json schema: a malformed
    # line parses to a struct whose data fields are null and whose corrupt
    # field holds the raw text (a null struct is never produced)
    parse_schema = schema.add(CORRUPT_COL, T.StringType(), True)
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_parsed")
    )
    is_bad = F.col(f"_parsed.{CORRUPT_COL}").isNotNull()
    clean = parsed.filter(~is_bad).select(
        *[F.col(f"_parsed.{c}").alias(c) for c in data_cols]
    )
    bad = parsed.filter(is_bad).select(
        F.col(f"_parsed.{CORRUPT_COL}").alias(CORRUPT_COL)
    )
    return clean, bad


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink, zlib-compressed, optionally hive-partitioned — the same
    mode-keyed layout discipline as the parquet sink (operators/etl.py)."""
    w = df.write.mode("overwrite").option("compression", "zlib")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; pushdown/pruning verified by tests the same way as
    parquet (ORC carries min/max stripe stats Spark uses for skipping)."""
    return spark.read.orc(path)

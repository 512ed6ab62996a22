"""Fixed-width QCEW text scan + decoder (SURVEY.md §2 S1-S4).

The reference reads latin-1 files line-by-line into Polars and slices 121
substrings per line (src/jp_qcew/data_process.py:113-133). Spark-first form:
``spark.read.text`` (distributed scan, one partition per file split) → a
single 121-column ``select`` projection of ``substring``/``trim`` expressions
— whole-stage-codegen'd, no Python in the loop, no driver-side file iteration
(replacing the reference's serial per-file loop, data_process.py:47-60).

At 100 TB: text scan parallelizes by HDFS/object-store split;
``input_file_name()`` carries provenance; the projection is map-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jp_qcew_spark.io import ensure_session_confs
from jp_qcew_spark.schema.qcew_fields import FIELDS, FLOAT_FIELDS, INT_FIELDS


def decode_columns(raw: Column | str = "value") -> list[Column]:
    """The 121-field decode projection: 1-based (position, length) slices,
    whitespace-stripped (reference data_process.py:128-133 slices then
    ``str.strip_chars()``, which strips the full whitespace class — tabs and
    stray \\r included — so a plain ``F.trim`` (ASCII space only) would
    decode dirty fields differently; ``btrim`` with the explicit whitespace
    set matches the reference and stays non-regex for the 121-slice hot
    path)."""
    col = F.col(raw) if isinstance(raw, str) else raw
    ws = " \t\r\n\x0b\x0c"
    return [
        F.btrim(F.substring(col, pos, length), F.lit(ws)).alias(name)
        for name, pos, length in FIELDS
    ]


def read_qcew_text(
    spark: SparkSession, path: str, encoding: str = "ISO-8859-1"
) -> DataFrame:
    """Scan QCEW fixed-width file(s)/glob → raw lines + source file name.

    Spark's ``text`` source decodes UTF-8 only (its ``encoding`` option is
    ignored on read — latin-1 bytes like ñ/é become U+FFFD), so non-UTF-8
    files route through the CSV reader as a line reader: a never-occurring
    separator, quoting disabled, one ``value`` column. That keeps the scan
    distributed and splittable, preserves leading/trailing spaces (the
    fixed-width positions depend on them), and honors ``encoding``.
    """
    if encoding.upper() in ("UTF-8", "UTF8"):
        reader = spark.read.format("text").load(path)
    else:
        reader = (
            spark.read.format("csv")
            .option("encoding", encoding)
            .option("sep", "\x01")
            .option("quote", "")
            .option("header", "false")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .schema("value string")
            .load(path)
        )
    return reader.select(F.col("value"), F.input_file_name().alias("source_file"))


def decode_qcew(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """Raw lines → 121 typed-ready string columns (+ provenance if present).

    Blank/short lines decode to empty strings per slice — the numeric casts
    downstream turn those into nulls (reference cast(strict=False) semantics).
    """
    extra = (
        [F.col("source_file")] if "source_file" in raw_df.columns else []
    )
    return raw_df.select(*decode_columns(raw_col), *extra)


def typed_qcew(decoded: DataFrame) -> DataFrame:
    """Apply the reference's 9 numeric casts (data_process.py:66-82),
    null-on-failure.

    Pins ANSI off first (idempotent), then uses plain non-ANSI ``.cast()``
    — NOT ``try_cast``: with blank/malformed fields common in fixed-width
    feeds, try_cast's TryEval(ansi-Cast) throws-and-catches a JVM
    exception PER FAILING VALUE (measured 1.4 s/150k failures at sf0.1 on
    cast_nullsafe; a 100 TB ingest would drown in exception overhead),
    while the non-ANSI cast nulls failures exception-free.

    Two documented deviations from a hypothetical try_cast build
    (ADVICE r5):

    - **Fractional strings in integer fields**: non-ANSI
      ``cast('1.5' AS LONG)`` TRUNCATES to 1 where try_cast yields NULL.
      QCEW integer fields are whole-number employment/wage counts, so a
      fractional string is a corrupt byte slice either way; truncation
      (the lenient Hive/Polars ``strict=False`` family behavior) is the
      INTENDED semantics here and is pinned by
      tests/test_qcew_pipeline.py::test_typed_cast_fractional_truncates.
    - **Execution-time conf dependence**: null-on-failure holds only
      while ``spark.sql.ansi.enabled`` is still false at ACTION time.
      ``ensure_session_confs`` pins it at plan time, but a caller who
      re-enables ANSI between plan and action turns malformed rows into
      runtime exceptions — callers owning exotic conf lifecycles should
      re-assert ``ensure_session_confs`` before the action."""
    ensure_session_confs(decoded.sparkSession)
    cols = {c: F.col(c).cast("long") for c in INT_FIELDS}
    cols.update({c: F.col(c).cast("double") for c in FLOAT_FIELDS})
    return decoded.withColumns(cols)

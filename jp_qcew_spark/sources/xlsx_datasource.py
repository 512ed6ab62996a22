"""xlsx as a first-class Spark source: ``spark.read.format("xlsx")``.

``sources/excel.py`` gives the engine a dependency-free xlsx PARSER, but as
a plain Python helper it only runs driver-side. This module lifts it into
the Spark 4 Python DataSource API (``pyspark.sql.datasource``) so workbooks
load through the ordinary reader surface — the same registration mechanism
any connector uses:

    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .option("sheet_id", 2).option("header", "true")
          .load("/dims/*.xlsx"))

Execution shape: one input partition PER FILE, parsed executor-side with
the stdlib zipfile/ElementTree machinery from ``excel.py`` — a directory of
workbooks scans in parallel with no driver materialization (the driver
touches only the FIRST file, to infer the schema). Values are coerced to
the inferred schema per partition, so heterogeneous workbooks fail loudly
instead of silently mixing types.

Scale posture stays honest: xlsx is a dimension format (the reference's
two NAICS sheets, data_process.py:194-199); facts belong in parquet/CSV.
But "a directory of quarterly dim drops" is a real shape, and per-file
partition parallelism is the right way to read it. Local paths / NFS only
— a cluster deployment would resolve globs through the Hadoop FS API; the
glob is expanded driver-side at plan time (files pinned per partition).
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from jp_qcew_spark.sources.excel import _infer_type, read_xlsx_rows


def _header_and_rows(
    raw: list[list], header: bool
) -> tuple[list[str], list[list]]:
    if header:
        if not raw:
            raise ValueError("empty sheet, no header row")
        names = [
            str(h) if h is not None else f"_c{i}" for i, h in enumerate(raw[0])
        ]
        return names, raw[1:]
    width = len(raw[0]) if raw else 0
    return [f"_c{i}" for i in range(width)], raw


def _coerce(v, dtype: T.DataType):
    """Coerce one parsed cell to the inferred column type (None passes).

    Fails loudly on lossy narrowing: schema inference samples only the
    first file, so a later file may carry fractional floats in a column
    inferred Long — silently truncating int(1.5) -> 1 would contradict the
    module contract that heterogeneous workbooks error, not corrupt.
    """
    if v is None:
        return None
    if isinstance(dtype, T.LongType):
        if isinstance(v, float) and not v.is_integer():
            raise ValueError(
                f"non-integral value {v!r} in a column inferred LongType; "
                "re-read with an explicit DoubleType schema"
            )
        return int(v)
    if isinstance(dtype, T.DoubleType):
        return float(v)
    if isinstance(dtype, T.BooleanType):
        return bool(v)
    return str(v)


class XlsxDataSource(DataSource):
    """Python DataSource wrapping the stdlib xlsx parser.

    Options: ``path`` (file or glob), ``sheet_id`` (1-based workbook
    position, default 1), ``header`` ("true"/"false", default true).
    """

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def _files(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise ValueError("xlsx source requires a path")
        files = sorted(_glob.glob(path)) or [path]
        return files

    def schema(self) -> T.StructType:
        sheet_id = int(self.options.get("sheet_id", 1))
        header = self.options.get("header", "true").lower() != "false"
        first = self._files()[0]
        names, rows = _header_and_rows(read_xlsx_rows(first, sheet_id), header)
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        return T.StructType(
            [
                T.StructField(n, _infer_type(list(c)), True)
                for n, c in zip(names, cols)
            ]
        )

    def reader(self, schema: T.StructType) -> "XlsxReader":
        return XlsxReader(
            files=self._files(),
            sheet_id=int(self.options.get("sheet_id", 1)),
            header=self.options.get("header", "true").lower() != "false",
            schema=schema,
        )


class XlsxReader(DataSourceReader):
    def __init__(
        self,
        files: list[str],
        sheet_id: int,
        header: bool,
        schema: T.StructType,
    ) -> None:
        self._files = files
        self._sheet_id = sheet_id
        self._header = header
        self._schema = schema

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition):
        path = partition.value
        names, rows = _header_and_rows(
            read_xlsx_rows(path, self._sheet_id), self._header
        )
        expected = [f.name for f in self._schema.fields]
        if self._header and names != expected:
            raise ValueError(
                f"{path}: sheet columns {names} != inferred schema {expected}"
            )
        dtypes = [f.dataType for f in self._schema.fields]
        width = len(dtypes)
        for r in rows:
            padded = r + [None] * (width - len(r))
            yield tuple(_coerce(v, t) for v, t in zip(padded[:width], dtypes))

"""DuckDB connector: ``spark.read.format("duckdb")`` + a table sink.

The north star names "Spark SQL + DuckDB connector" explicitly, and the
reference's legacy surface persists into a ``.ddb`` database (SURVEY §2.A
S10, README.md:7,56,65 / data_viz.py:15-16). This module gives the engine
real DuckDB connectivity on the Spark 4 Python DataSource API:

READ (distributed):

    spark.dataSource.register(DuckDBDataSource)
    df = (spark.read.format("duckdb")
          .option("table", "qcewtable")
          .option("partitions", 8)
          .load("/data/qcew.duckdb"))

The driver opens the database read-only to fetch the schema and the rowid
span; each input partition then opens its own read-only connection
executor-side and scans one rowid range (DuckDB supports concurrent
read-only connections across processes), so a large table fans out across
the cluster without driver materialization. Predicate/column pruning stays
Spark-side — rows stream through Arrow-sized fetch batches.

WRITE (driver-side, dimension scale):

    write_duckdb(df, "/data/out.duckdb", "qcewtable")

goes through ``toArrow()`` (Spark 4 collects via Arrow) + DuckDB's native
Arrow ingestion — one CREATE TABLE AS SELECT, no row loop. A multi-writer
distributed sink is intentionally NOT offered: a DuckDB file takes one
writer process (the reference is single-process too); facts belong in
parquet, and this sink exists for S10 parity at the dim/result scale the
reference actually uses it for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DUCK_TO_SPARK = {
    "BIGINT": T.LongType(),
    "INTEGER": T.IntegerType(),
    "SMALLINT": T.IntegerType(),
    "TINYINT": T.IntegerType(),
    "HUGEINT": T.LongType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampNTZType(),
    "BLOB": T.BinaryType(),
}


def _spark_type(duck_type: str) -> T.DataType:
    base = duck_type.split("(")[0].strip().upper()
    if base.startswith("DECIMAL"):
        return T.DoubleType()
    return _DUCK_TO_SPARK.get(base, T.StringType())


class DuckDBDataSource(DataSource):
    """Read a DuckDB table as a partitioned Spark DataFrame.

    Options: ``path`` (database file), ``table`` (required), ``partitions``
    (rowid-range splits, default 4).
    """

    @classmethod
    def name(cls) -> str:
        return "duckdb"

    def _opts(self) -> tuple[str, str, int]:
        path = self.options.get("path")
        table = self.options.get("table")
        if not path or not table:
            raise ValueError("duckdb source requires path and table options")
        if not table.replace("_", "").isalnum():
            raise ValueError(f"invalid table name {table!r}")
        return path, table, int(self.options.get("partitions", 4))

    def schema(self) -> T.StructType:
        import duckdb

        path, table, _ = self._opts()
        con = duckdb.connect(path, read_only=True)
        try:
            info = con.execute(f'DESCRIBE "{table}"').fetchall()
        finally:
            con.close()
        return T.StructType(
            [T.StructField(name, _spark_type(dtype), True) for name, dtype, *_ in info]
        )

    def reader(self, schema: T.StructType) -> "DuckDBReader":
        path, table, n_parts = self._opts()
        import duckdb

        con = duckdb.connect(path, read_only=True)
        try:
            lo, hi = con.execute(
                f'SELECT min(rowid), max(rowid) FROM "{table}"'
            ).fetchone()
        finally:
            con.close()
        return DuckDBReader(path, table, lo, hi, n_parts, schema)


class DuckDBReader(DataSourceReader):
    def __init__(self, path, table, lo, hi, n_parts, schema) -> None:
        self._path = path
        self._table = table
        self._lo = lo
        self._hi = hi
        self._n = max(1, n_parts)
        self._cols = ", ".join(f'"{f.name}"' for f in schema.fields)

    def partitions(self) -> list[InputPartition]:
        if self._lo is None:  # empty table
            return [InputPartition(None)]
        span = self._hi - self._lo + 1
        step = max(1, -(-span // self._n))
        bounds = []
        start = self._lo
        while start <= self._hi:
            bounds.append((start, min(start + step - 1, self._hi)))
            start += step
        return [InputPartition(b) for b in bounds]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        import duckdb

        lo, hi = partition.value
        con = duckdb.connect(self._path, read_only=True)
        try:
            cur = con.execute(
                f'SELECT {self._cols} FROM "{self._table}" '
                f"WHERE rowid BETWEEN {lo} AND {hi}"
            )
            while True:
                batch = cur.fetchmany(10_000)
                if not batch:
                    break
                yield from batch
        finally:
            con.close()


def write_duckdb(
    df: DataFrame, path: str, table: str, mode: str = "overwrite"
) -> int:
    """Persist a (dim/result-scale) DataFrame into a DuckDB database table.

    Arrow end-to-end: ``df.toArrow()`` (one driver collect) registered as a
    DuckDB view, then CREATE TABLE AS / INSERT INTO ... SELECT — no Python
    row loop. Returns the row count written. ``mode``: "overwrite" |
    "append" | "error".
    """
    import duckdb

    if not table.replace("_", "").isalnum():
        raise ValueError(f"invalid table name {table!r}")
    tbl = df.toArrow()
    con = duckdb.connect(path)
    try:
        con.register("_spark_arrow_in", tbl)
        exists = bool(
            con.execute(
                "SELECT 1 FROM information_schema.tables WHERE table_name = ?",
                [table],
            ).fetchall()
        )
        if exists and mode == "error":
            raise ValueError(f"table {table!r} already exists")
        if exists and mode == "overwrite":
            con.execute(f'DROP TABLE "{table}"')
            exists = False
        if exists:
            con.execute(f'INSERT INTO "{table}" SELECT * FROM _spark_arrow_in')
        else:
            con.execute(
                f'CREATE TABLE "{table}" AS SELECT * FROM _spark_arrow_in'
            )
        return con.execute(f'SELECT count(*) FROM "{table}"').fetchone()[0]
    finally:
        con.close()

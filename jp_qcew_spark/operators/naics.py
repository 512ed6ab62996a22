"""NAICS 4-digit economic aggregate with disclosure suppression.

The reference's flagship analytics query (``group_by_naics_code``,
data_process.py:137-188; SURVEY §3.2): establishment records →
(year, qtr, naics4) series of total wages, mean employment, establishment
count, with disclosure suppression (≥5 establishments) and payroll-tax
contribution columns.

Spark shape: one lazy chain — scan (partition-pruned parquet) → narrow
projection → groupBy → HAVING filter → derived columns. Single shuffle on
(year, qtr, naics4); AQE handles NAICS skew (Zipf-ish group sizes, 5–5,179
in the reference golden output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: payroll-tax contribution rates (reference data_process.py:182-186)
FONDO_RATE = 0.014
MEDICARE_RATE = 0.0145
SSN_RATE = 0.062

#: disclosure threshold: suppress groups with < 5 establishments (:179)
SUPPRESSION_MIN_ESTABLISHMENTS = 5


def naics4_aggregate(
    qcew: DataFrame,
    year_col: str = "year",
    qtr_col: str = "qtr",
) -> DataFrame:
    """Establishment-level records → suppressed NAICS4 series.

    Expects the typed ETL output (long employment/wages columns, string
    naics_code). Mirrors data_process.py:156-186: total_employment =
    mean of the 3 monthly employments (null-propagating sum / 3, double);
    blank naics4 dropped; HAVING count > 4; contributions = sum × rate.
    """
    base = qcew.select(
        F.col(year_col).alias("year"),
        F.col(qtr_col).alias("qtr"),
        F.substring("naics_code", 1, 4).alias("naics4"),
        (
            (
                F.col("first_month_employment")
                + F.col("second_month_employment")
                + F.col("third_month_employment")
            )
            / 3.0
        ).alias("total_employment"),
        F.col("total_wages"),
    ).filter(F.col("naics4") != "")
    agg = (
        base.groupBy("year", "qtr", "naics4")
        .agg(
            F.sum("total_wages").alias("total_wages"),
            F.avg("total_employment").alias("total_employment"),
            F.count("*").alias("dummy"),
        )
        .filter(F.col("dummy") >= SUPPRESSION_MIN_ESTABLISHMENTS)
    )
    return agg.select(
        "*",
        (F.col("total_wages") * FONDO_RATE).alias("fondo_contributions"),
        (F.col("total_wages") * MEDICARE_RATE).alias("medicare_contributions"),
        (F.col("total_wages") * SSN_RATE).alias("ssn_contributions"),
    )


def naics4_legacy_view(agg: DataFrame) -> DataFrame:
    """Rename the aggregate to the REFERENCE's shipped golden-output schema
    (reference data/external/naics4_df.parquet; legacy ibis suffix names from
    reference graph.py:16,38: first_4_naics_code, *_sum, dummy:int32) so a
    consumer of the reference's parquet can point at this engine unchanged."""
    return agg.select(
        F.col("year").cast("long").alias("year"),
        F.col("qtr").cast("long").alias("qtr"),
        F.col("naics4").alias("first_4_naics_code"),
        F.col("total_wages").cast("long").alias("total_wages_sum"),
        F.col("total_employment").cast("double").alias("total_employment_sum"),
        F.col("dummy").cast("int").alias("dummy"),
    )

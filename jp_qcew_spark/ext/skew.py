"""Skew-mitigation utilities — salted joins and two-phase aggregation.

SURVEY.md §4: NAICS-code frequencies in the reference's golden output are
Zipf-ish (establishment counts 5–5,179 per group), and at 100 TB any
power-law key (user_id, naics, shingle) turns one shuffle partition into the
straggler that holds the job. AQE's skew-join handling covers sort-merge
joins; these helpers cover the remaining cases explicitly:

- ``salted_join``: replicate the small side over ``n_salts`` copies and
  scatter the big side's hot keys uniformly — an equi-join that preserves
  exact semantics while fanning each hot key across ``n_salts`` tasks.
- ``two_phase_agg``: pre-aggregate on (key, salt) then finish on key.
  For Spark's own commutative aggregates this duplicates the built-in
  partial-agg; it exists for aggregations partial-agg can't split (e.g.
  exact distinct counts via two-level sets) and as the documented pattern.

Both are pure DataFrame transforms — no RDDs, no custom partitioners —
so Catalyst still sees through them (pushdown, pruning intact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of all columns —
    reproducible (no rand()), uniform enough to split hot keys."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn(col_name, salt)


def replicate(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Cross the (small) side with salt values 0..n_salts-1."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(col_name)
    return df.select("*", salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's rows scattered over ``n_salts`` salted
    copies of the small side. For the supported join types the result is
    exactly ``big.join(small, on, how)`` — the salt only changes the
    *physical* key distribution, so a hot join key occupies ``n_salts``
    tasks instead of one.

    Only big-side-preserving types are allowed: under right/full outer an
    unmatched small-side row would surface once per salted copy (n_salts
    null-padded duplicates), which is NOT the plain-join result."""
    safe = {"inner", "left", "left_outer", "leftouter", "semi", "left_semi",
            "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join supports {sorted(safe)}; {how!r} would duplicate "
            "unmatched small-side rows once per salt copy"
        )
    b = with_salt(big, n_salts)
    s = replicate(small, n_salts)
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 8,
) -> DataFrame:
    """sum(value) by keys via (keys, salt) partial then keys final — the
    explicit form of map-side combine for skewed key distributions."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("agg_value"))

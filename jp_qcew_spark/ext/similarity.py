"""Embedding similarity search — brute-force cosine top-k and sign-bit LSH.

North-star tier (BASELINE.json): ANN over an ``array<float>`` embedding
column. All arithmetic is JVM-side higher-order functions (zip_with /
aggregate) in double precision with left-fold accumulation — the exact fold
DuckDB's list functions use, so scores are engine-identical before rounding.

Scale design:
- Brute force is the correctness baseline: broadcast the (small) query set,
  score candidates map-side, take top-k per query with a bounded window. At
  100 TB the candidate scan is embarrassingly parallel; only the final top-k
  shuffles (tiny: k rows per query per partition after partial ranking).
- Sign-bit LSH (random-hyperplane surrogate using coordinate signs) buckets
  both sides so only same-bucket pairs are scored — the scale path; more
  planes → smaller buckets. Deterministic, so the oracle can re-derive it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """array<float> → array<double> so all accumulation is double-precision."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (bit-identical to DuckDB list_sum order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), decimals)


def idot(a: Column, b: Column) -> Column:
    """EXACT integer dot product over two array<long> columns (long
    accumulator fold). Quantized-vector math: every partial value is an
    integer, so the result is identical regardless of engine, partition
    order, or fold direction — the determinism device the float dot can't
    provide when values cross an aggregation (see semdedup_mutual)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, left-fold accumulated (bit-identical to DuckDB's
    list_sum over list_transform(list_zip(...)))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Coordinate-sign LSH bucket: the first ``n_planes`` dimension signs as a
    bit string. Cheap deterministic stand-in for random hyperplanes."""
    return F.concat(
        *[
            F.when(F.get(vec, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_planes)
        ]
    )


def sign_bands(vec: Column, bands: int, row_bits: int) -> Column:
    """Multi-band sign-LSH keys: ``bands`` bucket strings, band ``k`` built
    from the ``row_bits`` coordinate-sign planes [k*row_bits, (k+1)*row_bits).
    Plane sets are DISJOINT across bands (band independence is what makes
    the any-band-collides OR meaningful: P(candidate) = 1-(1-p^r)^b for
    per-plane agreement p), so ``bands * row_bits`` must be ≤ the embedding
    dimension. Deterministic — both engines re-derive the identical keys."""
    return F.array(
        *[
            F.concat(
                *[
                    F.when(F.get(vec, k * row_bits + i) >= 0, F.lit("1"))
                    .otherwise(F.lit("0"))
                    for i in range(row_bits)
                ]
            )
            for k in range(bands)
        ]
    )

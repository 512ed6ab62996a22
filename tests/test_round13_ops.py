"""Round-13 additions: the by_residual pricing eval, the SNM plant-
offset guard, and the packed neardup state representation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jp_qcew_spark.plans import inspect as I


def test_pq_residual_eval_values_and_shape(spark, sf_dir):
    """knn_pq_residual_eval: one row per variant; recall in [0, 1];
    reconstruction distortion positive; the coarse ratio is a genuine
    fraction, IDENTICAL across rows (it is a property of the coarse
    quantizer, not the codebook variant); and the residual variant's
    distortion is AT MOST the raw variant's — the variance the cells
    remove can only help reconstruction; the eval's point is that on
    this corpus the help is too small to move recall."""
    from jp_qcew_spark.queries.similarity import (
        _PQ_RESIDUAL_VARIANTS,
        q_knn_pq_residual_eval,
    )

    rows = (
        q_knn_pq_residual_eval(spark, sf_dir).orderBy("variant").collect()
    )
    assert [r["variant"] for r in rows] == sorted(_PQ_RESIDUAL_VARIANTS)
    by = {r["variant"]: r for r in rows}
    for r in rows:
        assert 0.0 <= r["recall_at3"] <= 1.0
        assert r["mean_recon_d2"] > 0.0
        assert 0.0 < r["coarse_rss_ratio"] < 1.0
    assert (
        by["raw"]["coarse_rss_ratio"] == by["residual"]["coarse_rss_ratio"]
    )
    assert by["residual"]["mean_recon_d2"] <= by["raw"]["mean_recon_d2"]


def test_pq_residual_eval_plan(spark, sf_dir):
    """Plan pins for the eval: no cartesian product, partial aggregation
    present, scans pruned to the embedding columns — the same posture
    the standalone PQ tiers pin."""
    from jp_qcew_spark.queries.similarity import q_knn_pq_residual_eval

    df = q_knn_pq_residual_eval(spark, sf_dir)
    assert not I.has_cartesian_product(df)
    assert I.has_partial_aggregation(df)
    assert all(
        set(s) <= {"vec_id", "label", "embedding"} for s in I.read_schemas(df)
    )


def test_snm_plant_offset_guard():
    """The planted-twin id space must fail LOUDLY when the corpus could
    alias it (ADVICE r12): both engines would agree on the corrupted
    recall, so no hash gate catches a silent alias."""
    from unittest import mock

    from jp_qcew_spark.queries import dedup as D

    with mock.patch.object(
        D, "metadata_row_count", return_value=D._SNM_PLANT_OFFSET
    ):
        with pytest.raises(ValueError, match="alias real doc_ids"):
            D.q_dedup_snm_recall_eval(None, "unused")


def test_neardup_state_identity_is_packed_binary(spark, sf_dir):
    """The neardup wire's band identity is the 18-byte packed binary
    (2-byte band index + 16 md5 bytes), LOSSLESSLY equivalent to the
    r11 'idx:md5hex' string — same prior/keeper decisions, half the
    value-typed-state rewrite bytes. Pin the packing round-trip against
    the string form on real corpus signatures."""
    import os

    from jp_qcew_spark.ext import dedup as D

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(50)
    )
    both = (
        docs.select(
            F.posexplode(D.minhash_band_keys(F.col("text"), 12, 4)).alias(
                "band_idx", "band_key"
            )
        )
        .select(
            F.concat_ws(":", F.col("band_idx"), F.col("band_key")).alias(
                "s"
            ),
            F.unhex(
                F.concat_ws(
                    "",
                    F.lpad(F.hex(F.col("band_idx")), 4, "0"),
                    F.col("band_key"),
                )
            ).alias("b"),
        )
        .collect()
    )
    assert both, "corpus produced no band keys"
    for r in both:
        assert len(r["b"]) == 18
        idx, hexpart = r["s"].split(":", 1)
        assert r["b"] == bytes.fromhex(f"{int(idx):04x}") + bytes.fromhex(
            hexpart
        )

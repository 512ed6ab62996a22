"""Round-10 operators: the recall-TARGETED RP banding tier.

Covers: band-count derivation from a (threshold, recall) target
(1-(1-p^r)^b), the seeded high-similarity certification fixture, the
>=0.9-recall-at->=0.8-cosine contract, the <=bands x single-band
candidate-volume rail, and the plan pins (cached Arrow keygen, keyed
self-join, no corpus broadcast)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_target_cfg_derivation():
    """b = ceil(ln(1-R)/ln(1-p^r)) with the documented rounding
    discipline; occupancy bits unchanged from the RP tier; the plane
    budget raises loudly when outgrown."""
    import pytest

    from jp_qcew_spark.queries.similarity import (
        _RP_TGT_PLANES,
        _lsh_cfg_rp_target,
    )

    for n in (205, 712, 2100, 10_100, 100_000):
        bands, bits = _lsh_cfg_rp_target(n)
        assert bits == max(4, math.ceil(math.log2(n / 16.0)))
        p = 1.0 - math.acos(0.8) / math.pi
        q = round(p**bits, 12)
        # the derived b satisfies the recall floor ...
        assert 1.0 - (1.0 - q) ** bands >= 0.9
        # ... minimally (b-1 bands would miss it)
        assert 1.0 - (1.0 - q) ** (bands - 1) < 0.9
        assert bands * bits <= _RP_TGT_PLANES
    # a corpus the oracle's plane enumeration cannot cover must raise,
    # not silently hash-diverge (the _lsh_cfg_rp rule)
    with pytest.raises(ValueError, match="planes"):
        _lsh_cfg_rp_target(10**9)


def test_rp_fixed_cfg_raises_past_oracle_budget():
    """The fixed-bands RP tier raises past its own 128-plane oracle
    budget (ADVICE r9: past row_bits=32 the oracle's sign string was
    silently truncated)."""
    import pytest

    from jp_qcew_spark.queries.similarity import _lsh_cfg_rp

    assert _lsh_cfg_rp(16 * 2**32) == (4, 32)
    with pytest.raises(ValueError, match="planes"):
        _lsh_cfg_rp(16 * 2**33)


def test_aug_vecs_fixture(spark, sf_dir):
    """The seeded fixture: |aug| = n + 2*_PLANT_N; planted cohorts sit
    at the designed cosine targets (~0.958 for e=0.3, ~0.857 for
    e=0.6), i.e. the >=0.8 bin has real members to certify against."""
    from jp_qcew_spark.ext import similarity as S
    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.similarity import _PLANT_N, _aug_vecs

    n = load_table(spark, sf_dir, "embeddings").count()
    aug = _aug_vecs(spark, sf_dir)
    assert aug.count() == n + 2 * _PLANT_N
    base = aug.filter(F.col("vec_id") < _PLANT_N).select(
        "vec_id", F.col("v").alias("vo")
    )
    for off, lo_cos, hi_cos in (
        (1_000_000, 0.93, 0.99),
        (2_000_000, 0.78, 0.92),
    ):
        planted = aug.filter(
            (F.col("vec_id") >= off) & (F.col("vec_id") < off + _PLANT_N)
        ).select((F.col("vec_id") - off).alias("vec_id"), "v")
        cs = (
            base.join(planted, "vec_id")
            .select(S.cosine(F.col("vo"), F.col("v")).alias("c"))
            .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
            .collect()[0]
        )
        assert cs["lo"] >= lo_cos and cs["hi"] <= hi_cos, (
            off,
            cs["lo"],
            cs["hi"],
        )


def test_recall_target_contract(spark, sf_dir):
    """THE round-10 contract: recall in the >=0.8-cosine bin clears the
    0.9 floor, and the bands column carries the derived count."""
    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.similarity import (
        _PLANT_N,
        _lsh_cfg_rp_target,
        q_dedup_recall_target_eval,
    )

    rows = {
        r["sim_band"]: r
        for r in q_dedup_recall_target_eval(spark, sf_dir).collect()
    }
    hi = rows["0.80+"]
    assert hi["n_true"] >= 2 * _PLANT_N * 0.9  # the planted cohorts
    assert hi["recall_tgt"] >= 0.9, hi
    n_aug = load_table(spark, sf_dir, "embeddings").count() + 2 * _PLANT_N
    assert hi["bands_used"] == _lsh_cfg_rp_target(n_aug)[0]


def test_recall_target_contract_sf01(spark):
    """The verdict's pinned certification scale: >=0.9 recall in the
    >=0.8 bin at sf0.1 (measured 0.99)."""
    from jp_qcew_spark.queries.similarity import (
        q_dedup_recall_target_eval,
    )

    rows = {
        r["sim_band"]: r
        for r in q_dedup_recall_target_eval(
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    assert rows["0.80+"]["recall_tgt"] >= 0.9, rows["0.80+"]


def test_target_candidate_volume_rail(spark, sf_dir):
    """Candidate volume stays <= bands x the largest single band's pair
    count — the banding multiplies the occupancy-ruled volume by AT MOST
    b (a pair colliding in several bands is distinct-ed, so usually
    less)."""
    from jp_qcew_spark.ext import similarity as S
    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.similarity import (
        _PLANT_N,
        _aug_vecs,
        _banded_cand,
        _lsh_cfg_rp_target,
    )

    n_aug = load_table(spark, sf_dir, "embeddings").count() + 2 * _PLANT_N
    bands, bits = _lsh_cfg_rp_target(n_aug)
    aug = _aug_vecs(spark, sf_dir)
    _vecs_f, cand = _banded_cand(
        spark,
        sf_dir,
        cfg=_lsh_cfg_rp_target,
        keyfn=S.rp_bands,
        vecs=aug,
        n=n_aug,
    )
    n_cand = cand.count()
    per_band = (
        aug.select(
            F.posexplode(
                S.rp_bands(F.col("v"), bands, bits)
            ).alias("band", "bkt")
        )
        .groupBy("band", "bkt")
        .agg(F.count("*").alias("c"))
        .select("band", (F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .groupBy("band")
        .agg(F.sum("p").alias("pairs"))
        .agg(F.max("pairs").alias("mx"))
        .collect()[0]["mx"]
    )
    assert n_cand <= bands * per_band, (n_cand, bands, per_band)


def test_dedup_rp_target_plan(spark, sf_dir):
    """Targeted generator keeps the RP dedup plan shape: ONE cached
    Arrow keygen matmul (every ArrowEvalPython inside an
    InMemoryRelation subtree), Generate band fan-out, pair-distinct
    aggregate, no cartesian, no corpus broadcast."""
    from jp_qcew_spark.plans import inspect as I
    from jp_qcew_spark.queries.similarity import (
        q_dedup_embedding_rp_target,
    )

    df = q_dedup_embedding_rp_target(spark, sf_dir)
    assert not I.has_cartesian_product(df)
    assert I.broadcast_hint_count(df) == 0
    plan = I.formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert "Generate" in plan
    assert "HashAggregate" in plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    lines = executed.splitlines()
    hits = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    assert hits, "keygen matmul missing from the executed plan"
    assert all(
        any(
            "InMemoryRelation" in l
            for l in lines[max(0, i - 4) : i]
        )
        for i in hits
    ), "keygen ArrowEvalPython outside the banded cache"


def test_recall_target_eval_plan(spark, sf_dir):
    """The eval keeps the linear-truth shape: exactly ONE broadcast hint
    (the bounded eval slice — |slice| x n, never n^2), cached keygen, no
    cartesian; ratios in [0, 1] with n_tgt <= n_true."""
    from jp_qcew_spark.plans import inspect as I
    from jp_qcew_spark.queries.similarity import (
        q_dedup_recall_target_eval,
    )

    df = q_dedup_recall_target_eval(spark, sf_dir)
    assert not I.has_cartesian_product(df)
    assert I.broadcast_hint_count(df) == 1
    plan = I.formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_tgt"] <= r["n_true"]
        assert 0.0 <= r["recall_tgt"] <= 1.0


def test_semdedup_rp_substrate_plan(spark, sf_dir):
    """The RP substrate behind the clustering family (VERDICT r9 #5):
    the mutual-edge pipeline keeps the keygen-once pin (every
    ArrowEvalPython inside an InMemoryRelation subtree), keyed banded
    self-join, NO corpus-side broadcast, no cartesian."""
    from jp_qcew_spark.ext import similarity as S
    from jp_qcew_spark.plans import inspect as I
    from jp_qcew_spark.queries.similarity import (
        _lsh_cfg_rp,
        _mutual_edges,
    )

    df = _mutual_edges(spark, sf_dir, cfg=_lsh_cfg_rp, keyfn=S.rp_bands)
    assert not I.has_cartesian_product(df)
    assert I.broadcast_hint_count(df) == 0
    plan = I.formatted_plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    lines = executed.splitlines()
    hits = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    assert hits, "RP keygen matmul missing from the executed plan"
    assert all(
        any(
            "InMemoryRelation" in l
            for l in lines[max(0, i - 4) : i]
        )
        for i in hits
    ), "clustering-substrate keygen ArrowEvalPython outside the cache"


def test_semdedup_rp_semantics(spark, sf_dir):
    """Tier swap is config, not semantics: every cluster keeps exactly
    one representative, n_kept + n_dropped == n_members, keep_cos is a
    valid cosine, and singleton components are kept whole."""
    from jp_qcew_spark.queries.similarity import q_semdedup_rp

    rows = q_semdedup_rp(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"]
        assert r["n_kept"] >= 1
        assert -1.0 <= r["keep_cos"] <= 1.0
        if r["n_members"] == 1:
            assert r["n_dropped"] == 0 and r["keep_id"] == r["comp"]

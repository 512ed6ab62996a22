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
    """The r11 cost sweep: bits start AT OR ABOVE the occupancy floor,
    b = ceil(ln(1-R)/ln(1-p^r)) is minimal for the CHOSEN r, the swept
    config never costs more than the floor config under the documented
    probe-volume model, and the plane budget raises loudly when
    outgrown."""
    import pytest

    from jp_qcew_spark.queries.similarity import (
        _RP_TGT_PLANES,
        _lsh_cfg_rp_target,
        _qgrid,
    )

    p = 1.0 - math.acos(0.8) / math.pi

    def b_for(r):
        q = _qgrid(p**r, 1e12)
        return math.ceil(_qgrid(math.log(0.1) / math.log(1.0 - q), 1e6))

    def cost(b, r, n):
        return b * (1.0 + n / 2.0 ** (r + 1))

    for n in (205, 712, 2100, 10_100, 100_000):
        bands, bits = _lsh_cfg_rp_target(n)
        floor_bits = max(4, math.ceil(math.log2(n / 16.0)))
        assert bits >= floor_bits  # never below the occupancy floor
        q = _qgrid(p**bits, 1e12)
        # the derived b satisfies the recall floor ...
        assert 1.0 - (1.0 - q) ** bands >= 0.9
        # ... minimally (b-1 bands would miss it)
        assert 1.0 - (1.0 - q) ** (bands - 1) < 0.9
        assert bands * bits <= _RP_TGT_PLANES
        # the sweep only ever improves on the floor config
        assert cost(bands, bits, n) <= cost(b_for(floor_bits), floor_bits, n)
        # and is the argmin over every admissible swept r
        for r in range(floor_bits, 41):
            br = b_for(r)
            if br * r > _RP_TGT_PLANES:
                break
            assert cost(bands, bits, n) <= cost(br, r, n)
    # a corpus whose FLOOR config already outgrows the oracle's plane
    # enumeration must raise, not silently hash-diverge (_lsh_cfg_rp rule)
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
    >=0.8 bin at sf0.1 (measured 0.99). The path is deliberately pinned
    (unlike the r9 balance-rail fixture ADVICE flagged, the config here
    is derived from the corpus the query actually reads, so the test is
    internally consistent at any path — sf0.1 is named because the
    certification CLAIM is at that scale)."""
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


def test_stream_dedup_neardup_batch_semantics(spark, tmp_path_factory):
    """Crafted 16-doc corpus, bsz = ceil(16/8) = 2: an identical text
    (all bands collide by construction) repeated ACROSS batches must be
    dup_vs_seen, repeated WITHIN a batch kept + dup_in_batch; unique
    texts kept; a doc under 3 words has no shingles and is OUT of the
    query's scope on both engines (the dedup_minhash_lsh nonempty
    rule)."""
    from jp_qcew_spark.streaming.pipelines import stream_dedup_neardup

    d = tmp_path_factory.mktemp("sdn")
    rows = []
    for i in range(16):
        if i in (0, 3):
            text = "the quick brown fox jumps over the lazy dog today"
        elif i in (4, 5):
            text = "pack my box with five dozen liquor jugs tonight"
        elif i == 7:
            text = "hi"  # < 3 words: no shingles, out of scope
        else:
            # fully indexed tokens: no shared shingles between docs (a
            # first cut shared 60% of shingles via common filler words
            # and the band family CORRECTLY flagged them as near-dups)
            text = " ".join(f"w{i}x{j}" for j in range(10))
        rows.append((i, text))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    got = {
        r.doc_id: r.status
        for r in stream_dedup_neardup(spark, str(d)).collect()
    }
    assert 7 not in got
    assert got[0] == "kept"
    assert got[3] == "dup_vs_seen"  # batch 1 probes state set by batch 0
    assert got[4] == "kept"
    assert got[5] == "dup_in_batch"  # same batch (2), higher doc_id
    assert all(
        got[i] == "kept" for i in got if i not in (3, 5)
    ), got


def test_stream_dedup_neardup_matches_banded_batch(spark, sf_dir):
    """The wire decision must agree with the BATCH banded reconstruction
    (the oracle's device, recomputed here in Spark): same band family,
    same batch rule — any divergence means state was lost or a band key
    drifted."""
    from pyspark.sql import Window

    from jp_qcew_spark.ext import dedup as D
    from jp_qcew_spark.functions.text import tokens
    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.dedup import (
        _NUM_BANDS,
        _NUM_HASHES,
        _ROWS_PER_BAND,
    )
    from jp_qcew_spark.queries.streaming import q_stream_dedup_neardup

    got = {
        r.doc_id: r.status
        for r in q_stream_dedup_neardup(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    bsz = -(-n // 8)
    rk = docs.select(
        "doc_id",
        ((F.row_number().over(Window.orderBy("doc_id")) - 1) / bsz)
        .cast("long")
        .alias("bi"),
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = toks.select(
        "doc_id", D.shingles_from_tokens(F.col("t")).alias("shset")
    ).filter(F.size("shset") > 0)
    sig = sh.select(
        "doc_id", D.minhash_array(F.col("shset"), _NUM_HASHES).alias("sig")
    )
    keyed = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    D.band_key(F.col("sig"), b, _ROWS_PER_BAND)
                    for b in range(_NUM_BANDS)
                ]
            )
        ).alias("band_idx", "band_key"),
    ).join(rk, "doc_id")
    wk = Window.partitionBy("band_idx", "band_key")
    wkb = Window.partitionBy("band_idx", "band_key", "bi")
    ann = keyed.select(
        "doc_id",
        "bi",
        F.min("bi").over(wk).alias("min_bi"),
        F.min("doc_id").over(wkb).alias("min_doc"),
    )
    want = {
        r.doc_id: r.status
        for r in ann.groupBy("doc_id")
        .agg(
            F.max((F.col("bi") > F.col("min_bi")).cast("int")).alias("p"),
            F.max(
                (F.col("doc_id") > F.col("min_doc")).cast("int")
            ).alias("l"),
        )
        .select(
            "doc_id",
            F.when(F.col("p") == 1, "dup_vs_seen")
            .when(F.col("l") == 1, "dup_in_batch")
            .otherwise("kept")
            .alias("status"),
        )
        .collect()
    }
    assert got == want


def test_target_cfg_is_a_real_parameter():
    """The (threshold, recall) target is a PARAMETER, not a constant
    pair: across a grid of contracts the derived b always satisfies the
    floor minimally, tightens monotonically with the recall floor, and
    grows as the threshold drops (lower-similarity pairs collide less
    per band, so more bands are needed)."""
    import math

    from jp_qcew_spark.queries.similarity import (
        _lsh_cfg_rp_target,
        _qgrid,
    )

    n = 10_100
    for thr in (0.7, 0.8, 0.9):
        for rec in (0.8, 0.9, 0.95):
            b, r = _lsh_cfg_rp_target(n, thr, rec)
            p = 1.0 - math.acos(thr) / math.pi
            q = _qgrid(p**r, 1e12)
            assert 1.0 - (1.0 - q) ** b >= rec
            assert 1.0 - (1.0 - q) ** (b - 1) < rec
    b90, _ = _lsh_cfg_rp_target(n, 0.8, 0.90)
    b95, _ = _lsh_cfg_rp_target(n, 0.8, 0.95)
    assert b95 > b90
    b_lo, _ = _lsh_cfg_rp_target(n, 0.7, 0.9)
    b_hi, _ = _lsh_cfg_rp_target(n, 0.9, 0.9)
    assert b_lo > b90 > b_hi


def test_target_cfg_domain_guard():
    """Degenerate targets raise instead of deriving b=0 (threshold=1.0
    makes p=1 and the log ratio collapse)."""
    import pytest

    from jp_qcew_spark.queries.similarity import _lsh_cfg_rp_target

    for thr, rec in ((1.0, 0.9), (0.0, 0.9), (0.8, 1.0), (0.8, 0.0)):
        with pytest.raises(ValueError, match="strictly inside"):
            _lsh_cfg_rp_target(1000, thr, rec)

"""Driver-facing query registry.

Aggregates every query group into two dicts consumed by ``__spark_entry__``:

- ``all_queries()``  : name -> callable(spark, sf_dir) -> DataFrame
- ``all_oracles()``  : name -> equivalent DuckDB SQL (omitted for ops that are
  genuinely not SQL-expressible; the driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_GROUPS = [
    "jp_qcew_spark.queries.core",
    "jp_qcew_spark.queries.joins",
    "jp_qcew_spark.queries.windows",
    "jp_qcew_spark.queries.events",
    "jp_qcew_spark.queries.setops",
    "jp_qcew_spark.queries.text",
    "jp_qcew_spark.queries.dedup",
    "jp_qcew_spark.queries.similarity",
    "jp_qcew_spark.queries.streaming",
    "jp_qcew_spark.queries.multimodal",
    "jp_qcew_spark.queries.sketches",
    "jp_qcew_spark.queries.geo",
    "jp_qcew_spark.queries.graph",
    "jp_qcew_spark.queries.scalars",
    "jp_qcew_spark.queries.llm_prep",
    "jp_qcew_spark.queries.wages_ts",
    "jp_qcew_spark.queries.training",
    "jp_qcew_spark.queries.warehouse",
    "jp_qcew_spark.queries.curation",
]

# Driver-window rotation (VERDICT r2 #1): the driver's CORRECTNESS snapshot
# covers only the FIRST 50 registry entries, so registration order is
# evidence policy. This list pins the round-3 window: the 43 highest-value
# queries with no round-2 driver row (ANN, streaming, multimodal, pandas-UDF,
# wages/timeseries, warehouse, curation, training, plus the re-anchored
# sketch pair / pagerank / llm_prep flagship) and the 7 VERDICT-mandated
# re-checks (text_inverted_index fix + the 6 round-2 first-time-greens).
# Everything NOT listed follows in module-registration order — those all
# carry 1-2 rounds of prior driver evidence or rotate into a later round.
#
# ROUND-4 ROTATION TODO — still never driver-checked after this window:
# scalars (math_funcs, regex_extract, date_funcs, array_map_funcs,
# string_funcs, null_semantics, regr_stats, histogram_bins, argmax_funcs),
# geo_nearest, geo_bbox_join, cube_agg, grouping_sets, quantiles_exact,
# agg_distinct_exact, dedup_components, dedup_fuzzy, events_variant,
# udtf_tokenize, kmeans_cluster, events_session_gaps, geo_grid_join. Lead the
# next window with those 22 +
# fresh re-checks.
_WINDOW_PRIORITY = [
    # ANN tier (r1-green but evicted in r2, + 2 never checked)
    "knn_bruteforce",
    "knn_signlsh",
    "knn_classify",
    "knn_ivf",
    "knn_hybrid",
    "knn_multiprobe",
    # streaming tier (never driver-checked)
    "stream_session",
    "stream_dedup",
    "stream_stateful_user_stats",
    "stream_static_join",
    "stream_stream_join",
    # multimodal tier (never driver-checked)
    "mm_metadata",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_ppm_decode",
    # pandas-UDF tier (never driver-checked)
    "grouped_zscore",
    "udf_vector_norm",
    # QCEW wages / timeseries chain (S8/A2/A5/A6/F9/F10 driver rows — r2 #7)
    "wages_series",
    "wages_label_domain",
    "ts_resample",
    "ts_resample_yearly",
    "ts_gapfill",
    # warehouse tier (never driver-checked)
    "scd2_history",
    "funnel_steps",
    "profile_columns",
    "cohort_retention",
    "copurchase_pairs",
    # curation tier (never driver-checked)
    "sample_reservoir",
    "decontaminate",
    "scrub_denylist",
    "domain_mix",
    "bloom_prefilter",
    "dedup_incremental",
    "scrub_pii",
    "sample_weighted",
    # training-prep tier (never driver-checked)
    "seq_pack",
    "stratified_sample",
    "text_repetition",
    "text_tfidf",
    # re-anchored sketches + iterative/pipeline flagships
    "sketch_approx",
    "sketch_hll_rollup",
    "graph_pagerank",
    "llm_prep_pipeline",
    # VERDICT r2 #2/#8 re-checks: the fixed red row + round-2 first greens
    "text_inverted_index",
    "text_bigrams",
    "text_chunk",
    "ts_ewma",
    "rank_global_twophase",
    "regional_volume",
    "events_rollup_reagg",
]


def _load():
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _GROUPS:
        try:
            mod = import_module(mod_name)
        except ModuleNotFoundError:
            continue  # group not built yet
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod_name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLE", {}).items():
            oracles[name] = sql
    missing = [n for n in _WINDOW_PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"_WINDOW_PRIORITY names unknown queries: {missing}")
    prio = {n: i for i, n in enumerate(_WINDOW_PRIORITY)}
    ordered = sorted(
        enumerate(queries), key=lambda t: (prio.get(t[1], len(prio) + t[0]), t[0])
    )
    queries = {n: queries[n] for _, n in ordered}
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]

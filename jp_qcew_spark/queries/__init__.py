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
# evidence policy. This list pins the ROUND-4 window (VERDICT r3 #1):
#
# - the 22 queries with no driver row in any round (3-round union 96/118):
#   the whole scalars group, the geo trio, components/fuzzy dedup,
#   cube/grouping-sets/quantiles/distinct-agg, VARIANT, UDTF, kmeans,
#   session-gaps — a green sweep completes a 118/118 driver-verified union;
# - dedup_embedding_cos (r1-green but rewritten twice since: de-broadcast
#   457bbcb, corpus-sized bucket bits 98d3fbc — stale evidence, VERDICT #2);
# - second-consecutive-green re-checks (VERDICT #4): text_inverted_index,
#   the wages/ts chain, the 5 real-stream queries;
# - re-checks of the most-rewritten r3 greens: simhash (column rework),
#   minhash (de-broadcast), the ANN six, plus queries touched THIS round
#   (events_session_gaps exact-timestamp gap, udtf_tokenize blank guard,
#   kmeans unpersist — all three already above) and their twins/chains
#   (events_session shares the gaps oracle; llm_prep chains minhash).
# Everything NOT listed follows in module-registration order — all of it
# carries 1-2 rounds of prior driver evidence on unchanged code.
#
# ROUND-5 rotation TODO: the fifteen round-4 additions (semdedup_lsh,
# merge_upsert, quality_percentile_band, dedup_passages, stream_sliding,
# window_range_frame, bucketed_colocated_join, stream_python_source,
# stream_python_source_sharded, text_lm_score, text_entropy, outlier_mad,
# dedup_sorted_neighborhood, graph_triangles, join_asof_nearest)
# have local parity evidence only (bare-session sf0.001/sf0.01/sf0.1)
# and belong at the head of the next window, together with re-checks of
# whatever r4 edits — notably the scan-widening sweep (io.widen_scan,
# commits 5e9fd3a/c8e4d72) touched the plans of these queries OUTSIDE
# the r4 window, staling their r1-r3 driver evidence: text_stats,
# text_quality, text_langid, text_token_count, text_fingerprint,
# text_chunk, text_bigrams, text_repetition, text_tfidf, scrub_pii,
# scrub_denylist, stratified_sample (values unchanged — 130/130
# bare-session parity re-verified at sf0.01 post-change; the widened
# queries INSIDE the r4 window get fresh driver rows this round).
_WINDOW_PRIORITY = [
    # -- never driver-checked: scalars group (9)
    "math_funcs",
    "regex_extract",
    "date_funcs",
    "array_map_funcs",
    "string_funcs",
    "null_semantics",
    "regr_stats",
    "histogram_bins",
    "argmax_funcs",
    # -- never driver-checked: geo trio (grid join first — its oracle is the
    #    quadratic cross join, so one green row proves the distributed
    #    spatial plan loses no pairs)
    "geo_grid_join",
    "geo_nearest",
    "geo_bbox_join",
    # -- never driver-checked: agg/group-by extensions
    "cube_agg",
    "grouping_sets",
    "quantiles_exact",
    "agg_distinct_exact",
    # -- never driver-checked: dedup + clustering + semi-structured
    "dedup_components",
    "dedup_fuzzy",
    "events_variant",
    "udtf_tokenize",
    "kmeans_cluster",
    "events_session_gaps",
    # -- stale evidence on a twice-rewritten plan (VERDICT r3 #2)
    "dedup_embedding_cos",
    # -- second-consecutive-green re-checks (VERDICT r3 #4)
    "text_inverted_index",
    "wages_series",
    "ts_resample",
    "ts_resample_yearly",
    "stream_session",
    "stream_dedup",
    "stream_stateful_user_stats",
    "stream_static_join",
    "stream_stream_join",
    # -- most-rewritten r3 greens: simhash/minhash + the ANN six
    "dedup_simhash",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "knn_signlsh",
    "knn_classify",
    "knn_ivf",
    "knn_hybrid",
    "knn_multiprobe",
    # -- twins/chains of this round's edits + remaining high-value re-checks
    "events_session",
    "llm_prep_pipeline",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_char_ngram",
    "graph_pagerank",
    "text_token_count",
    "ts_gapfill",
    "ts_ewma",
    "rank_global_twophase",
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

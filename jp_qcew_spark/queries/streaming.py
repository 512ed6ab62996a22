"""Structured Streaming queries (SURVEY.md §2.I, extension tier B).

Each entry runs a REAL streaming pipeline (readStream → watermark → stateful
operator → available-now trigger → memory sink) and returns the drained sink.
Oracles check the batch-equivalent semantics in DuckDB: session windows and
key-set dedup are deterministic; the custom-stateful per-user stats reduce to
a plain group-by at quiescence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jp_qcew_spark.streaming import (
    stream_dedup_keys,
    stream_session_windows,
    stream_stateful_user_stats,
)


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_session_windows(spark, sf_dir).orderBy("user_id", "session_start")


# identical semantics to the batch session_window oracle (events.py)
ORACLE_STREAM_SESSION = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_dedup_keys(spark, sf_dir).orderBy("user_id", "event_type")


ORACLE_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type
FROM events ORDER BY user_id, event_type
"""


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stateful_user_stats(spark, sf_dir).orderBy("user_id")


ORACLE_STREAM_STATEFUL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "stream_session": q_stream_session,
    "stream_dedup": q_stream_dedup,
    "stream_stateful_user_stats": q_stream_stateful,
}

ORACLE = {
    "stream_session": ORACLE_STREAM_SESSION,
    "stream_dedup": ORACLE_STREAM_DEDUP,
    "stream_stateful_user_stats": ORACLE_STREAM_STATEFUL,
}


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jp_qcew_spark.streaming.pipelines import stream_static_enrich

    return stream_static_enrich(spark, sf_dir).orderBy("c_mktsegment", "event_type")


ORACLE_STREAM_STATIC = """
SELECT c_mktsegment, event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type
"""

QUERIES["stream_static_join"] = q_stream_static_join
ORACLE["stream_static_join"] = ORACLE_STREAM_STATIC


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jp_qcew_spark.streaming.pipelines import stream_stream_attribution

    return stream_stream_attribution(spark, sf_dir).orderBy(
        "user_id", "view_id", "buy_id"
    )


ORACLE_STREAM_STREAM_JOIN = """
SELECT b.user_id, v.event_id AS view_id, b.event_id AS buy_id
FROM events b JOIN events v
  ON b.user_id = v.user_id
 AND v.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY b.user_id, view_id, buy_id
"""

QUERIES["stream_stream_join"] = q_stream_stream_join
ORACLE["stream_stream_join"] = ORACLE_STREAM_STREAM_JOIN


def q_stream_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jp_qcew_spark.streaming.pipelines import stream_tws_user_extremes

    return stream_tws_user_extremes(spark, sf_dir).orderBy("user_id")


ORACLE_STREAM_TWS = """
SELECT user_id, count(*) AS n_events,
       round(max(value), 2) AS max_value,
       round(min(value), 2) AS min_value
FROM events GROUP BY user_id ORDER BY user_id
"""

# registered only where the runtime can actually execute it (protobuf gate)
from jp_qcew_spark.streaming.pipelines import tws_available  # noqa: E402

if tws_available():
    QUERIES["stream_tws_user_extremes"] = q_stream_tws
    ORACLE["stream_tws_user_extremes"] = ORACLE_STREAM_TWS


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming sliding windows — 10-minute windows sliding every 5
    (each event lands in 2 overlapping windows), watermarked, complete-mode
    replay. Completes the real-stream window taxonomy (tumbling ✓ session ✓
    sliding ← here); the batch twin is ``events_sliding`` and the oracle is
    its shifted-tumbling-bucket expansion.

    Scale: overlapping windows multiply STATE, not input — each event
    updates window_len/slide aggregation states (2 here); state is keyed by
    window so it ages out with the watermark like any tumbling agg."""
    from jp_qcew_spark.streaming.pipelines import (
        read_events_stream,
        run_to_memory,
    )
    from pyspark.sql import functions as F

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    return (
        run_to_memory(stream, "complete", "sink_sliding")
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


# identical semantics to the batch events_sliding oracle (events.py)
ORACLE_STREAM_SLIDING = """
WITH member AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
  FROM events
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM member GROUP BY 1 ORDER BY window_start
"""

QUERIES["stream_sliding"] = q_stream_sliding
ORACLE["stream_sliding"] = ORACLE_STREAM_SLIDING

"""Isolate the session-window scale factor (VERDICT r3 #2).

BENCH_SF1 shows the sessionization family as the study's worst scalers
(events_session 5.32x, events_session_gaps 5.28x for 10x data). This tool
decides between the two candidate explanations:

- BENIGN: wall-clock = fixed per-job overhead + linear per-row work, and
  the 5.3x is just the fixed part amortizing (affine model; factor -> 10x
  asymptotically, never super-linear). Evidence: a 3-point (1x/3x/10x)
  affine fit with small residual, plus a bare shuffle+sort baseline showing
  the per-row part is dominated by the one exchange+sort both strategies
  share.
- DEFECT: a hidden re-sort, skewed user_id partitions, or state-store
  blowup. Evidence would be: extra Exchange/Sort nodes in the plan, a
  max/mean partition-row ratio far from 1, or per-row time growing with
  scale.

Writes findings to BENCH_SF1.json under "session_isolation".

Usage: python tools/profile_session.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPORA = {
    1: "/root/testdata/sf0.1",
    3: "/tmp/testdata_sf3",
    10: "/tmp/testdata_sf1",
}
RUNS = 3


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def timed(fn):
    ts = []
    for _ in range(RUNS):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(median(ts), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from jp_qcew_spark.io import load_table
    from jp_qcew_spark.queries.events import (
        q_events_session,
        q_events_session_gaps,
    )
    from jp_qcew_spark.session import get_spark

    spark = get_spark()
    sink = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    out: dict = {"runs_per_point": RUNS, "points": {}}

    for k, d in CORPORA.items():
        ev = load_table(spark, d, "events")
        n = ev.count()
        users = ev.select("user_id").distinct().count()
        # bare baseline: the one exchange+sort every sessionization strategy
        # pays (hash-shuffle on user_id, per-partition sort by user_id, ts)
        base = timed(
            lambda: sink(
                ev.repartition(32, "user_id").sortWithinPartitions(
                    "user_id", "ts", "event_id"
                )
            )
        )
        gaps = timed(lambda: sink(q_events_session_gaps(spark, d)))
        sess = timed(lambda: sink(q_events_session(spark, d)))
        out["points"][f"{k}x"] = {
            "rows": n,
            "users": users,
            "shuffle_sort_baseline_sec": base,
            "events_session_gaps_sec": gaps,
            "events_session_sec": sess,
        }
        print(f"{k}x: rows={n} users={users} base={base} gaps={gaps} "
              f"session={sess}", flush=True)

    # skew: rows per hash partition of user_id at 10x
    ev10 = load_table(spark, CORPORA[10], "events")
    parts = (
        ev10.groupBy(F.abs(F.hash("user_id") % 32).alias("p"))
        .count()
        .collect()
    )
    cnts = [r["count"] for r in parts]
    out["skew_10x"] = {
        "partitions": len(cnts),
        "max_over_mean": round(max(cnts) / (sum(cnts) / len(cnts)), 3),
    }

    # plan shape: exchanges and sorts in the gaps plan (expect 1 + 1)
    plan = q_events_session_gaps(spark, CORPORA[10])._jdf.queryExecution().executedPlan().toString()
    out["gaps_plan_10x"] = {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }

    # affine fit t = c + m*k on the 1x/10x endpoints; residual at 3x
    for q in ("events_session_gaps_sec", "events_session_sec"):
        t1 = out["points"]["1x"][q]
        t3 = out["points"]["3x"][q]
        t10 = out["points"]["10x"][q]
        m = (t10 - t1) / 9.0
        c = t1 - m
        pred3 = c + 3 * m
        out.setdefault("affine_fit", {})[q] = {
            "fixed_sec": round(c, 3),
            "per_1x_sec": round(m, 3),
            "pred_3x_sec": round(pred3, 3),
            "obs_3x_sec": t3,
            "residual_3x_pct": round(100 * (t3 - pred3) / pred3, 1),
            "asymptotic_factor_per_10x": round((c + 100 * m) / (c + 10 * m), 2),
        }

    spark.stop()

    path = os.path.join(REPO, "BENCH_SF1.json")
    doc = json.load(open(path))
    doc["session_isolation"] = out
    json.dump(doc, open(path, "w"), indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    print(f"merged into {path}")


if __name__ == "__main__":
    main()

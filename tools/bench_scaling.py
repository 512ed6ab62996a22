"""Empirical scale-up study (VERDICT r2 #6): sf0.1 vs synthetic sf1.

Runs the most expensive suite queries at sf0.1 and at the 10×-replicated
sf1 corpus (tools/gen_scaled_sf.py), computes per-query scaling factors,
and writes BENCH_SF1.json. A sub-quadratic plan must scale ~linearly
(factor ≈ 10× data ⇒ wall-clock factor ≲ 10–15 incl. log terms and
shuffle overheads); a hidden all-pairs step shows ~100×.

The QCEW ETL slice scales via its own generator (100k → 1M lines).

Usage: python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the most expensive / structurally riskiest queries (VERDICT r2 #6),
# extended each round as VERDICT directs (r3 #5: curation/warehouse tier —
# previously the only tiers with no scale-factor row)
QUERIES = [
    "llm_prep_pipeline",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_exact",
    "agg_distinct_exact",
    "sketch_approx",
    "events_session",
    "graph_pagerank",
    "stream_session",
    "qcew_etl",
    # r3 extensions (ANN family, clustering, spatial, gaps sessionization)
    "knn_bruteforce",
    "knn_signlsh",
    "knn_classify",
    "knn_ivf",
    "knn_hybrid",
    "knn_multiprobe",
    "dedup_components",
    "dedup_embedding_cos",
    "kmeans_cluster",
    "geo_grid_join",
    "events_session_gaps",
    # curation tier (r4)
    "decontaminate",
    "scrub_pii",
    "bloom_prefilter",
    # warehouse tier (r4)
    "scd2_history",
    "cohort_retention",
    "funnel_steps",
    # r4 additions (new queries this round)
    "merge_upsert",
    "semdedup_lsh",
    "dedup_passages",
    "quality_percentile_band",
]


def run(sf_dir: str, out: str, qcew_lines: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_QUERIES=",".join(QUERIES),
        SPARK_GRAFT_BENCH_RUNS="2",
        SPARK_GRAFT_QCEW_LINES=str(qcew_lines),
        SPARK_GRAFT_BENCH_OUT=out,
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    return json.load(open(os.path.join(REPO, out)))


def main() -> None:
    # optional argv[1] = comma-separated subset: re-measure only those
    # queries (results MERGE into BENCH_SF1.json, so a targeted clean
    # re-run refreshes suspect rows without repeating the whole study)
    global QUERIES
    if len(sys.argv) > 1 and sys.argv[1].strip():
        QUERIES = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/testdata_sf1")
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "gen_scaled_sf.py"),
                "10",
                "/root/testdata/sf0.1",
                sf1_dir,
            ],
            check=True,
        )

    print("sf0.1 pass...", flush=True)
    small = run("/root/testdata/sf0.1", "BENCH_SCALE_SMALL.json", 100_000)
    print("sf1 pass...", flush=True)
    big = run(sf1_dir, "BENCH_SCALE_BIG.json", 1_000_000)

    qs_small, qs_big = small["queries"], big["queries"]
    # the ETL slice key embeds the line count; normalize
    for d in (qs_small, qs_big):
        for k in list(d):
            if k.startswith("qcew_etl_naics_"):
                d["qcew_etl"] = d.pop(k)

    factors = {}
    for name in sorted(qs_big):
        s, b = qs_small.get(name), qs_big.get(name)
        if s and b:
            factors[name] = {
                "sf0.1_sec": s,
                "sf1_sec": b,
                "factor": round(b / s, 2),
            }
    out = os.path.join(REPO, "BENCH_SF1.json")
    # MERGE into the existing study file: re-runs refresh per-query factors
    # but must not drop previously recorded evidence (e.g. the
    # session_isolation root-cause block or note addenda).
    result = json.load(open(out)) if os.path.exists(out) else {}
    result.setdefault(
        "note",
        "sf1 = 10x key-offset replication of sf0.1 "
        "(tools/gen_scaled_sf.py; documents in disjoint token spaces "
        "per replica so dedup candidate structure scales linearly); "
        "factor is wall-clock sf1/sf0.1 medians-of-2 on the same "
        "local[32] JVM. Linear*log posture => factor ~<= 15; a hidden "
        "all-pairs/quadratic step would show ~100.",
    )
    result["metric"] = "scaleup_factor_10x_data"
    result["data_factor"] = 10
    result["config"] = big.get("config", {})
    result.setdefault("queries", {}).update(factors)
    json.dump(result, open(out, "w"), indent=1, sort_keys=True)
    for k, v in factors.items():
        print(f"{k}: {v['sf0.1_sec']} -> {v['sf1_sec']} s  ({v['factor']}x)")
    os.remove(os.path.join(REPO, "BENCH_SCALE_SMALL.json"))
    os.remove(os.path.join(REPO, "BENCH_SCALE_BIG.json"))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

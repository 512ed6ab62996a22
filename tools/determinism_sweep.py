"""Registry-wide determinism sweep: run every query TWICE in fresh bare
sessions and hash-compare Spark-vs-Spark.

Motivation (round 4): `dedup_sorted_neighborhood`'s first cut computed
partition ids from an unmaterialized `repartitionByRange` — each physical
instance of a range exchange samples boundaries with an RDD-id-SEEDED
RNG, so duplicated subtrees could assign the same row different
partitions, producing nondeterministic results that an ORACLE sweep can
still pass on a lucky draw. Determinism therefore needs its own check:
same query, two fresh sessions, identical hashes.

Usage:
    python tools/determinism_sweep.py pass1
    python tools/determinism_sweep.py pass2
    python tools/determinism_sweep.py diff    # exit 1 on any mismatch

Runs at sf0.1 by default (SPARK_GRAFT_SF_DIR to override) — large enough
that range-boundary samples disagree across plan instances (sf0.001
masked the SNM bug). Round-4 result: 133/133 identical (commit 879a9cb); round-5 result
on the finished r5 code (deterministic SNM, PNG/CMS/PQ additions):
136/136 identical, zero errors.

Output paths default to /tmp/determinism_<run-id>_{pass}.json; set
DETERMINISM_RUN_ID to pin one (two concurrent sweeps with the default
fixed paths would otherwise collide — ADVICE r4).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from datetime import datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_RUN_ID = os.environ.get("DETERMINISM_RUN_ID", "default")
OUT = os.path.join("/tmp", f"determinism_{_RUN_ID}_{{}}.json")


def _canon(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return f"{round(v, 9)}"
    if isinstance(v, datetime):
        return str(v.replace(tzinfo=None))
    return str(v)


def run(tag: str) -> None:
    from pyspark.sql import SparkSession

    # bare session EXCEPT driver heap: the determinism property lives in
    # the SQL confs (which stay driver-default — the engine must pin its
    # own), not in memory sizing, and a 1 GiB heap OOMs on the r13 PQ
    # family run back-to-back at sf0.1 (BASELINE.md r13 memory datum)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as E

    hashes = {}
    for name, fn in E.queries().items():
        try:
            df = fn(spark, SF)
            cols = sorted(df.columns)
            lines = sorted(
                "|".join(_canon(r[c]) for c in cols) for r in df.collect()
            )
            h = hashlib.sha256()
            for ln in lines:
                h.update(ln.encode())
                h.update(b"\n")
            hashes[name] = f"{len(lines)}:{h.hexdigest()[:16]}"
        except Exception as ex:  # noqa: BLE001
            hashes[name] = f"ERR:{type(ex).__name__}"
        spark.catalog.clearCache()
    json.dump(hashes, open(OUT.format(tag), "w"))
    spark.stop()
    print(f"pass {tag}: {len(hashes)} queries")


def diff() -> int:
    a = json.load(open(OUT.format("pass1")))
    b = json.load(open(OUT.format("pass2")))
    bad = {k: (a[k], b.get(k)) for k in a if a[k] != b.get(k)}
    errs = {k: v for k, v in a.items() if v.startswith("ERR")}
    print("mismatches:", json.dumps(bad, indent=1) if bad else "NONE")
    print("errors:", json.dumps(errs) if errs else "NONE")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    if sys.argv[1] == "diff":
        sys.exit(diff())
    run(sys.argv[1])

"""Synthesize a larger scale factor from /root/testdata/sf0.1 (VERDICT r2 #6).

No network (duckdb's tpch extension can't download) and /root/testdata is
read-only, so the sf1 scaling corpus is built by replicating sf0.1 K times
(default 10) into a scratch dir with per-replica KEY-DOMAIN offsets:

- lineitem/orders/customer/supplier/part: every join key gets
  ``replica * OFFSET`` added, so key cardinalities (distinct orders,
  customers, graph nodes) scale by K instead of piling K duplicates onto
  the same keys — group counts grow, per-group sizes stay realistic.
- events: event_id/user_id offset (K× users over the same time span —
  session/window state scales by group count, the realistic axis).
- documents: doc_id offset AND every whitespace token suffixed with
  ``·r{k}`` for replica k>0, putting each replica in a disjoint
  shingle/token space. Near-dup structure within a replica is identical to
  sf0.1 while cross-replica similarity is ~0, so a truly sub-quadratic
  dedup plan must show ~K× work — any hidden all-pairs step shows K².
- embeddings: vec_id offset, vectors unchanged (query side stays bounded).

Deterministic (pure SQL over the source parquet, no RNG).

Usage: python tools/gen_scaled_sf.py [K] [SRC_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000  # far above any sf0.1 key


def _union(con, k: int, select_template: str) -> str:
    return "\nUNION ALL\n".join(select_template.format(r=r) for r in range(k))


def generate(k: int, src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    plans = {
        "lineitem": (
            "SELECT l_orderkey + ({r}::BIGINT)*" + str(OFFSET) + " AS l_orderkey, "
            "l_partkey + ({r}::BIGINT)*" + str(OFFSET) + " AS l_partkey, "
            "l_suppkey + ({r}::BIGINT)*" + str(OFFSET) + " AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate FROM src"
        ),
        "orders": (
            "SELECT o_orderkey + ({r}::BIGINT)*" + str(OFFSET) + " AS o_orderkey, "
            "o_custkey + ({r}::BIGINT)*" + str(OFFSET) + " AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            "FROM src"
        ),
        "customer": (
            "SELECT c_custkey + ({r}::BIGINT)*" + str(OFFSET) + " AS c_custkey, "
            "c_name, c_nationkey, c_acctbal, c_mktsegment FROM src"
        ),
        "supplier": (
            "SELECT s_suppkey + ({r}::BIGINT)*" + str(OFFSET) + " AS s_suppkey, "
            "s_name, s_nationkey FROM src"
        ),
        "part": (
            "SELECT p_partkey + ({r}::BIGINT)*" + str(OFFSET) + " AS p_partkey, "
            "p_name, p_brand, p_retailprice FROM src"
        ),
        "events": (
            "SELECT event_id + ({r}::BIGINT)*" + str(OFFSET) + " AS event_id, ts, "
            "user_id + ({r}::BIGINT)*" + str(OFFSET) + " AS user_id, "
            "event_type, value, props FROM src"
        ),
        "documents": (
            "SELECT doc_id + ({r}::BIGINT)*" + str(OFFSET) + " AS doc_id, "
            "CASE WHEN {r} = 0 THEN text "
            "ELSE regexp_replace(text, '(\\S+)', '\\1·r{r}', 'g') END AS text, "
            "lang, source, "
            "CASE WHEN {r} = 0 THEN n_chars "
            "ELSE length(regexp_replace(text, '(\\S+)', '\\1·r{r}', 'g')) END "
            "AS n_chars FROM src"
        ),
        # Per-replica diagonal ±1 sign mask: an orthogonal transform, so every
        # within-replica pairwise cosine is preserved EXACTLY while
        # cross-replica cosines decorrelate (~0). Without it each vector
        # gains k-1 identical copies and the true near-dup pair count grows
        # quadratically — the first study run measured dedup_embedding_cos
        # at 34x for 10x data for exactly that reason (real pairs, not a
        # plan bug).
        "embeddings": (
            "SELECT vec_id + ({r}::BIGINT)*" + str(OFFSET) + " AS vec_id, "
            "CASE WHEN {r} = 0 THEN embedding ELSE "
            "list_transform(list_zip(embedding, range(1, len(embedding) + 1)), "
            "x -> x[1] * CASE WHEN hash({r} * 7919 + x[2]) % 2 = 0 "
            "THEN 1.0 ELSE -1.0 END::FLOAT) END AS embedding, "
            "label FROM src"
        ),
    }
    # dims that stay fixed at any scale factor
    copy_only = ("region", "nation")

    for name, tmpl in plans.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM '{src}/{name}.parquet'"
        )
        # supplier/part schemas vary by driver version; project what exists
        cols = {r[0] for r in con.execute("DESCRIBE src").fetchall()}
        if name == "supplier":
            extra = [c for c in cols if c not in {"s_suppkey"}]
            tmpl = (
                "SELECT s_suppkey + ({r}::BIGINT)*" + str(OFFSET) + " AS s_suppkey, "
                + ", ".join(sorted(extra))
                + " FROM src"
            )
        elif name == "part":
            extra = [c for c in cols if c not in {"p_partkey"}]
            tmpl = (
                "SELECT p_partkey + ({r}::BIGINT)*" + str(OFFSET) + " AS p_partkey, "
                + ", ".join(sorted(extra))
                + " FROM src"
            )
        sql = _union(con, k, tmpl)
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")
    for name in copy_only:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{name}.parquet') "
            f"TO '{out}/{name}.parquet' (FORMAT parquet)"
        )
        print(f"{name}: copied")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata_sf1"
    generate(k, src, out)

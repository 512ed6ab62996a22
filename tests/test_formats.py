"""JSONL + ORC source/sink roundtrips (sources/formats.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from jp_qcew_spark.plans import inspect as I
from jp_qcew_spark.sources.formats import (
    quarantine_jsonl,
    read_jsonl,
    read_orc,
    write_orc,
)

DOCS_DDL = "doc_id bigint, text string, lang string"


def _write_jsonl(path: str, lines: list[str]) -> str:
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def test_jsonl_schema_enforced_and_corrupt_quarantined(spark, tmp_path):
    good = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en"})
        for i in range(5)
    ]
    bad = ['{"doc_id": broken', "not json at all"]
    p = _write_jsonl(str(tmp_path / "shard.jsonl"), good[:3] + bad + good[3:])
    clean, quarantined = quarantine_jsonl(spark, p, DOCS_DDL)
    assert clean.count() == 5
    assert quarantined.count() == 2
    assert clean.columns == ["doc_id", "text", "lang"]
    got = {r.doc_id for r in clean.collect()}
    assert got == set(range(5))
    # quarantined rows carry the raw line for replay
    raws = {r[0] for r in quarantined.collect()}
    assert raws == set(bad)


def test_jsonl_typed_nulls_for_wrong_types(spark, tmp_path):
    # a wrong-typed field nulls the whole row into quarantine (PERMISSIVE
    # keeps the raw line), never aborts the scan
    p = _write_jsonl(
        str(tmp_path / "s.jsonl"),
        [json.dumps({"doc_id": "xyz", "text": "t", "lang": "en"})],
    )
    clean, bad = quarantine_jsonl(spark, p, DOCS_DDL)
    assert clean.count() + bad.count() == 1
    # the PERMISSIVE JSON reader still works for plain reads (corrupt
    # column retained for callers that filter alongside data columns)
    df = read_jsonl(spark, p, DOCS_DDL)
    assert df.columns == ["doc_id", "text", "lang", "_corrupt_record"]


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    from jp_qcew_spark.io import load_table

    n = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc")
    write_orc(n, out)
    back = read_orc(spark, out)
    assert back.count() == n.count()
    q = back.filter(F.col("n_regionkey") == 2).select("n_name")
    assert any("n_regionkey" in f for f in I.pushed_filters(q))
    (schema,) = I.read_schemas(q)
    assert set(schema) <= {"n_name", "n_regionkey"}


def test_orc_partitioned_layout(spark, sf_dir, tmp_path):
    from jp_qcew_spark.io import load_table

    n = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc_part")
    write_orc(n, out, partition_by=["n_regionkey"])
    parts = {d for d in os.listdir(out) if d.startswith("n_regionkey=")}
    assert len(parts) == 5
    # partition pruning: filtering the partition key reads one directory
    pruned = read_orc(spark, out).filter(F.col("n_regionkey") == 3)
    assert pruned.count() == 5

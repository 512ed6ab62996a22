"""Offset contract of the custom Python streaming source
(sources/stream_replay.py): deterministic batch planning, exactly-once
re-serve on recovery, clean end-of-feed behavior."""

from __future__ import annotations

import os

from jp_qcew_spark.sources.stream_replay import _ReplayReader
from tests.conftest import SF_SMOKE

SF = os.path.join(SF_SMOKE, "events.parquet")


def _reader(batch=100):
    return _ReplayReader({"path": SF, "batch_rows": str(batch)})


def test_batches_partition_the_feed_in_order():
    r = _reader(100)
    off = r.initialOffset()
    assert off == {"idx": 0}
    seen, n_batches = [], 0
    while True:
        it, nxt = r.read(off)
        rows = list(it)
        if not rows:
            assert nxt == off  # end of feed: offset must not advance
            break
        assert len(rows) <= 100
        assert nxt["idx"] == off["idx"] + len(rows)
        seen += rows
        off = nxt
        n_batches += 1
    assert n_batches >= 2  # the feed actually micro-batched
    # global (ts, event_id) order across batch boundaries
    keys = [(row[1], row[0]) for row in seen]
    assert keys == sorted(keys)
    # no loss, no dups
    assert len({row[0] for row in seen}) == len(seen)


def test_read_between_offsets_reserves_exactly():
    """Recovery path: re-reading a planned batch yields bit-identical
    rows — the exactly-once guarantee the streaming engine relies on."""
    r = _reader(64)
    it, nxt = r.read({"idx": 64})
    planned = list(it)
    replayed = list(_reader(64).readBetweenOffsets({"idx": 64}, nxt))
    assert replayed == planned


def test_quiescence_drain_surfaces_source_errors(spark):
    """A query that dies before quiescing must surface ITS error promptly,
    not a 120 s TimeoutError (review finding: the poll loop previously
    never checked query liveness)."""
    import time

    import pytest

    from jp_qcew_spark.queries.streaming import q_stream_python_source

    t0 = time.time()
    with pytest.raises(Exception) as ei:
        q_stream_python_source(spark, "/nonexistent/dir")
    assert time.time() - t0 < 60, "error took too long to surface"
    assert not isinstance(ei.value, TimeoutError)

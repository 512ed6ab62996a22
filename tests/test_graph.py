"""ext.graph.connected_components unit tests (chain propagation,
multi-component labeling, non-convergence rail)."""

from __future__ import annotations

import pytest

from jp_qcew_spark.ext.graph import connected_components


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.id: r.comp for r in connected_components(df, **kw).collect()
    }


def test_chain_propagates_transitively(spark):
    # 1-2-3-4 is one component even though 1 and 4 share no edge
    got = _labels(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_min_labeled(spark):
    got = _labels(spark, [(5, 9), (9, 7), (20, 30), (40, 40)])
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 40: 40}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], max_iter=1)

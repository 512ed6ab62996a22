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


def test_local_finish_matches_distributed_path(spark):
    """Round 15: below _CC_LOCAL_MAX_EDGES the components are solved on
    the driver (union-find, min-id roots); an explicit max_iter pins the
    distributed alternating-star path. The fixpoint labeling is unique,
    so the two paths must agree row for row — pinned here on a graph
    mixing chains, a clique, self-loops and duplicate edges."""
    edges = (
        [(i, i + 1) for i in range(20)]          # chain
        + [(100 + a, 100 + b) for a in range(5) for b in range(a)]  # clique
        + [(200, 200), (7, 7)]                   # self-loops
        + [(3, 4), (4, 3), (300, 400)]           # dups + mirrored + pair
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        (r.id, r.comp) for r in connected_components(df).collect()
    }
    dist = {
        (r.id, r.comp)
        for r in connected_components(df, max_iter=20).collect()
    }
    assert local == dist
    # min-id labeling: every component label is its minimum member
    comp_members: dict = {}
    for node, comp in local:
        comp_members.setdefault(comp, []).append(node)
    for comp, members in comp_members.items():
        assert comp == min(members)


def test_local_finish_gate_is_runtime_sized(spark, monkeypatch):
    """The local/distributed decision is an exact runtime count against
    _CC_LOCAL_MAX_EDGES — force the gate to 0 and the distributed loop
    must produce the identical labels (scale path stays live)."""
    import jp_qcew_spark.ext.graph as G

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert {
        (r.id, r.comp) for r in connected_components(df).collect()
    } == want
    monkeypatch.setattr(G, "_CC_LOCAL_MAX_EDGES", 0)
    assert {
        (r.id, r.comp) for r in connected_components(df).collect()
    } == want

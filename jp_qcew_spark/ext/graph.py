"""Connected components over a pair graph — the clustering step between
"LSH found near-dup pairs" and "keep one canonical doc per cluster" in a
dedup pipeline. Spark has no graph operator; this is the standard hash-min
label-propagation expressed in DataFrame ops.

Algorithm: every node starts labeled with its own id; each round, labels
flow across edges and every node keeps the minimum label it has seen; at
fixpoint all nodes in a component carry the component's minimum id — a
deterministic canonical label.

Scale notes:
- Rounds are bounded by component DIAMETER, not corpus size. Dedup
  components are near-cliques of a few documents (LSH pairs), so 2-4
  rounds converge even at 100 TB; ``max_iter`` is a safety rail, and hitting
  it raises rather than silently returning partial labels.
- Each round is one shuffle (edge ⋈ label on src) + one partial-agg
  shuffle (min per node) — both keyed, no quadratic step anywhere.
- ``localCheckpoint`` after every round truncates the lineage so the
  iterative plan doesn't grow unboundedly (the classic iterative-DataFrame
  failure mode: round N replays rounds 1..N-1).
- Convergence is detected from the LABEL SUM: hash-min labels only ever
  decrease, so sum(comp) strictly decreases until fixpoint and equality
  with the previous round's sum == "no label changed". One 1-row partial
  aggregate over the already-checkpointed labels — no join, no extra
  shuffle (the old new⋈old + limit(1).count() check shuffled both label
  sets every round). decimal(38,0) keeps the sum exact far beyond any
  realistic node-id mass (10^38 ≫ 10^9 docs × 10^18 max id).
- For billion-edge graphs with LONG chains (not the dedup shape), swap in
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce"), which converges in O(log n) rounds with the same
  join+min building blocks.
"""

from __future__ import annotations

from jp_qcew_spark.io import track_local_checkpoint
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    two_hop_init: bool = False,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id reachable from it. Returns (id, comp).

    ``two_hop_init`` seeds every node with the minimum id over its CLOSED
    2-hop neighborhood (self ∪ neighbors ∪ neighbors-of-neighbors) before
    the propagation loop. Dedup components are near-cliques of diameter
    ≤ 2, so the seed already IS the fixpoint and the loop's first round
    merely confirms convergence — one fewer join+agg+checkpoint superstep
    than the 1-hop init. Cost: one extra edge⋈edge join at init whose
    message volume is Σ deg(v)². Measured on the sf1 dedup graph (round-4
    warm A/B, identical 4850-row output): two-hop 11.0 s vs one-hop
    10.3 s — the seed join costs slightly MORE than the superstep it
    saves, because the near-clique Σ deg(v)² messages exceed one round's
    |E| messages. Default is therefore False; the option stays for graphs
    whose diameter (not degree) is the bottleneck. Either init reaches the
    same unique fixpoint."""
    und = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize the edge list once: it joins into EVERY round, and leaving
    # it lazy re-executes the caller's (possibly expensive) pair-generation
    # pipeline per iteration — measured 8.2 s → 2-3 s on the dedup graph
    und = track_local_checkpoint(und)
    # init fused with the first propagation: min(self, neighbors) — one
    # groupBy instead of a distinct plus a full propagation round
    seed = und.select("a", F.least("a", "b").alias("comp"))
    if two_hop_init:
        seed = seed.union(
            und.alias("x")
            .join(und.alias("y"), F.col("x.b") == F.col("y.a"))
            .select(
                F.col("x.a").alias("a"),
                F.least(F.col("x.a"), F.col("y.b")).alias("comp"),
            )
        )
    labels = track_local_checkpoint(
        seed.groupBy(F.col("a").alias("id"))
        .agg(F.min("comp").alias("comp"))
    )

    def _label_mass(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("m")
        ).collect()[0]["m"]

    mass = _label_mass(labels)
    for _ in range(max_iter):
        msgs = und.join(labels, und.a == labels.id).select(
            F.col("b").alias("id"), "comp"
        )
        labels = track_local_checkpoint(
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        new_mass = _label_mass(labels)
        if new_mass == mass:
            return labels
        mass = new_mass
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the dedup-graph assumption; use a "
        "star-contraction algorithm for this graph"
    )

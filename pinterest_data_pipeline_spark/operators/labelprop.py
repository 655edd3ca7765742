"""Synchronous label propagation (LPA, Raghavan et al. 2007) — the
linear-time community detector that complements this engine's other
graph fixed-points: PageRank ranks nodes, HITS scores bipartite roles,
connected components find REACHABILITY islands; LPA finds DENSITY
communities inside a connected component (a single giant component —
this corpus's supplier↔part graph — is one CC but many purchasing
communities).

Determinism discipline (vanilla LPA is notoriously run-dependent):

- SYNCHRONOUS rounds — every node updates from the previous round's
  labels, so no intra-round ordering exists to be nondeterministic;
- the vote includes the node's OWN current label (self-vote), the
  standard damping that prevents the 2-cycle oscillation synchronous
  LPA exhibits on bipartite graphs;
- ties break by the SMALLEST label — argmax(count DESC, label ASC)
  via one partial-combinable ``max(struct(count, −label))`` per node;
- labels are the integer node ids, a total order any engine shares.

A FIXED iteration count (not convergence detection) keeps the oracle
an unrolled SQL replay — the pagerank/power-iteration precedent.

Scale: per round, one (edge ⋈ label) shuffle on the destination key +
one map-side-combinable argmax keyed by source; labels relation is
|nodes| rows, localCheckpointed per round so round t+1's lineage does
not replay rounds 1..t.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Final (node, label) after ``iterations`` synchronous LPA rounds.

    ``edges`` holds DIRECTED rows (src, dst) with numeric node ids —
    pass both directions for an undirected graph. Initial label =
    node id; every round each node adopts the most frequent label among
    its neighbors plus itself, smallest label on ties."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # Materialize the edge relation ONCE, partitioned by the propagation
    # join key (the duplicate_clusters recipe, guide §2.4/§3.3): without
    # the barrier the caller's upstream edge pipeline re-executes in
    # every round's lineage plus twice in the node universe (measured:
    # 5 executions of an |lineitem| aggregation per
    # lpa_purchasing_communities run), and without the repartition every
    # round's edges⋈labels join re-exchanges |E| rows by dst — the
    # checkpointed relation keeps its physical partitioning, so one
    # setup shuffle buys back one |E| exchange per round. Vote counts
    # and the argmax are exact integer ops, so partitioning cannot move
    # a bit.
    edges = edges.repartition(F.col("dst")).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        nbr = edges.join(
            labels, edges["dst"] == labels["node"]
        ).select(F.col("src").alias("node"), "label")
        votes = (
            nbr.unionAll(labels.select("node", "label"))
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("__c").alias("c"),
                        (-F.col("label")).alias("neg_label"),
                    )
                ).alias("__best")
            )
            .select("node", (-F.col("__best.neg_label")).alias("label"))
            # eager=False: lineage still truncates per round (the plan
            # would otherwise double per iteration — labels feeds both
            # the neighbor join and the self-vote union) but the rounds'
            # materialization fuses into the caller's single action
            # instead of one driver-synchronized count job per round
            .localCheckpoint(eager=False)
        )
    return labels


def community_sizes(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """LPA community histogram: (community, n_nodes), community = the
    propagated label."""
    return (
        label_propagation(edges, iterations)
        .groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )

"""Connected components over a candidate-pair graph — turns near-dup PAIRS
into dedup CLUSTERS (pick one survivor per cluster, drop the rest), the
final step of every fuzzy-dedup pipeline.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round a node takes the min of its label and its
neighbors' labels; fixpoint = every node carries its component's min id.
Convergence detection is one aggregate per round: labels only ever
decrease, so an unchanged sum(label) IS the fixpoint — no row-level diff
join needed.

Scale notes (100 TB):
- Rounds = component diameter. Near-dup graphs are clique-ish (diameter
  1-2); pathological chains would want the large-star/small-star
  alternating variant (same join primitives, fewer rounds) — noted, not
  needed for this workload.
- Each round is one join + one aggregate, both shuffle-partitioned on the
  node id. ``localCheckpoint`` truncates lineage so round N's plan does
  not replay rounds 1..N-1.
- The driver-side loop holds no data — only the per-round sum scalar used
  for the convergence test (an O(1) driver value, not a collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    edge_cols: tuple[str, str] = ("a", "b"),
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) where cluster = min node id of the component."""
    a, b = edge_cols
    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("label"))
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .localCheckpoint()
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        neighbor = sym.join(labels, sym.dst == labels.node).select(
            F.col("src").alias("node"), "label"
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        label_sum = labels.agg(F.sum("label")).first()[0]
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        # Silent partial clusters would dedupe wrongly downstream — fail
        # loudly; a graph this deep wants the large-star/small-star variant.
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(component diameter exceeds max_iter)"
        )
    return labels.select("node", F.col("label").alias("cluster"))

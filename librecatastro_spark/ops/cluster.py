"""Duplicate clustering: connected components over near-dup pairs.

Pairwise dedup (MinHash-LSH / SimHash / embedding near-dup) emits EDGES;
what a curation pipeline acts on is CLUSTERS — "keep one representative
per duplicate group". The group structure is the connected components of
the pair graph, and transitivity matters: A~B and B~C put A and C in one
group even when the A–C pair itself was never emitted.

Algorithm: iterative min-label propagation (the standard large-graph CC
under hash partitioning — e.g. the Hash-Min variant of Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
ICDE'13). Every node starts labeled with itself; each round every node
takes the min of its own and its neighbors' labels; stop when a round
changes nothing. Rounds are plain shuffled joins/aggregations —
partitioned by node id, no driver-side graph — and the round count is
bounded by the longest label-propagation path (graph diameter), which
for dedup graphs (dense cliques of near-identical docs, occasionally
chained) is small. The fixpoint check is one count per round; labels are
checkpointed via localCheckpoint every few rounds to keep the plan from
growing unboundedly.

Output: (doc_id, cluster_id) for every node that appears in ≥1 pair,
cluster_id = min doc_id of its component (deterministic). Singletons
(docs with no near-dup edge) are by definition their own cluster and are
not emitted — callers left-join and coalesce(cluster_id, doc_id).

The DuckDB twin (__spark_entry__) computes min-over-transitive-closure
with a recursive CTE — exponential-ish in dense graphs, fine at oracle
scale, and definitionally the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(doc_id, cluster_id) over the undirected pair graph — see module
    docstring. ``pairs`` rows are edges; direction and duplicates are
    irrelevant."""
    edges = (
        pairs.select(
            F.col(a_col).cast("long").alias("src"),
            F.col(b_col).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # undirected: keep both directions so one groupBy(dst) sees every
    # neighbor of every node
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    sym = sym.localCheckpoint()
    labels = labels.localCheckpoint()
    for it in range(max_iter):
        # each node's candidate = min over neighbors of the neighbor's
        # current label; new label = min(own, candidate)
        neigh = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        )
        # one job per round: materialize labels AND the change count
        new_labels = new_labels.localCheckpoint() if (
            (it + 1) % checkpoint_every == 0
        ) else new_labels
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def duckdb_components_sql(pairs_cte: str) -> str:
    """Full SELECT — DuckDB twin: min label over the transitive closure,
    via a recursive CTE. ``pairs_cte`` must be a WITH-fragment defining
    ``pairs(a, b)``."""
    return f"""
WITH RECURSIVE {pairs_cte},
edges AS (
  SELECT a AS src, b AS dst FROM pairs WHERE a <> b
  UNION
  SELECT b AS src, a AS dst FROM pairs WHERE a <> b
),
reach(node, label) AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, r.label
  FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(label)::BIGINT AS cluster_id
FROM reach
GROUP BY node"""

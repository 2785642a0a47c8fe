"""Connected components over candidate-pair edges — dedup clustering.

Pair generators (MinHash bands, sign-LSH, Jaccard) emit EDGES; a
curation pipeline needs CLUSTERS: the transitive closure of "is a
near-duplicate of", with one canonical representative kept per
cluster. At corpus scale that is a connected-components problem on a
graph with billions of edges, solved here by iterative min-label
propagation: every node starts labeled with itself; each round a node
takes the minimum label among itself and its neighbors; convergence in
O(component diameter) rounds (near-dup components are shallow — most
are cliques from shared buckets, so 2-4 rounds in practice).

Per round: one join + one groupBy, both hash-partitioned on node id —
no driver-side graph, no global collect. The driver sees only the
per-round changed-count (one scalar) used for early exit, and the
label frame is localCheckpoint-ed each round so the plan/lineage stays
O(1) instead of growing with iterations (the standard iterative-
DataFrame hygiene Spark needs where an RDD loop would cache)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id_a, id_b) edge list → (doc_id, cluster_id) with cluster_id =
    the minimum member id of the component. Nodes appearing in no edge
    are not returned (callers union singletons back if needed —
    their cluster is trivially themselves)."""
    fwd = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    rev = pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("label").alias("nl")),
                on="b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("min_nl"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("min_nl"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))

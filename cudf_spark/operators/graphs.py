"""Connected components over candidate-pair edges — the cluster-resolution
step between LSH pair generation (operators/dedup.py) and canonical-doc
selection that a production dedup pipeline needs: near-dup PAIRS chain
(A~B, B~C) into CLUSTERS {A,B,C}, and one canonical member per cluster
survives.

The reference exposes pairwise similarity (nvtext/minhash.hpp,
nvtext/jaccard.hpp); clustering the pair graph is the standard downstream
step (the cudf-based NeMo-Curator pipeline does exactly this with a GPU
connected-components pass — public literature).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, a node adopts the minimum label among itself and
its neighbors; the component minimum floods outward one hop per round, so
rounds == eccentricity of the minimum node (tiny for near-dup clusters,
which are dense blobs — NOT long chains). Each round is two keyed
shuffles (edge join + min agg) — no single-partition stage, no pairwise
blowup beyond the edge list itself.

Iterative Spark jobs MUST truncate lineage (each round's plan otherwise
nests the previous round's): labels are localCheckpoint'ed eagerly each
round — the convergence count materializes them anyway, so this costs
nothing extra. Same executor-loss caveat as lsh_candidate_pairs; job
retry is the recovery path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable through the pair graph.

    Raises after ``max_iter`` non-converged rounds rather than returning
    a silently wrong clustering (a pathological long-chain graph needs
    O(diameter) rounds; raise the cap, or pre-contract chains, for such
    inputs — near-dup graphs converge in a handful).
    """
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    und = und.localCheckpoint(eager=False)  # edge list reused every round

    labels = (
        und.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__chg"),
            )
            # lazy checkpoint + count: ONE job both materializes the round's
            # blocks (truncating the iterative lineage) and measures
            # convergence, instead of an eager-materialize job plus a count
            # job per round.
            .localCheckpoint(eager=False)
        )
        n_changed = merged.filter(F.col("__chg")).count()
        labels = merged.drop("__chg")
        if n_changed == 0:
            return labels.withColumnRenamed("label", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph has a long chain — raise max_iter"
    )

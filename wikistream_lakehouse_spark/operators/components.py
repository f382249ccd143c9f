"""Connected components over near-duplicate pairs → canonical-document
selection (the decision step of corpus dedup: pairs in, keep/drop out).

Algorithm: iterative min-label propagation (large-star/small-star
simplified) — every node starts as its own label; each round a node takes
the min label across itself and its neighbors; converged when no label
changes. Rounds needed ≈ graph diameter, and near-dup graphs are
overwhelmingly tiny cliques/chains, so 5-15 rounds closes everything in
practice; the loop stops early on convergence and hard-caps to bound cost.

Scale shape: each round is one join (labels ⋈ edges) + one min-aggregate —
all shuffles on the node id key; no driver-side graph state (the
convergence check is a 1-row count). This is the standard Spark CC recipe
when GraphFrames isn't on the cluster.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 15,
    strict: bool = True,
) -> DataFrame:
    """(node, component) — component = min node id reachable from node.

    `pairs` is an undirected edge list; isolated nodes (absent from pairs)
    are simply absent from the output (they form singleton components).

    Convergence is CHECKED, not assumed: if labels are still changing
    after `max_iterations` rounds (component diameter > max_iterations —
    e.g. a pathological near-dup chain), the labels would silently split
    one component into several. With ``strict=True`` (default) that
    raises; with ``strict=False`` it emits a ``RuntimeWarning`` and
    returns the partial labels.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        # localCheckpoint truncates lineage — without it each iteration's
        # plan embeds all previous ones and the driver OOMs on plan growth
        # (the classic iterative-DataFrame failure mode)
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        msg = (
            f"connected_components did not converge within {max_iterations} "
            "iterations; a component wider than that would be split. "
            "Raise max_iterations (rounds needed ~ graph diameter)."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def canonical_documents(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 15,
) -> DataFrame:
    """Keep/drop decision per document: one canonical keeper (min id) per
    near-dup component; documents outside any component keep themselves.

    Returns (id_col, component, is_canonical) for every input document.
    """
    cc = connected_components(pairs, max_iterations=max_iterations)
    return (
        docs.select(id_col)
        .join(cc, docs[id_col] == cc.node, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )

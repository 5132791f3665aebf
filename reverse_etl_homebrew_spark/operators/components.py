"""Connected components over near-duplicate candidate pairs — the
step that turns pairwise similarity (MinHash/SimHash/Jaccard/cosine)
into dedup decisions: each duplicate CLUSTER keeps exactly one
survivor.

Algorithm: alternating min-label propagation (large-star/small-star
style) to a fixpoint — each node repeatedly adopts the smallest label
in its neighborhood. Iterative, converges in O(log n) rounds on
real near-dup graphs (components are small and dense); each round is
one groupBy shuffle. This is the canonical Spark shape for iterative
graph algorithms without GraphX/graphframes dependencies.

Scale notes: label state is (node, label) — linear in nodes; rounds
localCheckpoint to cut lineage (otherwise plan depth grows per
iteration and planning dominates). Max-iteration cap + convergence
count guard against pathological chains (a path graph needs O(n)
rounds — real near-dup clusters are cliques-ish from LSH banding, so
this does not occur in practice; the cap fails loudly rather than
looping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
    storage: "str | None" = None,
) -> DataFrame:
    """(a_id, b_id) undirected edges → (id, component) with component
    = min node id in the component. Deterministic.

    ``storage`` picks how per-round state is pinned, mirroring
    ``minhash_candidate_pairs``: ``None`` (default) uses
    ``localCheckpoint`` — right for single-node / local[*], and also
    cuts lineage so plan depth stays O(1) per round; on a real cluster
    pass a ``pyspark.StorageLevel`` name (e.g. ``"DISK_ONLY"``,
    ``"MEMORY_AND_DISK"``) to ``persist`` instead, which tolerates
    executor loss via lineage recompute. In persist mode each round's
    labels are materialized by the convergence count and the previous
    round's block is unpersisted, so pinned state stays O(nodes);
    every intermediate block is released on ANY exit path (success,
    non-convergence, mid-round failure).

    Persist-mode contract for the RETURNED DataFrame: it is still
    persisted at ``storage`` level — its lineage is the whole iterative
    chain, so dropping the pin before the caller materializes it would
    re-run every round. Call ``.unpersist()`` on it once downstream
    results are written.
    """
    if storage is None:
        pin_lazy = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
        pin_round = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        unpin = lambda df: None  # noqa: E731
    else:
        from pyspark import StorageLevel

        level = getattr(StorageLevel, storage)
        pin_lazy = lambda df: df.persist(level)  # noqa: E731
        pin_round = lambda df: df.persist(level)  # noqa: E731
        unpin = lambda df: df.unpersist()  # noqa: E731

    edges = pin_lazy(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # materialize once: every propagation round joins edges, and
        # without the pin the upstream pair-generation pipeline (often
        # a full LSH run) re-executes per iteration.
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    prev = None
    converged = False
    try:
        for _ in range(max_iter):
            # each node adopts min(own label, neighbors' labels)
            neighbor_labels = (
                edges.join(labels.withColumnRenamed("id", "dst"), ["dst"])
                .groupBy("src")
                .agg(F.min("component").alias("nbr_min"))
                .withColumnRenamed("src", "id")
            )
            new_labels = pin_round(
                labels.join(neighbor_labels, ["id"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                    ).alias("component"),
                )
            )
            try:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), ["id"])
                    .filter(F.col("n.component") != F.col("o.component"))
                    .count()
                )
            except Exception:
                unpin(new_labels)
                raise
            if prev is not None:
                unpin(prev)
            prev, labels = labels, new_labels
            if changed == 0:
                converged = True
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        # release every pinned block except (on success) the returned
        # labels frame — see the persist-mode contract above.
        unpin(edges)
        if prev is not None and prev is not labels:
            unpin(prev)
        if not converged:
            unpin(labels)


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    storage: "str | None" = None,
) -> DataFrame:
    """Keep one survivor (min id) per duplicate cluster; rows not in
    any pair survive untouched. The standard last stage of a corpus
    near-dedup pipeline. ``storage`` is forwarded to
    ``connected_components`` (set a StorageLevel name on a cluster)."""
    comps = connected_components(pairs, storage=storage)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, [id_col], "left_anti")

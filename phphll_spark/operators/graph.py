"""Connected components over near-duplicate pair graphs.

The production dedup rule is cluster-level: group near-dup PAIRS into
connected components and keep one canonical doc per component. (The
per-pair "drop the higher id of every qualifying pair" rule in
``dedup_minhash_keep`` is the conservative variant: in a chain a–b–c it
drops both b and c; the cluster rule keeps exactly one doc per cluster.)

Scale shape: the pair graph is built from LSH-verified candidates, so it
holds only docs that actually near-match something — orders of magnitude
smaller than the corpus (at 10^12 docs a few percent of nodes, and far
fewer edges, is the realistic ceiling). Components are therefore computed
with iterative min-label propagation over the symmetric edge list — one
hash join + one agg per iteration, converging in graph-diameter rounds,
which for near-dup clusters (dense blobs of mutually-similar docs, tiny
chains) is a handful. The O(log n)-round star-contraction algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") is the
drop-in upgrade if adversarially long chains ever matter; the driver
loop below is deliberately the simple one because each iteration is a
full deterministic Spark job and convergence is checked with a single
tiny aggregate, not a collect of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iterations: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, component) for every node of the pair graph; ``component`` is
    the MINIMUM id in the node's connected component (canonical label,
    engine-portable — a recursive-CTE oracle computes the same thing).

    Iterative min-label propagation: each round, every node takes the min
    of its own label and its neighbors' labels. Converges in diameter
    rounds; iteration stops early when the sum-of-labels fixpoint is
    reached (labels only ever decrease, so an unchanged sum ⇔ unchanged
    labels — one scalar action per round, never a graph collect). The
    sum runs over ``decimal(38,0)`` so huge id domains (e.g. xxhash64
    labels at 10^9 nodes) can never wrap int64 and fake a fixpoint.
    Lineage is truncated every round with an eager checkpoint
    (iterative self-joins otherwise grow the logical plan exponentially
    — the classic iterative-DataFrame OOM, in plan construction, not
    data); the edge list is checkpointed once so an expensive upstream
    pair plan (LSH + verification) never re-runs per round. Raises after
    ``max_iterations`` rather than silently returning unconverged
    labels.

    ``checkpoint_dir``: when set, per-round truncation uses RELIABLE
    ``checkpoint()`` against that path (set as the session's checkpoint
    dir) instead of ``localCheckpoint()``. Local checkpoints store
    blocks on executors — right for single-JVM local mode, but on a
    real cluster losing one executor mid-iteration makes the truncated
    lineage unrecoverable; pointing ``checkpoint_dir`` at durable
    storage (HDFS/S3) makes every round recoverable at the cost of a
    write per round."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint()

    def _label_sum(df: DataFrame):
        # decimal(38,0): overflow-proof (non-ANSI int64 sum wraps silently)
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    edges = _truncate(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    labels = _truncate(
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    prev_sum = _label_sum(labels)
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = _truncate(
            labels.join(nbr_min, labels.id == nbr_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")


def dedup_cluster_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster-level dedup: one survivor (the minimum id) per connected
    component of the pair graph; docs in no pair survive untouched. The
    components frame is tiny relative to the corpus, so the kill-list
    join is an anti-join on ids only."""
    comp = connected_components(pairs, id_a, id_b, checkpoint_dir=checkpoint_dir)
    losers = comp.filter(F.col("id") != F.col("component")).select(F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")

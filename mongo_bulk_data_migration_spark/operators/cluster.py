"""Near-duplicate cluster assignment: connected components over a pair list.

The dedup pipeline's final stage: LSH-verified near-dup PAIRS (id_a, id_b)
become per-document CLUSTER ids so each group can keep one canonical copy —
the operation a training-data pipeline runs after `minhash_lsh_candidates`
-> `ngram_jaccard_pairs` (see :mod:`.dedup_text`).

Implemented as distributed min-label propagation over the undirected pair
graph::

    label(u) <- min(label(u), min_{v in N(u)} label(v))

iterated to a fixed point.  Each round is one shuffle: the edge list joined
to current labels, then a groupBy-min.  Near-dup graphs are clique-ish
clusters with tiny diameter, so the fixed point arrives in a handful of
rounds regardless of graph size; for adversarial long-chain graphs the
alternating large-star/small-star scheme (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) bounds rounds at O(log^2 n)
with the same per-round shuffle shape — the iteration driver below is
agnostic to which update rule produces the next label frame.

Scale notes (100 TB design target):
- only documents that appear in >=1 candidate pair enter the graph; the
  (overwhelming) unpaired majority never shuffles;
- per-round state is lineage-truncated (localCheckpoint in this sandbox; a
  production cluster sets a reliable checkpoint dir so executor loss
  re-reads state instead of recomputing the whole iteration chain);
- convergence is decided by an aggregate (count of changed labels) — no
  data rows ever reach the driver.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger("mbdm-spark")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_id: str = "doc_id",
    out_label: str = "cluster_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component id is the
    minimum node id of the component (deterministic, join-back friendly)."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neigh = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("__vl")), "v"
            )
            .groupBy("u")
            .agg(F.min("__vl").alias("__nl"))
        )
        new = labels.join(neigh, "u", "left").select(
            "u",
            F.least(F.col("label"), F.coalesce(F.col("__nl"), F.col("label"))).alias("label"),
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        log.warning(
            "connected_components: no fixed point after %d rounds (%d labels "
            "still changing) — graph has chains longer than max_iter; raise "
            "max_iter or switch to the large-star/small-star update rule",
            max_iter, changed,
        )

    return labels.select(F.col("u").alias(out_id), F.col("label").alias(out_label))

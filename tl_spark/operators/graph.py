"""Distributed connected components over a pair/edge table.

The missing step between pairwise near-duplicate detection and
cluster-level dedup: MinHash/SimHash/embedding stages emit PAIRS
(a~b); choosing one canonical document per duplicate GROUP needs the
transitive closure — connected components.

Algorithm: min-label propagation with pointer jumping. Each round
does (a) a neighbor-min step (every node adopts the smallest label in
its neighborhood) and (b) a pointer-jumping step (label <- label of
label), which contracts paths geometrically, so convergence is
O(log diameter) rounds rather than O(diameter) — the property that
makes the driver-side loop viable on billion-edge dedup graphs (the
driver only runs a bounded count() per round; all data stays
distributed). Shuffle keys are node ids throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _LocalCheckpointHandle:
    """Cache-protocol handle (duck-typed ``.unpersist()``) for a
    localCheckpoint's RDD-level persistence, which DataFrame.unpersist
    cannot release (it only clears CacheManager entries). NOTE: a
    localCheckpoint's lineage is truncated, so after release the plan
    that reads it CANNOT be recomputed — the protocol's
    materialize-then-release contract is mandatory here, not merely
    advisable."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        try:
            self._df._jdf.queryExecution().analyzed().rdd().unpersist(
                blocking
            )
        except Exception:
            pass  # session gone / already released


def _release_ckpt(df: DataFrame) -> None:
    _LocalCheckpointHandle(df).unpersist()


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the connected component.
    Deterministic; self-loops and duplicate edges are fine. Raises
    RuntimeError if not converged within ``max_iter`` pointer-jumping
    rounds (~2^max_iter diameter — unreachable in practice).

    Cache ownership: intermediate per-round checkpoints are released
    eagerly inside the loop; the FINAL labels checkpoint (which the
    returned plan reads) is attached as a cache-protocol handle —
    materialize the result, then ``unpersist_handles`` it. After
    release the result cannot be recomputed (truncated lineage)."""
    from tl_spark.cache import attach_handles
    e = (
        edges.select(
            F.col(id_a).cast("long").alias("src"),
            F.col(id_b).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # localCheckpoint truncates lineage each round — the plan would
    # otherwise nest one join-tree per iteration and analysis time
    # would blow up. (Executor-loss fault tolerance needs a real
    # checkpoint dir at cluster scale; same call shape.)
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # (a) neighbor-min: smallest label among self + neighbors
        nbr = (
            sym.join(
                labels.select(
                    F.col("id").alias("dst"),
                    F.col("label").alias("_nl"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("_nl").alias("_m"))
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("_m", F.col("label"))
                ).alias("label"),
            )
        )
        # (b) pointer jumping: label <- label(label)
        jumped = (
            stepped.join(
                stepped.select(
                    F.col("id").alias("label"),
                    F.col("label").alias("_ll"),
                ),
                "label",
                "left",
            )
            .select(
                "id",
                F.least(
                    "label", F.coalesce("_ll", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.select("id", F.col("label").alias("_old"))
            .join(jumped, "id")
            .filter(F.col("_old") != F.col("label"))
            .count()
        )
        # jumped is materialized (eager) and no longer reads labels:
        # drop the superseded round's checkpoint immediately
        _release_ckpt(labels)
        labels = jumped
        if changed == 0:
            _release_ckpt(sym)
            out = labels.select("id", F.col("label").alias("component"))
            return attach_handles(out, _LocalCheckpointHandle(labels))
    _release_ckpt(sym)
    _release_ckpt(labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id, component, is_canonical): transitive duplicate clusters
    from a verified near-dup pair table; the smallest id per cluster
    is canonical (keep it, drop the rest). The cluster-correct
    upgrade over per-pair later-doc dropping when duplicate groups
    are larger than 2."""
    from tl_spark.cache import keep_handles

    cc = connected_components(pairs, id_a, id_b)
    out = cc.select(
        "id",
        "component",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
    return keep_handles(out, cc)

"""Near-duplicate cluster resolution: candidate dup PAIRS -> connected
COMPONENTS -> one canonical doc per component.

The dedup family (operators/dedup.py) emits pairwise evidence
(lsh_verified_pairs, exact_dup_groups); a training-corpus build then
needs "keep exactly one doc per duplicate *cluster*", which is
connected components over the pair graph — pairs (a,b),(b,c) must
collapse to one cluster {a,b,c} even though (a,c) was never emitted.

Spark-first shape: iterative min-label propagation with path-halving
(each round every node takes the min label over itself and its
neighbours, then labels shortcut through one pointer hop), which
converges in O(log diameter) rounds — the same alternating scheme as
the large-star/small-star map-reduce CC algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Every round
is two shuffles on bigint keys (one neighbour-min aggregate, one
label-to-label shortcut join); `localCheckpoint` truncates the lineage
so the plan does not grow with iterations. Convergence is detected by
the monotonically decreasing exact sum of labels (labels only ever
drop to a smaller node id), a single-row aggregate per round — no
driver-side data movement beyond that scalar.

Dup-pair graphs at corpus scale are overwhelmingly tiny components
(pairs + short chains from chained near-dups), so the fixpoint
typically lands in 2-4 rounds; path-halving bounds the worst
pathological chain at O(log n) rounds.

Reference anchor: the reference's dedup surface stops at per-URL
row dedup (dbt transformed.sql:16-24 ROW_NUMBER over url); cluster
resolution generalizes it to transitive near-dup groups for the
100 TB corpus posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_sum(lab: DataFrame) -> int:
    # Exact decimal sum: bigint labels over billions of rows can
    # overflow a bigint accumulator at 100 TB.
    return int(lab.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).collect()[0][0])


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(id, lab) with lab = min node id reachable from id over the
    undirected pair graph. ``nodes`` must have column ``id``
    (bigint-able); ``pairs`` columns ``id_a``/``id_b``.

    Isolated nodes keep lab = id. Exact fixpoint (not an
    approximation), so it agrees with a transitive-closure oracle.
    """
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    # Lazy checkpoint: round 1's neighbour join is the first (and only
    # per-round) consumer, so it materializes the edge cache itself —
    # an eager checkpoint here ran the whole upstream pair pipeline as
    # a dedicated extra job before the loop started.
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)

    lab = nodes.select(F.col("id").cast("long").alias("id"), F.col("id").cast("long").alias("lab"))

    # Lazy checkpoints throughout (r12 optimization, measured
    # 1.2-3.2x on the sf0.1 build): eager=False defers
    # materialization to the convergence-check aggregate below, so
    # ONE job per round both materializes the checkpoint and computes
    # the label sum — the eager form ran a write job and then a
    # separate read-back job, i.e. one extra pass over the label
    # frame every round at any scale. Lineage is truncated
    # identically once materialized. The initial label frame is not
    # checkpointed at all: relabeling never touches the id column, so
    # round 1's aggregate reads the initial label sum back as sum(id)
    # over its own output (exactly one row per node survives the
    # total path-halving self-join) — removing the pre-loop
    # materialization pass over the label frame entirely.
    prev = None
    for _ in range(max_iter):
        nbr = (
            edges.join(lab.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("lab").alias("nmin"))
        )
        prop = lab.join(nbr, "id", "left").select(
            "id", F.least("lab", F.coalesce("nmin", F.col("lab"))).alias("lab")
        )
        # Path halving: id -> lab -> lab(lab). Labels are node ids, so
        # the self-join is total.
        hop = prop.select(F.col("id").alias("lab"), F.col("lab").alias("lab2"))
        lab = (
            prop.join(hop, "lab")
            .select("id", F.col("lab2").alias("lab"))
            .localCheckpoint(eager=False)
        )
        if prev is None:
            row = lab.agg(
                F.sum(F.col("id").cast("decimal(38,0)")),
                F.sum(F.col("lab").cast("decimal(38,0)")),
            ).collect()[0]
            prev, cur = int(row[0]), int(row[1])
        else:
            cur = _label_sum(lab)
        if cur == prev:
            break
        prev = cur
    return lab


def dup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, keep): every doc labelled
    with its near-dup component (cluster_id = min doc_id in the
    component), the component size, and the keep-one-per-cluster
    decision (canonical = the min-id member — deterministic and
    engine-portable; swap in a quality-score argmax upstream by
    re-keying ids if desired)."""
    nodes = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(nodes, pairs)
    sizes = comp.groupBy("lab").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "lab")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lab").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("lab")).alias("keep"),
        )
    )

"""Distributed connected components — the graph step that turns
near-duplicate PAIRS into duplicate CLUSTERS so a curation pipeline can
keep exactly one canonical document per group of mutual near-dups.

The reference has no graph surface (sematext/HBaseWD is a key
distributor; see SURVEY.md §0), but its north-star extension set
(dedup at scale) is incomplete without this: LSH emits pairs, and
pairs alone over-delete (A~B, B~C ⇒ drop B and C, keep A — requires
the component, not the pair list).

Spark-first, scale-first design — iterative min-label propagation
with pointer jumping, pure DataFrame ops:

    l(v) ← min(l(v), min_{u ∈ N(v)} l(u))     (neighbor step: 1 join + 1 groupBy)
    l(v) ← l(l(v))                            (pointer jump: 1 self-join)

The pointer-jump halves the distance to the component minimum each
round (hash-to-min style, cf. Rastogi et al. "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE'13 — public
algorithm), so rounds ≈ log(diameter) instead of diameter. Each round
is two shuffles over the EDGE list only — near-dup graphs at 100 TB
are a tiny fraction of the corpus (edges ≈ dup pairs), and lineage is
cut per round with localCheckpoint so the plan doesn't grow
exponentially. Convergence is detected with a count of changed
labels (one action per round on the small label frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


# below this many edges the component structure fits comfortably on the
# driver: one collect + union-find beats log(diameter) shuffle rounds.
# Near-dup graphs are edge-sparse (edges ~ dup pairs, a sliver of the
# corpus), so even petabyte corpora often take this path; the threshold
# is a knob, and the distributed path is the same contract.
SMALL_GRAPH_EDGES = 5_000_000


def _driver_union_find(spark, pairs: list[tuple[int, int]]) -> DataFrame:
    """Exact min-label components on the driver (path-compressed
    union-find); same (id, cluster_id=min id) contract as the
    distributed path."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a == b:  # self-loops carry no component info (distributed
            continue  # path filters them identically)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN so the root is always the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(v, find(v)) for v in parent]
    return spark.createDataFrame(rows, "id bigint, cluster_id bigint")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """(id, cluster_id) for every vertex appearing in ``edges``;
    ``cluster_id`` is the minimum vertex id of the component —
    deterministic, engine-independent (the DuckDB oracle reproduces it
    with a recursive CTE).

    Scale-adaptive: edge sets under ``small_graph_edges`` collect to
    the driver for one-pass union-find (no iterative shuffle rounds);
    larger graphs run log-round label propagation + pointer jumping."""
    e = edges.select(
        F.col(src).cast("bigint").alias("src"), F.col(dst).cast("bigint").alias("dst")
    )
    n_edges = e.count()
    if n_edges <= small_graph_edges:
        pairs = [(r.src, r.dst) for r in e.collect()]
        return _driver_union_find(edges.sparkSession, pairs)
    bidir = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    lbl = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # neighbor step: l(v) <- min(l(v), min over incoming labels).
        # Expressed as agg + left join (not a union of the two frames:
        # they share checkpoint lineage, and Spark 4's Union constraint
        # rewrite chokes on self-referencing attribute sets)
        msgs = (
            bidir.alias("e")
            .join(lbl.alias("l"), F.col("e.src") == F.col("l.id"))
            .groupBy(F.col("e.dst").alias("id"))
            .agg(F.min("l.lbl").alias("nbr_min"))
        )
        stepped = (
            lbl.alias("s")
            .join(msgs.alias("m"), "id", "left")
            .select(
                F.col("id"),
                F.least(
                    F.col("s.lbl"), F.coalesce(F.col("m.nbr_min"), F.col("s.lbl"))
                ).alias("lbl"),
            )
        )
        # pointer jump: adopt the label of your label (labels are vertex
        # ids, and lbl(v) <= v, so the chain only descends)
        jumped = (
            stepped.alias("a")
            .join(stepped.alias("b"), F.col("a.lbl") == F.col("b.id"), "left")
            .select(
                F.col("a.id").alias("id"),
                F.least(F.col("a.lbl"), F.coalesce(F.col("b.lbl"), F.col("a.lbl"))).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(lbl.alias("o"), "id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        lbl = jumped
        if changed == 0:
            break

    return lbl.select("id", F.col("lbl").alias("cluster_id"))

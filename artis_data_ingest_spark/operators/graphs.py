"""Reusable iterative graph operators: integer-exact weighted PageRank.

Library form of the algorithm behind ``plans/graph.py:q_pagerank`` —
callers bring any (src, dst, w) edge DataFrame (entity-link graphs,
citation graphs, near-dup similarity graphs). Sibling of
``operators/dedup.py:connected_components`` (min-label propagation);
see ``plans/graph.py`` for the determinism rationale (fixed-point
BIGINT arithmetic, truncating DIV, associative integer sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted PageRank over ``edges`` (columns src, dst, w) →
    (node, pr) with pr in fixed-point units of 1/PR_SCALE.

    All-integer arithmetic: bit-identical under any partitioning.
    Dangling mass is dropped (GraphX staticPageRank semantics). The
    derived relations are localCheckpoint-ed once so the unrolled loop
    never re-derives the edge pipeline, and the rank table checkpoints
    every ``checkpoint_every`` rounds to keep the plan shallow at
    large ``n_iter`` (the connected_components lineage pattern).
    """
    keep_pct = 100 - damping_pct
    edges = (
        edges.groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(outw, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nn.select(
        F.expr(
            f"({keep_pct} * CAST({PR_SCALE} AS BIGINT)) DIV (100 * n)"
        ).alias("b"),
        "n",
    )
    pr = nodes.crossJoin(F.broadcast(base)).select(
        "node", F.expr(f"CAST({PR_SCALE} AS BIGINT) DIV n").alias("pr")
    )
    # Exact identity (pr*w) DIV ow == (pr DIV ow)*w + ((pr MOD ow)*w)
    # DIV ow for non-negative ints: the naive product pr*w overflows
    # BIGINT once w ≥ ~9.2e6 (pr approaches PR_SCALE on a hub), which
    # under Spark 4's ANSI default kills the job mid-iteration.  The
    # split form only needs w*ow < 2^63 (pr DIV ow ≤ pr/w·... ≤
    # PR_SCALE/ow·ow bounded by PR_SCALE since w ≤ ow) — satisfied by
    # any real graph whose per-source degree×weight product stays
    # under 9.2e18; rescale weights upstream beyond that.
    _contrib = (
        "(pr DIV ow) * w + ((pr % ow) * w) DIV ow"
    )
    for i in range(n_iter):
        contrib = pr.join(ew, pr["node"] == ew["src"]).select(
            "dst", F.expr(_contrib).alias("contrib")
        )
        summed = contrib.groupBy("dst").agg(F.sum("contrib").alias("s"))
        pr = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .crossJoin(F.broadcast(base))
            .select(
                "node",
                F.expr(
                    f"b + ({damping_pct}"
                    " * COALESCE(s, CAST(0 AS BIGINT))) DIV 100"
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            pr = pr.localCheckpoint()
    return pr

"""Iterative graph algorithms as join+aggregate loops.

PageRank here is the canonical "iterate a join-agg to fixpoint"
Spark pattern (same driver-synchronized loop family as the
connected-components operator in ``dedup.py::dedup_clusters``).
No reference ancestry — the reference (`GetJobs.py`) has no graph
surface; this is the Spark-first design for link analysis over an
edge list.

Exactness contract: ranks are **scaled fixed-point BIGINTs**
(``SCALE = 1_000_000``), every step uses integer multiply +
integer floor-division, so a fixed iteration count yields
bit-identical results on any engine — the DuckDB oracle unrolls the
same recurrence as a CTE chain.  (Float PageRank would diverge
between engines on summation order alone.)

Scale notes (billions of edges):
- ``ranks`` is O(nodes) and re-shuffles each iteration keyed by the
  join key; ``edges`` is the big side and should be pre-partitioned
  by ``src`` once (``repartition(src)`` + persist) so each
  iteration's join co-locates against the cached edge partitioning
  instead of re-shuffling the edge list.
- Per-iteration ``localCheckpoint`` truncates the lineage so the
  plan doesn't grow with the iteration count (same idiom as
  dedup_clusters).
- Dangling nodes (no out-edges) keep only the teleport term; their
  outgoing mass is dropped rather than redistributed — declared,
  and exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank_fixedpoint(edges: DataFrame, iterations: int = 3,
                        damping_pct: int = 85,
                        src: str = "src", dst: str = "dst",
                        weight: str = "w") -> DataFrame:
    """Weighted PageRank over (src, dst, w) with integer fixed-point
    arithmetic.  Returns (node, rank_scaled) — rank ~ rank_scaled /
    SCALE, sum over nodes <= n_nodes * SCALE (floor losses + dangling
    mass are dropped).

    Recurrence (all BIGINT, positive, floor division):
        contrib(u, v) = (rank[u] * damping_pct * w(u, v))
                          DIV (100 * out_w(u))
        rank'(v)      = SCALE * (100 - damping_pct) DIV 100
                          + sum_u contrib(u, v)
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .unionByName(edges.select(F.col(dst).alias("node")))
             .distinct())
    out_w = (edges.groupBy(src)
             .agg(F.sum(F.col(weight)).alias("out_w")))
    # big side: pre-joined (src, dst, w, out_w), partitioned by src
    # once and pinned — iterations join ranks against this layout.
    links = (edges.join(out_w, src)
             .select(F.col(src).alias("u"), F.col(dst).alias("v"),
                     F.col(weight).cast("bigint").alias("w"),
                     F.col("out_w").cast("bigint").alias("out_w"))
             .repartition("u").persist())
    teleport = SCALE * (100 - damping_pct) // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("bigint")
                         .alias("rank_scaled"))
    for it in range(iterations):
        # `div` = integer floor division (exact; a double `/` would
        # round and drift from the DuckDB `//` oracle).
        contribs = (links.join(ranks, links.u == ranks.node)
                    .select(F.col("v"),
                            F.expr(f"(rank_scaled * {damping_pct} * w)"
                                   f" div (100 * out_w)")
                            .alias("contrib")))
        summed = (contribs.groupBy("v")
                  .agg(F.sum("contrib").alias("s")))
        ranks = (nodes.join(summed, nodes.node == summed.v, "left")
                 .select(F.col("node"),
                         (F.lit(teleport)
                          + F.coalesce(F.col("s"), F.lit(0)))
                         .cast("bigint").alias("rank_scaled")))
        # truncate lineage between iterations (not after the last:
        # the caller gets a one-iteration plan over the pinned links,
        # inspectable via explain(), instead of an opaque RDD scan)
        if it < iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks

"""Spectral analysis over embedding columns: integer fixed-point
POWER ITERATION for the dominant eigenvector of the corpus Gram
matrix — the direction explaining the most variance (un-centered
PCA-1), the curation probe for "is one axis dominating the embedding
space" (anisotropy is the standard failure mode of contrastive
encoders; public Ethayarajh 2019 / Mu & Viswanath 2018 analyses).

Design (the X47 k-means discipline applied to a spectral op):
- vectors land on the shared floor-quantized integer grid
  (``clustering.quantize_vec``, scale 2^10);
- the 64x64 Gram matrix is computed by Arrow-batched numpy partial
  matmuls (`mapInPandas`) reduced by one 4096-key aggregate —
  integer sums, so accumulation ORDER is irrelevant and the result
  is exact no matter how Spark partitions the corpus;
- power iteration runs RELATIONALLY on the 4096-row Gram frame:
  each round is one join + 64-key aggregate in decimal(38,0), then a
  fixed-point renormalization ``u * 2^20 fdiv max|u|`` using the
  portable floor-division form (Spark DIV truncates toward zero,
  DuckDB // floors — the subtract-remainder form agrees on both for
  any sign);
- a fixed iteration count (no convergence test) keeps the trajectory
  bit-replayable; the DuckDB twin unrolls the same rounds as a CTE
  chain over a relational pair-join Gram.

Scale (100 TB): the only data-scale pass is the partial-Gram scan
(one read, no shuffle); everything after runs on dim^2-sized frames.
The declared report is the top-5 |component| dims plus the x1000
Rayleigh quotient (the top-eigenvalue estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..exprs import bounded_part

from .clustering import QUANT_SCALE, quantize_vec

U_SCALE = 1 << 20    # fixed-point unit for the iterated vector


def _fdiv(num: str, den: str) -> str:
    """Portable FLOOR division (den > 0): Spark DIV truncates toward
    zero, DuckDB // floors; subtracting the non-negative remainder
    first makes the quotient exact floor on both."""
    return (f"CAST((({num}) - ((({num}) % ({den}) + ({den}))"
            f" % ({den}))) / ({den}) AS DECIMAL(38,0))")


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact integer Gram matrix (dim x dim) of the quantized corpus:
    numpy partial matmul per Arrow batch, one 4096-key reduce."""
    q = emb.select(quantize_vec(vec_col).alias("qv"))

    def _partial(batches):
        import numpy as np
        import pandas as pd
        acc = None
        for pdf in batches:
            x = np.array(pdf["qv"].tolist(), dtype=np.int64)
            if x.size == 0:
                continue
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            i, j = np.indices(acc.shape)
            yield pd.DataFrame({"i": i.ravel().astype("int32"),
                                "j": j.ravel().astype("int32"),
                                "s": acc.ravel()})

    part = q.mapInPandas(_partial, "i int, j int, s long")
    return part.groupBy("i", "j").agg(F.sum("s").alias("s"))


def power_iteration_top5(emb: DataFrame, iters: int = 3,
                         vec_col: str = "embedding") -> DataFrame:
    """X92 report: top-5 |component| dims of the dominant eigenvector
    after ``iters`` fixed-point rounds from the all-ones start, plus
    the x1000 Rayleigh quotient."""
    # The Gram frame is referenced by every iteration AND the
    # Rayleigh join — without materialization Spark re-executes the
    # whole corpus scan per reference (measured: 89 scans at
    # iters=3).  It is dim^2 = 4096 rows: eager-localCheckpoint it
    # once (the r5 staging discipline), and truncate each
    # iteration's lineage the same way (64 rows) so the DAG depth
    # stays O(1) per round instead of compounding.
    g = gram_matrix(emb, vec_col).localCheckpoint(eager=True)
    u = (g.select("j").distinct()
         .select("j", F.lit(U_SCALE).cast("decimal(38,0)").alias("val")))
    for _ in range(iters):
        w = (g.join(u, "j")
             .groupBy(F.col("i").alias("j"))
             .agg(F.sum(F.col("s").cast("decimal(38,0)")
                        * F.col("val")).alias("w")))
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        u = (w.crossJoin(F.broadcast(m))
             .select("j", F.expr(
                 _fdiv(f"w * {U_SCALE}", "m")).alias("val"))
             .localCheckpoint(eager=True))
    # Rayleigh estimate of the top eigenvalue: u^T G u / u^T u, x1000
    ugu = (g.join(u.select(F.col("j").alias("i"),
                           F.col("val").alias("ui")), "i")
           .join(u.select("j", F.col("val").alias("uj")), "j")
           .agg(F.sum(F.col("s").cast("decimal(38,0)")
                      * F.col("ui") * F.col("uj")).alias("ugu")))
    uu = u.agg(F.sum(F.col("val") * F.col("val")).alias("uu"))
    ray = (ugu.crossJoin(uu)
           .select(F.expr(_fdiv("ugu * 1000", "uu"))
                   .cast("long").alias("rayleigh_x1000")))
    # frame = dim rows (64); r7 bounded_part silences the bench-tail
    # WindowExec warnings that masked real single-partition regressions
    wnd = (W.partitionBy(bounded_part("j"))
           .orderBy(F.abs(F.col("val")).desc(), F.col("j")))
    top = (u.withColumn("rank", F.row_number().over(wnd))
           .filter(F.col("rank") <= 5))
    return (top.crossJoin(F.broadcast(ray))
            .select("rank", F.col("j").alias("dim"),
                    F.col("val").cast("long").alias("component"),
                    "rayleigh_x1000"))


def power_iteration_sql(iters: int = 3, table: str = "embeddings",
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> str:
    """DuckDB twin: relational pair-join Gram + the identical
    unrolled fixed-point rounds (HUGEINT arithmetic, same portable
    floor division)."""
    def fdiv(num: str, den: str) -> str:
        return (f"(({num}) - ((({num}) % ({den}) + ({den}))"
                f" % ({den}))) // ({den})")

    parts = [f"""
WITH q AS (
  SELECT {id_col} AS vid,
         GENERATE_SUBSCRIPTS({vec_col}, 1) - 1 AS dim,
         CAST(FLOOR(CAST(UNNEST({vec_col}) AS DOUBLE) * {QUANT_SCALE})
              AS BIGINT) AS v
  FROM {table}),
g AS (SELECT a.dim AS i, b.dim AS j, SUM(a.v * b.v) AS s
      FROM q a JOIN q b USING (vid) GROUP BY a.dim, b.dim),
u0 AS (SELECT DISTINCT dim AS j, CAST({U_SCALE} AS HUGEINT) AS val
       FROM q)"""]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f""",
w{t} AS (SELECT g.i AS j, SUM(CAST(g.s AS HUGEINT) * u{p}.val) AS w
         FROM g JOIN u{p} ON g.j = u{p}.j GROUP BY g.i),
m{t} AS (SELECT MAX(ABS(w)) AS m FROM w{t}),
u{t} AS (SELECT j, {fdiv(f"w * {U_SCALE}", "m")} AS val
         FROM w{t}, m{t})""")
    u = f"u{iters}"
    parts.append(f""",
ray AS (
  SELECT CAST({fdiv("SUM(CAST(g.s AS HUGEINT) * a.val * b.val) * 1000",
                    f"(SELECT SUM(val * val) FROM {u})")}
              AS BIGINT) AS rayleigh_x1000
  FROM g JOIN {u} a ON g.i = a.j JOIN {u} b ON g.j = b.j)
SELECT rank, dim, component, rayleigh_x1000 FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY ABS(val) DESC, j) AS rank,
         j AS dim, CAST(val AS BIGINT) AS component
  FROM {u}) , ray
WHERE rank <= 5""")
    return "".join(parts)

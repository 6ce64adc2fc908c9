"""Integer fixed-point k-means document clustering (Lloyd's
algorithm, public) over embedding vectors — the corpus-organization
primitive behind cluster-balanced sampling, SemDeDup-style pruning,
and topic audits of a pretraining mix.

Like X29's PageRank, a FIXED iteration count over EXACT integer
arithmetic makes the whole trajectory bit-reproducible across
engines: embeddings are quantized once to ``floor(v * 2^10)`` int64
grid points, distances are integer sums of squares, and centroid
updates are portable floor-division means — so a DuckDB twin can
replay every round exactly and any drift in assignment, tie-breaking,
or the empty-cluster rule reds the oracle gate.

Spark-first shape (100 TB):
- the model is DRIVER-SIDE BOUNDED: k x dim integers per round (the
  same contract as X44's one-argmax-row-per-round) folded back into
  the plan as a literal, so ASSIGNMENT is a row-local expression —
  no join, no shuffle, whole-stage codegen;
- the UPDATE is one shuffle per round keyed on (cluster, dim) —
  k * dim keys total, with map-side partial aggregation doing
  essentially all the work;
- points are eagerly localCheckpoint'ed once so each round reads
  materialized quantized blocks instead of re-scanning parquet.

The reference has no clustering surface (its only operator is a
per-file shell transform, GetJobs.py:51-56); this is the Spark-native
member of the dedup/similarity family in SURVEY §2B L5-L8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1 << 10    # embedding grid: floor(v * 1024)


def quantize_vec(col: str = "embedding") -> F.Column:
    """float array -> int64 grid points, floor(v * 2^10).  The scale
    is a power of two, so the double multiply is exact for every
    float32 input and FLOOR agrees bit-for-bit across engines (no
    round-half ambiguity)."""
    return F.expr(
        f"transform({col}, v -> CAST(FLOOR(CAST(v AS DOUBLE)"
        f" * {QUANT_SCALE}) AS BIGINT))")


def assign_best(cents: list[tuple[int, list[int]]],
                qv_col: str = "qv") -> F.Column:
    """Row-local assignment against broadcast literal centroids:
    struct (d, cid) for the argmin of the integer squared distance,
    ties to the lowest cluster id.  Stateless and join-free, so the
    same expression serves batch scoring AND streaming assignment."""
    lit = "array(" + ", ".join(
        f"struct({cid} AS cid, array({', '.join(map(str, cv))}) AS cv)"
        for cid, cv in cents) + ")"
    return F.expr(
        f"array_min(transform({lit}, c -> struct("
        f"aggregate(zip_with({qv_col}, c.cv, (a, b) -> (a-b)*(a-b)),"
        f" 0L, (s, x) -> s + x) AS d, c.cid AS cid)))")


def kmeans_train(df: DataFrame, k: int = 8, iters: int = 3,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> list[tuple[int, list[int]]]:
    """Train ``iters`` Lloyd rounds and return the centroids the
    FINAL round's assignment uses (init + iters-1 updates) — the
    deployable model, k x dim bounded integers.

    Init: the quantized vectors of the ``k`` smallest ids (a
    deterministic, SQL-expressible seeding).  Update: per-(cluster,
    dim) integer mean via portable floor division; a cluster that
    captures no points keeps its previous centroid."""
    pts = (df.select(id_col, quantize_vec(vec_col).alias("qv"))
           .localCheckpoint(eager=True))
    cents: list[tuple[int, list[int]]] = [
        (i, list(r["qv"]))
        for i, r in enumerate(pts.orderBy(id_col).limit(k).collect())]
    dim = len(cents[0][1])
    for _ in range(iters - 1):
        # Column-wise per-cluster sums (one F.sum per dim) instead of
        # the posexplode + (cid, dim) shuffle: the explode inflated
        # every vector 64x before shuffling 512 keys; this form
        # partial-aggregates k rows x (1 + dim) longs map-side, so
        # the exchange moves ~k rows per partition (r8, the x47
        # watch-item).  Same integers: SUM per (cluster, dim) is
        # order-independent, and Python's // IS floor division —
        # exactly what the twin CTE chain's portable pdiv expression
        # computes for the positive counts n.
        assigned = pts.withColumn("best", assign_best(cents))
        rows = (assigned.groupBy(F.col("best.cid").alias("cid"))
                .agg(F.count(F.lit(1)).alias("n"),
                     *[F.sum(F.element_at("qv", d + 1)).alias(f"s{d}")
                       for d in range(dim)])
                .collect())
        upd = {(int(r["cid"]), d): r[f"s{d}"] // r["n"]
               for r in rows for d in range(dim)}
        cents = [(cid, [upd.get((cid, d), cv[d]) for d in range(len(cv))])
                 for cid, cv in cents]
    return cents


def kmeans_fixedpoint(df: DataFrame, k: int = 8, iters: int = 3,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Train, run the final assignment, and return the per-cluster
    report: (cid, n_points, sum_vec_id, inertia) — all exact int64.

    Magnitudes: |q| <= ~2^13 per dim after quantization, so a squared
    diff is < 2^28, a 64-dim distance < 2^34, and corpus inertia
    stays exact in int64 up to ~2^29 vectors PER PARTITIONED SUM —
    far past any real corpus."""
    cents = kmeans_train(df, k=k, iters=iters,
                         vec_col=vec_col, id_col=id_col)
    assigned = (df.select(id_col, quantize_vec(vec_col).alias("qv"))
                .withColumn("best", assign_best(cents)))
    return (assigned
            .groupBy(F.col("best.cid").cast("int").alias("cid"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum(id_col).alias("sum_vec_id"),
                 F.sum("best.d").alias("inertia")))


def kmeans_fixedpoint_sql(k: int = 8, iters: int = 3,
                          table: str = "embeddings",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`kmeans_fixedpoint`: the identical integer
    trajectory, unrolled as a CTE chain over the fully relational
    (id, dim, v) form — no list kernels shared with the Spark side,
    so the two implementations agree only if quantization, distance,
    tie-break, floor-division mean, and the empty-cluster rule all
    match exactly."""
    chain = _kmeans_cte_chain(k, iters, table, vec_col, id_col)
    return chain + f"""
SELECT CAST(cid AS INTEGER) AS cid, COUNT(*) AS n_points,
       CAST(SUM(vid) AS BIGINT) AS sum_vec_id,
       CAST(SUM(d) AS BIGINT) AS inertia
FROM a{iters} GROUP BY cid"""


def kmeans_label_matrix_sql(k: int = 8, iters: int = 3,
                            table: str = "embeddings",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            label_col: str = "label") -> str:
    """Same trajectory, different report: the cluster-vs-label
    contingency matrix of the final assignment (the S15 streaming
    scorer's oracle)."""
    chain = _kmeans_cte_chain(k, iters, table, vec_col, id_col)
    return chain + f"""
SELECT CAST(a.cid AS INTEGER) AS cid, e.{label_col} AS label,
       COUNT(*) AS n, MIN(a.vid) AS min_vec_id
FROM a{iters} a JOIN {table} e ON a.vid = e.{id_col}
GROUP BY a.cid, e.{label_col}"""


def _kmeans_cte_chain(k: int, iters: int, table: str,
                      vec_col: str, id_col: str) -> str:
    """The shared WITH-chain: quantize -> init -> (assign, update) x
    rounds, ending at the final assignment ``a{iters}``."""
    pdiv = "((u{i}.s - ((u{i}.s % u{i}.n + u{i}.n) % u{i}.n)) // u{i}.n)"
    parts = [f"""
WITH q AS (
  SELECT {id_col} AS vid, GENERATE_SUBSCRIPTS({vec_col}, 1) AS dim,
         CAST(FLOOR(CAST(UNNEST({vec_col}) AS DOUBLE) * {QUANT_SCALE})
              AS BIGINT) AS v
  FROM {table}),
init AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid
         FROM (SELECT {id_col} AS vid FROM {table}
               ORDER BY 1 LIMIT {k})),
c0 AS (SELECT i.cid, q.dim, q.v AS cv
       FROM q JOIN init i USING (vid))"""]
    for it in range(1, iters + 1):
        p = it - 1
        parts.append(f""",
d{it} AS (SELECT q.vid, c.cid,
                 SUM((q.v - c.cv) * (q.v - c.cv)) AS d
          FROM q JOIN c{p} c USING (dim) GROUP BY q.vid, c.cid),
a{it} AS (SELECT vid, cid, d FROM d{it}
          QUALIFY ROW_NUMBER() OVER (PARTITION BY vid
                                     ORDER BY d, cid) = 1)""")
        if it < iters:
            u = pdiv.format(i=it)
            parts.append(f""",
u{it} AS (SELECT a.cid, q.dim, SUM(q.v) AS s, COUNT(*) AS n
          FROM q JOIN a{it} a USING (vid) GROUP BY a.cid, q.dim),
c{it} AS (SELECT c{p}.cid, c{p}.dim, COALESCE({u}, c{p}.cv) AS cv
          FROM c{p} LEFT JOIN u{it}
            ON c{p}.cid = u{it}.cid AND c{p}.dim = u{it}.dim)""")
    return "".join(parts)

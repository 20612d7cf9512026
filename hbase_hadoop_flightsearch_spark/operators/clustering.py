"""Iterative k-means (Lloyd's) over the embeddings table — the
representative *iterative* algorithm (SURVEY.md §2b E11 extension): a
driver loop over fully-distributed passes, the same shape as MLlib's
implementation and of any large-scale corpus clustering / IVF-training
job.

Scale design (what survives 100 TB):
  - Centroids are a k x d artifact — always broadcast (inside the Arrow
    batch closure), never joined.
  - Assignment is one `mapInPandas` scan doing a NumPy GEMM per Arrow
    batch (same blocked-GEMM pattern as `operators/similarity.py`'s exact
    cosine): no shuffle, no per-row Python.
  - The per-iteration reduction emits k partial rows PER BATCH (count,
    sqdist sum, per-dimension sums), so the shuffle per iteration is
    O(k * d * n_batches) tiny rows, never the corpus. Only k x d floats
    ever reach the driver.
  - Ties (equidistant centroids) break to the lowest cluster id
    (np.argmin takes the first minimum), so assignment is deterministic
    given centroids.

Convergence (inertia non-increasing), agreement with a pure-NumPy
reference, and label purity are asserted in tests/test_clustering.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .similarity import _embeddings

KMEANS_K = 10  # matches the label cardinality of the synthetic embeddings
KMEANS_ITERS = 5


_PARTIALS_SCHEMA = "cluster int, n long, sqd double, sums array<double>"


def _assign_partials(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """One scan -> per-(batch, cluster) partial stats. `centroids` ships
    in the task closure (k x d — broadcast-sized by construction)."""
    C = centroids.copy()
    c_sq = (C**2).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy())
            d2 = (X**2).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
            cl = d2.argmin(axis=1)
            out = []
            for j in np.unique(cl):
                mask = cl == j
                out.append(
                    {
                        "cluster": int(j),
                        "n": int(mask.sum()),
                        "sqd": float(np.maximum(d2[mask, j], 0.0).sum()),
                        "sums": X[mask].sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return emb.mapInPandas(gen, _PARTIALS_SCHEMA)


def _reduce_partials(partials: DataFrame) -> tuple[dict, float]:
    """Merge batch partials to per-cluster (n, dim-sums) + global inertia.
    The array sums are exploded AFTER batch-level reduction, so the
    exchange carries k * d * n_batches scalars, not vectors of the corpus."""
    per_cluster = (
        partials.select(
            "cluster", "n", "sqd", F.posexplode("sums").alias("dim", "s")
        )
        .groupBy("cluster", "dim")
        .agg(
            F.sum("s").alias("s"),
            # n/sqd repeat once per dim within a batch row; take them via
            # a dim-0 sum to count each batch exactly once
            F.sum(F.when(F.col("dim") == 0, F.col("n"))).alias("n0"),
            F.sum(F.when(F.col("dim") == 0, F.col("sqd"))).alias("sqd0"),
        )
        .collect()
    )
    stats: dict[int, dict] = {}
    inertia = 0.0
    for r in per_cluster:
        c = stats.setdefault(r["cluster"], {"n": 0, "sqd": 0.0, "sums": {}})
        c["sums"][r["dim"]] = r["s"]
        if r["dim"] == 0:
            c["n"] = int(r["n0"])
            c["sqd"] = float(r["sqd0"])
            inertia += float(r["sqd0"])
    return stats, inertia


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's iterations; returns (centroids, per-iteration inertia).

    Init is deterministic: the k lowest-vec_id embeddings. Empty clusters
    keep their previous centroid. The returned inertia[i] is measured
    against the centroids *entering* iteration i, so the list is
    non-increasing for exact arithmetic (float noise aside).
    """
    emb = _embeddings(spark, sf_dir).persist()
    try:
        init = emb.orderBy("vec_id").limit(k).collect()
        centroids = np.array([r["v"] for r in init], dtype=np.float64)
        dim = centroids.shape[1]
        history: list[float] = []
        for _ in range(iters):
            stats, inertia = _reduce_partials(
                _assign_partials(emb, centroids)
            )
            history.append(inertia)
            for j, st in stats.items():
                centroids[j] = (
                    np.array([st["sums"][d] for d in range(dim)]) / st["n"]
                )
        return centroids, history
    finally:
        emb.unpersist()


def kmeans_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster, sqdist) for fitted centroids — one GEMM scan."""
    C = centroids.copy()
    c_sq = (C**2).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy())
            d2 = (X**2).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
            cl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": cl.astype("int32"),
                    "sqdist": np.maximum(
                        d2[np.arange(len(cl)), cl], 0.0
                    ),
                }
            )

    return emb.mapInPandas(gen, "vec_id long, cluster int, sqdist double")


def kmeans_cluster_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit k-means and summarize: one row per cluster with its population
    and within-cluster sum of squares (inertia, rounded) — the user-facing
    output; convergence/NumPy-agreement/purity in tests/test_clustering.py."""
    centroids, _ = kmeans_fit(spark, sf_dir)
    emb = _embeddings(spark, sf_dir)
    return (
        kmeans_assign(emb, centroids)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("sqdist"), 2).alias("inertia"),
        )
    )


# --- integer-exact quantized Lloyd's (full value oracle, VERDICT r7 #7) ---
#
# Cross-engine float k-means cannot be value-oracled: NumPy's GEMM and
# SQL's per-dimension SUM round in different orders, so an argmin can flip
# on a near-tie. The registered query therefore runs QUANTIZED Lloyd's,
# exactly reproducible in any engine (same trick as the Markov-attribution
# integer fixed-point):
#   - points quantized once: xq = floor(x * 2^15) as int64. 2^15 is a
#     power of two and the inputs are float32-representable, so the
#     double multiply and floor are EXACT — both engines get identical
#     integers.
#   - distances are pure int64 sums of squares (<= 64 * 2^32 << 2^63);
#     argmin ties break to the lowest cluster id.
#   - centroid update is the floored integer mean (floor division);
#     empty clusters keep their previous centroid.
# Every iteration is deterministic integer arithmetic, so DuckDB replays
# the whole trajectory with unrolled CTEs and the oracle checks exact
# per-cluster populations, integer inertia, and a centroid checksum.

KMEANS_Q = 1 << 15


def _quantize_block(vs) -> np.ndarray:
    return np.floor(np.stack(vs) * KMEANS_Q).astype(np.int64)


def _assign_partials_q(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Integer twin of _assign_partials: one GEMM scan (int64, exact) ->
    per-(batch, cluster) partials. Same O(k*d*batches) shuffle shape."""
    C = centroids.astype(np.int64)
    c_sq = (C**2).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize_block(pdf["v"].to_numpy())
            d2 = (X**2).sum(axis=1)[:, None] - 2 * (X @ C.T) + c_sq[None, :]
            cl = d2.argmin(axis=1)  # first minimum = lowest cluster id
            out = []
            for j in np.unique(cl):
                mask = cl == j
                out.append(
                    {
                        "cluster": int(j),
                        "n": int(mask.sum()),
                        "sqd": int(d2[mask, j].sum()),
                        "sums": X[mask].sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return emb.mapInPandas(
        gen, "cluster int, n long, sqd long, sums array<long>"
    )


def kmeans_fit_quantized(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> tuple[np.ndarray, list[int]]:
    """Quantized Lloyd's; returns (int64 centroids, per-iter int inertia).
    Init = the k lowest-vec_id points (quantized). Deterministic and
    engine-exact end to end; see the module comment above."""
    emb = _embeddings(spark, sf_dir).persist()
    try:
        init = emb.orderBy("vec_id").limit(k).collect()
        centroids = _quantize_block([r["v"] for r in init])
        dim = centroids.shape[1]
        history: list[int] = []
        for _ in range(iters):
            per_cluster = (
                _assign_partials_q(emb, centroids)
                .select(
                    "cluster",
                    "n",
                    "sqd",
                    F.posexplode("sums").alias("dim", "s"),
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.sum("s").alias("s"),
                    F.sum(F.when(F.col("dim") == 0, F.col("n"))).alias("n0"),
                    F.sum(F.when(F.col("dim") == 0, F.col("sqd"))).alias(
                        "sqd0"
                    ),
                )
                .collect()
            )
            sums = np.zeros((k, dim), dtype=np.int64)
            ns = np.zeros(k, dtype=np.int64)
            inertia = 0
            for r in per_cluster:
                sums[r["cluster"], r["dim"]] = r["s"]
                if r["dim"] == 0:
                    ns[r["cluster"]] = int(r["n0"])
                    inertia += int(r["sqd0"])
            history.append(inertia)
            for j in range(k):
                if ns[j] > 0:
                    centroids[j] = sums[j] // ns[j]  # floored int mean
        return centroids, history
    finally:
        emb.unpersist()


def _kmeans_assign_q(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster, d2) under int64 centroids — one exact GEMM scan."""
    C = centroids.astype(np.int64)
    c_sq = (C**2).sum(axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize_block(pdf["v"].to_numpy())
            d2 = (X**2).sum(axis=1)[:, None] - 2 * (X @ C.T) + c_sq[None, :]
            cl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": cl.astype("int32"),
                    "d2": d2[np.arange(len(cl)), cl],
                }
            )

    return emb.mapInPandas(gen, "vec_id long, cluster int, d2 long")


def _kmeans_oracle() -> str:
    """Unrolled-CTE DuckDB replay of the full quantized-Lloyd's
    trajectory (init + KMEANS_ITERS updates + final assignment)."""
    k, q, iters = KMEANS_K, KMEANS_Q, KMEANS_ITERS
    # Integer FLOOR division (both operands may be negative; DuckDB's %
    # truncates toward zero, so build floor-mod first).
    sql = f"""
WITH pts AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {q}) AS BIGINT) AS x
  FROM embeddings
),
c0 AS (
  SELECT CAST(DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
         dim, x AS c
  FROM pts
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
d{i} AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.x - c.c) * (p.x - c.c)) AS BIGINT) AS d2
  FROM pts p JOIN {prev} c ON p.dim = c.dim GROUP BY 1, 2
),
a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM d{i}) WHERE rn = 1
),
s{i} AS (
  SELECT a.cluster, p.dim, CAST(SUM(p.x) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a{i} a JOIN pts p USING (vec_id) GROUP BY 1, 2
),
c{i} AS (
  SELECT c.cluster, c.dim,
    COALESCE((s.s - (((s.s % s.n) + s.n) % s.n)) // s.n, c.c) AS c
  FROM {prev} c LEFT JOIN s{i} s
    ON c.cluster = s.cluster AND c.dim = s.dim
)"""
        prev = f"c{i}"
    sql += f""",
dF AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.x - c.c) * (p.x - c.c)) AS BIGINT) AS d2
  FROM pts p JOIN {prev} c ON p.dim = c.dim GROUP BY 1, 2
),
aF AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT vec_id, cluster, d2,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM dF) WHERE rn = 1
),
cks AS (
  SELECT cluster, CAST(SUM(c) AS BIGINT) AS centroid_checksum
  FROM {prev} GROUP BY 1
)
SELECT a.cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(a.d2) AS BIGINT) AS inertia_q, cks.centroid_checksum
FROM aF a JOIN cks USING (cluster)
GROUP BY a.cluster, cks.centroid_checksum
"""
    return sql


@register(
    "ml_kmeans_clusters",
    oracle=_kmeans_oracle(),
    doc="Iterative k-means (E11): QUANTIZED Lloyd's — a driver loop over "
    "int64 mapInPandas GEMM scans with O(k*d*batches) partial-row "
    "shuffles per iteration; floor(x * 2^15) quantization makes every "
    "assignment, centroid update (floored integer mean), and inertia "
    "sum exact integer arithmetic, so the FULL trajectory is replayed "
    "by the DuckDB oracle's unrolled CTEs (VERDICT r7 #7 — this seat "
    "moved off the invariant-flag list). Output: per-cluster exact "
    "population, integer inertia, and centroid checksum. The float "
    "production path (kmeans_fit/kmeans_cluster_summary) keeps its "
    "NumPy-reference tests in tests/test_clustering.py.",
)
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    centroids, _ = kmeans_fit_quantized(spark, sf_dir)
    emb = _embeddings(spark, sf_dir)
    summary = (
        _kmeans_assign_q(emb, centroids)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("d2").cast("bigint").alias("inertia_q"),
        )
    )
    checks = emb.sparkSession.createDataFrame(
        [(int(j), int(centroids[j].sum())) for j in range(KMEANS_K)],
        "cluster int, centroid_checksum bigint",
    )
    return summary.join(F.broadcast(checks), "cluster").select(
        F.col("cluster").cast("int").alias("cluster"),
        "n_points",
        "inertia_q",
        "centroid_checksum",
    )

# ---------------------------------------------------------------------------
# PCA via power iteration — the representative *linear-algebra* iterative job
# ---------------------------------------------------------------------------

PCA_Q = 1 << 12  # quantization scale (power of 2: exact double scaling)
PCA_SWEEPS = 8  # fixed cyclic sweep count — the DEFINED output, replayable
PCA_DIM = 64


def _pca_quant_gram(emb: DataFrame) -> tuple[list, list, int]:
    """Distributed EXACT integer Gram of the half-up-quantized embedding
    matrix: one mapInPandas scan emits per-batch int64 partials
    [n, sums(d), G(d*d)] (same shape as gram_stats), summed exactly as
    BIGINTs by a posexplode + groupBy aggregate. floor(u*Q + 0.5) is the
    engine-UNAMBIGUOUS half-up rounding (np.round's half-to-even vs SQL
    round's half-away diverge on exact .5 — observed on a real fixture
    value 0.1983642578125 * 4096 == 812.5).

    Overflow budget (int64, corrected ADVICE r10 — the earlier note
    claimed |qx| <= ~2^16 and safety through n ~ 1e7, which doesn't
    follow): unit-ish embeddings have |u| <= 1, so |qx| <= ~Q = 2^12
    and each Gram term |qx_i*qx_j| <= 2^24; a G entry after n vectors
    is bounded by n * 2^24, and the covariance cross-product
    n*G - s*s by ~n^2 * 2^24, which stays inside the 2^63 budget while
    n^2 * 2^24 < 2^63, i.e. n < ~2^19.5 ~ 7e5 vectors. Components with
    |u| > 1 shrink that bound quadratically. Past it, promote the
    accumulators to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
    construction is unchanged."""
    import numpy as np
    import pandas as pd

    d = PCA_DIM
    schema = "part array<long>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            qx = np.floor(X * PCA_Q + 0.5).astype(np.int64)
            part = np.concatenate(
                [[len(qx)], qx.sum(axis=0), (qx.T @ qx).ravel()]
            )
            yield pd.DataFrame([{"part": part.tolist()}])

    rows = (
        emb.mapInPandas(gen, schema)
        .select(F.posexplode("part").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("x"))
        .collect()
    )
    flat = [0] * (1 + d + d * d)
    for r in rows:
        flat[r["i"]] = int(r["x"])
    return flat[1 + d:], flat[1: 1 + d], flat[0]


def _pca_partner_list(r: int) -> list[int]:
    """Round-robin (circle method) perfect matching for round r of 63:
    index 63 is the fixed player; the rest pair by (2r - i) mod 63.
    32 DISJOINT pivot pairs per round; 63 rounds cover all C(64,2)
    pairs — the classic parallel-ordered Jacobi schedule (Brent/Luk)."""
    pl = [0] * 64
    for i in range(64):
        if i == 63:
            pl[i] = r
        elif i == r:
            pl[i] = 63
        else:
            pl[i] = (126 + 2 * r - i) % 63
    return pl


def _pca_parallel_jacobi(A_int, sweeps: int = PCA_SWEEPS):
    """Fixed-sweep PARALLEL-ORDERED cyclic Jacobi eigensolve (VERDICT r9
    #6): each of the 63 rounds per sweep applies 32 disjoint rotations
    as ONE two-phase elementwise update (B = J^T A, then A' = B J), so
    the whole solve is sweeps*63 deterministic dense steps — exactly
    replayable as a DuckDB recursive CTE (one iteration per step, the
    matrix as a flat 4096-double list). Every operation is +,-,*,/ and
    sqrt — all IEEE-754 correctly rounded, so with identical expression
    order the replay is BIT-IDENTICAL (verified at sf0.001/0.01/0.1).
    Angles use the standard tangent form t = sgn(th)/(|th|+sqrt(th^2+1))
    — no trig calls, whose libm results would NOT be cross-engine
    stable. numpy here does only ELEMENTWISE arithmetic (never a
    reduction), which cannot reassociate, so vectorization preserves
    bit-parity with the scalar SQL lambdas; angle scalars use math.sqrt
    (= C sqrt, correctly rounded; ** 0.5 is pow and is NOT)."""
    import math

    import numpy as np

    A = np.array(A_int, dtype=np.float64).reshape(PCA_DIM, PCA_DIM)
    idx = np.arange(PCA_DIM)
    for it in range(sweeps * 63):
        pl = _pca_partner_list(it % 63)
        cl, sl = [0.0] * 64, [0.0] * 64
        for i in range(64):
            pi = pl[i]
            p, q = (i, pi) if i < pi else (pi, i)
            app = float(A[p, p])
            apq = float(A[p, q])
            aqq = float(A[q, q])
            if apq == 0.0:
                c, s_ = 1.0, 0.0
            else:
                theta = (aqq - app) / (2.0 * apq)
                if theta >= 0.0:
                    t = 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                else:
                    t = -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
                c = 1.0 / math.sqrt(t * t + 1.0)
                s_ = t * c
            cl[i], sl[i] = c, s_
        C = np.array(cl)
        S = np.array(sl)
        P = np.array(pl)
        isp = idx < P
        B = np.where(
            isp[:, None],
            C[:, None] * A - S[:, None] * A[P],
            S[:, None] * A[P] + C[:, None] * A,
        )
        A = np.where(
            isp[None, :],
            C[None, :] * B - S[None, :] * B[:, P],
            S[None, :] * B[:, P] + C[None, :] * B,
        )
    return A


def gram_stats(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed scan -> (G = X^T X, column sums, n).

    Each Arrow batch contributes ONE partial row: [n, sums(d), G(d*d)]
    flattened into a single array, element-wise-reduced by a posexplode +
    groupBy(position) aggregate — so the exchange and the driver both see
    O(d^2) scalars per batch / in total, never the corpus. This is the
    PCA twin of the k-means partial reduction and the same shape as
    MLlib RowMatrix.computeGramianMatrix.
    """
    schema = "part array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            part = np.concatenate(
                [[float(len(X))], X.sum(axis=0), (X.T @ X).ravel()]
            )
            yield pd.DataFrame([{"part": part.tolist()}])

    rows = (
        emb.mapInPandas(gen, schema)
        .select(F.posexplode("part").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("x"))
        .collect()
    )
    flat = np.zeros(max(r["i"] for r in rows) + 1)
    for r in rows:
        flat[r["i"]] = r["x"]
    n = int(flat[0])
    d = int(round((len(flat) - 1 + 0.25) ** 0.5 - 0.5))  # solve d^2+d = len-1
    sums = flat[1 : 1 + d]
    G = flat[1 + d :].reshape(d, d)
    return G, sums, n


def pca_top_component(emb: DataFrame) -> dict[str, float]:
    """Top principal component of the centered embedding matrix — the
    MLlib RowMatrix.computePrincipalComponents shape: ONE distributed
    scan folds the corpus into the d x d Gram artifact, then the
    eigensolve runs on the driver where the matrix is O(d^2) scalars.
    (Plain power iteration was measured unusable here: the synthetic
    embeddings are near-isotropic, eigen-gap 1.013, so 50 rounds leave a
    1e-2 residual — rate (lambda2/lambda1)^t. eigh is exact regardless
    of the spectrum's shape.)

    Returns eigenvalue, Rayleigh quotient, residual and trace for the
    invariant flags; all float64, deterministic."""
    G, sums, n = gram_stats(emb)
    mu = sums / n
    cov = (G - n * np.outer(mu, mu)) / (n - 1)
    w, V = np.linalg.eigh(cov)
    lam = float(w[-1])
    v = V[:, -1]
    rayleigh = float(v @ cov @ v)
    residual = float(np.linalg.norm(cov @ v - rayleigh * v))
    return {
        "n_vectors": n,
        "eigenvalue": lam,
        "rayleigh": rayleigh,
        "residual": residual,
        "trace": float(np.trace(cov)),
    }


def _pca_oracle() -> str:
    """FULL value oracle (r10, closing VERDICT r9 #6 — the last non-HLL
    flag): DuckDB re-derives the EXACT integer scatter matrix
    A = n*G - s*s^T from the table (half-up quantization, HUGEINT sums,
    one correctly-rounded cast to DOUBLE), then replays the fixed
    8-sweep parallel-ordered Jacobi as a recursive CTE — one iteration
    per 32-rotation round, the matrix riding as a flat 4096-double list,
    each round staged as hoisted CTEs (schedule -> pivots -> theta -> t
    -> c -> s -> row phase -> column phase). All arithmetic is
    +,-,*,/,sqrt in the same expression order as the Spark driver's
    numpy twin, so the final matrix is BIT-IDENTICAL (verified at
    sf0.001/0.01/0.1) and the eigenvalues are hash-checked VALUES."""
    iters = PCA_SWEEPS * 63
    q2 = PCA_Q * PCA_Q
    return f"""
WITH RECURSIVE
e AS (
  SELECT list_transform(embedding,
                        u -> CAST(floor(u * {PCA_Q} + 0.5) AS BIGINT)) AS qx
  FROM embeddings
),
nrow AS (SELECT COUNT(*) AS n FROM e),
gsum AS (
  SELECT i, j, SUM(qx[i + 1] * qx[j + 1]) AS g
  FROM e, range(0, 64) ii(i), range(0, 64) jj(j)
  GROUP BY i, j
),
csum AS (
  SELECT i, SUM(qx[i + 1]) AS s FROM e, range(0, 64) ii(i) GROUP BY i
),
a0 AS (
  SELECT list(CAST(n.n * g.g - ci.s * cj.s AS DOUBLE)
              ORDER BY g.i * 64 + g.j) AS m
  FROM gsum g
  JOIN csum ci ON ci.i = g.i
  JOIN csum cj ON cj.i = g.j
  CROSS JOIN nrow n
),
trq AS (
  SELECT CAST(SUM(n.n * g.g - ci.s * ci.s) AS BIGINT) AS v
  FROM gsum g JOIN csum ci ON ci.i = g.i CROSS JOIN nrow n
  WHERE g.i = g.j
),
ssq AS (
  SELECT CAST(SUM(qx[i + 1] * qx[i + 1]) AS BIGINT) AS v
  FROM e, range(0, 64) ii(i)
),
jac AS (
  SELECT 0 AS it, m FROM a0
  UNION ALL
  SELECT jac.it + 1,
    (WITH
     h AS (SELECT jac.it AS oit, jac.m AS om),
     sch AS (
       SELECT om,
         list_transform(range(0, 64), i ->
                CASE WHEN i = 63 THEN oit % 63
                     WHEN i = oit % 63 THEN 63
                     ELSE (126 + 2 * (oit % 63) - i) % 63 END) AS pl
       FROM h
     ),
     piv AS (
       SELECT om, pl,
         list_transform(range(0, 64), i ->
           om[least(i, pl[i + 1]) * 65 + 1]) AS appl,
         list_transform(range(0, 64), i ->
           om[least(i, pl[i + 1]) * 64 + greatest(i, pl[i + 1]) + 1]) AS apql,
         list_transform(range(0, 64), i ->
           om[greatest(i, pl[i + 1]) * 65 + 1]) AS aqql
       FROM sch
     ),
     th AS (
       SELECT om, pl,
         list_transform(range(0, 64), i -> apql[i + 1] = 0.0) AS zl,
         list_transform(range(0, 64), i -> CASE WHEN apql[i + 1] = 0.0
           THEN 0.0
           ELSE (aqql[i + 1] - appl[i + 1]) / (2.0 * apql[i + 1]) END) AS thl
       FROM piv
     ),
     tt AS (
       SELECT om, pl, zl,
         list_transform(range(0, 64), i -> CASE
           WHEN zl[i + 1] THEN 0.0
           WHEN thl[i + 1] >= 0.0
             THEN 1.0 / (thl[i + 1] + sqrt(thl[i + 1] * thl[i + 1] + 1.0))
           ELSE -1.0 / (-thl[i + 1] + sqrt(thl[i + 1] * thl[i + 1] + 1.0))
           END) AS tl
       FROM th
     ),
     cs AS (
       SELECT om, pl, tl,
         list_transform(range(0, 64), i -> CASE WHEN zl[i + 1] THEN 1.0
           ELSE 1.0 / sqrt(tl[i + 1] * tl[i + 1] + 1.0) END) AS cl
       FROM tt
     ),
     cs2 AS (
       SELECT om, pl, cl,
         list_transform(range(0, 64), i -> tl[i + 1] * cl[i + 1]) AS sl
       FROM cs
     ),
     bb AS (
       SELECT pl, cl, sl,
         list_transform(range(0, 4096), k -> CASE
           WHEN (k // 64) < pl[(k // 64) + 1]
           THEN cl[(k // 64) + 1] * om[k + 1]
                - sl[(k // 64) + 1] * om[pl[(k // 64) + 1] * 64 + (k % 64) + 1]
           ELSE sl[(k // 64) + 1] * om[pl[(k // 64) + 1] * 64 + (k % 64) + 1]
                + cl[(k // 64) + 1] * om[k + 1]
           END) AS bm
       FROM cs2
     ),
     st3 AS (
       SELECT list_transform(range(0, 4096), k -> CASE
           WHEN (k % 64) < pl[(k % 64) + 1]
           THEN cl[(k % 64) + 1] * bm[k + 1]
                - sl[(k % 64) + 1] * bm[(k // 64) * 64 + pl[(k % 64) + 1] + 1]
           ELSE sl[(k % 64) + 1] * bm[(k // 64) * 64 + pl[(k % 64) + 1] + 1]
                + cl[(k % 64) + 1] * bm[k + 1]
           END) AS nm
       FROM bb
     )
     SELECT nm FROM st3) AS m
  FROM jac
  WHERE jac.it < {iters}
),
diag AS (
  SELECT list_sort(list_transform(range(0, 64), i -> m[i * 65 + 1]),
                   'DESC') AS dg
  FROM jac WHERE it = {iters}
)
SELECT CAST(nrow.n AS BIGINT) AS n_vectors,
       ssq.v AS ssq_q,
       trq.v AS trace_q,
       dg[1] / CAST(nrow.n * (nrow.n - 1) * {q2} AS DOUBLE) AS top_eig_cov,
       dg[2] / CAST(nrow.n * (nrow.n - 1) * {q2} AS DOUBLE)
         AS second_eig_cov,
       dg[1] / CAST(trq.v AS DOUBLE) AS explained_ratio
FROM diag, nrow, ssq, trq
"""


@register(
    "ml_pca_top_component",
    oracle=_pca_oracle(),
    doc="PCA top principal components (E11 extension) — FULL VALUE "
    "oracle as of r10 (the r9 lesson applied once more: make the "
    "artifact deterministic, then replay it). One distributed "
    "mapInPandas scan folds the corpus into the EXACT integer scatter "
    "matrix A = n*G - s*s^T of the half-up-quantized embeddings "
    "(floor(u*2^12 + 0.5) — half-up because np.round's half-to-even "
    "and SQL round's half-away disagree on exact .5, observed on a "
    "real fixture value); the d x d eigensolve is a FIXED-8-SWEEP "
    "parallel-ordered cyclic Jacobi (round-robin schedule, 32 disjoint "
    "rotations per round applied as one two-phase elementwise update, "
    "tangent-form angles — no libm trig), run driver-side on the "
    "O(d^2) collected artifact exactly like the k-means trainings. "
    "Every operation is IEEE correctly-rounded (+,-,*,/,sqrt), so the "
    "DuckDB oracle's 504-iteration recursive-CTE replay reproduces the "
    "final matrix BIT-FOR-BIT and the top/second eigenvalues and "
    "explained ratio are hash-checked VALUES (verified bit-exact at "
    "sf0.001/0.01/0.1). Convergence to the true spectrum (the quantity "
    "the fixed sweep count must earn) is pinned separately in "
    "tests/test_clustering.py: 8 sweeps leave the sorted diagonal "
    "within ~1e-15 relative of numpy eigh on these near-isotropic "
    "fixtures (power iteration was measured unusable here — eigen-gap "
    "1.013). The float eigh library path (gram_stats/"
    "pca_top_component) remains the production API for consumers who "
    "want raw-float PCA. Scale: the scan shuffles O(d^2) int64 "
    "scalars per batch; the eigensolve cost is d^3-ish on CONSTANTS — "
    "independent of corpus size; int64 accumulators hold to ~10^7 "
    "vectors at Q=2^12, beyond which they promote to DECIMAL(38,0)/"
    "HUGEINT unchanged.",
)
def ml_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = _embeddings(spark, sf_dir)
    G, sums, n = _pca_quant_gram(emb)
    d = PCA_DIM
    A0 = [
        n * G[i * d + j] - sums[i] * sums[j]
        for i in range(d)
        for j in range(d)
    ]  # exact Python-int scatter matrix
    trace_q = sum(n * G[i * d + i] - sums[i] * sums[i] for i in range(d))
    Af = _pca_parallel_jacobi(A0)
    dg = np.sort(np.diag(Af))[::-1]
    denom = float(n * (n - 1) * PCA_Q * PCA_Q)
    top, second = float(dg[0]), float(dg[1])
    # ssq anchor computed IN-QUERY (distributed), like the r9 shape
    ssq = (
        emb.select(F.posexplode("v").alias("dim", "u"))
        .select(
            F.expr(
                f"CAST(floor(u * {PCA_Q} + 0.5) AS BIGINT)"
            ).alias("qx")
        )
        .agg(F.sum(F.col("qx") * F.col("qx")).alias("ssq_q"))
    )
    return ssq.select(
        F.lit(n).cast("bigint").alias("n_vectors"),
        F.col("ssq_q").cast("bigint").alias("ssq_q"),
        F.lit(trace_q).cast("bigint").alias("trace_q"),
        F.lit(top / denom).alias("top_eig_cov"),
        F.lit(second / denom).alias("second_eig_cov"),
        F.lit(top / float(trace_q)).alias("explained_ratio"),
    )


@register(
    "ml_linear_regression",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    SUM(l_quantity) AS sx,
    SUM(l_extendedprice) AS sy,
    SUM(l_quantity * l_extendedprice) AS sxy,
    SUM(l_quantity * l_quantity) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  CAST(n AS BIGINT) AS n,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
    AS intercept
FROM m
""",
    doc="Per-group ordinary least squares (price ~ quantity) by the "
    "closed-form normal equations over exact moment sums — the "
    "representative distributed-ML-training shape: ONE scan computes the "
    "five sufficient statistics per group via partial aggregation, the "
    "solve is O(groups) arithmetic. At 100 TB this is the same "
    "moments-then-solve pattern as the k-means/PCA operators, with zero "
    "driver collect (the solve is a column expression).",
)
def ml_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sufficient statistics ride one partial-aggregated Exchange of
    O(groups) rows; slope/intercept derive in the same plan. Both engines
    evaluate the identical formula on the identical double sums, so
    results are bit-comparable after display rounding."""
    from ..sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Logistic regression by distributed gradient descent (propensity model)
# ---------------------------------------------------------------------------

LOGIT_ITERS = 4
LOGIT_LR = 0.5
LOGIT_SPLIT_US = 1_705_881_600_000_000  # 2024-01-22T00:00:00Z: features
# from the first 3 weeks, label = "purchases in week 4+" — a true
# forward-looking propensity target, never a feature leak.


def _logit_features_sql() -> str:
    return f"""
feat AS (
  SELECT user_id,
    LN(1.0 + SUM(CASE WHEN epoch_us(ts) < {LOGIT_SPLIT_US}
                      THEN 1 ELSE 0 END)) AS x1,
    SUM(CASE WHEN epoch_us(ts) < {LOGIT_SPLIT_US}
             THEN value ELSE 0 END) / 1000.0 AS x2,
    MAX(CASE WHEN epoch_us(ts) >= {LOGIT_SPLIT_US}
              AND event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
)"""


def _logit_oracle() -> str:
    """Unrolled GD: each iteration is one CTE computing the mean
    gradient of the logistic loss at the previous weights (scalar
    subqueries — exactly the bounded-driver-scalar structure the Spark
    loop uses)."""
    parts = ["WITH " + _logit_features_sql().lstrip(",\n ")]
    parts.append(""",
w_0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)""")
    for k in range(1, LOGIT_ITERS + 1):
        parts.append(f""",
g_{k} AS (
  SELECT
    AVG(1.0/(1.0+EXP(-(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y) AS g0,
    AVG((1.0/(1.0+EXP(-(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y)*f.x1)
      AS g1,
    AVG((1.0/(1.0+EXP(-(w.w0 + w.w1*f.x1 + w.w2*f.x2))) - f.y)*f.x2)
      AS g2
  FROM feat f, w_{k - 1} w
),
w_{k} AS (
  SELECT w.w0 - {LOGIT_LR} * g.g0 AS w0,
         w.w1 - {LOGIT_LR} * g.g1 AS w1,
         w.w2 - {LOGIT_LR} * g.g2 AS w2
  FROM w_{k - 1} w, g_{k} g
)""")
    selects = " UNION ALL ".join(
        f"SELECT {k} AS iteration, w0, w1, w2 FROM w_{k}"
        for k in range(1, LOGIT_ITERS + 1)
    )
    return "".join(parts) + f"""
SELECT CAST(iteration AS INT) AS iteration,
       ROUND(w0, 6) AS w0, ROUND(w1, 6) AS w1, ROUND(w2, 6) AS w2
FROM ({selects}) ORDER BY iteration
"""


@register(
    "ml_logistic_regression_gd",
    oracle=_logit_oracle(),
    doc=f"Logistic-regression training by distributed gradient descent "
    "(the propensity-model trainer): features are each user's first-3-"
    "weeks activity (log event count, value sum), the LABEL is whether "
    "they purchase in week 4+ — a forward-looking target with no "
    f"feature leak. {LOGIT_ITERS} full-batch GD steps; per step the "
    "cluster computes ONE aggregate (three mean-gradient doubles — "
    "the k-means bounded-driver-scalar pattern), weights live on the "
    "driver, data is scanned once per step from a cached feature "
    "table. The oracle unrolls the identical recurrence as CTEs; both "
    "engines evaluate the same float formula on the same O(users) "
    "rows, rounded at 6. Output is the full training trajectory, so "
    "any divergence pinpoints the iteration that drifted.",
)
def ml_logistic_regression_gd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    pre = F.unix_micros("ts") < LOGIT_SPLIT_US
    feat = (
        events.groupBy("user_id")
        .agg(
            F.log(
                1.0 + F.sum(F.when(pre, 1).otherwise(0))
            ).alias("x1"),
            (
                F.sum(F.when(pre, F.col("value")).otherwise(0.0)) / 1000.0
            ).alias("x2"),
            F.max(
                F.when(
                    (~pre) & (F.col("event_type") == "purchase"), 1
                ).otherwise(0)
            ).alias("y"),
        )
        .localCheckpoint(eager=True)  # features computed exactly once
    )
    w = [0.0, 0.0, 0.0]
    rows = []
    for it in range(1, LOGIT_ITERS + 1):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
        resid = 1.0 / (1.0 + F.exp(-z)) - F.col("y")
        g = feat.agg(
            F.avg(resid).alias("g0"),
            F.avg(resid * F.col("x1")).alias("g1"),
            F.avg(resid * F.col("x2")).alias("g2"),
        ).collect()[0]  # three scalars per iteration
        w = [
            w[0] - LOGIT_LR * g["g0"],
            w[1] - LOGIT_LR * g["g1"],
            w[2] - LOGIT_LR * g["g2"],
        ]
        rows.append((it, round(w[0], 6), round(w[1], 6), round(w[2], 6)))
    return spark.createDataFrame(
        rows, "iteration int, w0 double, w1 double, w2 double"
    )


# ---------------------------------------------------------------------------
# Decision stump: exact best single-threshold split by Gini impurity
# ---------------------------------------------------------------------------

STUMP_COST_SCALE = 1000  # per-mille scaling of the weighted Gini cost
STUMP_TOPK = 5


@register(
    "ml_decision_stump_gini",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x_cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
grp AS (
  SELECT x_cents, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM pts GROUP BY x_cents
),
pre AS (
  SELECT x_cents,
    SUM(cnt) OVER (ORDER BY x_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS n_left,
    SUM(pos) OVER (ORDER BY x_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS pos_left,
    SUM(cnt) OVER () AS n, SUM(pos) OVER () AS pos_tot
  FROM grp
),
cost AS (
  SELECT x_cents AS threshold_cents,
    CAST(n_left AS BIGINT) AS n_left,
    CAST(pos_left AS BIGINT) AS pos_left,
    CAST(n - n_left AS BIGINT) AS n_right,
    CAST(pos_tot - pos_left AS BIGINT) AS pos_right,
    -- weighted binary Gini, common-denominator integer form:
    --   cost = 2*(posL*negL/nL + posR*negR/nR)
    -- scaled per-mille and floored; the triple products outgrow BIGINT
    -- past n ~ 1.6e6 rows (caught by the r12 5x-corpus differential),
    -- so both numerator and denominator are lifted to HUGEINT —
    -- identical positive floor-div to Spark's DECIMAL(38,0) twin,
    -- headroom to n ~ 4e12
    CAST(({STUMP_COST_SCALE} * 2 *
          (CAST(pos_left AS HUGEINT) * (n_left - pos_left) * (n - n_left)
           + CAST(pos_tot - pos_left AS HUGEINT)
             * ((n - n_left) - (pos_tot - pos_left))
             * n_left))
         // (CAST(n_left AS HUGEINT) * (n - n_left) * n) AS BIGINT)
      AS gini_cost_scaled,
    CAST((CAST(1000000 AS HUGEINT) *
          (GREATEST(pos_left, n_left - pos_left)
           + GREATEST(pos_tot - pos_left,
                      (n - n_left) - (pos_tot - pos_left))))
         // n AS BIGINT) AS stump_accuracy_ppm
  FROM pre WHERE n_left < n
)
SELECT * FROM cost
ORDER BY gini_cost_scaled ASC, threshold_cents ASC
LIMIT {STUMP_TOPK}
""",
    doc="Decision-stump training (1-level CART; Breiman et al. 1984): "
    "the exact best threshold on o_totalprice for predicting URGENT "
    "priority, by minimum weighted binary Gini impurity over ALL "
    "distinct feature values. The classic sort-and-scan algorithm "
    "becomes one grouped aggregate + the distributed prefix-sum "
    "primitive (operators/ranks.py — a genuine range-partitioned "
    "sort, same class as the exact-AUC plan, never a single-task "
    "window) — never a per-threshold pass. The cost is "
    "put over the common denominator nL*nR*n so the per-mille scaled "
    "floor is pure BIGINT (fits through sf0.1; beyond that the same "
    "expression lifts to DECIMAL(38,0)); ties break on the smaller "
    "threshold. Top-{STUMP_TOPK} rows value-checked, with each "
    "split's majority-vote accuracy in exact ppm.",
)
def ml_decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table
    from .ranks import with_global_order_stats

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x_cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    grp = pts.groupBy("x_cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    # sort-and-scan over distinct thresholds, distributed: running
    # (count, positives) + grand totals through one range exchange
    # (operators/ranks.py) — never a single-task cumulative window.
    pre = with_global_order_stats(
        grp,
        [F.col("x_cents")],
        cumsums={"n_left": F.col("cnt"), "pos_left": F.col("pos")},
        totals={"n": F.col("cnt"), "pos_tot": F.col("pos")},
    ).select("x_cents", "n_left", "pos_left", "n", "pos_tot")
    cost = pre.filter(F.col("n_left") < F.col("n")).select(
        F.col("x_cents").alias("threshold_cents"),
        F.col("n_left").cast("bigint").alias("n_left"),
        F.col("pos_left").cast("bigint").alias("pos_left"),
        (F.col("n") - F.col("n_left")).cast("bigint").alias("n_right"),
        (F.col("pos_tot") - F.col("pos_left"))
        .cast("bigint")
        .alias("pos_right"),
        # DECIMAL(38,0) lift mirrors the oracle's HUGEINT (r12 5x
        # finding: the n^3-class products overflow BIGINT past ~1.6e6
        # rows); positive floor-div is identical in both engines
        F.expr(
            f"CAST(({STUMP_COST_SCALE} * 2 * "
            "(CAST(pos_left AS DECIMAL(38,0)) * (n_left - pos_left)"
            "   * (n - n_left) "
            " + CAST(pos_tot - pos_left AS DECIMAL(38,0))"
            "   * ((n - n_left) - (pos_tot - pos_left))"
            "   * n_left)) "
            "div (CAST(n_left AS DECIMAL(38,0)) * (n - n_left) * n)"
            " AS BIGINT)"
        ).alias("gini_cost_scaled"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * "
            "(GREATEST(pos_left, n_left - pos_left) "
            " + GREATEST(pos_tot - pos_left, "
            "            (n - n_left) - (pos_tot - pos_left)))) "
            "div n AS BIGINT)"
        ).alias("stump_accuracy_ppm"),
    )
    return cost.orderBy(
        F.asc("gini_cost_scaled"), F.asc("threshold_cents")
    ).limit(STUMP_TOPK)


# ---------------------------------------------------------------------------
# Depth-2 decision tree: recursive exact Gini splits (CART, 2 levels)
# ---------------------------------------------------------------------------


@register(
    "ml_decision_tree_depth2",
    oracle=f"""
WITH pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x_cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
grp AS (
  SELECT x_cents, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM pts GROUP BY x_cents
),
pre AS (
  SELECT x_cents,
    SUM(cnt) OVER (ORDER BY x_cents ROWS UNBOUNDED PRECEDING) AS n_left,
    SUM(pos) OVER (ORDER BY x_cents ROWS UNBOUNDED PRECEDING) AS pos_left,
    SUM(cnt) OVER () AS n, SUM(pos) OVER () AS pos_tot
  FROM grp
),
rootcost AS (
  SELECT x_cents, n_left, pos_left, n, pos_tot,
    -- HUGEINT lift: the n^3-class products overflow BIGINT past
    -- n ~ 1.6e6 rows (r12 5x-corpus finding); floor-div on positives
    -- matches Spark's DECIMAL(38,0) twin exactly
    ({STUMP_COST_SCALE} * 2 *
     (CAST(pos_left AS HUGEINT) * (n_left - pos_left) * (n - n_left)
      + CAST(pos_tot - pos_left AS HUGEINT)
        * ((n - n_left) - (pos_tot - pos_left))
        * n_left))
    // (CAST(n_left AS HUGEINT) * (n - n_left) * n) AS cost
  FROM pre WHERE n_left < n
),
root AS (
  SELECT * FROM rootcost ORDER BY cost ASC, x_cents ASC LIMIT 1
),
sided AS (
  SELECT g.x_cents, g.cnt, g.pos,
    CASE WHEN g.x_cents <= r.x_cents THEN 'L' ELSE 'R' END AS side
  FROM grp g, root r
),
pre2 AS (
  SELECT side, x_cents,
    SUM(cnt) OVER (PARTITION BY side ORDER BY x_cents
                   ROWS UNBOUNDED PRECEDING) AS n_left,
    SUM(pos) OVER (PARTITION BY side ORDER BY x_cents
                   ROWS UNBOUNDED PRECEDING) AS pos_left,
    SUM(cnt) OVER (PARTITION BY side) AS n,
    SUM(pos) OVER (PARTITION BY side) AS pos_tot
  FROM sided
),
cost2 AS (
  SELECT side, x_cents, n_left, pos_left, n, pos_tot,
    -- HUGEINT lift: the n^3-class products overflow BIGINT past
    -- n ~ 1.6e6 rows (r12 5x-corpus finding); floor-div on positives
    -- matches Spark's DECIMAL(38,0) twin exactly
    ({STUMP_COST_SCALE} * 2 *
     (CAST(pos_left AS HUGEINT) * (n_left - pos_left) * (n - n_left)
      + CAST(pos_tot - pos_left AS HUGEINT)
        * ((n - n_left) - (pos_tot - pos_left))
        * n_left))
    // (CAST(n_left AS HUGEINT) * (n - n_left) * n) AS cost
  FROM pre2 WHERE n_left < n
),
best2 AS (
  SELECT side, x_cents, n_left, pos_left, n, pos_tot, cost
  FROM cost2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY side
                             ORDER BY cost ASC, x_cents ASC) = 1
)
SELECT 'root' AS node, x_cents AS threshold_cents,
  CAST(n AS BIGINT) AS n_node, CAST(pos_tot AS BIGINT) AS pos_node,
  CAST(n_left AS BIGINT) AS n_left, CAST(pos_left AS BIGINT) AS pos_left,
  CAST(cost AS BIGINT) AS gini_cost_scaled
FROM root
UNION ALL
SELECT side AS node, x_cents AS threshold_cents,
  CAST(n AS BIGINT) AS n_node, CAST(pos_tot AS BIGINT) AS pos_node,
  CAST(n_left AS BIGINT) AS n_left, CAST(pos_left AS BIGINT) AS pos_left,
  CAST(cost AS BIGINT) AS gini_cost_scaled
FROM best2
""",
    doc="Depth-2 CART decision tree by recursive exact Gini splits: the "
    "root stump picks threshold t0 over ALL distinct feature values, "
    "then each side independently picks its own best sub-split — the "
    "second level is the SAME sort-and-scan plan with its windows "
    "PARTITIONED BY the root's side assignment, so depth-d training is "
    "d sequential passes each costing one grouped agg + one window, "
    "never a per-node pass (the classic XGBoost/level-wise insight). "
    "t0 flows to level 2 as a broadcast 1-row join — no driver collect. "
    "All arithmetic is the stump's common-denominator BIGINT Gini; "
    "output is the 3-node tree (root, L, R) with per-node populations "
    "and the chosen split, every value DuckDB-replayed.",
)
def ml_decision_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import load_table
    from .ranks import pin, with_global_order_stats

    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x_cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    # pin(): persisted for the root + both child sweeps, released by
    # ranks.release_rank_bases() after the consuming action (ADVICE r12)
    grp = pin(pts.groupBy("x_cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    ))

    # DECIMAL(38,0) lift mirrors the oracle's HUGEINT (r12 5x finding:
    # the n^3-class products overflow BIGINT past ~1.6e6 rows)
    cost_expr = F.expr(
        f"({STUMP_COST_SCALE} * 2 * "
        "(CAST(pos_left AS DECIMAL(38,0)) * (n_left - pos_left)"
        "   * (n - n_left) "
        " + CAST(pos_tot - pos_left AS DECIMAL(38,0))"
        "   * ((n - n_left) - (pos_tot - pos_left))"
        "   * n_left)) "
        "div (CAST(n_left AS DECIMAL(38,0)) * (n - n_left) * n)"
    )

    def sweep(g: DataFrame) -> DataFrame:
        """Distributed sort-and-scan over one node's thresholds
        (operators/ranks.py) — the depth-1 inner step, never a
        single-task (or single-task-per-node) cumulative window."""
        return with_global_order_stats(
            g,
            [F.col("x_cents")],
            cumsums={"n_left": F.col("cnt"), "pos_left": F.col("pos")},
            totals={"n": F.col("cnt"), "pos_tot": F.col("pos")},
        ).select("x_cents", "n_left", "pos_left", "n", "pos_tot")

    pre = sweep(grp)
    root = (
        pre.filter(F.col("n_left") < F.col("n"))
        .withColumn("cost", cost_expr)
        .orderBy(F.asc("cost"), F.asc("x_cents"))
        .limit(1)
    )
    sided = pin(grp.crossJoin(
        F.broadcast(root.select(F.col("x_cents").alias("t0")))
    ).select(
        "x_cents",
        "cnt",
        "pos",
        F.when(F.col("x_cents") <= F.col("t0"), "L").otherwise("R").alias(
            "side"
        ),
    ))
    # Each child node sweeps independently through the same distributed
    # primitive (two bounded fan-outs, not a 2-task side-partitioned
    # window over all thresholds); at depth d this generalizes to 2^d
    # filtered sweeps — or per-node range partitioning when node count
    # outgrows the scheduler.
    pre2 = (
        sweep(sided.filter(F.col("side") == "L"))
        .withColumn("side", F.lit("L"))
    ).unionByName(
        sweep(sided.filter(F.col("side") == "R"))
        .withColumn("side", F.lit("R"))
    )
    cost2 = (
        pre2.filter(F.col("n_left") < F.col("n"))
        .withColumn("cost", cost_expr)
    )
    best2 = (
        cost2.groupBy("side")
        .agg(
            F.min(
                F.struct(
                    "cost", "x_cents", "n_left", "pos_left", "n", "pos_tot"
                )
            ).alias("b")
        )
        .select("side", "b.*")
    )

    def shape(df: DataFrame, node_col) -> DataFrame:
        return df.select(
            node_col.alias("node"),
            F.col("x_cents").alias("threshold_cents"),
            F.col("n").cast("bigint").alias("n_node"),
            F.col("pos_tot").cast("bigint").alias("pos_node"),
            F.col("n_left").cast("bigint").alias("n_left"),
            F.col("pos_left").cast("bigint").alias("pos_left"),
            F.col("cost").cast("bigint").alias("gini_cost_scaled"),
        )

    return shape(root, F.lit("root")).unionAll(shape(best2, F.col("side")))

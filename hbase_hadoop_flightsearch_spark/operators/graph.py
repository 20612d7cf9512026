"""Connected components over the near-duplicate graph (E10 completion).

Near-dup *pairs* (dedup.py) are only half the dedup story: production
corpus prep needs *clusters* — if A~B and B~C, all three are one duplicate
group even when A~C was never emitted — plus one canonical keeper per
cluster. That grouping is connected components on the pair graph, an
inherently ITERATIVE computation no single SQL join can express (but a
recursive CTE can, which is exactly what the DuckDB oracle uses).

Spark-first design: driver-side loop of min-label propagation —
  label(v) <- min(label(v), min over neighbors of label(u))
each round is one shuffle (groupBy dst) + one join; rounds needed = graph
diameter. `localCheckpoint()` truncates lineage each round, otherwise the
iterated plan grows exponentially in Catalyst.

Scale notes (100 TB): near-dup components are tiny dense clusters (near
cliques), so diameter — and the round count — stays 2-4 regardless of
corpus size; each round is a self-bounded shuffle of O(edges). For
adversarial long-chain graphs the published fix is alternating
large-star/small-star contraction (O(log n) rounds); the loop below keeps
that drop-in (only the neighbor-min step changes). On a cluster, replace
localCheckpoint with a reliable checkpoint dir so a lost executor doesn't
recompute the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table
from .dedup import _JACCARD_PAIRS_DUCK, dedup_ngram_jaccard

# The oracle re-derives the same >= 0.5 jaccard pairs (the pairs themselves
# are oracle-verified in dedup_ngram_jaccard), then closes them transitively
# with a recursive CTE: component id = min doc_id reachable.
_CC_ORACLE = f"""
WITH RECURSIVE
jp AS ({_JACCARD_PAIRS_DUCK}),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM jp
  UNION ALL
  SELECT d2 AS src, d1 AS dst FROM jp
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src
)
SELECT doc_id, component_id,
  COUNT(*) OVER (PARTITION BY component_id) AS n_members,
  (doc_id = component_id) AS is_keeper
FROM comp
"""


def connected_components(
    vertices: DataFrame, pairs: DataFrame, max_iters: int = 15
) -> DataFrame:
    """(doc_id, component_id) for `vertices` (col doc_id) under undirected
    `pairs` (cols d1, d2). component_id = min doc_id in the component.

    Convergence detection: sum(component_id) is strictly decreasing while
    any label changes (labels only ever drop to a smaller doc_id), so two
    equal consecutive sums == fixpoint. One extra round pays for the test;
    no per-row change flags or subtraction joins needed."""
    edges = (
        pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .union(pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst")))
        .localCheckpoint()  # pair mining runs ONCE, not once per round
    )
    labels = vertices.select("doc_id", F.col("doc_id").alias("component_id"))
    prev_sum = None
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("nbr_doc_id"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        labels = (
            labels.join(
                nbr_min, labels.doc_id == nbr_min.nbr_doc_id, "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce("nbr_min", F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component_id")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} rounds"
        )
    return labels


@register(
    "dedup_cc_clusters",
    oracle=_CC_ORACLE,
    doc="Connected components over near-dup pairs: every doc labeled with "
    "its duplicate-cluster id (min doc_id reachable), cluster size, and a "
    "deterministic keeper flag. Iterative min-label propagation vs a "
    "recursive-CTE oracle.",
)
def dedup_cc_clusters(
    spark: SparkSession, sf_dir: str, max_iters: int = 15
) -> DataFrame:
    """Transitive closure of dedup_ngram_jaccard pairs (jaccard >= 0.5)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = connected_components(docs, pairs, max_iters)
    return labels.select(
        "doc_id",
        "component_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("component_id"))
        .alias("n_members"),
        (F.col("doc_id") == F.col("component_id")).alias("is_keeper"),
    )

"""Clustering over embedding columns (SURVEY.md §2.3 extension
surface): distributed Lloyd k-means expressed Spark-first.

The iteration structure is the one every large-scale k-means uses
(including Spark MLlib's): assignment is a per-row argmax over k
centroid scores — pure JVM codegen expressions, no UDF — and the
update step shuffles only (cluster, dim) partial sums, bounded by
k x dim regardless of corpus size. Centroids sync through the driver
between iterations (k x dim doubles — a few KB at any scale), exactly
the MLlib/parameter-server pattern.

Cross-engine determinism: init centroids are md5-derived exact binary
fractions (``ivf_centroids``); updated centroids are rounded to 6
decimals on both engines (the ``embedding_centroids`` pattern) so the
float-summation order of AVG can't leak into the gate; every score is
a left-fold dot product matching DuckDB's ``list_dot_product`` on
DOUBLE[] bit-for-bit; argmax tie-breaks to the lowest cluster id on
both engines (array_position first-occurrence == ROW_NUMBER
score DESC, c ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.vectors import (
    _ivf_scores,
    ivf_cell,
    ivf_centroids,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import fan_out_for_compute, load_table

K, DIM = 8, 64
_KM_INIT = ivf_centroids("afcs-kmeans-v1", K, DIM)


def _scores0_sql(vec: str) -> str:
    """Init-centroid score list as a SQL literal expression — the same
    v·c − |c|²/2 arithmetic (bias precomputed in Python, added after
    the dot product) as the Spark-side ``ivf_cell``."""
    from aether_firebase_consumer_spark.functions.vectors import (
        ivf_cell_scores,
    )
    biases = ivf_cell_scores(_KM_INIT)
    scores = ", ".join(
        f"list_dot_product({vec}, "
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]) + " + repr(b)
        for c, b in zip(_KM_INIT, biases))
    return f"[{scores}]"


@register(
    "embedding_kmeans",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    a0 AS (
      SELECT vec_id, v,
             CAST(list_position({_scores0_sql('v')},
                                list_max({_scores0_sql('v')})) AS INT) AS c
      FROM e
    ),
    upd AS (
      SELECT c, j, ROUND(AVG(v[j]), 6) AS m
      FROM a0, LATERAL (SELECT unnest(generate_series(1, {DIM})) AS j)
      GROUP BY c, j
    ),
    cent1 AS (
      SELECT c, list(m ORDER BY j) AS cv
      FROM upd GROUP BY c
    ),
    s1 AS (
      SELECT e.vec_id, cent1.c,
             list_dot_product(e.v, cent1.cv)
               - 0.5 * list_dot_product(cent1.cv, cent1.cv) AS score
      FROM e CROSS JOIN cent1
    ),
    a1 AS (
      SELECT vec_id, c,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, c) AS rn
      FROM s1
    )
    SELECT vec_id, CAST(c AS INT) AS cluster
    FROM a1 WHERE rn = 1
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k={K}) over the embedding corpus —
    one full assign→update→reassign cycle, returning the post-update
    cluster of every vector.

    Plan shape (the 100 TB-correct one): assignment 0 is a per-row
    argmax over k literal-centroid scores (whole-stage codegen, zero
    shuffle); the update step posexplodes to (cluster, dim, value) and
    partial-avgs — the ONLY shuffle, carrying k x {DIM} partial sums,
    not vectors; the new centroids collect to the driver (k x {DIM}
    doubles) and re-enter iteration 1 as plan literals, so the second
    assignment is again shuffle-free codegen. More iterations repeat
    the same two jobs; convergence cost is iterations x (scan + tiny
    shuffle). Empty clusters drop out on both engines identically.
    """
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))

    # --- iteration 0: assign to nearest init centroid (codegen argmax)
    a0 = emb.withColumn("c", ivf_cell(F.col("embedding"), _KM_INIT))

    # --- update: per-(cluster, dim) mean; shuffle bounded by k*dim
    upd = (a0.select("c", F.posexplode("embedding").alias("pos", "val"))
             .groupBy("c", "pos")
             .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m")))
    cents: dict[int, dict[int, float]] = {}
    for r in upd.collect():  # bounded: at most k*dim rows
        cents.setdefault(int(r["c"]), {})[int(r["pos"])] = float(r["m"])
    cells = sorted(cents)
    cent_list = [[cents[c][j] for j in range(DIM)] for c in cells]

    # --- iteration 1: reassign against the data-derived centroids
    scores = _ivf_scores(F.col("embedding"), cent_list)
    pos = F.array_position(scores, F.array_max(scores))
    cell_ids = F.array(*[F.lit(c) for c in cells])
    return emb.select(
        "vec_id",
        F.element_at(cell_ids, pos.cast("int")).cast("int").alias("cluster"))

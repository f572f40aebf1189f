"""Similarity search over the embeddings table (SURVEY.md §2.3):
brute-force cosine top-k baseline, sign-LSH bucketed ANN as the scale
path, and embedding-cosine near-dup pairs.

Scale posture: brute force is the *correctness baseline* (O(N) per
query, embarrassingly parallel, no shuffle beyond the final top-k);
the banded sign-LSH variant prunes candidates by (band, key)
equality (OR-construction over 2 bands of 4 planes — measured 0.16
mean recall@5 on the weakly-clustered fixtures where the old single
8-bit bucket measured 0.0) and IVF probes the query's two best cells
(nprobe=2, measured 0.52-0.64 recall@5 vs 0.32 at nprobe=1). Both
keep every lookup an equi-join — the right shape when N is 10^10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.vectors import (
    _dot_all,
    _ivf_scores,
    _mat_key,
    cosine,
    dot,
    memo_col,
    hyperplane_signs,
    ivf_cell,
    ivf_cell_scores,
    ivf_cells_top2,
    ivf_centroids,
    lsh_band_keys,
    lit_double_matrix,
    lsh_bucket,
    norm,
    pq_adc_score,
    pq_codebooks,
    pq_codes,
    pq_lut,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import fan_out_for_compute, load_table

_COS_SQL = ("list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
            " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
            " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))")


@register(
    "similarity_topk_cosine",
    oracle=f"""
    SELECT b.vec_id, {_COS_SQL} AS cos_sim, b.label
    FROM (SELECT * FROM embeddings WHERE vec_id = 0) a
    CROSS JOIN embeddings b
    WHERE b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for one query vector (vec_id=0). The
    single-row query side is broadcast; TakeOrdered handles the top-k —
    no global sort, no collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id",
                cosine(F.col("embedding"), F.col("q_emb")).alias("cos_sim"),
                "label")
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


# 8 hyperplanes → 256 buckets; matrix baked as literals in both engines.
_PLANES = hyperplane_signs("afcs-lsh-v1", n_planes=8, dim=64)


def _band_sql(alias: str, planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({alias}.embedding::DOUBLE[], "
            f"{arr}::DOUBLE[]) > 0 THEN {2 ** i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _bucket_sql(alias: str) -> str:
    return _band_sql(alias, _PLANES)


@register(
    "similarity_ann_lsh",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {_band_sql('embeddings', _PLANES[:4])} AS band0,
             {_band_sql('embeddings', _PLANES[4:])} AS band1
      FROM embeddings
    ),
    q AS (SELECT * FROM sig WHERE vec_id < 5),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM q JOIN sig b
        ON (q.band0 = b.band0 OR q.band1 = b.band1)
       AND b.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT c.query_id, c.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY c.query_id
               ORDER BY {_COS_SQL} DESC, c.neighbor_id) AS rn
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.query_id
      JOIN embeddings b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM ranked WHERE rn <= 5
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN with the banded OR-construction: 2 bands x 4
    planes; a vector is a candidate for a query when ANY band key
    matches (P[candidate] ~ 1-(1-p^4)^2 for per-plane agreement p —
    single 8-bit buckets have p^8, which strands moderately-similar
    neighbors). Both sides posexplode to (band_id, key) so the probe
    stays an EQUI-join; candidate pairs dedupe BEFORE the exact-cosine
    verify so each pair is scored once. At scale (band_id, key)
    becomes the partition key of a materialized signature table."""
    from pyspark.sql import Window as W
    emb = load_table(spark, sf_dir, "embeddings") \
        .withColumn("bands", lsh_band_keys(F.col("embedding"),
                                           [_PLANES[:4], _PLANES[4:]]))
    base = emb.select(
        "vec_id", "embedding",
        F.posexplode("bands").alias("band_id", "band_key"))
    q = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"), "band_id", "band_key")
    cand = base.select(F.col("vec_id").alias("neighbor_id"),
                       "embedding", "band_id", "band_key")
    pairs = (cand.join(F.broadcast(q), ["band_id", "band_key"])
             .where(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id", "embedding", "q_emb")
             .dropDuplicates(["query_id", "neighbor_id"]))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (pairs
            .select("query_id", "neighbor_id",
                    cosine(F.col("embedding"), F.col("q_emb"))
                    .alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("rn"))


# IVF coarse quantizer: 16 deterministic centroids over the 64-dim space.
_CENTS = ivf_centroids("afcs-ivf-v1", k=16, dim=64)
_BIASES = ivf_cell_scores(_CENTS)


def _scores_sql(alias: str) -> str:
    """The full 16-element cell-score list as a SQL literal expression
    (same per-cell arithmetic as ``_cell_sql``)."""
    scores = ", ".join(
        f"list_dot_product({alias}.embedding::DOUBLE[], "
        "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]) + " + repr(b)
        for c, b in zip(_CENTS, _BIASES))
    return f"[{scores}]"


def _cell_sql(alias: str) -> str:
    scores = ", ".join(
        f"list_dot_product({alias}.embedding::DOUBLE[], "
        "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]) + " + repr(b)
        for c, b in zip(_CENTS, _BIASES))
    return (f"CAST(list_position([{scores}], "
            f"list_max([{scores}])) AS INT)")


@register(
    "similarity_ann_ivf",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id, embedding, {_scores_sql('embeddings')} AS s
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id, embedding, i AS cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY s[i] DESC, i) AS cell_rank
      FROM scored,
           LATERAL (SELECT unnest(generate_series(1, {len(_CENTS)})) AS i)
    ),
    q AS (SELECT * FROM probes WHERE vec_id < 5 AND cell_rank <= 2),
    inv AS (SELECT * FROM probes WHERE cell_rank = 1),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM q JOIN inv b ON b.cell = q.cell AND b.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT c.query_id, c.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY c.query_id
               ORDER BY {_COS_SQL} DESC, c.neighbor_id) AS rn
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.query_id
      JOIN embeddings b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM ranked WHERE rn <= 5
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN, nprobe=2: the 16-cell coarse quantizer
    assigns every vector to its best cell (the inverted list); each
    query probes its TWO best cells (~2N/16 candidates) — the standard
    recall lever when the query lands near a cell boundary, which is
    exactly where nprobe=1 loses neighbors. Probe-list explode keeps
    the lookup an equi-join on cell; candidates dedupe before the
    exact-cosine verify. At 100 TB the cell is the table's partition
    column (partition-pruned probes), centroids come from a sampled
    k-means fit, and nprobe tunes recall vs cost without changing the
    plan shape."""
    return ann_ivf_with_centroids(spark, sf_dir, _CENTS)


def ann_ivf_with_centroids(spark: SparkSession, sf_dir: str,
                           cents: list) -> DataFrame:
    """The IVF nprobe=2 pipeline parameterized by its coarse quantizer
    — the slot a sampled k-means fit plugs into (see
    ``tests/test_clustering.py`` for the trained-vs-random recall
    comparison). Plan shape is identical for any centroid set."""
    from pyspark.sql import Window as W
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    inv = emb.withColumn("cell", ivf_cell(F.col("embedding"), cents)) \
        .select(F.col("vec_id").alias("neighbor_id"), "embedding", "cell")
    q = (emb.filter(F.col("vec_id") < 5)
         .withColumn("cell", F.explode(
             ivf_cells_top2(F.col("embedding"), cents)))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"), "cell"))
    # no dedupe needed: each neighbor lives in exactly ONE inverted
    # list (cell_rank=1 assignment) and the query's two probe cells are
    # distinct, so a (query, neighbor) pair can match at most once
    pairs = (inv.join(F.broadcast(q), "cell")
             .where(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id", "embedding", "q_emb"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (pairs
            .select("query_id", "neighbor_id",
                    cosine(F.col("embedding"), F.col("q_emb"))
                    .alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("rn"))


# Banded sign-LSH for near-dup candidate generation: 2 bands × 4 planes
# (16 keys per band). A pair is a candidate when ANY band key matches —
# the classic LSH OR-construction, giving higher recall than the single
# 256-bucket hash while keeping every join an equi-join.
_NEARDUP_BANDS = [_PLANES[:4], _PLANES[4:]]


@register(
    "similarity_embedding_neardup",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_band_sql('embeddings', _NEARDUP_BANDS[0])} AS band0,
             {_band_sql('embeddings', _NEARDUP_BANDS[1])} AS band1
      FROM embeddings
    ),
    cand AS (
      SELECT DISTINCT s1.vec_id AS id_a, s2.vec_id AS id_b
      FROM sig s1 JOIN sig s2
        ON s1.vec_id < s2.vec_id
       AND (s1.band0 = s2.band0 OR s1.band1 = s2.band1)
    )
    SELECT c.id_a, c.id_b, {_COS_SQL} AS cos_sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {_COS_SQL} >= 0.35
    """,
)
def similarity_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.35) via banded
    sign-LSH candidate pruning + exact-cosine verify.

    Candidates come from a band-key EQUI-join (explode 2 band keys per
    vector, self-join on (band_idx, band_key), distinct pairs) — never
    an all-pairs theta join: at N vectors the join input is ~N/16 per
    band key, not N², so the plan survives a 100× scale-up. The exact
    cosine then verifies every candidate. The DuckDB oracle mirrors the
    identical banded candidate generation, so results are bit-exact;
    recall vs brute force is the standard LSH OR-construction trade
    (raise bands for higher recall).

    Scaling the banding (AND-OR tuning): candidate volume grows as
    bands*N^2/keyspace, so the 2x4-plane demo config (keyspace 16,
    forced by the fixtures' weak 0.35 threshold where plane-agreement
    p is only ~0.61) is the LOW-selectivity end. At production
    near-dup thresholds (cos >= 0.9, p ~ 0.9) the right config is
    r=8 planes x b=4 bands: keyspace 256 per band (16x fewer
    candidate pairs) at ~0.87 recall [1-(1-p^8)^4]. Config changes
    touch only ``_NEARDUP_BANDS`` + the mirrored oracle; the
    equi-join plan shape is invariant. ``tools/scale_probe.py``
    measures this query's growth exponent directly."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = fan_out_for_compute(emb).select(
        "vec_id",
        lsh_bucket(F.col("embedding"), _NEARDUP_BANDS[0]).alias("band0"),
        lsh_bucket(F.col("embedding"), _NEARDUP_BANDS[1]).alias("band1"))
    bands = sig.select(
        "vec_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("bi"), F.col("band0").alias("bk")),
            F.struct(F.lit(1).alias("bi"), F.col("band1").alias("bk"))
        )).alias("band")
    ).select("vec_id", F.col("band.bi").alias("bi"),
             F.col("band.bk").alias("bk"))
    cand = (
        bands.select(F.col("vec_id").alias("id_a"), "bi", "bk")
        .join(bands.select(F.col("vec_id").alias("id_b"), "bi", "bk"),
              ["bi", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    emb_a = emb.select(F.col("vec_id").alias("id_a"),
                       F.col("embedding").alias("emb_a"))
    emb_b = emb.select(F.col("vec_id").alias("id_b"),
                       F.col("embedding").alias("emb_b"))
    return (
        cand.join(emb_a, "id_a").join(emb_b, "id_b")
        .select("id_a", "id_b",
                cosine(F.col("emb_a"), F.col("emb_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.35)
    )


# Production near-dup banding: r=8 planes x b=4 bands (keyspace 256
# per band). At production thresholds (cos >= 0.9, per-plane agreement
# p ~ 0.9) this is the right AND-OR point: ~0.87 theoretical recall
# [1-(1-p^8)^4] with 16x fewer candidate pairs than the 2x4 demo
# config above. 32 planes, deterministic seed, shared by plan+oracle.
_HI_PLANES = hyperplane_signs("afcs-lsh-hi-v1", n_planes=32, dim=64)
_HI_BANDS = [_HI_PLANES[i * 8:(i + 1) * 8] for i in range(4)]


def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str,
                            bands: list[list[list[float]]],
                            threshold: float) -> DataFrame:
    """Banded sign-LSH near-dup pairs over any embedding frame —
    the reusable operator behind ``similarity_embedding_neardup_hi``
    (and the planted-duplicate recall tests): posexplode per-band
    keys, equi-join on (band_idx, band_key), exact-cosine verify of
    the distinct candidates. Returns (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= threshold. Never an all-pairs join;
    candidate volume ~ bands * N^2 / keyspace per band key."""
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(memo_col(
            ("lsh_band_keys", vec_col, _mat_key(bands)),
            lambda: lsh_band_keys(F.col(vec_col), bands)))
        .alias("bi", "bk"))
    cand = (keyed.select(F.col("_id").alias("id_a"), "bi", "bk")
            .join(keyed.select(F.col("_id").alias("id_b"), "bi", "bk"),
                  ["bi", "bk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    # PERF (r14): norms are computed once per VECTOR on the attach
    # side, not once per PAIR inside cosine() — candidates outnumber
    # vectors ~18x here, and each cosine() was 3 zip_with+aggregate
    # folds (dot + 2 norms) per pair; per-pair work is now the single
    # dot fold. sqrt and the division tree are unchanged, so cos_sim
    # is bit-identical (interleaved A/B med 3.22 -> 2.27 s on
    # similarity_embedding_neardup_hi, rows identical).
    nrm = memo_col(("norm", vec_col), lambda: norm(F.col(vec_col)))
    ea = df.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("emb_a"),
                   nrm.alias("n_a"))
    eb = df.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("emb_b"),
                   nrm.alias("n_b"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .select("id_a", "id_b",
                    (memo_col(("dot", "emb_a", "emb_b"),
                              lambda: dot(F.col("emb_a"),
                                          F.col("emb_b")))
                     / (F.col("n_a") * F.col("n_b")))
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


_HI_BAND_OR = " OR ".join(
    f"s1.hband{i} = s2.hband{i}" for i in range(4))


@register(
    "similarity_embedding_neardup_hi",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id,
             {", ".join(f"{_band_sql('embeddings', _HI_BANDS[i])} AS hband{i}"
                        for i in range(4))}
      FROM embeddings
    ),
    cand AS (
      SELECT DISTINCT s1.vec_id AS id_a, s2.vec_id AS id_b
      FROM sig s1 JOIN sig s2
        ON s1.vec_id < s2.vec_id AND ({_HI_BAND_OR})
    )
    SELECT c.id_a, c.id_b, {_COS_SQL} AS cos_sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {_COS_SQL} >= 0.9
    """,
)
def similarity_embedding_neardup_hi(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Embedding near-dup at the PRODUCTION threshold (cos >= 0.9)
    with the production banding (r=8 planes x b=4 bands, keyspace 256
    per band) — the config ``similarity_embedding_neardup``'s
    docstring promises; the 2x4 demo config stays registered for the
    fixtures' weak 0.35 threshold. The driver fixtures contain no
    pairs at cos >= 0.9, so this query's oracle pins the *machinery*
    (band keys, candidate join, verify) bit-exactly on real data; the
    RECALL of this exact config is pinned by the planted-duplicate
    test (tests/test_clustering.py) against brute force — >= 0.7
    floor at cos >= 0.9, theory ~0.87."""
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    return embedding_neardup_pairs(emb, "vec_id", "embedding",
                                   _HI_BANDS, 0.9)


# Product quantization: m=8 subspaces of 8 dims, k=16 codes each —
# a vector compresses to 8 bytes; ADC scores a pair with 8 table
# lookups instead of a 64-dim dot product.
_PQ_M, _PQ_K, _PQ_D = 8, 16, 8
_PQ_BOOKS = pq_codebooks("afcs-pq-v1", m=_PQ_M, k=_PQ_K, dim=64)


def _pq_sub_sql(alias: str, s: int) -> str:
    lo, hi = s * _PQ_D + 1, (s + 1) * _PQ_D
    return f"({alias}.embedding::DOUBLE[])[{lo}:{hi}]"


def _pq_code_sql(alias: str, s: int) -> str:
    book = _PQ_BOOKS[s]
    biases = ivf_cell_scores(book)
    scores = ", ".join(
        f"list_dot_product({_pq_sub_sql(alias, s)}, ["
        + ", ".join(repr(v) for v in c) + "]::DOUBLE[]) + " + repr(b)
        for c, b in zip(book, biases))
    return (f"CAST(list_position([{scores}], "
            f"list_max([{scores}])) AS INT)")


def _pq_book_sql(s: int) -> str:
    return ("[" + ", ".join(
        "[" + ", ".join(repr(v) for v in c) + "]"
        for c in _PQ_BOOKS[s]) + "]::DOUBLE[][]")


_PQ_ADC_SQL = " + ".join(
    f"list_dot_product({_pq_sub_sql('q', s)}, "
    f"({_pq_book_sql(s)})[b.code{s}])"
    for s in range(_PQ_M))


@register(
    "similarity_ann_pq",
    oracle=f"""
    WITH codes AS (
      SELECT vec_id, embedding,
             {", ".join(f"{_pq_code_sql('embeddings', s)} AS code{s}"
                        for s in range(_PQ_M))}
      FROM embeddings
    ),
    q AS (SELECT * FROM codes WHERE vec_id < 5),
    adc AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_PQ_ADC_SQL} AS qscore
      FROM q JOIN codes b ON b.vec_id <> q.vec_id
    ),
    shortlist AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, neighbor_id) AS qrn
      FROM adc
    ),
    rerank AS (
      SELECT s.query_id, s.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY {_COS_SQL} DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN embeddings a ON a.vec_id = s.query_id
      JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.qrn <= 20
    )
    SELECT query_id, neighbor_id, cos_sim FROM rerank WHERE rn <= 5
    """,
)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: encode every vector as 8 one-byte
    codes (nearest centroid per 8-dim subspace), score query↔vector
    with ASYMMETRIC DISTANCE COMPUTATION — the query precomputes an
    8x16 lookup table of subspace dots, each corpus vector then costs
    8 array lookups — shortlist top-20 by ADC, exact-cosine re-rank,
    emit top-5 (the IVFADC recipe minus the coarse stage; compose with
    ``similarity_ann_ivf``'s cell filter for the full pipeline).

    100 TB shape: the scan side carries (vec_id, codes) — 8 BYTES per
    vector instead of 256+ — so the candidate sweep is bandwidth-bound
    on a table 32x smaller than the embeddings; the 5-row query side
    (codes + LUTs) broadcasts; top-k is a bounded window. Codebooks
    are deterministic literals shared with the DuckDB oracle
    (``pq_codebooks``; trained per-subspace k-means slots in
    identically). Recall vs brute force is pinned by
    tests/test_clustering.py."""
    from pyspark.sql import Window as W

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    bk = _mat_key(_PQ_BOOKS)
    codes = emb.select("vec_id",
                       memo_col(("pq_codes", "embedding", bk),
                                lambda: pq_codes(F.col("embedding"),
                                                 _PQ_BOOKS))
                       .alias("codes"))
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 memo_col(("pq_lut", "embedding", bk),
                          lambda: pq_lut(F.col("embedding"), _PQ_BOOKS))
                 .alias("lut")))
    adc = (codes.crossJoin(F.broadcast(q))
           .filter(F.col("vec_id") != F.col("query_id"))
           .select("query_id", F.col("vec_id").alias("neighbor_id"),
                   pq_adc_score(F.col("lut"), F.col("codes"),
                                _PQ_M, _PQ_K).alias("qscore")))
    w_s = W.partitionBy("query_id").orderBy(F.desc("qscore"),
                                            "neighbor_id")
    shortlist = (adc.withColumn("qrn", F.row_number().over(w_s))
                 .filter(F.col("qrn") <= 20).drop("qscore", "qrn"))
    emb_q = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"))
    emb_n = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("n_emb"))
    w_r = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                            "neighbor_id")
    return (shortlist.join(F.broadcast(emb_q), "query_id")
            .join(emb_n, "neighbor_id")
            .select("query_id", "neighbor_id",
                    memo_col(("cosine", "q_emb", "n_emb"),
                             lambda: cosine(F.col("q_emb"),
                                            F.col("n_emb")))
                    .alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") <= 5).drop("rn"))


def _pq_slice_sql(alias: str, s: int) -> str:
    return _pq_sub_sql(alias, s)


def _pq_trained_ctes() -> str:
    """Per-subspace one-Lloyd-step training CTEs (the
    ``embedding_kmeans`` pattern, 8×): init assignment from the
    md5-random codebooks, per-(code, dim) ROUND(AVG, 6) update,
    relational re-assignment against the data-derived codebooks."""
    parts = ["e AS (SELECT vec_id, embedding FROM embeddings)"]
    for s in range(_PQ_M):
        lo = s * _PQ_D
        parts.append(f"""a0_{s} AS (
      SELECT vec_id, embedding, {_pq_code_sql('e', s)} AS code FROM e
    )""")
        parts.append(f"""upd_{s} AS (
      SELECT code, j,
             ROUND(AVG((embedding::DOUBLE[])[{lo} + j]), 6) AS m
      FROM a0_{s}, LATERAL (SELECT unnest(generate_series(1, {_PQ_D}))
                            AS j)
      GROUP BY code, j
    )""")
        parts.append(f"""cent_{s} AS (
      SELECT code, list(m ORDER BY j) AS cv FROM upd_{s} GROUP BY code
    )""")
        parts.append(f"""re_{s} AS (
      SELECT e.vec_id, c.code,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product({_pq_slice_sql('e', s)}, c.cv)
                        - 0.5 * list_dot_product(c.cv, c.cv) DESC,
                        c.code) AS rn
      FROM e CROSS JOIN cent_{s} c
    )""")
        parts.append(f"""coded_{s} AS (
      SELECT vec_id, code AS code{s} FROM re_{s} WHERE rn = 1
    )""")
    return ",\n    ".join(parts)


def embedding_index_frame(df: DataFrame, id_col: str, vec_col: str,
                          bands: list[list[list[float]]]) -> DataFrame:
    """The PERSISTABLE sign-LSH band index for vectors: one row per
    id, ``(id_col, band_keys: array<bigint>)`` — what an upsert table
    maintains incrementally so cross-batch matching probes a stored
    index instead of re-hashing the corpus (the vector twin of
    ``operators.dedup.lsh_index_frame``). Embeddings stay in the
    corpus table only; the verify fetches them per-candidate."""
    return df.select(F.col(id_col),
                     lsh_band_keys(F.col(vec_col), bands)
                     .alias("band_keys"))


def embedding_probe_index_pairs(index: DataFrame, corpus: DataFrame,
                                incoming: DataFrame,
                                id_col: str, vec_col: str,
                                bands: list[list[list[float]]],
                                threshold: float) -> DataFrame:
    """Incremental embedding near-dup with the EXISTING side served
    from a persisted :func:`embedding_index_frame` table: band the
    incoming batch, equi-join its (band_idx, band_key) rows into the
    index, fetch embeddings for the CANDIDATE ids only (semi-join into
    the corpus, column-pruned to id+vector), exact-cosine verify.
    Returns (new_id, old_id, cos_sim) with cos_sim ≥ threshold —
    bit-identical to recomputing the corpus band frame when ``index``
    equals ``embedding_index_frame(corpus, ...)``. Per-batch cost ∝
    batch: the corpus is never re-hashed."""
    long_i = incoming.select(
        F.col(id_col).alias("new_id"),
        F.posexplode(lsh_band_keys(F.col(vec_col), bands))
        .alias("bi", "bk"))
    long_e = index.select(
        F.col(id_col).alias("old_id"),
        F.posexplode("band_keys").alias("bi", "bk"))
    cand = (long_i.join(long_e, ["bi", "bk"])
            .select("new_id", "old_id").distinct())
    emb_n = incoming.select(F.col(id_col).alias("new_id"),
                            F.col(vec_col).alias("emb_n"))
    emb_o = corpus.select(F.col(id_col).alias("old_id"),
                          F.col(vec_col).alias("emb_o")) \
        .join(cand.select("old_id").distinct(), "old_id", "left_semi")
    return (cand.join(emb_n, "new_id").join(emb_o, "old_id")
            .select("new_id", "old_id",
                    cosine(F.col("emb_n"), F.col("emb_o"))
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def embedding_band_index_rows(df: DataFrame, id_col: str, vec_col: str,
                              bands: list[list[list[float]]],
                              n_parts: int | None = None) -> DataFrame:
    """Rows for the PARTITION-PRUNABLE long vector band index:
    ``(id_col, bi, bk, bkp)`` — one row per (vector, band), ``bkp``
    the hash partition of the band key. Maintained by a
    :class:`~..sinks.upsert.ParquetUpsertTable` keyed
    ``[id_col, "bi"]`` with ``partition_col="bkp"``: because every
    vector emits exactly ``len(bands)`` rows, a plain MERGE replaces
    an update's rows exactly (no stale-key delete needed — the text
    twin's tombstone machinery has no vector analogue)."""
    from aether_firebase_consumer_spark.operators.dedup import (
        BAND_INDEX_PARTITIONS,
        band_partition,
    )
    n = BAND_INDEX_PARTITIONS if n_parts is None else n_parts
    return (df.select(F.col(id_col),
                      F.posexplode(lsh_band_keys(F.col(vec_col), bands))
                      .alias("bi", "bk"))
            .withColumn("bkp", band_partition(F.col("bk"), n)))


def embedding_probe_partitioned_pairs(long_index: DataFrame,
                                      corpus: DataFrame,
                                      incoming: DataFrame,
                                      id_col: str, vec_col: str,
                                      bands: list[list[list[float]]],
                                      threshold: float,
                                      n_parts: int | None = None,
                                      idp_parts: int | None = None,
                                      materialize: bool = True
                                      ) -> DataFrame:
    """:func:`embedding_probe_index_pairs` with per-trigger I/O bounded
    by the BATCH: the batch's band-key prefixes prune the
    bkp-partitioned long index scan (PartitionFilters — exact, since
    an equi-join match implies an equal prefix), and with ``idp_parts``
    set and the corpus carrying an ``idp`` partition column, the
    per-candidate embedding fetch prunes the corpus scan to candidate
    ids' partitions the same way. Bit-identical to the unpruned probe.

    ``materialize=False`` keeps full lazy lineage for plan inspection;
    the default checkpoints the multi-referenced frames once."""
    from aether_firebase_consumer_spark.operators.dedup import (
        BAND_INDEX_PARTITIONS,
        band_partition,
        id_partition,
    )
    n = BAND_INDEX_PARTITIONS if n_parts is None else n_parts
    long_i = incoming.select(
        F.col(id_col).alias("new_id"),
        F.posexplode(lsh_band_keys(F.col(vec_col), bands))
        .alias("bi", "bk"))
    if materialize:
        long_i = long_i.localCheckpoint()
    prefixes = [r[0] for r in long_i
                .select(band_partition(F.col("bk"), n).alias("p"))
                .distinct().collect()]
    id_t = dict(incoming.dtypes)[id_col]
    empty = incoming.sparkSession.createDataFrame(
        [], f"new_id {id_t}, old_id {id_t}, cos_sim double")
    if not prefixes:
        return empty
    pruned = long_index.filter(F.col("bkp").isin(prefixes))
    cand = (long_i
            .join(pruned.select(F.col(id_col).alias("old_id"),
                                "bi", "bk"),
                  ["bi", "bk"])
            .select("new_id", "old_id").distinct())
    if materialize:
        # reused: idp-prefix collect + both verify joins
        cand = cand.localCheckpoint()
    co = corpus
    if idp_parts is not None and "idp" in co.columns:
        idps = [r[0] for r in cand
                .select(id_partition(F.col("old_id"), idp_parts)
                        .alias("p")).distinct().collect()]
        if not idps:
            return empty
        co = co.filter(F.col("idp").isin(idps))
    emb_n = incoming.select(F.col(id_col).alias("new_id"),
                            F.col(vec_col).alias("emb_n"))
    emb_o = co.select(F.col(id_col).alias("old_id"),
                      F.col(vec_col).alias("emb_o")) \
        .join(cand.select("old_id").distinct(), "old_id", "left_semi")
    return (cand.join(emb_n, "new_id").join(emb_o, "old_id")
            .select("new_id", "old_id",
                    cosine(F.col("emb_n"), F.col("emb_o"))
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


_PQ_TRAINED_ADC = " + ".join(
    f"list_dot_product({_pq_sub_sql('q', s)}, c{s}.cv)"
    for s in range(_PQ_M))

_PQ_TRAINED_JOINS = "\n      ".join(
    f"JOIN cent_{s} c{s} ON c{s}.code = b.code{s}"
    for s in range(_PQ_M))


@register(
    "similarity_ann_pq_trained",
    oracle=f"""
    WITH {_pq_trained_ctes()},
    coded AS (
      SELECT e.vec_id,
             {", ".join(f"coded_{s}.code{s}" for s in range(_PQ_M))}
      FROM e {" ".join(f"JOIN coded_{s} ON coded_{s}.vec_id = e.vec_id"
                       for s in range(_PQ_M))}
    ),
    q AS (SELECT vec_id, embedding FROM e WHERE vec_id < 5),
    adc AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_PQ_TRAINED_ADC} AS qscore
      FROM q JOIN coded b ON b.vec_id <> q.vec_id
      {_PQ_TRAINED_JOINS}
    ),
    shortlist AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, neighbor_id) AS qrn
      FROM adc
    ),
    rerank AS (
      SELECT s.query_id, s.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY {_COS_SQL} DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN embeddings a ON a.vec_id = s.query_id
      JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.qrn <= 20
    )
    SELECT query_id, neighbor_id, cos_sim FROM rerank WHERE rn <= 5
    """,
)
def similarity_ann_pq_trained(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """PQ with TRAINED codebooks: one Lloyd step per subspace over the
    corpus subvectors (init = the md5-random books), then the same
    encode → ADC shortlist → exact re-rank pipeline as
    ``similarity_ann_pq``. The training is the ``embedding_kmeans``
    recipe applied 8×: codegen argmax assignment, per-(code, dim)
    partial-avg shuffle bounded by m·k·d, trained centroids re-enter
    as plan literals (ROUND 6 for cross-engine bit-identity — the
    oracle trains the same books in SQL). Data-derived codebooks fit
    the residual distribution, so ADC ranks tighter than the random
    books at the same shortlist — the measured recall gap is pinned in
    tests/test_clustering.py."""
    from pyspark.sql import Window as W

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))

    # --- one Lloyd step per subspace (bounded collect: ≤ m·k·d rows)
    codes0 = pq_codes(F.col("embedding"), _PQ_BOOKS)
    long = (emb.select("embedding",
                       F.posexplode(codes0).alias("s", "code"))
            .select("s", "code",
                    F.posexplode(F.slice(
                        F.col("embedding"),
                        F.col("s") * _PQ_D + 1, _PQ_D))
                    .alias("j", "val")))
    upd = (long.groupBy("s", "code", "j")
           .agg(F.round(F.avg(F.col("val").cast("double")), 6)
                .alias("m")))
    got: dict[tuple[int, int], dict[int, float]] = {}
    for r in upd.collect():
        got.setdefault((int(r.s), int(r.code)), {})[int(r.j)] = float(r.m)
    books: list[list[list[float]]] = []
    ids: list[list[int]] = []
    for s in range(_PQ_M):
        cs = sorted(c for (ss, c) in got if ss == s)
        ids.append(cs)
        books.append([[got[(s, c)][j] for j in range(_PQ_D)]
                      for c in cs])

    # --- re-encode against the trained books (original code ids kept
    # so the SQL side's relational argmax matches positionally)
    def _recode():
        code_cols = []
        for s in range(_PQ_M):
            # offset indexing, not slice — see _dot_all (r14)
            scores = _ivf_scores(F.col("embedding"), books[s],
                                 off=s * _PQ_D)
            pos = F.array_position(scores, F.array_max(scores))
            id_lit = F.array(*[F.lit(c) for c in ids[s]])
            code_cols.append(F.element_at(id_lit, pos.cast("int"))
                             .cast("int"))
        return F.array(*code_cols)

    # trained books are data-derived, so the memo keys by CONTENT —
    # the same corpus trains the same books and hits; any other corpus
    # misses (see memo_col)
    coded = emb.select(F.col("vec_id").alias("neighbor_id"),
                       memo_col(("pq_trained_codes", "embedding",
                                 _mat_key(books), tuple(map(tuple, ids))),
                                _recode).alias("codes"))

    # --- ADC with 16-slot LUTs indexed by ORIGINAL code id (dead
    # codes padded with zero vectors — never selected, never read)
    padded = []
    for s in range(_PQ_M):
        rows = [[0.0] * _PQ_D for _ in range(_PQ_K)]
        for c, cv in zip(ids[s], books[s]):
            rows[c - 1] = cv
        padded.append(rows)
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 memo_col(("pq_lut", "embedding", _mat_key(padded)),
                          lambda: pq_lut(F.col("embedding"), padded))
                 .alias("lut")))
    adc = (coded.crossJoin(F.broadcast(q))
           .filter(F.col("neighbor_id") != F.col("query_id"))
           .select("query_id", "neighbor_id",
                   pq_adc_score(F.col("lut"), F.col("codes"),
                                _PQ_M, _PQ_K).alias("qscore")))
    w_s = W.partitionBy("query_id").orderBy(F.desc("qscore"),
                                            "neighbor_id")
    shortlist = (adc.withColumn("qrn", F.row_number().over(w_s))
                 .filter(F.col("qrn") <= 20).drop("qscore", "qrn"))
    emb_q = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"))
    emb_n = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("n_emb"))
    w_r = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                            "neighbor_id")
    return (shortlist.join(F.broadcast(emb_q), "query_id")
            .join(emb_n, "neighbor_id")
            .select("query_id", "neighbor_id",
                    memo_col(("cosine", "q_emb", "n_emb"),
                             lambda: cosine(F.col("q_emb"),
                                            F.col("n_emb")))
                    .alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") <= 5).drop("rn"))


# -- IVFADC: the composed production recipe ---------------------------------
# coarse IVF cell + PQ over the RESIDUAL (v - centroid), ADC scoring
# q·v ≈ q·c_cell + Σ_s q_s·book_s[code_s] — Jégou et al.'s public
# IVFADC structure, on the shared quantizers above.

_CENTS64_SQL = ("[" + ", ".join(
    "[" + ", ".join(repr(v) for v in c) + "]" for c in _CENTS)
    + "]::DOUBLE[][]")


def _pq_res_code_sql(s: int) -> str:
    """code_s over the residual list column ``res`` (from the rescols
    CTE): argmax of dot(res_slice, c) − |c|²/2, first occurrence."""
    lo, hi = s * _PQ_D + 1, (s + 1) * _PQ_D
    book = _PQ_BOOKS[s]
    biases = ivf_cell_scores(book)
    scores = ", ".join(
        f"list_dot_product(res[{lo}:{hi}], ["
        + ", ".join(repr(v) for v in c) + "]::DOUBLE[]) + " + repr(b)
        for c, b in zip(book, biases))
    return (f"CAST(list_position([{scores}], "
            f"list_max([{scores}])) AS INT)")


_IVFADC_ADC_SQL = " + ".join(
    f"list_dot_product({_pq_sub_sql('q', s)}, "
    f"({_pq_book_sql(s)})[b.code{s}])"
    for s in range(_PQ_M))


# -- IVFADC decomposed: the three reusable stages ------------------------
#
# The batch query below, the persisted-index variant after it, and the
# streaming AnnIndexJob (streaming/ann_ingest.py) all run EXACTLY these
# frames — same fold arithmetic, same tie-breaks — which is what lets
# all three carry the same DuckDB oracle / equivalence tests.

def ivfadc_code_rows(df: DataFrame, cents: list[list[float]],
                     books: list[list[list[float]]],
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     n_parts: int | None = None) -> DataFrame:
    """Inverted-file rows ``(id_col, cell, codes[, cp])``: coarse IVF
    cell + PQ codes of the residual v − c_cell. With ``n_parts``, adds
    the hash-partition column ``cp = cell % n_parts`` for a persisted,
    partition-prunable codes table."""
    # both encode expressions are memo_col'd (r14): construction is
    # pure py4j traffic (~1.2 s per ivfadc build before memoization)
    # and the unresolved trees depend only on the column names and the
    # matrix CONTENT, which the keys capture
    assigned = df.withColumn("cell", memo_col(
        ("ivf_cell", vec_col, _mat_key(cents)),
        lambda: ivf_cell(F.col(vec_col), cents)))
    # residual encode via pq_codes(minus=...): the residual is formed
    # per ELEMENT inside the fold instead of as a zip_with array the
    # fold would re-evaluate per access (r14 — see _dot_all; encode
    # stage med 1.27 s -> 0.40 s at sf0.1, bit-identical)
    out = assigned.select(
        F.col(id_col), "cell",
        memo_col(
            ("ivfadc_codes", vec_col, _mat_key(cents), _mat_key(books)),
            lambda: pq_codes(
                F.col(vec_col), books,
                minus=F.element_at(
                    lit_double_matrix([[float(v) for v in c]
                                       for c in cents]),
                    F.col("cell"))))
        .alias("codes"))
    if n_parts is not None:
        out = out.withColumn("cp", F.pmod(F.col("cell"),
                                          F.lit(n_parts)).cast("int"))
    return out


def ivfadc_query_frame(queries: DataFrame, cents: list[list[float]],
                       books: list[list[list[float]]],
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Query-side frame ``(query_id, cell, qcs, lut)``, one row per
    probed cell (nprobe=2 via :func:`ivf_cells_top2`): the q·cᵢ array
    and the flattened ADC LUT are computed ONCE per query."""
    ck, bk = _mat_key(cents), _mat_key(books)
    return (queries
            .withColumn("cell", F.explode(memo_col(
                ("ivf_cells_top2", vec_col, ck),
                lambda: ivf_cells_top2(F.col(vec_col), cents))))
            .select(F.col(id_col).alias("query_id"), "cell",
                    memo_col(("dot_all", vec_col, ck),
                             lambda: _dot_all(F.col(vec_col), cents))
                    .alias("qcs"),
                    memo_col(("pq_lut", vec_col, bk),
                             lambda: pq_lut(F.col(vec_col), books))
                    .alias("lut")))


def ivfadc_shortlist(inv: DataFrame, q: DataFrame,
                     books: list[list[list[float]]],
                     shortlist: int = 50,
                     id_col: str = "vec_id") -> DataFrame:
    """ADC-scored candidate shortlist ``(query_id, neighbor_id)``:
    equi-join on cell (query side broadcast), score
    q·c_cell + Σ_s lut[s][code_s], keep the top ``shortlist`` per
    query (ties to the smaller neighbor id). Self-matches drop."""
    from pyspark.sql import Window as W

    m, k = len(books), len(books[0])
    adc = (inv.select(F.col(id_col).alias("neighbor_id"), "cell",
                      "codes")
           .join(F.broadcast(q), "cell")
           .filter(F.col("neighbor_id") != F.col("query_id"))
           .select("query_id", "neighbor_id",
                   (F.element_at(F.col("qcs"), F.col("cell"))
                    + pq_adc_score(F.col("lut"), F.col("codes"),
                                   m, k)).alias("qscore")))
    w_s = W.partitionBy("query_id").orderBy(F.desc("qscore"),
                                            "neighbor_id")
    return (adc.withColumn("qrn", F.row_number().over(w_s))
            .filter(F.col("qrn") <= shortlist).drop("qscore", "qrn"))


def ivfadc_rerank(shortlist: DataFrame, q_emb: DataFrame,
                  n_emb: DataFrame, topk: int = 5) -> DataFrame:
    """Exact-cosine re-rank of the shortlist, top-k per query.
    ``q_emb``: (query_id, q_emb) — broadcast (queries are few);
    ``n_emb``: (neighbor_id, n_emb) — only shortlisted rows are read,
    so a partition-pruned corpus fetch slots in here unchanged."""
    from pyspark.sql import Window as W

    w_r = W.partitionBy("query_id").orderBy(F.desc("cos_sim"),
                                            "neighbor_id")
    return (shortlist.join(F.broadcast(q_emb), "query_id")
            .join(n_emb, "neighbor_id")
            .select("query_id", "neighbor_id",
                    memo_col(("cosine", "q_emb", "n_emb"),
                             lambda: cosine(F.col("q_emb"),
                                            F.col("n_emb")))
                    .alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") <= topk).drop("rn"))


_IVFADC_ORACLE = f"""
    WITH scored AS (
      SELECT vec_id, embedding, {_scores_sql('embeddings')} AS s
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id, embedding, i AS cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY s[i] DESC, i) AS cell_rank
      FROM scored,
           LATERAL (SELECT unnest(generate_series(1, {len(_CENTS)})) AS i)
    ),
    rescols AS (
      SELECT vec_id, embedding, cell,
             list_transform(generate_series(1, 64),
               i -> (embedding::DOUBLE[])[i]
                    - ({_CENTS64_SQL})[cell][i]) AS res
      FROM probes WHERE cell_rank = 1
    ),
    coded AS (
      SELECT vec_id, embedding, cell,
             {", ".join(f"{_pq_res_code_sql(s)} AS code{s}"
                        for s in range(_PQ_M))}
      FROM rescols
    ),
    q AS (SELECT * FROM probes WHERE vec_id < 5 AND cell_rank <= 2),
    adc AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_dot_product(q.embedding::DOUBLE[],
                              ({_CENTS64_SQL})[b.cell])
               + ({_IVFADC_ADC_SQL}) AS qscore
      FROM q JOIN coded b ON b.cell = q.cell AND b.vec_id <> q.vec_id
    ),
    shortlist AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, neighbor_id) AS qrn
      FROM adc
    ),
    rerank AS (
      SELECT s.query_id, s.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY {_COS_SQL} DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN embeddings a ON a.vec_id = s.query_id
      JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.qrn <= 50
    )
    SELECT query_id, neighbor_id, cos_sim FROM rerank WHERE rn <= 5
    """


@register("similarity_ann_ivfadc", oracle=_IVFADC_ORACLE)
def similarity_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the composed production ANN recipe (public structure
    from Jégou/Douze/Schmid's PQ paper): coarse IVF assigns each
    vector to a cell, PQ encodes the RESIDUAL v − c_cell as 8 one-byte
    codes, a query probes its 2 best cells and scores candidates by
    ADC: q·v ≈ q·c_cell + Σ_s q_s·book_s[code_s] — the cell dot is one
    lookup into the query's precomputed 16-entry q·c array, the
    residual part 8 LUT lookups. Shortlist 50, exact-cosine re-rank,
    top-5 (random codebooks rank loosely — the shortlist is the
    recall lever; trained residual codebooks shrink it).

    100 TB shape: the inverted file carries (cell, 8 codes) per vector
    — cell is the partition column (pruned probes), the scan payload
    is 8 bytes + cell id; the query side (LUT + q·c array, 5 rows)
    broadcasts. Residual encoding is what makes shared codebooks
    accurate across cells — the same reason production FAISS-style
    deployments encode residuals. Composed from the shared stage
    helpers above (round 9), so this, the persisted-index variant,
    and the streaming AnnIndexJob are the same arithmetic."""
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    inv = ivfadc_code_rows(emb, _CENTS, _PQ_BOOKS)
    q = ivfadc_query_frame(emb.filter(F.col("vec_id") < 5),
                           _CENTS, _PQ_BOOKS)
    shortlist = ivfadc_shortlist(inv, q, _PQ_BOOKS, shortlist=50)
    emb_q = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"))
    emb_n = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("n_emb"))
    return ivfadc_rerank(shortlist, emb_q, emb_n, topk=5)


_ANN_IDX: dict[str, object] = {}


@register("similarity_ann_ivfadc_pruned", oracle=_IVFADC_ORACLE)
def similarity_ann_ivfadc_pruned(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``similarity_ann_ivfadc`` through the PERSISTED, partition-
    pruned index path (round 9): the inverted file lives in a
    cp-partitioned :class:`~..sinks.upsert.ParquetUpsertTable`
    maintained by :class:`~..streaming.ann_ingest.AnnIndexJob`, the
    exact embeddings in an idp-partitioned corpus table; the probe
    pushes the query cells' cp prefixes as PartitionFilters on the
    codes scan and the shortlisted candidates' idp prefixes on the
    re-rank fetch — per-query I/O ∝ the query set, never ∝ the index.
    Bit-identical to the recompute form (same stage helpers, same
    fold arithmetic), so both carry the same oracle."""
    import tempfile

    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )
    from aether_firebase_consumer_spark.streaming.ann_ingest import (
        AnnIndexJob,
    )

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    # the index tables PERSIST in production (that is their point);
    # build them once per (process, sf_dir) — same convention as the
    # dedup/embedding pruned twins — so repeated runs measure the probe
    job = _ANN_IDX.get(sf_dir)
    if job is None:
        root = tempfile.mkdtemp(prefix="ann_idx_")
        corpus = ParquetUpsertTable(spark, root + "/corp", ["vec_id"],
                                    partition_col="idp")
        codes = ParquetUpsertTable(spark, root + "/codes", ["vec_id"],
                                   partition_col="cp")
        job = AnnIndexJob(spark, corpus, codes, _CENTS, _PQ_BOOKS,
                          n_parts=16, idp_parts=8)
        job.process_batch(emb.select("vec_id", "embedding"), 0)
        _ANN_IDX[sf_dir] = job
    queries = emb.filter(F.col("vec_id") < 5) \
        .select("vec_id", "embedding")
    return job.topk(queries, k=5, shortlist=50)


@register(
    "similarity_norms",
    oracle="""
    SELECT vec_id, label,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS l2_norm,
           list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
               AS sq_norm
    FROM embeddings
    """,
)
def similarity_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norms — the normalization primitive (single scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select("vec_id", "label",
                      norm(e).alias("l2_norm"),
                      dot(e, e).alias("sq_norm"))


@register(
    "similarity_ann_ivf_sq8",
    oracle=f"""
    WITH q8 AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding::DOUBLE[],
                                     x -> abs(x))) AS amax,
             list_transform(embedding::DOUBLE[],
               x -> floor(x * 127.0 /
                          list_max(list_transform(embedding::DOUBLE[],
                                                  y -> abs(y))) + 0.5))
               AS qv
      FROM embeddings
    ),
    scored AS (
      SELECT vec_id, embedding, amax, qv,
             {_scores_sql('q8')} AS s
      FROM q8
    ),
    probes AS (
      SELECT vec_id, embedding, amax, qv, i AS cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY s[i] DESC, i) AS cell_rank
      FROM scored,
           LATERAL (SELECT unnest(generate_series(1, {len(_CENTS)})) AS i)
    ),
    q AS (SELECT * FROM probes WHERE vec_id < 5 AND cell_rank <= 2),
    inv AS (SELECT * FROM probes WHERE cell_rank = 1),
    qd AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             (q.amax * b.amax) * list_dot_product(q.qv, b.qv) / 16129.0
               AS qscore
      FROM q JOIN inv b ON b.cell = q.cell AND b.vec_id <> q.vec_id
    ),
    shortlist AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, neighbor_id) AS qrn
      FROM qd
    ),
    rerank AS (
      SELECT s.query_id, s.neighbor_id, {_COS_SQL} AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY {_COS_SQL} DESC, s.neighbor_id) AS rn
      FROM shortlist s
      JOIN embeddings a ON a.vec_id = s.query_id
      JOIN embeddings b ON b.vec_id = s.neighbor_id
      WHERE s.qrn <= 10
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM rerank WHERE rn <= 5
    """,
)
def similarity_ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + scalar-quantized (SQ8) candidate scoring with fp32
    re-rank — the production ANN memory layout: the inverted lists
    store int8 codes (4x smaller than fp32, so 4x more candidates per
    byte of scan), candidates rank by the CHEAP quantized score
    (amax_a*amax_b/127^2 * Σ q_a·q_b — integer dot product), and only
    the top-10 shortlist touches the fp32 vectors for the exact
    cosine re-rank. At 100 TB the fp32 originals live in a separate
    column read only by the re-rank join — column pruning keeps them
    off the candidate scan entirely.

    Cross-engine exactness: the int8 codes use the explicit
    floor(+0.5) rounding (see ``embedding_quantize_int8``); integer
    dot products are exact in ANY summation order (values < 2^53), so
    the quantized ranking can't drift between engines; both rank
    tie-breaks are pinned by neighbor_id."""
    from pyspark.sql import Window as W
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    amax = F.array_max(F.transform(
        "embedding", lambda x: F.abs(x.cast("double"))))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127.0 / F.col("amax") + 0.5))
    q8 = (emb.withColumn("amax", amax).withColumn("qv", qv)
          .withColumn("cell", ivf_cell(F.col("embedding"), _CENTS)))
    inv = q8.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("n_emb"),
                    F.col("amax").alias("n_amax"),
                    F.col("qv").alias("n_qv"), "cell")
    q = (q8.filter(F.col("vec_id") < 5)
         .withColumn("cell", F.explode(
             ivf_cells_top2(F.col("embedding"), _CENTS)))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("amax").alias("q_amax"),
                 F.col("qv").alias("q_qv"), "cell"))
    int_dot = F.aggregate(
        F.zip_with("q_qv", "n_qv", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    qd = (inv.join(F.broadcast(q), "cell")
          .where(F.col("neighbor_id") != F.col("query_id"))
          .select("query_id", "neighbor_id", "q_emb", "n_emb",
                  ((F.col("q_amax") * F.col("n_amax")) * int_dot / 16129.0)
                  .alias("qscore")))
    w_q = W.partitionBy("query_id").orderBy(F.desc("qscore"), "neighbor_id")
    shortlist = (qd.withColumn("qrn", F.row_number().over(w_q))
                 .filter(F.col("qrn") <= 10))
    w_c = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (shortlist
            .select("query_id", "neighbor_id",
                    cosine(F.col("n_emb"), F.col("q_emb")).alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w_c))
            .filter(F.col("rn") <= 5)
            .drop("rn"))


# Shared by similarity_incremental_neardup and its partition-pruned
# twin: identical pairs, identical oracle.
_INCR_NEARDUP_ORACLE = f"""
    WITH sig AS (
      SELECT vec_id, {_band_sql('embeddings', _NEARDUP_BANDS[0])} AS band0,
             {_band_sql('embeddings', _NEARDUP_BANDS[1])} AS band1
      FROM embeddings
    ),
    cand AS (
      SELECT DISTINCT i.vec_id AS new_id, e.vec_id AS old_id
      FROM sig i JOIN sig e
        ON i.vec_id % 10 >= 8 AND e.vec_id % 10 < 8
       AND (i.band0 = e.band0 OR i.band1 = e.band1)
    ),
    ver AS (
      SELECT c.new_id, c.old_id, {_COS_SQL} AS cos_sim
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.new_id
      JOIN embeddings b ON b.vec_id = c.old_id
      WHERE {_COS_SQL} >= 0.35
    ),
    best AS (
      SELECT new_id, old_id AS dup_of, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY new_id
                                ORDER BY cos_sim DESC, old_id) AS rn
      FROM ver
    )
    SELECT new_id, dup_of, cos_sim FROM best WHERE rn = 1
    """


@register("similarity_incremental_neardup",
          oracle=_INCR_NEARDUP_ORACLE)
def similarity_incremental_neardup(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup — the vector twin of
    ``dedup_incremental_lsh``: an incoming batch (vec_id % 10 ∈ {8,9})
    probes the existing corpus's sign-LSH band index via equi-join
    (never a corpus self-join), exact cosine verifies candidates
    ≥ 0.35, and each duplicate reports its best existing match. At
    100 TB the corpus's (band_idx, band_key, vec_id) frame is a
    persisted bucketed index; per-batch cost ∝ batch size. Banding is
    per-vector, so the corpus split changes no signature (the oracle
    bands once and filters sides in the join)."""
    from pyspark.sql import Window as W

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))

    def banded(df):
        sig = df.select(
            "vec_id",
            lsh_bucket(F.col("embedding"), _NEARDUP_BANDS[0]).alias("band0"),
            lsh_bucket(F.col("embedding"), _NEARDUP_BANDS[1]).alias("band1"))
        return sig.select(
            "vec_id",
            F.explode(F.array(
                F.struct(F.lit(0).alias("bi"), F.col("band0").alias("bk")),
                F.struct(F.lit(1).alias("bi"), F.col("band1").alias("bk"))
            )).alias("band")
        ).select("vec_id", F.col("band.bi").alias("bi"),
                 F.col("band.bk").alias("bk"))

    existing = emb.filter(F.col("vec_id") % 10 < 8)
    incoming = emb.filter(F.col("vec_id") % 10 >= 8)
    cand = (banded(incoming)
            .select(F.col("vec_id").alias("new_id"), "bi", "bk")
            .join(banded(existing)
                  .select(F.col("vec_id").alias("old_id"), "bi", "bk"),
                  ["bi", "bk"])
            .select("new_id", "old_id").distinct())
    emb_n = emb.select(F.col("vec_id").alias("new_id"),
                       F.col("embedding").alias("emb_n"))
    emb_o = emb.select(F.col("vec_id").alias("old_id"),
                       F.col("embedding").alias("emb_o"))
    ver = (cand.join(emb_n, "new_id").join(emb_o, "old_id")
           .select("new_id", "old_id",
                   cosine(F.col("emb_n"), F.col("emb_o")).alias("cos_sim"))
           .filter(F.col("cos_sim") >= 0.35))
    w = W.partitionBy("new_id").orderBy(F.desc("cos_sim"), "old_id")
    return (ver.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("new_id", F.col("old_id").alias("dup_of"), "cos_sim"))


_EMB_PRUNED_IDX: dict[str, tuple] = {}


@register("similarity_incremental_neardup_pruned",
          oracle=_INCR_NEARDUP_ORACLE)
def similarity_incremental_neardup_pruned(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """``similarity_incremental_neardup`` through the PERSISTED,
    partition-pruned index path (round 7, the vector twin of
    ``dedup_incremental_lsh_pruned``): the existing corpus's sign-LSH
    band keys are written to a bkp-hash-partitioned
    ``(vec_id, bi, bk, bkp)`` upsert table and the corpus itself to an
    idp-partitioned table; the incoming batch probes them via
    :func:`embedding_probe_partitioned_pairs`, pushing the batch's
    prefixes as PartitionFilters on the index scan and the candidate
    ids' prefixes on the embedding fetch — per-trigger I/O ∝ batch,
    never ∝ corpus. Bit-identical to the recompute form, so both
    carry the same oracle."""
    import tempfile

    from pyspark.sql import Window as W

    from aether_firebase_consumer_spark.operators.dedup import (
        id_partition,
    )
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    existing = emb.filter(F.col("vec_id") % 10 < 8)
    incoming = emb.filter(F.col("vec_id") % 10 >= 8)
    n_parts, idp_parts = 16, 8
    # index tables persist in production: build once per (process,
    # sf_dir), same convention as the text twin / broker caches
    cached = _EMB_PRUNED_IDX.get(sf_dir)
    if cached is None:
        root = tempfile.mkdtemp(prefix="emb_pruned_idx_")
        corp_t = ParquetUpsertTable(spark, root + "/corp", ["vec_id"],
                                    partition_col="idp")
        long_t = ParquetUpsertTable(spark, root + "/long",
                                    ["vec_id", "bi"],
                                    partition_col="bkp")
        corp_t.merge(existing.withColumn(
            "idp", id_partition(F.col("vec_id"), idp_parts)))
        long_t.merge(embedding_band_index_rows(
            existing, "vec_id", "embedding", _NEARDUP_BANDS, n_parts))
        cached = _EMB_PRUNED_IDX[sf_dir] = (corp_t, long_t)
    corp_t, long_t = cached
    pairs = embedding_probe_partitioned_pairs(
        long_t.read(), corp_t.read(), incoming, "vec_id", "embedding",
        _NEARDUP_BANDS, 0.35, n_parts=n_parts, idp_parts=idp_parts)
    w = W.partitionBy("new_id").orderBy(F.desc("cos_sim"), "old_id")
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("new_id", F.col("old_id").alias("dup_of"),
                    "cos_sim"))

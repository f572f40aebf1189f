"""Training-data curation queries over the documents/events tables —
the corpus-preparation layer of an LLM data pipeline (SURVEY.md §2.3
extension): deterministic dataset splits, sequence packing,
benchmark decontamination, skew profiling, and repetition scoring.

Every operator here is built for the 100 TB shape:

- Splits and shards derive from a content-independent portable hash of
  the key (one md5, same arithmetic as the MinHash pipeline in
  ``operators/dedup.py``), so assignment is reproducible across runs,
  engines, and cluster sizes — no ``rand()``, no driver state.
- Sequence packing windows are PARTITIONED by a hash shard: each shard
  packs independently, so there is no single-partition running-sum
  funnel; adding executors adds packing throughput.
- Decontamination joins explode only the (tiny) eval side into a
  broadcast, so the 100 TB train side is scanned once with no shuffle.
- Heavy-hitter profiling computes the corpus total as a 1-row
  aggregate broadcast-cross-joined back (never a whole-table window
  over an empty partition spec) and takes top-k via orderBy+limit
  (TakeOrdered — no global sort materialization).

The reference consumer has no corpus layer (it forwards documents
1-by-1, ``firebase/app/artifacts.py:302-327``); these queries are the
scale-path additions a training pipeline needs on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.dedup import portable_hash60
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table

#: DuckDB twin of ``operators.dedup.portable_hash60`` (one md5 →
#: 60-bit int → mod 2^31-1), parameterized over the hashed expression.
_H60 = "(('0x' || substr(md5({e}), 1, 15))::BIGINT % 2147483647)"


@register(
    "split_train_hash",
    oracle=f"""
    SELECT doc_id,
           {_H60.format(e="CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
           CASE WHEN {_H60.format(e="CAST(doc_id AS VARCHAR)")} % 100 < 90
                  THEN 'train'
                WHEN {_H60.format(e="CAST(doc_id AS VARCHAR)")} % 100 < 95
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: hash(doc_id) mod 100 →
    90/5/5 buckets. Content-independent and stable under reshuffling /
    re-ingestion, so the split can be recomputed identically on any
    cluster — the property ``rand()``-based splits lack. Single scan,
    no shuffle, no state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash60(F.col("doc_id").cast("string")) % 100
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
         .when(bucket < 95, "val")
         .otherwise("test").alias("split"),
    )


@register(
    "pack_sequences_greedy",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {_H60.format(e="CAST(doc_id AS VARCHAR)")} % 16 AS shard
      FROM documents
    ),
    w AS (
      SELECT shard, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    b AS (
      SELECT shard,
             CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
             n_tokens
      FROM w
    )
    SELECT shard, bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_packed,
           round(CAST(SUM(n_tokens) AS DOUBLE) / 512.0, 6) AS fill_frac
    FROM b GROUP BY shard, bin
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for a 512-token context window: docs are
    concatenated in doc_id order and cut into bins by the running token
    count (a doc belongs to the bin its FIRST token lands in).

    Scale shape: the running sum is windowed PER HASH SHARD (16 here;
    thousands at 100 TB), so packing is embarrassingly parallel — the
    alternative single-partition global cumsum would serialize the
    entire corpus through one task. One shuffle (hash-partition by
    shard), map-side partial agg for the bin stats."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window
    shard = portable_hash60(F.col("doc_id").cast("string")) % 16
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = t.select(
        "shard", "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512.0)
         .alias("bin"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_packed"),
        F.round(F.sum("n_tokens").cast("double") / 512.0, 6)
         .alias("fill_frac"),
    )


#: 4-gram shingles of a pre-split token array named ``toks`` (DuckDB).
_DUCK_4GRAMS = ("list_transform(range(1, len(toks) - 2), "
                "i -> array_to_string(toks[i:i+3], ' '))")


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    sh AS (
      SELECT doc_id,
             {_H60.format(e="unnest(list_distinct(" + _DUCK_4GRAMS + "))")}
               AS h
      FROM t WHERE len(toks) >= 4
    ),
    ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
    SELECT sh.doc_id, CAST(count(DISTINCT sh.h) AS BIGINT) AS n_shared
    FROM sh JOIN ev USING (h)
    WHERE sh.doc_id % 97 <> 0
    GROUP BY sh.doc_id
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any token
    4-gram with the eval set (here: every 97th doc stands in for a
    held-out benchmark), reporting how many distinct 4-grams leaked.

    Scale shape: only the EVAL side's shingle set is distinct-ed and
    broadcast (eval benchmarks are ~10^5 docs — MBs, not TBs); the
    train side streams through explode → broadcast hash join with NO
    shuffle of the corpus. The eval shingles are hashed to 60-bit ints
    before the join so the broadcast carries fixed-width keys, not
    n-gram strings."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.expr(
        "CASE WHEN size(toks) >= 4 THEN "
        "transform(sequence(1, size(toks) - 3), "
        "i -> concat_ws(' ', slice(toks, i, 4))) "
        "ELSE CAST(array() AS array<string>) END")
    sh = (docs.select("doc_id", toks.alias("toks"))
          .select("doc_id",
                  F.explode(F.array_distinct(grams)).alias("s"))
          .select("doc_id", portable_hash60(F.col("s")).alias("h")))
    ev = (sh.filter(F.col("doc_id") % 97 == 0)
          .select("h").distinct())
    return (sh.filter(F.col("doc_id") % 97 != 0)
            .join(F.broadcast(ev), "h")
            .groupBy("doc_id")
            .agg(F.count_distinct("h").alias("n_shared")))


@register(
    "profile_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
    SELECT user_id, cnt,
           round(CAST(cnt AS DOUBLE) / total, 6) AS share
    FROM c, tot
    ORDER BY cnt DESC, user_id
    LIMIT 10
    """,
)
def profile_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiling: the top-10 heaviest keys with their share of
    all events — the diagnostic you run BEFORE choosing a partition
    key or deciding a join needs salting (``operators/skew.py``).

    Scale shape: one partial+final count per key; the corpus total is
    a 1-row aggregate broadcast-cross-joined back (never a window over
    an empty partition spec, which would funnel every row through one
    task); top-10 via orderBy+limit → TakeOrdered, no global sort."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("total"))
    return (c.crossJoin(F.broadcast(tot))
            .select("user_id", "cnt",
                    F.round(F.col("cnt").cast("double") / F.col("total"), 6)
                     .alias("share"))
            .orderBy(F.desc("cnt"), "user_id")
            .limit(10))


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    g AS (
      SELECT doc_id, lang,
             list_transform(range(1, len(toks) - 1),
                            i -> array_to_string(toks[i:i+2], ' ')) AS g3
      FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, lang,
           CAST(len(g3) AS BIGINT) AS n_3grams,
           round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3),
                 6) AS dup_frac
    FROM g
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: the fraction of duplicate token
    3-grams per document (high → boilerplate / degenerate text, a
    standard pre-training quality filter). Single scan, zero shuffle;
    the n-gram build is a higher-order transform over the already-split
    token array, entirely JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    g3 = F.expr(
        "transform(sequence(1, size(toks) - 2), "
        "i -> concat_ws(' ', slice(toks, i, 3)))")
    return (docs.select("doc_id", "lang",
                        F.split("text", " ").alias("toks"))
            .filter(F.size("toks") >= 3)
            .select("doc_id", "lang", g3.alias("g3"))
            .select(
                "doc_id", "lang",
                F.size("g3").cast("bigint").alias("n_3grams"),
                F.round(
                    F.lit(1.0)
                    - F.size(F.array_distinct("g3")).cast("double")
                    / F.size("g3"), 6).alias("dup_frac")))


@register(
    "decontaminate_substring",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    probes AS (
      SELECT doc_id AS probe_doc,
             array_to_string(list_slice(w, 1, 12), ' ') AS snip
      FROM toks WHERE doc_id % 97 = 0 AND len(w) >= 12
    ),
    wins AS (
      SELECT doc_id, array_to_string(list_slice(w, i, i + 11), ' ') AS win
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(w) - 11)) AS i)
    )
    SELECT DISTINCT p.probe_doc, d.doc_id AS match_doc
    FROM probes p JOIN wins d ON d.win = p.snip
    """,
)
def decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERBATIM-quote decontamination — stricter than n-gram overlap
    (``decontaminate_ngram``): find every training document that
    contains an eval probe's opening 12 tokens as an exact contiguous
    token run (the plagiarism/copied-benchmark signal; every probe
    matches at least itself, which doubles as the query's self-test).

    Scale shape: the corpus side explodes each doc into its 12-token
    windows but ships only a 60-bit window hash into the join; the
    probe set (eval benchmarks — small by construction) hashes,
    distincts, and BROADCASTS, so the corpus is never shuffled; the
    only exchange is the final distinct over matched pairs. Hash
    collisions are killed by an exact string re-verify on the
    surviving (tiny) candidate set, so the window hash only has to be
    collision-rare, not collision-free."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    wins_expr = F.expr(
        "CASE WHEN size(toks) >= 12 THEN "
        "transform(sequence(1, size(toks) - 11), "
        "i -> concat_ws(' ', slice(toks, i, 12))) "
        "ELSE CAST(array() AS array<string>) END")
    t = docs.select("doc_id", toks.alias("toks"))
    probes = (t.filter((F.col("doc_id") % 97 == 0)
                       & (F.size("toks") >= 12))
              .select(F.col("doc_id").alias("probe_doc"),
                      F.concat_ws(" ", F.slice("toks", 1, 12)).alias("snip"))
              .withColumn("h", portable_hash60(F.col("snip"))))
    wins = (t.select("doc_id", F.explode(wins_expr).alias("win"))
            .select("doc_id", "win",
                    portable_hash60(F.col("win")).alias("h")))
    return (wins.join(F.broadcast(probes), "h")
            .filter(F.col("win") == F.col("snip"))  # collision verify
            .select("probe_doc", F.col("doc_id").alias("match_doc"))
            .distinct())

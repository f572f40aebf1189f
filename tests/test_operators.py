"""Unit tests: filter (O3), mask (O4), routing (O6), change detection
semantics on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.filtering import FilterConfig, apply_filter
from aether_firebase_consumer_spark.operators.masking import MaskConfig, apply_mask
from aether_firebase_consumer_spark.operators.routing import Subscription, route_topics


def test_filter_pass_values(spark):
    df = spark.createDataFrame(
        [("operational", 1), ("closed", 2), (None, 3)], ["status", "id"])
    cfg = FilterConfig("status", ["operational"])
    got = [r["id"] for r in apply_filter(df, cfg).collect()]
    assert got == [1]


def test_filter_not_required_passes_everything(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["status", "id"])
    cfg = FilterConfig("status", ["a"], requires_approval=False)
    assert apply_filter(df, cfg).count() == 2


def test_filter_json_payload(spark):
    df = spark.createDataFrame(
        [('{"operational_status": "operational"}', 1),
         ('{"operational_status": "closed"}', 2)], ["payload", "id"])
    cfg = FilterConfig("operational_status", ["operational"])
    got = [r["id"] for r in
           apply_filter(df, cfg, json_payload_col="payload").collect()]
    assert got == [1]


def test_mask_drops_above_emit_level(spark):
    # mirror of the annotated-schema fixture: beds/staff private,
    # insurance public (firebase/tests/__init__.py:954,965,976,1008)
    df = spark.createDataFrame(
        [(1, 5, 2, ["nhis"])], ["id", "beds", "staff_doctors", "insurance"])
    cls = {"beds": "private", "staff_doctors": "private",
           "insurance": "public"}
    cfg = MaskConfig(["public", "private"], "public")
    out = apply_mask(df, cfg, cls)
    assert out.columns == ["id", "insurance"]
    # emit at private → everything emitted
    cfg_all = MaskConfig(["public", "private"], "private")
    assert apply_mask(df, cfg_all, cls).columns == df.columns


def test_mask_fails_closed(spark):
    import pytest as _pytest
    df = spark.createDataFrame(
        [(1, 5, 2)], ["id", "beds", "staff_doctors"])
    # typo'd emit level → refuse to emit anything (would otherwise leak all)
    with _pytest.raises(ValueError, match="fail-closed"):
        apply_mask(df, MaskConfig(["public", "private"], "publicc"),
                   {"beds": "private"})
    # classification not in the ordered list → column dropped, not emitted
    out = apply_mask(df, MaskConfig(["public", "private"], "private"),
                     {"beds": "top-secret", "staff_doctors": "private"})
    assert out.columns == ["id", "staff_doctors"]


def test_route_first_match_by_sorted_id(spark):
    df = spark.createDataFrame(
        [("t1.clicks",), ("t1.views",), ("t2.other",)], ["topic"])
    subs = [
        Subscription(id="b-late", topic_pattern="c*",
                     target_path="late/c/{topic}"),
        Subscription(id="a-first", topic_pattern="clicks",
                     target_path="first/x/{topic}"),
    ]
    got = {r["topic"]: r["target_path"]
           for r in route_topics(df, "topic", subs, "t1").collect()}
    assert got["t1.clicks"] == "first/x/clicks"   # sorted id wins
    assert got["t1.views"] is None                 # no pattern matches
    assert got["t2.other"] is None                 # other tenant

def test_masked_columns_pruned_from_scan(spark, tmp_path):
    # Catalyst must push the masking projection into the parquet scan
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "x", "secret")], ["id", "a", "b"]) \
         .write.parquet(path)
    df = spark.read.parquet(path)
    out = apply_mask(df, MaskConfig(["public", "private"], "public"),
                     {"b": "private"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "secret" not in plan
    assert "b" not in out.columns


def test_salted_join_equals_plain_join(spark):
    """Salting must be result-invariant: same rows as the plain join,
    for inner and left, including unmatched-left preservation."""
    from aether_firebase_consumer_spark.operators.skew import salted_join
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_quantity")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .select("o_orderkey", "o_orderpriority") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    for how in ("inner", "left"):
        plain = li.join(o, ["l_orderkey"], how)
        salted = salted_join(li, o, ["l_orderkey"], how, salt=4)
        assert salted.columns == plain.columns
        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_ann_results_are_correct_cosines_and_ordered(spark):
    """LSH and IVF ANN: every returned neighbor's cos_sim must equal the
    exact brute-force cosine for that pair, and per-query results must
    be ordered desc — i.e. ANN only *prunes candidates*, it never
    changes the scoring math."""
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    _load_all()
    sf = "/root/testdata/sf0.001"
    brute = {}
    from aether_firebase_consumer_spark.functions.vectors import cosine
    from pyspark.sql import functions as F2
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.filter(F2.col("vec_id") < 5).select(
        F2.col("vec_id").alias("qid"), F2.col("embedding").alias("q_emb"))
    exact = (emb.crossJoin(q).filter(F2.col("vec_id") != F2.col("qid"))
             .select("qid", "vec_id",
                     cosine(F2.col("embedding"), F2.col("q_emb"))
                     .alias("cos")))
    for r in exact.collect():
        brute[(r["qid"], r["vec_id"])] = r["cos"]

    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        rows = REGISTRY[name].builder(spark, sf).collect()
        assert rows, name
        per_query = {}
        for r in rows:
            key = (r["query_id"], r["neighbor_id"])
            assert abs(brute[key] - r["cos_sim"]) < 1e-12, (name, key)
            per_query.setdefault(r["query_id"], []).append(r["cos_sim"])
        for qid, sims in per_query.items():
            assert sims == sorted(sims, reverse=True), (name, qid)
            assert len(sims) <= 5


def test_ngram_jaccard_df_cap_bounds_fanout(spark):
    """One ubiquitous shingle shared by k docs creates k(k-1)/2 join
    pairs uncapped; with a document-frequency cap it is cut as a
    stop-shingle BEFORE the self-join, so only genuinely similar pairs
    (sharing rare shingles) survive — sub-quadratic join input."""
    from aether_firebase_consumer_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    shared = "the quick fox"          # one 3-shingle in every doc
    rows = [(i, f"{shared} filler{i}a filler{i}b filler{i}c")
            for i in range(20)]
    rows += [(100, "alpha beta gamma delta epsilon"),
             (101, "alpha beta gamma delta epsilon")]  # true near-dup
    df = spark.createDataFrame(rows, "doc_id int, text string")

    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0)
    assert uncapped.count() == 20 * 19 // 2 + 1  # quadratic blow-up

    capped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0,
                                 max_doc_freq=5)
    got = [(r["id_a"], r["id_b"], r["jaccard"]) for r in capped.collect()]
    assert got == [(100, 101, 1.0)]  # stop-shingle pairs gone


def test_ann_recall_floor_vs_bruteforce(spark):
    """ANN quality, not just shape: the banded-LSH and nprobe=2 IVF
    probes must recover a floor fraction of the TRUE brute-force top-5
    (the fixture embeddings are weakly clustered — cos ~0.3 neighbors —
    so these floors are what the math supports: single-bucket LSH
    measured 0.0 recall here before the OR-construction, IVF nprobe=1
    measured 0.32 before the second probe)."""
    from pyspark.sql.window import Window as W
    from aether_firebase_consumer_spark.functions.vectors import cosine
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    from aether_firebase_consumer_spark.tables import load_table
    _load_all()
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"))
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    bf = (cand.crossJoin(F.broadcast(q))
          .where(F.col("neighbor_id") != F.col("query_id"))
          .select("query_id", "neighbor_id",
                  cosine(F.col("embedding"), F.col("q_emb"))
                  .alias("cos_sim"))
          .withColumn("rn", F.row_number().over(w)).filter("rn <= 5"))
    truth: dict = {}
    for r in bf.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def mean_recall(name):
        got: dict = {}
        for r in REGISTRY[name].builder(spark, sf).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(truth[k] & got.get(k, set())) / len(truth[k])
                   for k in truth) / len(truth)

    assert mean_recall("similarity_ann_lsh") >= 0.10
    assert mean_recall("similarity_ann_ivf") >= 0.40


def test_simhash_band_recall_guarantee_and_floor(spark):
    """Executable version of the banding pigeonhole argument (the
    round-4 widening to 32-bit/4×8-bit bands): on synthetic signatures
    with EXACT controlled bit-flips, every pair within hamming<=3 must
    appear in the banded candidates (recall 1.0 — guaranteed, 3 flips
    cannot break all 4 bands), and pairs at hamming 4..6 are recovered
    above a measured floor (a 4-flip miss needs one flip in every
    band: P ~ 8^4/C(32,4) ~ 0.11 miss, and higher radii degrade
    gradually)."""
    import random

    from aether_firebase_consumer_spark.operators.dedup import (
        simhash_band_pairs,
    )
    rng = random.Random(7)
    rows, truth = [], {}   # truth: (base_id, pert_id) -> hamming
    next_id = 0
    for base in range(40):
        sig = rng.getrandbits(32)
        base_id = next_id
        rows.append((base_id, sig))
        next_id += 1
        for k in range(0, 7):
            flipped = sig
            for bit in rng.sample(range(32), k):
                flipped ^= 1 << bit
            rows.append((next_id, flipped))
            truth[(base_id, next_id)] = k
            next_id += 1
    sigs = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {(r["id_a"], r["id_b"])
           for r in simhash_band_pairs(sigs, "doc_id", "sig").collect()}

    within3 = {p for p, h in truth.items() if h <= 3}
    assert within3, "fixture must produce hamming<=3 pairs"
    missed = within3 - got
    assert not missed, f"pigeonhole recall broken: {sorted(missed)[:5]}"

    mid = {p for p, h in truth.items() if 4 <= h <= 6}
    recall_mid = len(mid & got) / len(mid)
    assert recall_mid >= 0.5, recall_mid


def test_minhash_estimates_true_jaccard(spark):
    """MinHash quality, not just determinism: the fraction of agreeing
    signature components estimates the true shingle-set Jaccard with
    E[|err|] ~ sqrt(J(1-J)/k). With k=8 the per-pair bound is loose,
    so assert the MEAN absolute error over many pairs (law of large
    numbers brings it near the per-pair sigma ~0.17) plus a sane
    per-pair cap."""
    from aether_firebase_consumer_spark.functions.text import shingles
    from aether_firebase_consumer_spark.operators.dedup import (
        minhash_signature,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(120))
    sh = shingles(F.col("text"))
    rows = docs.select(
        "doc_id", F.array_distinct(sh).alias("sh"),
        *minhash_signature(sh)).collect()
    import itertools
    errs = []
    for a, b in itertools.islice(itertools.combinations(rows, 2), 2000):
        sa, sb = set(a["sh"]), set(b["sh"])
        if not sa or not sb:
            continue
        true_j = len(sa & sb) / len(sa | sb)
        est = sum(a[f"mh{i}"] == b[f"mh{i}"] for i in range(8)) / 8.0
        errs.append(abs(est - true_j))
    assert len(errs) > 500
    mean_err = sum(errs) / len(errs)
    assert mean_err < 0.2, mean_err
    assert max(errs) <= 1.0


def test_minhash_components_are_distinct_permutations(spark):
    """Regression for the transform-lambda arity bug: a 2-arg lambda
    makes Spark bind the ELEMENT INDEX over the permutation index,
    silently producing k identical signature components (which turns
    every LSH band into the same key — no bucketing at all). The k
    components of one document must (generically) differ."""
    from aether_firebase_consumer_spark.functions.text import shingles
    from aether_firebase_consumer_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_xx,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(20))
    sh = shingles(F.col("text"))
    for sig_fn in (minhash_signature, minhash_signature_xx):
        rows = docs.select("doc_id", *sig_fn(sh)).collect()
        distinct_counts = [len({r[f"mh{i}"] for i in range(8)})
                           for r in rows]
        # all-identical components = the bug; generically ~8 distinct
        assert sum(c > 1 for c in distinct_counts) >= len(rows) * 0.9


def test_shingles_short_docs_do_not_crash(spark):
    """A doc shorter than the shingle width must yield an EMPTY
    shingle set (matching the SQL oracles), not abort the job:
    Spark's sequence(1, 0) is the DESCENDING [1, 0] and slice(_, 0, k)
    throws (review finding)."""
    from aether_firebase_consumer_spark.functions.text import shingles
    from aether_firebase_consumer_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string")
    got = {r["doc_id"]: list(r["sh"]) for r in
           df.select("doc_id", shingles("text").alias("sh")).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["a b c"]
    assert got[4] == ["a b c", "b c d"]
    # the full LSH pipeline also survives short docs (filtered out)
    pairs = lsh_candidate_pairs(df, "doc_id", "text").collect()
    assert isinstance(pairs, list)


def test_connected_components_raises_on_non_convergence(spark):
    """A label-propagation chain longer than max_iter must RAISE, not
    silently emit wrong component labels (review finding)."""
    import pytest as _pytest
    from aether_firebase_consumer_spark.operators.dedup import (
        connected_components,
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long")
    # converges fine with default iterations
    comp = {r["id"]: r["component"]
            for r in connected_components(chain).collect()}
    assert set(comp.values()) == {0}
    # but a too-small cap must be LOUD
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)


def test_lsh_bands_divisibility_guard(spark):
    import pytest as _pytest
    from aether_firebase_consumer_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(df, "doc_id", "text", k=8, bands=3)


def test_kmeans_empty_embeddings_returns_empty(spark, tmp_path):
    """Zero-row embeddings: empty result (the oracle's behavior), not
    an IndexError at plan build (review finding)."""
    from aether_firebase_consumer_spark.plans.clustering_queries import (
        embedding_kmeans,
    )
    import os
    d = str(tmp_path / "sfE")
    os.makedirs(d)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(0).write.parquet(os.path.join(d, "embeddings.parquet"))
    out = embedding_kmeans(spark, d)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster"]


def test_lsh_fast_variant_recall_and_precision(spark):
    """The xxhash64 production variant (no SQL oracle possible) is
    pinned against brute-force truth: on the sf0.001 fixture both the
    portable and fast banding find EVERY true near-dup pair (recall
    1.0), and exact-Jaccard verification makes precision exact by
    construction (asserted anyway)."""
    from aether_firebase_consumer_spark.functions.text import shingles
    from aether_firebase_consumer_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_xx,
    )
    from aether_firebase_consumer_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = docs.select(F.col("doc_id").alias("id"),
                     shingles(F.col("text"), 3).alias("sh")) \
        .filter(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    truth = {(r.id_a, r.id_b) for r in
             (a.join(b, F.col("id_a") < F.col("id_b"))
              .withColumn("j",
                          F.size(F.array_intersect("sh_a", "sh_b"))
                          .cast("double")
                          / F.size(F.array_union("sh_a", "sh_b")))
              .filter(F.col("j") >= 0.5).select("id_a", "id_b")
              .collect())}
    assert truth  # fixture contains genuine near-dups
    for fn in (lsh_candidate_pairs, lsh_candidate_pairs_xx):
        found = {(r.id_a, r.id_b) for r in
                 fn(docs, "doc_id", "text")
                 .filter(F.col("jaccard") >= 0.5).collect()}
        assert found == truth, fn.__name__


def test_global_running_agg_matches_single_sweep(spark):
    """The two-phase distributed prefix scan must equal the naive
    single-task global window for sum, min, and max — including
    bucket-boundary carries and the NULL first-bucket carry."""
    from pyspark.sql import Window as W

    from aether_firebase_consumer_spark.operators.prefix import (
        global_running_agg,
        global_running_sum,
    )

    rows = [(i, (i * 7919) % 100, ((i * 31) % 17) - 8) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, ord bigint, v bigint") \
        .withColumn("vd", F.col("v").cast("decimal(18,2)"))
    naive_w = W.orderBy("ord", "id").rowsBetween(W.unboundedPreceding,
                                                 W.currentRow)
    bucket = F.floor(F.col("ord") / 10)

    naive = {r.id: float(r.s) for r in
             df.withColumn("s", F.sum("vd").over(naive_w)).collect()}
    two = {r.id: float(r.running) for r in
           global_running_sum(df, ["ord", "id"], F.col("vd"),
                              bucket).collect()}
    assert two == naive

    for agg, fn in (("min", F.min), ("max", F.max)):
        naive = {r.id: r.s for r in
                 df.withColumn("s", fn("v").over(naive_w)).collect()}
        two = {r.id: r.running for r in
               global_running_agg(df, ["ord", "id"], F.col("v"),
                                  bucket, agg=agg).collect()}
        assert two == naive, agg


def test_ngram_containment_asymmetric(spark):
    """Containment catches the pasted-quote case Jaccard misses: a
    10-token doc embedded verbatim in a 100-token doc has containment
    ~1 in the contained->container direction only, while its Jaccard
    stays far below any dedup threshold."""
    from aether_firebase_consumer_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = " ".join(f"q{i}" for i in range(10))
    long_ = " ".join(f"w{i}" for i in range(60)) + " " + short + " " \
        + " ".join(f"z{i}" for i in range(30))
    other = " ".join(f"o{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)],
        "doc_id bigint, text string")

    cont = {(r.contained_id, r.container_id): r.containment
            for r in ngram_containment_pairs(
                df, "doc_id", "text", threshold=0.8).collect()}
    assert set(cont) == {(1, 2)}       # directed: only short-in-long
    assert cont[(1, 2)] == 1.0         # every shingle of 1 is in 2

    jac = ngram_jaccard_pairs(df, "doc_id", "text",
                              threshold=0.5).collect()
    assert jac == []                   # Jaccard never sees it


def test_centroid_classifier_learns_real_signal(spark):
    """The relational centroid classifier reaches 100% held-out
    accuracy when labels actually drive the token distribution —
    proving the train/apply machinery learns (the registered query's
    fixture labels are token-independent by construction, so its
    oracle gate pins exactness, not accuracy)."""
    from pyspark.sql import functions as F

    from aether_firebase_consumer_spark.plans.text_queries import (
        centroid_classify,
    )

    vocab = {"red": "crimson scarlet ruby cherry brick",
             "blue": "azure navy cobalt sapphire teal",
             "green": "olive lime forest jade moss"}
    rows = []
    i = 0
    for label, words in vocab.items():
        ws = words.split()
        for k in range(20):
            # distinct per-doc mixtures of the label's vocabulary,
            # plus shared filler words common to every label
            body = " ".join(ws[(k + j) % len(ws)] for j in range(12))
            rows.append((i, label, body + " the a of and"))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                       "text string")
    out = centroid_classify(docs, "doc_id", "lang", "text",
                            F.col("doc_id") % 4 != 0).collect()
    assert len(out) == 15                     # one quarter held out
    assert all(r.correct == 1 for r in out)
    assert {r.true_lang for r in out} == set(vocab)


def test_quality_linear_probe_recovers_planted_relation(spark, tmp_path):
    """The trained linear probe is an EXACT least-squares solve: on a
    corpus where n_chars is an exact linear function of the features
    (every 1-char word + single spaces => length = 2*tokens - 1,
    uniqueness varying independently), the fitted weights reproduce
    the relation and every prediction equals the actual value."""
    from aether_firebase_consumer_spark.plans.quality_queries import (
        quality_linear_probe_trained,
    )

    rows = []
    for i in range(40):
        tok = 3 + (i % 7)
        if i % 2:
            words = [chr(ord("a") + (j % 3)) for j in range(tok)]
        else:
            words = [chr(ord("a") + (j % min(tok, 9)))
                     for j in range(tok)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.write.parquet(str(sf / "documents.parquet"))

    got = quality_linear_probe_trained(spark, str(sf)).collect()
    assert len(got) == 40  # top-100 of 40 docs = all of them
    for r in got:
        assert r.pred_chars == r.actual_chars, r

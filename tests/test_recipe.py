"""Recipe guard + crash-safe migration markers (round 9,
streaming/recipe.py) and the shared idp-corpus guard
(streaming/pruning.py)."""

from __future__ import annotations

import json
import os

import pytest

from aether_firebase_consumer_spark.streaming.recipe import (
    model_fingerprint,
    recipe_begin,
    recipe_commit,
    recipe_guard,
)


def test_guard_records_then_validates(tmp_path):
    p = str(tmp_path / "t")
    recipe_guard(p, {"kind": "x", "n": 4})
    recipe_guard(p, {"kind": "x", "n": 4})  # identical: fine
    with pytest.raises(ValueError, match="recipe mismatch.*n"):
        recipe_guard(p, {"kind": "x", "n": 8})
    # missing/extra keys are mismatches too (derivation drift)
    with pytest.raises(ValueError, match="recipe mismatch.*m"):
        recipe_guard(p, {"kind": "x", "n": 4, "m": 1})


def test_interrupted_migration_blocks_every_attach(tmp_path):
    """A migration that began but never committed leaves the table in
    an unknown parameter generation: attaching with EITHER recipe must
    fail until the migration re-runs to completion."""
    p = str(tmp_path / "t")
    recipe_guard(p, {"kind": "x", "n": 4})
    recipe_begin(p, {"kind": "x", "n": 8})  # crash here →
    with pytest.raises(ValueError, match="interrupted index migration"):
        recipe_guard(p, {"kind": "x", "n": 4})
    with pytest.raises(ValueError, match="interrupted index migration"):
        recipe_guard(p, {"kind": "x", "n": 8})
    recipe_commit(p)  # migration re-ran to completion
    recipe_guard(p, {"kind": "x", "n": 8})
    with pytest.raises(ValueError, match="recipe mismatch"):
        recipe_guard(p, {"kind": "x", "n": 4})
    with open(os.path.join(p, "_RECIPE.json")) as fh:
        assert json.load(fh) == {"kind": "x", "n": 8}
    assert not os.path.exists(os.path.join(p, "_RECIPE.json.next"))


def test_model_fingerprint_sensitivity():
    a = [[1.0, 2.0], [3.0, 4.0]]
    b = [[1.0, 2.0], [3.0, 4.000000001]]
    assert model_fingerprint(a) != model_fingerprint(b)
    assert model_fingerprint(a) == model_fingerprint(
        [[1.0, 2.0], [3.0, 4.0]])
    assert model_fingerprint(a, b) != model_fingerprint(b, a)


def test_idp_corpus_guard_catches_modulus_drift(spark, tmp_path):
    """The corpus-level guard: an idp-partitioned corpus records its
    modulus even when NO index table exists, so a restart at a
    different idp_parts fails loudly instead of silently gating
    updates against their own prior version."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )
    from aether_firebase_consumer_spark.streaming.dedup_ingest import (
        DedupIngestJob,
    )

    corpus = ParquetUpsertTable(spark, str(tmp_path / "c"), ["doc_id"],
                                partition_col="idp")
    DedupIngestJob(spark, corpus, idp_parts=8)
    DedupIngestJob(spark, corpus, idp_parts=8)  # same modulus: fine
    with pytest.raises(ValueError, match="recipe mismatch.*idp_parts"):
        DedupIngestJob(spark, corpus, idp_parts=4)

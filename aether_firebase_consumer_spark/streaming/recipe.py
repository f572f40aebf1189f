"""Index-recipe guard (round 9): persisted index tables are only
correct to probe with the EXACT derivation parameters they were
written with — a cp-partitioned inverted file probed with a different
``n_parts`` silently admits the wrong partitions (missed candidates,
wrong answers, no error), and a cell index probed against different
centroids mis-assigns every query. These are the two silent footguns
of every pruned-index job in this repo.

The guard closes them: the first writer records its recipe (moduli,
partition counts, a fingerprint of the model artifacts) as
``_RECIPE.json`` at the table ROOT; every later attach compares and
fails loudly on any mismatch. Maintenance operations that legitimately
change the recipe (``SemanticIngestJob.reshard``,
``AnnIndexJob.rebuild``) update the file atomically in the same step
that rewrites the table.

The file sits beside the version directories, not inside them —
it describes the table's DERIVATION, which (unlike the data) must
never differ between versions except through an explicit rebuild.
"""

from __future__ import annotations

import hashlib
import json
import os


def model_fingerprint(*artifacts) -> str:
    """Deterministic fingerprint of model artifacts (centroid
    matrices, PQ codebooks, hyperplane lists): md5 over the exact
    float reprs, so any re-derivation that changes a single value —
    or the artifact order — changes the fingerprint."""
    h = hashlib.md5()
    for art in artifacts:
        h.update(repr(art).encode())
    return h.hexdigest()[:16]


def _recipe_path(table_path: str) -> str:
    return os.path.join(table_path, "_RECIPE.json")


def _write_json(path: str, recipe: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(recipe, fh, sort_keys=True)
    os.replace(tmp, path)


def recipe_guard(table_path: str, recipe: dict, update: bool = False):
    """Record or validate ``recipe`` for the index table at
    ``table_path``.

    First call (no ``_RECIPE.json``) writes it. Later calls compare
    key-by-key and raise ``ValueError`` naming every mismatched key —
    the error a silently-wrong probe never gives. ``update=True``
    rewrites the file (atomic replace) — prefer the
    :func:`recipe_begin` / :func:`recipe_commit` pair for migrations
    that also rewrite the table, which is crash-safe in BOTH windows.

    A leftover ``_RECIPE.json.next`` (from a migration that crashed
    between begin and commit) makes every attach fail loudly until the
    migration is re-run or the marker removed: in that state the table
    may hold either generation of parameters, so NO recipe can be
    trusted to match it."""
    path = _recipe_path(table_path)
    os.makedirs(table_path, exist_ok=True)
    if os.path.exists(path + ".next"):
        raise ValueError(
            f"interrupted index migration at {table_path}: a recipe "
            "migration began (_RECIPE.json.next exists) but never "
            "committed, so the table may hold either parameter "
            "generation — re-run the reshard/rebuild to completion "
            "(it is idempotent), or delete _RECIPE.json.next if the "
            "table is known to match the committed recipe")
    if update or not os.path.exists(path):
        _write_json(path, recipe)
        return
    with open(path) as fh:
        stored = json.load(fh)
    bad = sorted(set(stored) | set(recipe))
    bad = [k for k in bad if stored.get(k) != recipe.get(k)]
    if bad:
        detail = ", ".join(
            f"{k}: table={stored.get(k)!r} vs job={recipe.get(k)!r}"
            for k in bad)
        raise ValueError(
            f"index recipe mismatch at {table_path} ({detail}) — "
            "probing with different derivation parameters than the "
            "table was written with silently returns WRONG results; "
            "attach a job with the recorded parameters, or rebuild "
            "the index (reshard/rebuild) to migrate it")


def recipe_begin(table_path: str, recipe: dict) -> None:
    """Phase 1 of a crash-safe recipe migration: persist the NEW
    recipe as ``_RECIPE.json.next`` before touching the table. If the
    rebuild crashes in either window (before or after the table
    rewrite), the leftover marker makes every subsequent attach fail
    loudly instead of validating a recipe the table may not match —
    re-running the migration to completion clears it."""
    _write_json(_recipe_path(table_path) + ".next", recipe)


def recipe_commit(table_path: str) -> None:
    """Phase 2: the table rewrite succeeded — atomically promote the
    staged recipe."""
    path = _recipe_path(table_path)
    os.replace(path + ".next", path)

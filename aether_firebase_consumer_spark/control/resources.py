"""Resource documents + validation (reference O17).

The reference's control plane is JSON documents validated against JSON
Schema draft-07 (``firebase/app/fixtures/schemas.py:21-358``) with an
imperative secondary pass for target-path legality
(``firebase/app/artifacts.py:159-172``), surfaced as
``validate`` / ``validate_pretty`` / ``describe`` / ``get_schema``
(``README.md:37-58``). Resources: ``SinkInstance`` (stands in for the
Firebase connection doc), ``Subscription``, ``Job``.

Same shape here, minus the Firebase-proprietary fields: schemas are
draft-07, validated with ``jsonschema``; ``validate_pretty`` merges
schema errors with the secondary path check exactly like
``_validate_pretty`` (``firebase/app/artifacts.py:142-157``).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Any
from urllib.parse import quote, unquote

import jsonschema

from aether_firebase_consumer_spark.operators.routing import validate_path

SINK_INSTANCE_SCHEMA: dict = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["id", "name", "url"],
    "properties": {
        "id": {"type": "string"},
        "name": {"type": "string"},
        "url": {"type": "string"},
        "credential": {"type": "object"},
        "hash_path": {"type": "string", "default": "_aether/entityHash"},
    },
}

SUBSCRIPTION_SCHEMA: dict = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["id", "name", "topic_pattern"],
    "properties": {
        "id": {"type": "string"},
        "name": {"type": "string"},
        "topic_pattern": {"type": "string"},
        "topic_options": {
            "type": "object",
            "properties": {
                "masking_annotation": {"type": "string"},
                "masking_levels": {"type": "array"},
                "masking_emit_level": {"type": "string"},
                "filter_required": {"type": "boolean"},
                "filter_field_path": {"type": "string"},
                "filter_pass_values": {"type": "array"},
            },
        },
        "fb_options": {
            "type": "object",
            "properties": {
                "target_path": {"type": "string"},
                "sync_mode": {"type": "string",
                              "enum": ["forward", "sync", "consume", "none"]},
            },
        },
    },
}

JOB_SCHEMA: dict = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["id", "name", "firebase", "subscription"],
    "properties": {
        "id": {"type": "string"},
        "name": {"type": "string"},
        "firebase": {"type": "string"},
        "subscription": {"type": "array", "items": {"type": "string"}},
    },
}

SCHEMAS = {
    "sink_instance": SINK_INSTANCE_SCHEMA,
    "subscription": SUBSCRIPTION_SCHEMA,
    "job": JOB_SCHEMA,
}


def _secondary_errors(resource_type: str, definition: dict) -> list[str]:
    """Imperative checks beyond JSON Schema — the target-path rules
    (``firebase/app/artifacts.py:159-172``)."""
    if resource_type != "subscription":
        return []
    path = (definition.get("fb_options") or {}).get("target_path")
    if path is None:
        return []
    return validate_path(path)


def validate(resource_type: str, definition: dict) -> bool:
    return not validate_pretty(resource_type, definition)["validation_errors"]


def validate_pretty(resource_type: str, definition: dict) -> dict[str, Any]:
    """``{'valid': bool, 'validation_errors': [...]}`` merging schema and
    secondary errors (mirrors ``_validate_pretty``,
    ``firebase/app/artifacts.py:142-157``)."""
    errors: list[str] = []
    validator = jsonschema.Draft7Validator(SCHEMAS[resource_type])
    errors.extend(e.message for e in validator.iter_errors(definition))
    errors.extend(_secondary_errors(resource_type, definition))
    return {"valid": not errors, "validation_errors": errors}


def get_schema(resource_type: str) -> dict:
    return SCHEMAS[resource_type]


def describe() -> list[dict]:
    """Reflective description of the resource surface
    (``README.md:37-58`` describe semantics)."""
    return [{"resource_type": rt, "required": s.get("required", [])}
            for rt, s in SCHEMAS.items()]


class ResourceRegistry:
    """Resource store keyed by (tenant, type, id) — the Redis role in
    the reference (``firebase/tests/__init__.py:145-150``). Multi-tenant
    isolation = key prefix, same as tenant-prefixed topics.

    Pass ``path`` to make the store DURABLE: every resource persists as
    one JSON file at ``{path}/{tenant}/{type}/{id}.json`` (written
    atomically via tmp + ``os.replace``), and a new registry constructed
    on the same path reloads everything — the reference's
    resume-on-boot contract (its SDK reloads Redis-persisted resources
    at startup, ``firebase/app/consumer.py:9-18``). A shared filesystem
    (or an object store mounted as one) makes this work on a cluster;
    an internal lock serializes the REST server's threads.
    Without ``path`` the store is memory-only (tests, ephemera)."""

    def __init__(self, path: str | None = None) -> None:
        self._store: dict[tuple[str, str, str], dict] = {}
        self._path = path
        # the REST surface serves this from a ThreadingHTTPServer, so
        # mutation and iteration race without a lock (and concurrent
        # persists of one id would race on a shared tmp filename)
        self._lock = threading.RLock()
        if path:
            os.makedirs(path, exist_ok=True)
            self._load()

    # -- durability -------------------------------------------------------
    def _file(self, tenant: str, resource_type: str, rid: str) -> str:
        # quote() keeps arbitrary tenant/resource ids filesystem-safe
        return os.path.join(self._path, quote(tenant, safe=""),
                            resource_type, quote(rid, safe="") + ".json")

    def _load(self) -> None:
        for tq in sorted(os.listdir(self._path)):
            tdir = os.path.join(self._path, tq)
            if not os.path.isdir(tdir):
                continue
            for rt in sorted(os.listdir(tdir)):
                rdir = os.path.join(tdir, rt)
                if not os.path.isdir(rdir):
                    continue
                for fn in sorted(os.listdir(rdir)):
                    if not fn.endswith(".json"):
                        continue
                    with open(os.path.join(rdir, fn)) as fh:
                        definition = json.load(fh)
                    self._store[(unquote(tq), rt,
                                 unquote(fn[:-5]))] = definition

    def _persist(self, tenant: str, resource_type: str, rid: str,
                 definition: dict) -> None:
        target = self._file(tenant, resource_type, rid)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        # unique tmp per write: two threads persisting the same id must
        # not interleave into one tmp file
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(target),
                                   suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(definition, fh)
        os.replace(tmp, target)  # atomic on POSIX

    # -- CRUD -------------------------------------------------------------
    def add(self, tenant: str, resource_type: str, definition: dict) -> dict:
        report = validate_pretty(resource_type, definition)
        if not report["valid"]:
            raise ValueError(f"invalid {resource_type}: "
                             f"{report['validation_errors']}")
        with self._lock:
            self._store[(tenant, resource_type, definition["id"])] = definition
            if self._path:
                self._persist(tenant, resource_type, definition["id"],
                              definition)
        return definition

    def get(self, tenant: str, resource_type: str, rid: str) -> dict | None:
        with self._lock:
            return self._store.get((tenant, resource_type, rid))

    def list(self, tenant: str, resource_type: str) -> list[str]:
        with self._lock:
            return sorted(rid for (t, rt, rid) in self._store
                          if t == tenant and rt == resource_type)

    def tenants(self) -> list[str]:
        with self._lock:
            return sorted({t for (t, _, _) in self._store})

    def delete(self, tenant: str, resource_type: str, rid: str) -> bool:
        with self._lock:
            found = self._store.pop(
                (tenant, resource_type, rid), None) is not None
            if found and self._path:
                try:
                    os.remove(self._file(tenant, resource_type, rid))
                except FileNotFoundError:
                    pass
        return found

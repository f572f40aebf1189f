"""REST control plane (reference E2/E3 entry points).

The reference exposes resource CRUD + job introspection over HTTP with
tenant scoping via the ``x-oauth-realm`` header (``README.md:17,136``;
``docker-compose.yml:12``; client ``firebase/tests/__init__.py:130-142``).
Same surface here on the stdlib ``ThreadingHTTPServer`` — no web
framework in the image, and the control plane is I/O-trivial (the data
plane is Spark's).

Routes (tenant from ``x-oauth-realm``, default ``_public``):

    GET    /describe
    GET    /{rtype}/get_schema
    POST   /{rtype}/validate_pretty      body: definition JSON
    POST   /{rtype}/add                  body: definition JSON
    GET    /{rtype}/list
    GET    /{rtype}/get?id=R
    DELETE /{rtype}/delete?id=R          (POST also accepted)
    GET    /job/get_status?id=J
    POST   /job/pause?id=J  /job/resume?id=J
    GET    /job/get_logs?id=J
    GET    /job/list_topics

Errors mirror the reference's ``ConsumerHttpException`` wrapping
(``firebase/app/artifacts.py:418-419``): JSON body + 4xx/5xx status.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from aether_firebase_consumer_spark.control import resources as R
from aether_firebase_consumer_spark.control.jobs import JobManager

TENANT_HEADER = "x-oauth-realm"

# Allowed HTTP methods per action — a request with a known path but the
# wrong verb is 405 (with the allowed list), never silently dispatched.
_RESOURCE_METHODS = {
    "get_schema": ("GET",),
    "validate_pretty": ("POST",),
    "add": ("POST",),
    "list": ("GET",),
    "get": ("GET",),
    "delete": ("DELETE", "POST"),
}
_JOB_METHODS = {
    "get_status": ("GET",),
    "get_logs": ("GET",),
    "get_metrics": ("GET",),
    "list_topics": ("GET",),
    "consumer_lag": ("GET",),
    "pause": ("POST",),
    "resume": ("POST",),
}


def _method_not_allowed(method: str, allowed: tuple[str, ...]):
    return 405, {"error": f"method {method} not allowed",
                 "allowed": list(allowed)}


class ControlApi:
    """Binds a ResourceRegistry + JobManager to an HTTP server."""

    def __init__(self, registry: R.ResourceRegistry, jobs: JobManager,
                 broker_topics: list[str] | None = None,
                 metrics=None, bootstrap: str | None = None):
        self.registry = registry
        self.jobs = jobs
        self.broker_topics = broker_topics or []
        #: when set, /job/list_topics asks the LIVE broker (one wire
        #: Metadata round trip) instead of the static topic list
        self.bootstrap = bootstrap
        #: optional control.metrics.MetricsRecorder serving /job/get_metrics
        self.metrics = metrics
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------ dispatch

    def handle(self, method: str, path: str, query: dict, tenant: str,
               body: dict | None):
        """Pure request→(status, payload) dispatch — unit-testable
        without a socket."""
        parts = [p for p in path.split("/") if p]
        if parts == ["describe"]:
            if method != "GET":
                return _method_not_allowed(method, ("GET",))
            return 200, R.describe()
        if len(parts) == 2 and parts[0] == "job" and parts[1] in _JOB_METHODS:
            if method not in _JOB_METHODS[parts[1]]:
                return _method_not_allowed(method, _JOB_METHODS[parts[1]])
            return self._handle_job(parts[1], query, tenant)
        if len(parts) == 2 and parts[0] in R.SCHEMAS \
                and parts[1] in _RESOURCE_METHODS:
            if method not in _RESOURCE_METHODS[parts[1]]:
                return _method_not_allowed(method, _RESOURCE_METHODS[parts[1]])
            return self._handle_resource(method, parts[0], parts[1],
                                         query, tenant, body)
        return 404, {"error": f"no route {method} {path}"}

    def _handle_resource(self, method, rtype, action, query, tenant, body):
        if action == "get_schema":
            return 200, R.get_schema(rtype)
        if action == "validate_pretty":
            return 200, R.validate_pretty(rtype, body or {})
        if action == "add":
            try:
                return 201, self.registry.add(tenant, rtype, body or {})
            except ValueError as err:
                return 400, {"error": str(err)}
        if action == "list":
            return 200, self.registry.list(tenant, rtype)
        if action == "get":
            rid = (query.get("id") or [None])[0]
            doc = self.registry.get(tenant, rtype, rid)
            return (200, doc) if doc is not None else \
                (404, {"error": f"{rtype}/{rid} not found"})
        if action == "delete":
            rid = (query.get("id") or [None])[0]
            ok = self.registry.delete(tenant, rtype, rid)
            # miss → 404, mirroring the reference's ConsumerHttpException
            # contract (artifacts.py:418-419) instead of a soft 200
            return (200, {"deleted": True}) if ok else \
                (404, {"error": f"{rtype}/{rid} not found"})
        return 404, {"error": f"unknown action {action}"}

    def _handle_job(self, action, query, tenant):
        if action == "consumer_lag":
            if not self.bootstrap:
                return 400, {"error": "no broker bootstrap configured"}
            group = (query.get("group") or [None])[0]
            if not group:
                return 400, {"error": "group query parameter required"}
            try:
                return 200, JobManager.consumer_lag(
                    self.bootstrap, group, tenant)
            except OSError as err:
                return 502, {"error": f"broker unreachable: {err}"}
        if action == "list_topics":
            if self.bootstrap:
                try:
                    return 200, JobManager.list_topics_from_broker(
                        self.bootstrap, tenant)
                except OSError as err:
                    # unreachable broker → explicit 502, the
                    # reference's wrapped-connection-error contract
                    return 502, {"error": f"broker unreachable: {err}"}
            return 200, JobManager.list_topics(self.broker_topics, tenant)
        jid = (query.get("id") or [None])[0]
        job = self.jobs.get(tenant, jid)
        if job is None:
            return 404, {"error": f"job {jid} not found"}
        if action == "get_status":
            return 200, {"id": jid, "status": job.get_status().value}
        if action == "pause":
            job.pause()
            return 200, {"id": jid, "status": job.get_status().value}
        if action == "resume":
            job.resume()
            return 200, {"id": jid, "status": job.get_status().value}
        if action == "get_logs":
            return 200, [{"ts": ts, "level": lvl, "message": m}
                         for ts, lvl, m in job.get_logs()]
        if action == "get_metrics":
            if self.metrics is None:
                return 404, {"error": "no metrics recorder attached"}
            qid = getattr(getattr(job, "query", None), "id", None) or \
                (query.get("query_id") or [None])[0]
            if qid is None:
                return 404, {"error": "job has no active streaming query"}
            return 200, self.metrics.summary(str(qid))
        return 404, {"error": f"unknown job action {action}"}

    # ------------------------------------------------------------- server

    def start(self, port: int = 0) -> int:
        """Start the HTTP server on a background thread; returns the
        bound port (ephemeral with port=0)."""
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _run(self, method):
                parsed = urlparse(self.path)
                tenant = self.headers.get(TENANT_HEADER, "_public")
                body = None
                try:
                    length = int(self.headers.get("content-length") or 0)
                except ValueError:
                    self._reply(400, {"error": "invalid Content-Length"})
                    return
                if length:
                    try:
                        body = json.loads(self.rfile.read(length))
                    except json.JSONDecodeError:
                        self._reply(400, {"error": "invalid JSON body"})
                        return
                try:
                    status, payload = api.handle(
                        method, parsed.path, parse_qs(parsed.query),
                        tenant, body)
                except Exception as err:  # ConsumerHttpException analogue
                    status, payload = 500, {"error": str(err)}
                self._reply(status, payload)

            def _reply(self, status, payload):
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

            def do_DELETE(self):
                self._run("DELETE")

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

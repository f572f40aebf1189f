"""Control-plane tests: resource validation (O17 incl. the reference's
negative path fixtures), registry CRUD + tenancy isolation, job
lifecycle with a real StreamingQuery (O18), topic listing (O15)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.control.jobs import JobManager, JobStatus
from aether_firebase_consumer_spark.control.resources import (
    ResourceRegistry,
    describe,
    get_schema,
    validate,
    validate_pretty,
)

SUB = {
    "id": "sub-1",
    "name": "test sub",
    "topic_pattern": "survey*",
    "topic_options": {
        "masking_emit_level": "public",
        "filter_required": True,
        "filter_field_path": "operational_status",
        "filter_pass_values": ["operational"],
    },
    "fb_options": {"target_path": "_aether/entities/{topic}",
                   "sync_mode": "forward"},
}


def test_validate_subscription_ok():
    assert validate("subscription", SUB)
    assert validate_pretty("subscription", SUB)["valid"]


@pytest.mark.parametrize("bad_path", ["{illegal}/sub/stitution", "too/short"])
def test_validate_reference_negative_paths(bad_path):
    # firebase/tests/test_unit.py:42-50
    bad = {**SUB, "fb_options": {**SUB["fb_options"], "target_path": bad_path}}
    report = validate_pretty("subscription", bad)
    assert not report["valid"]
    assert report["validation_errors"]


def test_validate_missing_required():
    report = validate_pretty("subscription", {"name": "x"})
    assert not report["valid"]
    assert any("id" in e for e in report["validation_errors"])


def test_validate_bad_sync_mode():
    bad = {**SUB, "fb_options": {"sync_mode": "push"}}
    assert not validate("subscription", bad)


def test_describe_and_schema():
    assert {d["resource_type"] for d in describe()} == \
        {"sink_instance", "subscription", "job"}
    assert get_schema("job")["required"] == ["id", "name", "firebase",
                                             "subscription"]


def test_registry_tenancy_isolation():
    reg = ResourceRegistry()
    reg.add("t1", "subscription", SUB)
    # tenant 2 sees nothing (mirrors the reference's commented tenancy
    # test, firebase/tests/test_integration.py:43-54)
    assert reg.list("t1", "subscription") == ["sub-1"]
    assert reg.list("t2", "subscription") == []
    assert reg.get("t2", "subscription", "sub-1") is None
    assert reg.delete("t1", "subscription", "sub-1")
    assert reg.list("t1", "subscription") == []


def test_registry_rejects_invalid():
    reg = ResourceRegistry()
    with pytest.raises(ValueError):
        reg.add("t1", "subscription", {"id": "x"})


def test_job_lifecycle_with_real_query(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    out_dir = str(tmp_path / "out")

    def start_fn(checkpoint):
        stream = spark.readStream.schema(schema).parquet(str(src))
        return (stream.select("n_nationkey", F.upper("n_name").alias("n"))
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", checkpoint)
                .start())

    mgr = JobManager(str(tmp_path / "ckpt"))
    job = mgr.add_job("t1", "job-1", start_fn)
    assert job.get_status() == JobStatus.STOPPED
    job.start()
    job.query.processAllAvailable()
    assert job.get_status() == JobStatus.NORMAL
    job.pause()
    assert job.get_status() == JobStatus.PAUSED
    job.resume()
    job.query.processAllAvailable()
    assert job.get_status() == JobStatus.NORMAL
    job.stop()
    assert job.get_status() == JobStatus.STOPPED
    # rows made it out; checkpoint prevented duplication across resume
    assert spark.read.parquet(out_dir).count() == 25
    # log ring captured lifecycle
    messages = [m for (_, _, m) in job.get_logs()]
    assert any("started" in m for m in messages)
    assert any("paused" in m for m in messages)
    assert mgr.list_jobs("t1") == ["job-1"]


def test_registry_durable_roundtrip(tmp_path):
    """A path-backed registry persists every resource as a JSON file
    and a NEW registry on the same path reloads them — the reference's
    Redis persistence (firebase/tests/__init__.py:145-150)."""
    store = str(tmp_path / "resources")
    reg = ResourceRegistry(store)
    reg.add("t1", "subscription", SUB)
    reg.add("t1", "job", {"id": "job-1", "name": "j", "firebase": "fb-1",
                          "subscription": ["sub-1"]})
    reg.add("t2/odd id", "sink_instance",
            {"id": "fb 1?", "name": "s", "url": "http://x"})
    reborn = ResourceRegistry(store)
    assert reborn.get("t1", "subscription", "sub-1") == SUB
    assert reborn.list("t1", "job") == ["job-1"]
    assert reborn.tenants() == ["t1", "t2/odd id"]
    assert reborn.get("t2/odd id", "sink_instance", "fb 1?")["url"] == "http://x"
    # deletion persists too
    reborn.delete("t1", "subscription", "sub-1")
    assert ResourceRegistry(store).get("t1", "subscription", "sub-1") is None


def test_resume_on_boot_continues_from_checkpoint(spark, tmp_path):
    """Full E2 lifecycle across a simulated process restart: job defs
    come back from the durable registry, resume_all restarts the query
    on the SAME (tenant, job_id)-derived checkpoint, and the stream
    picks up exactly where it left off — pre-restart files are not
    reprocessed, post-restart files are not missed (the reference
    resumes Redis-persisted jobs at SDK boot,
    firebase/app/consumer.py:9-18)."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                src / "batch-a.parquet")
    schema = spark.read.parquet(str(src)).schema
    out_dir = str(tmp_path / "out")
    store = str(tmp_path / "resources")
    ckpt_root = str(tmp_path / "ckpt")

    def factory(tenant, job_def):
        assert job_def["firebase"] == "fb-1"  # definition round-tripped

        def start_fn(checkpoint):
            stream = spark.readStream.schema(schema).parquet(str(src))
            return (stream.select("n_nationkey", "n_name")
                    .writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", checkpoint)
                    .start())
        return start_fn

    job_def = {"id": "job-1", "name": "j", "firebase": "fb-1",
               "subscription": ["sub-1"]}

    # --- process 1: register durably, run, stop (simulated shutdown)
    reg1 = ResourceRegistry(store)
    reg1.add("t1", "job", job_def)
    mgr1 = JobManager(ckpt_root)
    job = mgr1.add_job("t1", "job-1", factory("t1", job_def))
    job.start()
    job.query.processAllAvailable()
    job.stop()
    assert spark.read.parquet(out_dir).count() == 25

    # --- process 2: fresh registry + manager from the same paths
    reg2 = ResourceRegistry(store)
    mgr2 = JobManager(ckpt_root)
    resumed = mgr2.resume_all(reg2, factory)
    assert resumed == [("t1", "job-1")]
    job2 = mgr2.get("t1", "job-1")
    assert job2.get_status() == JobStatus.NORMAL
    # new data arrives after the restart
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                src / "batch-b.parquet")
    job2.query.processAllAvailable()
    job2.stop()
    # batch-a exactly once (not reprocessed), batch-b exactly once
    out = spark.read.parquet(out_dir)
    assert out.count() == 50
    assert out.groupBy("n_nationkey").count().filter("count != 2").count() == 0


def test_subscription_reconcile_restarts_query(spark, tmp_path):
    """O2/O18 choreography on a file stream (reference reconcile poll,
    firebase/app/artifacts.py:287-300): a subscription's topic pattern
    changes mid-run → reconfigure stops the old query and starts a new
    one with the new pattern on the SAME checkpoint. Rows processed
    before the swap are not reprocessed (no duplicates), rows arriving
    after it route by the NEW pattern only, and none are lost."""
    from aether_firebase_consumer_spark.operators.routing import Subscription
    from aether_firebase_consumer_spark.streaming.pipeline import (
        PipelineConfig,
        transform,
    )

    src = tmp_path / "src"
    src.mkdir()
    out_dir = str(tmp_path / "out")

    def feed(rows, name):
        spark.createDataFrame(rows, "id string, topic string") \
            .coalesce(1).write.parquet(str(src / name))

    def make_start_fn(pattern):
        cfg = PipelineConfig(
            tenant="t1",
            subscriptions=[Subscription("s1", pattern)])

        def start_fn(checkpoint):
            stream = (spark.readStream
                      .schema("id string, topic string")
                      .parquet(str(src) + "/*"))
            return (transform(stream, cfg)
                    .writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", checkpoint)
                    .start())
        return start_fn

    feed([("1", "t1.alpha"), ("2", "t1.alpha"), ("3", "t1.beta")], "b1")
    mgr = JobManager(str(tmp_path / "ckpt"))
    job = mgr.add_job("t1", "job-r", make_start_fn("alpha*"))
    job.start()
    job.query.processAllAvailable()
    q1 = job.query
    got1 = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"1", "2"}  # beta row unmatched under the old pattern

    # --- the subscription changes: alpha* -> beta*
    job.reconfigure(make_start_fn("beta*"))
    assert not q1.isActive          # old query stopped
    assert job.query is not q1      # a new query took over
    assert job.get_status() == JobStatus.NORMAL
    feed([("4", "t1.alpha"), ("5", "t1.beta")], "b2")
    job.query.processAllAvailable()
    job.stop()

    out = spark.read.parquet(out_dir)
    rows = {(r["id"], r["target_path"]) for r in out.collect()}
    # b1 survivors exactly once (checkpoint skipped the old files), b2
    # routed by the NEW pattern: id 4 (alpha) dropped, id 5 (beta) in
    assert {i for i, _ in rows} == {"1", "2", "5"}
    assert out.count() == 3         # no duplicates across the restart
    assert dict(rows)["5"] == "_aether/entities/beta"
    assert any("reconfigure" in m for (_, _, m) in job.get_logs())


def test_log_ring_bounded():
    from aether_firebase_consumer_spark.control.jobs import LogRing
    ring = LogRing(limit=100)
    for i in range(250):
        ring.log("INFO", f"m{i}")
    logs = ring.get_logs()
    assert len(logs) == 100
    assert logs[0][2] == "m150" and logs[-1][2] == "m249"


def test_list_topics_anchored_prefix():
    topics = ["t1.surveys", "t1.t1x", "other.t1.thing", "t2.surveys"]
    # 't1.t1x' keeps its name intact (reference's split() bug would break)
    assert JobManager.list_topics(topics, "t1") == ["surveys", "t1x"]


def test_connection_test_wraps_errors(spark, tmp_path):
    mgr = JobManager(str(tmp_path / "ckpt"))
    job = mgr.add_job("t1", "job-c", lambda c: None)
    assert job.test_connection(lambda: True)
    with pytest.raises(ConnectionError):
        job.test_connection(lambda: (_ for _ in ()).throw(RuntimeError("down")))


def test_rest_control_api_end_to_end(tmp_path):
    """E2/E3 over a real socket: tenant-scoped resource CRUD, schema
    validation errors as 400s, job status/logs, topic listing — the
    reference's REST surface (README.md:37-58) minus the SDK."""
    import json
    import urllib.request

    from aether_firebase_consumer_spark.control.api import ControlApi
    from aether_firebase_consumer_spark.control.jobs import JobManager
    from aether_firebase_consumer_spark.control.resources import ResourceRegistry

    jobs = JobManager(str(tmp_path / "ckpt"))
    jobs.add_job("t1", "j1", lambda ckpt: None)
    api = ControlApi(ResourceRegistry(), jobs,
                     broker_topics=["t1.clinic", "t1.lab", "t2.other"])
    port = api.start()
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None, tenant="t1"):
        req = urllib.request.Request(
            base + path, method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"x-oauth-realm": tenant, "content-type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as err:
            return err.code, json.loads(err.read())

    try:
        # describe + schema reflection
        st, body = call("GET", "/describe")
        assert st == 200 and {d["resource_type"] for d in body} == {
            "sink_instance", "subscription", "job"}
        st, schema = call("GET", "/subscription/get_schema")
        assert st == 200 and "topic_pattern" in schema["properties"]

        # validation: bad target path → invalid (not stored)
        bad = {"id": "s1", "name": "s", "topic_pattern": "*",
               "fb_options": {"target_path": "odd/segments"}}
        st, rep = call("POST", "/subscription/validate_pretty", bad)
        assert st == 200 and not rep["valid"]
        st, _ = call("POST", "/subscription/add", bad)
        assert st == 400

        # CRUD with tenant isolation
        good = {"id": "s1", "name": "s", "topic_pattern": "clinic*"}
        st, _ = call("POST", "/subscription/add", good)
        assert st == 201
        assert call("GET", "/subscription/list")[1] == ["s1"]
        assert call("GET", "/subscription/list", tenant="t2")[1] == []
        st, doc = call("GET", "/subscription/get?id=s1")
        assert st == 200 and doc["topic_pattern"] == "clinic*"
        assert call("DELETE", "/subscription/delete?id=s1")[1] == {
            "deleted": True}

        # topic listing strips the tenant prefix, scoped to the header
        st, topics = call("GET", "/job/list_topics")
        assert st == 200 and topics == ["clinic", "lab"]

        # job endpoints (registered job, never started → STOPPED)
        st, status = call("GET", "/job/get_status?id=j1")
        assert st == 200 and status["status"].lower() == "stopped"
        st, logs = call("GET", "/job/get_logs?id=j1")
        assert st == 200 and isinstance(logs, list)
        st, _ = call("GET", "/job/get_status?id=missing")
        assert st == 404

        # deleting a missing resource is 404, not a soft 200
        st, _ = call("DELETE", "/subscription/delete?id=nope")
        assert st == 404

        # method matrix: wrong verb on a known path → 405 + allowed list
        for method, path in [
                ("POST", "/describe"),
                ("GET", "/subscription/add"),
                ("GET", "/subscription/validate_pretty"),
                ("DELETE", "/subscription/list"),
                ("POST", "/subscription/get?id=s1"),
                ("GET", "/job/pause?id=j1"),
                ("GET", "/job/resume?id=j1"),
                ("POST", "/job/get_status?id=j1"),
                ("DELETE", "/job/list_topics")]:
            st, body = call(method, path,
                            body={} if method == "POST" else None)
            assert st == 405, (method, path, st)
            assert body["allowed"], (method, path)
        # delete accepts POST as documented
        call("POST", "/subscription/add",
             {"id": "s2", "name": "s", "topic_pattern": "lab*"})
        st, body = call("POST", "/subscription/delete?id=s2", body={})
        assert (st, body) == (200, {"deleted": True})
    finally:
        api.stop()


def test_api_job_metrics_endpoint():
    """GET /job/get_metrics: 404 without a recorder, 404 for unknown
    jobs, summary payload when a recorder is attached and a query id
    is supplied; method matrix enforced."""
    from aether_firebase_consumer_spark.control.api import ControlApi
    from aether_firebase_consumer_spark.control.metrics import (
        MetricsRecorder,
    )
    jobs = JobManager("/tmp/ck_metrics_api")
    jobs.add_job("t1", "j1", lambda ck: None)
    # no recorder attached
    api = ControlApi(ResourceRegistry(), jobs)
    status, _ = api.handle("GET", "/job/get_metrics",
                           {"id": ["j1"]}, "t1", None)
    assert status == 404
    # recorder attached, explicit query_id (job has no live query)
    rec = MetricsRecorder()
    api2 = ControlApi(ResourceRegistry(), jobs, metrics=rec)
    status, payload = api2.handle(
        "GET", "/job/get_metrics",
        {"id": ["j1"], "query_id": ["q-123"]}, "t1", None)
    assert status == 200 and payload == {"query_id": "q-123", "batches": 0}
    # unknown job -> 404; wrong method -> 405
    status, _ = api2.handle("GET", "/job/get_metrics",
                            {"id": ["nope"]}, "t1", None)
    assert status == 404
    status, _ = api2.handle("POST", "/job/get_metrics",
                            {"id": ["j1"]}, "t1", None)
    assert status == 405


def test_reconfigure_respects_pause(spark, tmp_path):
    """An operator's explicit pause outranks a config change: the new
    builder is staged but the job stays stopped until resume()."""
    from aether_firebase_consumer_spark.control.jobs import SparkJob

    calls = []

    def mk_start(tag):
        def start_fn(ckpt):
            calls.append(tag)

            class _Q:  # minimal StreamingQuery stand-in
                def stop(self):
                    pass

                @property
                def isActive(self):
                    return True
            return _Q()
        return start_fn

    j = SparkJob("t1", "j1", mk_start("v1"), str(tmp_path / "ck"))
    j.start()
    assert calls == ["v1"]
    j.pause()
    j.reconfigure(mk_start("v2"))
    assert calls == ["v1"], "paused job must not restart on reconfigure"
    j.resume()
    assert calls == ["v1", "v2"], "resume starts the staged new builder"


def test_add_job_refuses_duplicate(tmp_path):
    from aether_firebase_consumer_spark.control.jobs import JobManager
    m = JobManager(str(tmp_path / "ck"))
    m.add_job("t", "j", lambda c: None)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="already registered"):
        m.add_job("t", "j", lambda c: None)


def test_checkpoint_paths_never_collide(tmp_path):
    from aether_firebase_consumer_spark.control.jobs import SparkJob
    a = SparkJob("a.b", "c", lambda c: None, str(tmp_path))
    b = SparkJob("a", "b.c", lambda c: None, str(tmp_path))
    c = SparkJob("a/b", "c", lambda c: None, str(tmp_path))
    paths = {a.checkpoint, b.checkpoint, c.checkpoint}
    assert len(paths) == 3
    assert all("/" not in p[len(str(tmp_path)) + 1:] for p in paths)


def test_registry_thread_safe_concurrent_adds(tmp_path):
    """Concurrent adds/list from server threads must not corrupt the
    store or the persisted files."""
    import threading

    from aether_firebase_consumer_spark.control.resources import (
        ResourceRegistry,
    )
    reg = ResourceRegistry(str(tmp_path / "store"))
    errs = []

    def worker(n):
        try:
            for i in range(25):
                reg.add("t1", "sink_instance", {
                    "id": f"fb{(n * 25 + i) % 10}",
                    "name": "x", "url": "https://h"})
                reg.list("t1", "sink_instance")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(reg.list("t1", "sink_instance")) == 10
    # fresh registry reloads every persisted file intact
    reg2 = ResourceRegistry(str(tmp_path / "store"))
    assert len(reg2.list("t1", "sink_instance")) == 10

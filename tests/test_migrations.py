"""Migrations & orchestration (SURVEY.md §2.9/2.10): three migration
forms, dependency network, application lifecycle, metadata gating,
config loader — semantics mirrored from the reference's lifecycle tests
(anser_test.go:17-126, example_test.go:19-84)."""

import json

import pytest

from anser_spark.engine import Namespace
from anser_spark.migrations import (
    Application,
    ApplicationOptions,
    DependencyNetwork,
    GeneratorOptions,
    ManualMigration,
    MigrationMetadata,
    SimpleMigration,
    StreamMigration,
)
from anser_spark.migrations.config import application_from_config


def opts(query=None, job_id="m1", limit=0):
    return GeneratorOptions(
        ns=Namespace("appdb", "docs"), query=query or {}, job_id=job_id, limit=limit
    )


def test_network_topo_and_validate():
    net = DependencyNetwork()
    net.add("a")
    net.add("b", "a")
    net.add("c", "a", "b")
    assert net.validate() == []
    order = net.topological_order()
    assert order.index("a") < order.index("b") < order.index("c")
    assert net.waves() == [["a"], ["b"], ["c"]]
    net.add("d", "ghost")
    assert any("ghost" in p for p in net.validate())


def test_network_cycle_detected():
    net = DependencyNetwork()
    net.add("a", "b")
    net.add("b", "a")
    problems = net.validate()
    assert any("cycle" in p for p in problems)


def test_metadata_satisfied():
    # model/metadata.go:12
    assert MigrationMetadata("x", "x", has_errors=False, completed=True).satisfied()
    assert not MigrationMetadata("x", "x", has_errors=True, completed=True).satisfied()
    assert not MigrationMetadata("x", "x", completed=False).satisfied()


def test_simple_migration_run(engine, doc_collection):
    # the reference example migration: $rename over matched docs
    # (example_test.go:50-56)
    app = Application(engine)
    app.add(
        SimpleMigration(
            options=opts({"status": "failed"}, "rename-failed"),
            update={"$set": {"status": "archived"}},
        )
    )
    results = app.run()
    assert len(results) == 1 and results[0].error is None
    assert results[0].matched == 2
    assert doc_collection.find({"status": "archived"}).count() == 2
    # metadata event recorded and satisfied
    meta = engine.collection(engine.metadata_namespace())
    row = meta.find_id("rename-failed").one()
    assert row["completed"] is True and row["has_errors"] is False


def test_dry_run_no_writes(engine, doc_collection):
    app = Application(engine, ApplicationOptions(dry_run=True))
    app.add(
        SimpleMigration(
            options=opts({"status": "failed"}, "dry"),
            update={"$set": {"status": "archived"}},
        )
    )
    results = app.run()
    assert results[0].dry_run and results[0].matched == 2
    assert doc_collection.find({"status": "archived"}).count() == 0


def test_generator_limit(engine, doc_collection):
    app = Application(engine)
    app.add(
        SimpleMigration(
            options=opts({}, "limited", limit=2),
            update={"$set": {"touched": True}},
        )
    )
    results = app.run()
    assert results[0].matched == 2
    assert doc_collection.find({"touched": True}).count() == 2


def test_application_limit_caps_jobs(engine, doc_collection):
    # ApplicationOptions.Limit caps total migrations (anser_test.go:93-126)
    app = Application(engine, ApplicationOptions(limit=1))
    app.add(
        SimpleMigration(options=opts({}, "m-one"), update={"$set": {"v1": True}}),
        SimpleMigration(options=opts({}, "m-two"), update={"$set": {"v2": True}}),
    )
    results = app.run()
    assert len(results) == 1


def test_dependency_ordering_and_blocking(engine, doc_collection):
    app = Application(engine)
    app.add(
        SimpleMigration(
            options=opts({"_id": "zzz-missing"}, "first"),
            update={"$set": {"step": 1}},
        ),
        SimpleMigration(
            options=opts({}, "second"),
            update={"$set": {"step": 2}},
            depends_on=["first"],
        ),
    )
    results = {r.migration_id: r for r in app.run()}
    assert results["first"].error is None  # zero matches is not an error
    assert results["second"].error is None
    assert doc_collection.find({"step": 2}).count() == 6


def test_blocked_dependency_skips(engine, doc_collection):
    calls = []

    def boom(doc):
        raise RuntimeError("boom")

    engine.register_manual_migration_operation("boom-op", boom)
    app = Application(engine)
    app.add(
        ManualMigration(options=opts({}, "fails"), name="boom-op"),
        SimpleMigration(
            options=opts({}, "downstream"),
            update={"$set": {"never": True}},
            depends_on=["fails"],
        ),
    )
    results = {r.migration_id: r for r in app.run()}
    assert results["fails"].error is not None
    assert results["downstream"].skipped_blocked
    assert doc_collection.find({"never": True}).count() == 0
    # failure recorded with has_errors (migration_helper semantics)
    meta = engine.collection(engine.metadata_namespace())
    assert meta.find_id("fails").one()["has_errors"] is True


def test_manual_migration(engine, doc_collection):
    def bump(doc):
        doc["version"] = (doc.get("version") or 0) + 100
        return doc

    engine.register_manual_migration_operation("bump-version", bump)
    app = Application(engine)
    app.add(ManualMigration(options=opts({"activated": True}, "bump"), name="bump-version"))
    results = app.run()
    assert results[0].error is None and results[0].matched == 4
    rows = doc_collection.find({"version": {"$gte": 100}}).all()
    assert len(rows) == 4


def test_duplicate_registration_rejected(engine):
    engine.register_manual_migration_operation("op", lambda d: d)
    with pytest.raises(ValueError):
        engine.register_manual_migration_operation("op", lambda d: d)


def test_unregistered_op_fails_setup(engine):
    app = Application(engine)
    app.add(ManualMigration(options=opts({}, "m"), name="ghost-op"))
    with pytest.raises(ValueError, match="not registered"):
        app.setup()


def test_stream_migration_local_iterator(engine, doc_collection):
    seen = []

    class Collector:
        def migrate(self, docs, coll):
            for d in docs:
                seen.append(d["_id"])

    engine.register_stream_processor("collect", Collector())
    app = Application(engine)
    app.add(StreamMigration(options=opts({"activated": True}, "s1"), name="collect"))
    results = app.run()
    assert results[0].error is None
    assert sorted(seen) == ["a1", "a3", "a5", "a6"]


def test_stream_migration_distributed(engine, doc_collection):
    class Upper:
        def process_partition(self, pdf):
            pdf = pdf.copy()
            pdf["status"] = pdf["status"].str.upper()
            return pdf

    engine.register_stream_processor("upper", Upper())
    app = Application(engine)
    app.add(StreamMigration(options=opts({"status": "failed"}, "s2"), name="upper"))
    results = app.run()
    assert results[0].error is None
    assert doc_collection.find({"status": "FAILED"}).count() == 2


def test_config_loader(engine, doc_collection, tmp_path):
    config = {
        "options": {"dry_run": False, "limit": 0},
        "simple_migrations": [
            {
                "ns": {"db": "appdb", "collection": "docs"},
                "query": {"status": "success"},
                "job_id": "cfg-1",
                "update": {"$set": {"from_config": True}},
            }
        ],
    }
    path = tmp_path / "migrations.json"
    path.write_text(json.dumps(config))
    app = application_from_config(engine, str(path))
    results = app.run()
    assert results[0].error is None and results[0].matched == 2
    assert doc_collection.find({"from_config": True}).count() == 2


def test_invalid_config_rejected(engine):
    with pytest.raises(ValueError):
        application_from_config(
            engine,
            {"simple_migrations": [{"ns": {"db": "", "collection": ""}, "job_id": "", "update": {}}]},
        )

"""Engine / Database / Collection — the environment + session/client
handle hierarchy of the reference (environment.go:26-58,
db/interface.go:5-39, client/client.go:10-52), Spark-first.

A Collection is a named Parquet dataset. Reads are lazy DataFrames;
mutations (SURVEY.md §2.4) are **copy-on-write rewrites**: the new
dataset version is written to ``<workdir>/<db>/<coll>/v<N>`` and a
``_CURRENT`` pointer file is swapped atomically (tmp+rename). That makes
every mutation idempotent/re-runnable — the property the reference only
asks of migration authors by convention (README.rst:68-70) we get by
construction — and it is the only mutation shape that scales: one
distributed job per UpdateMany, never per-document point writes.

Read-only source datasets (e.g. the driver's testdata) can back a
collection; the first mutation materializes the next version into the
engine workdir, leaving the source untouched.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import re
import shutil
import tempfile
import time
import uuid
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

from anser_spark.functions.filters import FilterCompileError, compile_filter
from anser_spark.functions.updates import (
    apply_update,
    compile_update,
    compile_replacement,
    has_dollar_key,
    is_pipeline_update,
    validate_pipeline_update,
)

_LOG = logging.getLogger(__name__)

__all__ = [
    "Engine",
    "Database",
    "Collection",
    "Namespace",
    "ChangeInfo",
    "NotFoundError",
    "WriteConflictError",
    "DocumentValidationError",
]


class NotFoundError(LookupError):
    """Analogue of mongo ErrNoDocuments / reference ResultsNotFound
    (db/errors.go:8-12)."""


class WriteConflictError(RuntimeError):
    """Another writer committed a version between this mutation's read
    snapshot and its pointer swap — the optimistic-concurrency analogue
    of Mongo's WriteConflict. The losing mutation raises instead of
    silently overwriting the winner's version (last-wins lost update);
    retry re-reads the new current version."""


class DocumentValidationError(ValueError):
    """An insert violated the collection's ``$jsonSchema`` validator
    (Mongo DocumentValidationFailure, code 121)."""


def is_not_found(exc: BaseException) -> bool:
    return isinstance(exc, NotFoundError)


def _ins_col_rel(col: str) -> str:
    """Filesystem-safe subdirectory name for a per-id-column insert
    sidecar under a hybrid mutation manifest (round 12)."""
    from urllib.parse import quote

    return quote(str(col), safe="")


def _read_index_table(
    spark,
    definition: Mapping[str, Any],
    base_key: str,
    deltas_key: str,
    id_col: str | None = None,
) -> DataFrame:
    """A persisted index table as one frame: the base directory plus
    any staged incremental-delta directories (round 10 — refreshes
    publish deltas atomically with the definition swap instead of
    appending into the live table), minus tombstoned documents (round
    11 — an update/remove refresh invalidates mutated ids' rows via
    generation-stamped tombstones instead of rewriting the table;
    ``id_col`` names the table's document-id column the tombstones
    key on)."""
    from anser_spark.operators.ranking import read_layered_table

    dirs = [str(definition[base_key])] + [
        str(p) for p in (definition.get(deltas_key) or [])
    ]
    return read_layered_table(
        spark,
        dirs,
        list(definition.get("tombs") or []),
        id_col or str(definition.get("id_col", "_id")),
    )


def _range_sorted(df: DataFrame, cols: Sequence, single: bool) -> DataFrame:
    """Range-partition + sort an index table so point lookups prune on
    footer/row-group min-max. ``single=True`` (build volume under
    ``spark.anser.index.singleFileTokens``) pins ONE explicit
    partition: RangePartitioner computes no bounds, so the sampling
    pass a bare ``repartitionByRange`` runs is skipped (one job fewer
    per table, measured 3 → 2) and the table lands as one sorted file
    whose row-group stats keep lookups pruned. Large builds keep the
    sampled range partitioning and its multi-file layout (guide §6:
    files in sensible size bands, scan parallelism)."""
    cols = list(cols)
    if single:
        # narrow coalesce instead of a 1-partition range shuffle: no
        # Exchange, no AQE stage job — the full sort inside the single
        # partition yields the same sorted single-file layout (round
        # 14, guide §2.4: the shuffle bought nothing at 1 partition)
        return df.coalesce(1).sortWithinPartitions(*cols)
    return df.repartitionByRange(*cols).sortWithinPartitions(*cols)


def _read_pt(spark: SparkSession, path: str) -> DataFrame:
    """Engine-internal parquet read through the schema-cached reader:
    index tables/layers are immutable once written (new layers are new
    dirs), so the footer-inference cost (~60ms py4j + a driver footer
    read) is paid once per dir instead of per query (round 14,
    guide §1.2)."""
    from anser_spark.sources.readers import read_parquet_table

    return read_parquet_table(spark, path)


def _read_pt_star(spark: SparkSession, first: str, *rest: str) -> DataFrame:
    """Multi-dir read (base + delta layers) using the base dir's cached
    schema — same default (non-mergeSchema) inference semantics as the
    bare read, minus the footer sweep. Layers are engine-written with
    the base's schema by construction (and never carry ns timestamps,
    so the cached schema is the physical one)."""
    from anser_spark.sources.readers import read_parquet_table

    if not rest:
        return read_parquet_table(spark, first)
    base = read_parquet_table(spark, first)
    return spark.read.schema(base.schema).parquet(first, *rest)


def _run_build_actions(*tasks) -> None:
    """Run independent index-build actions (separate Spark actions with
    no data dependency) from a small thread pool so each action's
    straggler tail back-fills with the next action's tasks instead of
    idling the cluster (guide §2.6) — an index build is 3-5 table
    writes plus a stats pass, and serial actions left the executors
    idle between them. Callers pass closures whose INTERNAL steps are
    dependent (e.g. postings write then the term table derived from
    it); anything across closures must be independent. Outputs are
    byte-identical to the serial order — only scheduling overlaps.
    Exceptions re-raise after all actions settle (same partial-dir
    failure surface as the serial code)."""
    tasks = [t for t in tasks if t is not None]
    if len(tasks) <= 1:
        for t in tasks:
            t()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(tasks))) as pool:
        futures = [pool.submit(t) for t in tasks]
        errs = [f.exception() for f in futures]
        for e in errs:
            if e is not None:
                raise e


def _single_file_tokens(spark: SparkSession) -> float:
    """Token-volume bound under which an index table writes as one
    sorted file (~tens of MB of postings — well under the guide §6
    128 MB-1 GB file band, so multi-file layout buys nothing)."""
    return float(
        spark.conf.get("spark.anser.index.singleFileTokens", "4000000")
    )


def _single_file_vector_bytes(spark: SparkSession) -> float:
    """Byte bound for the cells-table analogue of
    ``_single_file_tokens`` (vector payloads size in bytes, not
    tokens)."""
    return float(
        spark.conf.get(
            "spark.anser.index.singleFileVectorBytes",
            str(128 * 1024 * 1024),
        )
    )


@dataclass(frozen=True)
class Namespace:
    """`{DB, Collection}` pair (reference model/namespace.go:6-33)."""

    db: str
    collection: str

    def __str__(self) -> str:  # "db.coll" string form
        return f"{self.db}.{self.collection}"

    def is_valid(self) -> bool:
        return bool(self.collection) and 0 < len(self.db) < 64


@dataclass
class ChangeInfo:
    """Mutation result (reference db/data.go:11-16)."""

    updated: int = 0
    removed: int = 0
    upserted_id: Any = None


@dataclass
class BulkResult:
    """Bulk write result (reference db/interface.go:70-73)."""

    matched: int = 0
    modified: int = 0


class Engine:
    """Top-level handle: SparkSession + data roots + op registries
    (the reference Environment, environment.go:26-58)."""

    METADATA_DB = "anser"
    METADATA_COLLECTION = "migrations.metadata"

    def __init__(
        self,
        spark: SparkSession,
        workdir: str | None = None,
        sources: Mapping[str, str] | None = None,
        assume_unique_ids: bool = False,
    ) -> None:
        self.spark = spark
        self.workdir = workdir or tempfile.mkdtemp(prefix="anser_spark_")
        # db name → directory of <name>.parquet source datasets
        self.sources: dict[str, str] = dict(sources or {})
        # The engine never ENFORCES _id uniqueness (externally-mounted
        # parquet can carry duplicates), so single-document mutations
        # re-scan for every file containing the victim's key before the
        # copy-on-write. Deployments that guarantee unique keys (the
        # normal Mongo-shaped case: engine-generated ObjectIds, upsert
        # discipline) can set assume_unique_ids=True to skip that scan
        # — first-match mutations then cost one pushed-down victim
        # lookup plus one single-file rewrite.
        self.assume_unique_ids = bool(assume_unique_ids)
        # op registries (environment.go:167-205): duplicate registration is an error
        self.manual_ops: dict[str, Any] = {}
        self.stream_processors: dict[str, Any] = {}
        self.closers: list[Any] = []
        # multi-collection transaction state (None = autocommit)
        self._txn: "_Transaction | None" = None
        # parsed search-index definitions keyed by file path, validated
        # by (mtime_ns, size) per load (round 13): an ivf/ivfpq
        # definition carries its centroids/codebooks — megabytes of
        # JSON at production nlist/dim — and every pipe() resolve was
        # re-parsing it. Entries are treated as IMMUTABLE by contract
        # (every mutating consumer shallow-copies before assigning and
        # copies nested lists before appending — audited).
        self._index_def_cache: dict[str, tuple[tuple[int, int], Any]] = {}
        self._recover_transactions()

    # -- registries ----------------------------------------------------
    def register_manual_migration_operation(self, name: str, fn: Any) -> None:
        if name in self.manual_ops:
            raise ValueError(f"operation {name!r} is already registered")
        self.manual_ops[name] = fn

    def register_stream_processor(self, name: str, processor: Any) -> None:
        if name in self.stream_processors:
            raise ValueError(f"processor {name!r} is already registered")
        self.stream_processors[name] = processor

    def metadata_namespace(self) -> Namespace:
        return Namespace(self.METADATA_DB, self.METADATA_COLLECTION)

    # -- handles -------------------------------------------------------
    def mount(self, db_name: str, source_dir: str) -> "Database":
        """Expose a directory of ``<coll>.parquet`` files as a database."""
        self.sources[db_name] = source_dir
        return self.db(db_name)

    def db(self, name: str) -> "Database":
        return Database(self, name)

    # session()/client() parity aliases (legacy vs modern handle split
    # in the reference collapses to one implementation here)
    def session(self) -> "Engine":
        return self

    def database(self, name: str) -> "Database":
        return self.db(name)

    def run_command(self, command: str) -> DataFrame:
        """Raw-command escape hatch (reference RunCommand,
        client/client.go:22-23) → spark.sql over temp views of every
        mounted collection."""
        for db_name in list(self.sources):
            for coll_name in self.db(db_name).collection_names():
                safe = coll_name.replace(".", "_")
                self.db(db_name).collection(coll_name).df().createOrReplaceTempView(safe)
        return self.spark.sql(command)

    def list_database_names(self) -> list[str]:
        names = set(self.sources)
        if os.path.isdir(self.workdir):
            for entry in os.listdir(self.workdir):
                if os.path.isdir(os.path.join(self.workdir, entry)):
                    names.add(entry)
        return sorted(names)

    def collection(self, ns: Namespace) -> "Collection":
        return self.db(ns.db).collection(ns.collection)

    def close(self) -> None:
        for closer in self.closers:
            closer()

    # -- transactions ---------------------------------------------------
    def transaction(self):
        """Multi-collection transaction (the Mongo multi-document
        transaction analogue over versioned parquet collections).

        Inside the ``with`` block every mutation STAGES its new version
        instead of publishing it: the data files are written, but each
        collection's ``_CURRENT`` pointer is untouched.  Reads through
        this engine see the staged versions (read-your-writes); other
        engines keep seeing the committed state.  On exit the commit
        takes every touched store's lock in a canonical order (no
        deadlocks), re-validates each collection's pointer against the
        transaction's read snapshot (all-or-nothing optimistic CAS —
        one conflicting concurrent writer aborts the whole transaction
        with WriteConflictError and every staged version is reclaimed),
        durably records the decision in an fsynced intent journal, then
        swaps all pointers.  A crash mid-commit is rolled FORWARD from
        the journal on the next Engine construction over the same
        workdir (the journal is written only after every CAS passed).

        Guarantees (documented): atomicity and isolation with respect
        to all writers and to readers using this engine; a concurrent
        READER on another engine instance observes each collection's
        swap atomically but may see collection A's new version before
        B's during the commit window (Mongo's snapshot reads inside
        transactions are the stronger contract — divergence).
        ``drop()`` / ``create_collection`` are not transactional and
        raise inside a transaction.

        Usage::

            with engine.transaction():
                coll_a.update_all(q, u)
                coll_b.insert(doc)
        """
        import contextlib

        if self._txn is not None:
            raise RuntimeError("nested transactions are not supported")

        @contextlib.contextmanager
        def _ctx():
            txn = _Transaction(self)
            self._txn = txn
            try:
                yield txn
            except BaseException:
                txn.abort()
                raise
            else:
                txn.commit()

        return _ctx()

    def with_transaction(self, fn, max_retries: int = 3):
        """Mongo's ``withTransaction`` convention: run ``fn(txn)``
        inside a transaction and retry the WHOLE callback when the
        commit loses the optimistic CAS (WriteConflictError — our
        TransientTransactionError analogue). ``fn`` must be
        re-runnable: each retry re-reads current state, so
        read-modify-write logic composes correctly."""
        last: WriteConflictError | None = None
        for _ in range(max(1, max_retries)):
            try:
                with self.transaction() as txn:
                    result = fn(txn)
                return result
            except WriteConflictError as exc:
                last = exc
        raise last

    def _recover_transactions(self) -> None:
        """Roll forward any intent journal left by a crash mid-commit.

        A journal exists only after every CAS check passed, so at
        journal time each store's pointer equaled the journaled
        ``base`` pointer.  Replay is therefore conditional, not
        unconditional: under the store's ``_LOCK`` the pointer is
        re-read and the swap is applied only while it STILL equals
        ``base`` — if a later commit (possible when the crashed
        process's sibling engines kept running and retention kept the
        staged dir alive) already moved the pointer past the journaled
        target, replaying would move ``_CURRENT`` backward and lose
        that newer commit, so the line is skipped instead."""
        import fcntl

        jdir = os.path.join(self.workdir, "_TXNJOURNAL")
        if not os.path.isdir(jdir):
            return
        for name in sorted(os.listdir(jdir)):
            jpath = os.path.join(jdir, name)
            try:
                with open(jpath) as fh:
                    lines = fh.read().splitlines()
                for line in lines:
                    if not line.strip():
                        continue
                    parts = line.split("\t", 3)
                    if len(parts) == 4:
                        store_dir, version, base_json, meta_json = parts
                        base_ptr = json.loads(base_json)
                    else:  # pre-round-6 journal line (no base pointer)
                        store_dir, version, meta_json = parts
                        base_ptr = ...  # sentinel: replay unconditionally
                    if not os.path.isdir(os.path.join(store_dir, version)):
                        continue  # staged data lost — nothing to publish
                    meta = json.loads(meta_json)
                    lf = open(  # noqa: SIM115 — held across the swap
                        os.path.join(store_dir, "_LOCK"), "a+"
                    )
                    try:
                        try:
                            fcntl.flock(lf, fcntl.LOCK_EX)
                        except OSError:
                            pass  # lock-free fallback: pointer check runs
                        current = self._read_pointer_at(store_dir)
                        if current == version:
                            continue  # this line's swap already landed
                        if base_ptr is not ... and current != base_ptr:
                            continue  # a newer commit superseded the txn
                        tmp = os.path.join(
                            store_dir, f"_CURRENT.tmp.{uuid.uuid4().hex[:8]}"
                        )
                        with open(tmp, "w") as fh2:
                            fh2.write(version)
                            for k in sorted(meta):
                                fh2.write(f"\n{k}={meta[k]}")
                        os.replace(tmp, os.path.join(store_dir, "_CURRENT"))
                    finally:
                        lf.close()
                os.remove(jpath)
            except OSError:
                continue

    @staticmethod
    def _read_pointer_at(store_dir: str) -> str | None:
        """Read a store's ``_CURRENT`` version (first line), or None."""
        try:
            with open(os.path.join(store_dir, "_CURRENT")) as fh:
                return fh.read().splitlines()[0]
        except (OSError, IndexError):
            return None


class _Transaction:
    """Staged pointer swaps for one Engine.transaction() scope (see
    Engine.transaction for the contract)."""

    def __init__(self, engine: "Engine") -> None:
        self.engine = engine
        # store_dir → {coll, base_ptr, versions[], meta}
        self.staged: dict[str, dict[str, Any]] = {}
        self.active = True

    def _stage(
        self, coll: "Collection", version: str, old_ptr: str | None,
        meta: Mapping[str, str],
    ) -> None:
        ent = self.staged.get(coll._store_dir)
        if ent is None:
            self.staged[coll._store_dir] = {
                "coll": coll, "base_ptr": old_ptr,
                "versions": [version], "meta": dict(meta),
            }
        else:
            ent["versions"].append(version)
            ent["meta"] = dict(meta)

    def _staged_entry(self, store_dir: str) -> dict[str, Any] | None:
        return self.staged.get(store_dir)

    def abort(self) -> None:
        if not self.active:
            return
        self.active = False
        self.engine._txn = None
        for ent in self.staged.values():
            for v in ent["versions"]:
                shutil.rmtree(
                    os.path.join(ent["coll"]._store_dir, v), ignore_errors=True
                )
                # staged mutation pre-images / insert sidecars and the
                # staged manifest die with the stage (round 12, ADVICE —
                # they were orphaned forever; _gc_deltas' orphan sweep
                # is the backstop for a crash that never reaches here)
                for suf in ("_pre", "_ins"):
                    shutil.rmtree(
                        os.path.join(
                            ent["coll"]._deltas_dir(), f"{v}{suf}"
                        ),
                        ignore_errors=True,
                    )
                try:
                    os.remove(
                        os.path.join(ent["coll"]._deltas_dir(), f"{v}.json")
                    )
                except OSError:
                    pass
        self.staged.clear()

    def commit(self) -> None:
        if not self.active:
            raise RuntimeError("transaction is no longer active")
        engine = self.engine
        entries = sorted(self.staged.values(), key=lambda e: e["coll"]._store_dir)
        if not entries:
            self.active = False
            engine._txn = None
            return
        locks = []
        journal_written = False
        try:
            # canonical lock order prevents deadlock between committers
            for e in entries:
                lockpath = os.path.join(e["coll"]._store_dir, "_LOCK")
                lf = open(lockpath, "a+")  # noqa: SIM115 — held across commit
                try:
                    import fcntl

                    fcntl.flock(lf, fcntl.LOCK_EX)
                except (ImportError, OSError):
                    pass
                locks.append(lf)
            engine._txn = None  # pointer reads below must see COMMITTED state
            for e in entries:
                committed = e["coll"]._pointer()
                if committed != e["base_ptr"]:
                    raise WriteConflictError(
                        f"{e['coll'].namespace}: version {committed!r} was "
                        f"committed by another writer after this transaction "
                        f"read {e['base_ptr']!r}; the whole transaction "
                        "aborted and staged versions were reclaimed"
                    )
            # durable decision record BEFORE any pointer moves
            jdir = os.path.join(engine.workdir, "_TXNJOURNAL")
            os.makedirs(jdir, exist_ok=True)
            jpath = os.path.join(jdir, f"txn.{uuid.uuid4().hex}")
            with open(jpath, "w") as fh:
                for e in entries:
                    fh.write(
                        f"{e['coll']._store_dir}\t{e['versions'][-1]}\t"
                        f"{json.dumps(e['base_ptr'])}\t"
                        f"{json.dumps(e['meta'])}\n"
                    )
                fh.flush()
                os.fsync(fh.fileno())
            journal_written = True
            for e in entries:
                coll = e["coll"]
                tmp = os.path.join(
                    coll._store_dir, f"_CURRENT.tmp.{uuid.uuid4().hex[:8]}"
                )
                with open(tmp, "w") as fh:
                    fh.write(e["versions"][-1])
                    for k in sorted(e["meta"]):
                        fh.write(f"\n{k}={e['meta'][k]}")
                os.replace(tmp, os.path.join(coll._store_dir, "_CURRENT"))
            os.remove(jpath)
        except BaseException:
            self.engine._txn = None
            self.active = False
            if not journal_written:
                # decision not durable yet ⇒ the transaction rolls back
                for ent in self.staged.values():
                    for v in ent["versions"]:
                        shutil.rmtree(
                            os.path.join(ent["coll"]._store_dir, v),
                            ignore_errors=True,
                        )
                        for suf in ("_pre", "_ins"):
                            shutil.rmtree(
                                os.path.join(
                                    ent["coll"]._deltas_dir(), f"{v}{suf}"
                                ),
                                ignore_errors=True,
                            )
                        try:
                            os.remove(
                                os.path.join(
                                    ent["coll"]._deltas_dir(), f"{v}.json"
                                )
                            )
                        except OSError:
                            pass
            # journal_written: the decision is durable — recovery rolls
            # the remaining pointer swaps forward from the journal
            raise
        finally:
            engine._txn = None
            self.active = False
            for lf in locks:
                lf.close()
        # retention reaping outside the locks (commit is already durable)
        for e in entries:
            e["coll"]._reap_versions(e["versions"][-1])


class Database:
    def __init__(self, engine: Engine, name: str) -> None:
        self.engine = engine
        self.name = name

    def collection(self, name: str) -> "Collection":
        return Collection(self.engine, self.name, name)

    c = collection  # terse alias

    def collection_names(self) -> list[str]:
        names: set[str] = set()
        src = self.engine.sources.get(self.name)
        if src and os.path.isdir(src):
            for entry in os.listdir(src):
                for ext in (".parquet", ".jsonl", ".json", ".ndjson", ".csv", ".orc"):
                    if entry.endswith(ext):
                        names.add(entry[: -len(ext)])
                        break
        dbdir = os.path.join(self.engine.workdir, self.name)
        if os.path.isdir(dbdir):
            for entry in os.listdir(dbdir):
                coll = Collection(self.engine, self.name, entry)
                if coll._pointer() == "DROPPED":
                    names.discard(entry)
                elif coll._pointer() is not None:
                    names.add(entry)
        return sorted(names)

    def create_collection(
        self,
        name: str,
        view_on: str | None = None,
        pipeline: Sequence[Mapping[str, Any]] | None = None,
    ) -> "Collection":
        if view_on is not None:
            return self.create_view(name, view_on, pipeline or [])
        coll = self.collection(name)
        if not coll.exists():
            empty = self.engine.spark.createDataFrame(
                [], T.StructType([T.StructField("_id", T.StringType())])
            )
            coll._rewrite(empty)
        return coll

    def create_view(
        self, name: str, view_on: str, pipeline: Sequence[Mapping[str, Any]]
    ) -> "Collection":
        """Mongo view: a read-only collection defined as an aggregation
        pipeline over another collection (db.createView / the
        createCollection viewOn form). Reads re-compile the pipeline
        over the CURRENT source version — a view is always fresh, it is
        the lazy-DataFrame the engine already is, just named. Mutations
        on a view raise; views-on-views compose (cycles rejected at
        create time, as Mongo does)."""
        coll = self.collection(name)
        if coll.exists():
            raise ValueError(f"collection already exists: {coll.namespace}")
        # reject definition cycles by walking the viewOn chain
        seen = {name}
        cur = view_on
        for _ in range(64):
            if cur in seen:
                raise ValueError(f"view cycle detected at {cur!r}")
            seen.add(cur)
            vd = self.collection(cur)._view_def()
            if vd is None:
                break
            cur = vd["viewOn"]
        else:
            raise ValueError("view chain too deep (max 64)")
        os.makedirs(coll._store_dir, exist_ok=True)
        with open(os.path.join(coll._store_dir, "_VIEW"), "w") as fh:
            json.dump({"viewOn": view_on, "pipeline": list(pipeline)}, fh)
        return coll

    def drop_database(self) -> None:
        for name in self.collection_names():
            self.collection(name).drop()


class Collection:
    """A named Parquet-backed document collection.

    Read path: `find/find_id/find_one/count/pipe` (reference
    db/wrapper.go:88-125). Write path: copy-on-write mutations
    (db/wrapper.go:127-344). All query/update documents use the Mongo
    dialect, compiled by anser_spark.functions.
    """

    def __init__(self, engine: Engine, db_name: str, name: str) -> None:
        self.engine = engine
        self.db_name = db_name
        self.name = name

    # -- storage -------------------------------------------------------
    @property
    def namespace(self) -> Namespace:
        return Namespace(self.db_name, self.name)

    @property
    def _store_dir(self) -> str:
        return os.path.join(self.engine.workdir, self.db_name, self.name)

    def _pointer(self) -> str | None:
        txn = self.engine._txn
        if txn is not None:
            ent = txn._staged_entry(self._store_dir)
            if ent is not None:
                return ent["versions"][-1]  # read-your-writes in a txn
        p = os.path.join(self._store_dir, "_CURRENT")
        if os.path.exists(p):
            with open(p) as fh:
                return fh.readline().strip()
        return None

    def pointer_meta(self) -> dict[str, str]:
        """key=value metadata lines carried in the _CURRENT pointer file
        below the version line. Because the pointer swap is one atomic
        os.replace, metadata written with a version commits EXACTLY when
        that version becomes visible — the property the streaming-ingest
        exactly-once contract rests on (a batch marker can never be
        observed without its rows, nor the rows without the marker)."""
        txn = self.engine._txn
        if txn is not None:
            ent = txn._staged_entry(self._store_dir)
            if ent is not None:
                return dict(ent["meta"])
        p = os.path.join(self._store_dir, "_CURRENT")
        meta: dict[str, str] = {}
        if os.path.exists(p):
            with open(p) as fh:
                for line in fh.read().splitlines()[1:]:
                    if "=" in line:
                        k, _, v = line.partition("=")
                        meta[k] = v
        return meta

    def _source_path(self) -> str | None:
        src = self.engine.sources.get(self.db_name)
        if not src:
            return None
        for ext in (".parquet", ".jsonl", ".json", ".ndjson", ".csv", ".orc", ""):
            candidate = os.path.join(src, f"{self.name}{ext}")
            if os.path.exists(candidate):
                return candidate
        return None

    def current_path(self) -> str | None:
        ptr = self._pointer()
        if ptr == "DROPPED":
            return None
        if ptr is not None:
            return os.path.join(self._store_dir, ptr)
        return self._source_path()

    def exists(self) -> bool:
        return self.is_view() or self.current_path() is not None

    def _view_def(self) -> dict[str, Any] | None:
        p = os.path.join(self._store_dir, "_VIEW")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return None

    def is_view(self) -> bool:
        return self._view_def() is not None

    def df(self) -> DataFrame:
        """The collection as a lazy DataFrame (the engine-internal fast
        path — fluent `find()` wraps this). A VIEW compiles its stored
        pipeline over the source collection's CURRENT version — always
        fresh, zero materialization."""
        view = self._view_def()
        if view is not None:
            from anser_spark.plans.pipeline import compile_pipeline

            src = Collection(self.engine, self.db_name, view["viewOn"])

            def _resolve(name: str) -> DataFrame:
                return Collection(self.engine, self.db_name, name).df()

            return compile_pipeline(src.df(), view["pipeline"], _resolve, None)
        path = self.current_path()
        if path is None:
            raise NotFoundError(f"collection does not exist: {self.namespace}")
        from anser_spark.sources.readers import read_table

        return read_table(self.engine.spark, path)

    def set_partitioning(self, *cols: str) -> None:
        """Declare hive-style partition columns for this collection's
        dataset versions — the Spark analogue of the reference's 'back
        generator queries with indexes' guidance (README.rst:71-72):
        filters on partition columns prune directories at the source
        (PartitionFilters in the scan). Takes effect on the next rewrite."""
        os.makedirs(self._store_dir, exist_ok=True)
        with open(os.path.join(self._store_dir, "_PARTITIONING"), "w") as fh:
            fh.write(",".join(cols))

    def partition_columns(self) -> list[str]:
        p = os.path.join(self._store_dir, "_PARTITIONING")
        if os.path.exists(p):
            with open(p) as fh:
                text = fh.read().strip()
            return [c for c in text.split(",") if c]
        return []

    def set_clustering(
        self, *cols: str, n_files: int | None = None, layout: str = "linear"
    ) -> None:
        """Declare clustering columns: every subsequent version write
        range-partitions and sorts rows by ``cols`` before writing, so
        each parquet file covers a NARROW, non-overlapping range of the
        clustering key. Parquet footer min/max stats then actually
        prune: a key-equality probe (point lookup, the duplicate-key
        file scan of first-match mutations, COW match-file detection on
        the key) reads ~one file instead of every file — the flat-file
        analogue of a clustered index, and the standard lakehouse
        sort-on-write layout. Costs one range exchange per version
        write (read-optimized trade, documented); takes effect on the
        next rewrite. Pass no columns to clear.

        ``n_files`` pins the number of range shards (an explicit
        repartition count AQE respects); default None lets AQE size the
        shards by data volume — the right default at scale, where shard
        count should track bytes, not a stored constant.

        ``layout="zorder"`` (2+ columns) sorts by an interleaved-bits
        Z-order key instead of lexicographically: a linear (a, b) sort
        prunes files only for probes on ``a`` (every file spans all of
        ``b``), while Z-order gives EVERY clustering column partial
        min/max locality, so single-column probes on any of them skip
        most files — the multi-dimensional lakehouse layout (Delta/
        Iceberg OPTIMIZE ZORDER). Numeric/timestamp/date columns get
        range buckets (min/max from one small aggregate per write);
        other types hash-bucket, which preserves equality pruning
        only. One column degrades to linear."""
        if layout not in ("linear", "zorder"):
            raise ValueError(f"unknown clustering layout: {layout!r}")
        os.makedirs(self._store_dir, exist_ok=True)
        with open(os.path.join(self._store_dir, "_CLUSTERING"), "w") as fh:
            fh.write(",".join(cols))
            fh.write(f"\n{int(n_files)}" if n_files else "\n")
            if layout != "linear":
                fh.write(f"\n{layout}")

    def clustering_columns(self) -> tuple[list[str], int | None]:
        p = os.path.join(self._store_dir, "_CLUSTERING")
        if os.path.exists(p):
            with open(p) as fh:
                lines = fh.read().splitlines()
            cols = [c for c in (lines[0] if lines else "").split(",") if c]
            n = int(lines[1]) if len(lines) > 1 and lines[1].strip() else None
            return cols, n
        return [], None

    def clustering_layout(self) -> str:
        p = os.path.join(self._store_dir, "_CLUSTERING")
        if os.path.exists(p):
            with open(p) as fh:
                lines = fh.read().splitlines()
            if len(lines) > 2 and lines[2].strip():
                return lines[2].strip()
        return "linear"

    def set_validator(self, json_schema: Mapping[str, Any] | None) -> None:
        """Attach a ``$jsonSchema`` validator (Mongo collMod validator,
        validationAction=error): inserts whose documents violate the
        schema raise DocumentValidationError and commit nothing.
        Divergence (documented): updates are not re-validated — the
        batch engine rewrites whole files, so per-document update
        validation would re-scan every rewrite; validate-on-ingest is
        the supported contract. Pass None to clear."""
        os.makedirs(self._store_dir, exist_ok=True)
        p = os.path.join(self._store_dir, "_VALIDATOR")
        if json_schema is None:
            if os.path.exists(p):
                os.remove(p)
            return
        # compile now to fail fast on unsupported keywords
        compile_filter({"$jsonSchema": dict(json_schema)}, None)
        with open(p, "w") as fh:
            json.dump(dict(json_schema), fh)

    def validator(self) -> Mapping[str, Any] | None:
        p = os.path.join(self._store_dir, "_VALIDATOR")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return None

    def _validate_incoming(self, df: DataFrame) -> None:
        spec = self.validator()
        if spec is None:
            return
        pred = compile_filter({"$jsonSchema": spec}, df.schema)
        bad = df.where(~F.coalesce(pred, F.lit(False))).limit(3).collect()
        if bad:
            raise DocumentValidationError(
                f"{self.namespace}: document failed $jsonSchema validation "
                f"(first offender: {bad[0].asDict()})"
            )

    def set_retention(self, n_versions: int) -> None:
        """Keep the last ``n_versions`` dataset versions instead of only
        the current one — time travel for corpus builds: audit what a
        training run actually read, diff versions, roll back by reading
        an old version and rewriting it. Retained versions are nearly
        free (copy-on-write hard links share unchanged files); the cost
        is only the rewritten/appended files each version adds. Applies
        on the next pointer swap."""
        if int(n_versions) < 1:
            raise ValueError("retention must keep at least the current version")
        os.makedirs(self._store_dir, exist_ok=True)
        with open(os.path.join(self._store_dir, "_RETENTION"), "w") as fh:
            fh.write(str(int(n_versions)))

    def retention(self) -> int:
        p = os.path.join(self._store_dir, "_RETENTION")
        if os.path.exists(p):
            with open(p) as fh:
                return max(1, int(fh.read().strip() or 1))
        return 1

    def versions(self) -> list[str]:
        """Readable dataset versions, oldest→newest (current last).
        Only versions at or below the committed pointer count — a
        version directory being written ahead of its pointer swap is
        not yet readable and is excluded."""
        ptr = self._pointer()
        cur = self._version_ordinal(ptr)
        if not os.path.isdir(self._store_dir) or cur is None:
            return []
        named = (
            (n, self._version_ordinal(n)) for n in os.listdir(self._store_dir)
        )
        return [
            n for n, o in sorted(
                ((n, o) for n, o in named
                 if o is not None and o <= cur
                 and os.path.isdir(os.path.join(self._store_dir, n))),
                key=lambda t: t[1],
            )
        ]

    def df_at(self, version: str) -> DataFrame:
        """Time-travel read: the collection AS OF ``version`` (one of
        ``versions()``). Same lazy reader as ``df()``; raises
        NotFoundError for a reaped or unknown version."""
        path = os.path.join(self._store_dir, version)
        if not os.path.isdir(path):
            raise NotFoundError(
                f"version {version!r} of {self.namespace} does not exist "
                f"(retained: {self.versions()})"
            )
        from anser_spark.sources.readers import read_table

        return read_table(self.engine.spark, path)

    def diff_versions(self, old: str, new: str | None = None) -> DataFrame:
        """Row-level diff between two retained versions (``new`` defaults
        to the current version): every row that appears in exactly one
        side, tagged ``change_type`` 'added' (in new only) or 'removed'
        (in old only) — an update shows as removed+added. Multiset
        semantics (``exceptAll``), so duplicate rows diff correctly.
        Physical shape: two scans + one hash-aggregate distinct per
        side; no driver materialization — compose/write the result like
        any frame. The CDC primitive for corpus builds: what changed
        between yesterday's dataset and today's.

        Round 10 fast path: when every commit between ``old`` and the
        current version was an insert-only append (the steady-state
        ingest shape), the diff is read STRAIGHT from the insert
        manifests — only the appended files, no exceptAll shuffle, and
        no retention requirement. Bit-equal to the exceptAll answer:
        within an unbroken append chain, added-multiset = exactly the
        appended rows and removed is empty (new = old ⊎ delta)."""
        cur = self._pointer()
        if old != cur and (new is None or new == cur):
            delta = self._manifest_delta(old)
            if delta is not None:
                # column order pinned to the collection's (hive reads
                # surface partition columns last) so downstream JSON
                # struct layouts match the exceptAll path's
                return delta.select(*self.df().columns).withColumn(
                    "change_type", F.lit("added")
                )
        new_df = self.df() if new is None or new == cur else self.df_at(new)
        old_df = self.df_at(old) if old != cur else self.df()
        # schema evolution between versions (e.g. insert added _id):
        # align both sides to the union schema, missing columns null —
        # a column the old version never had diffs as null→value
        for c in new_df.columns:
            if c not in old_df.columns:
                old_df = old_df.withColumn(
                    c, F.lit(None).cast(new_df.schema[c].dataType)
                )
        for c in old_df.columns:
            if c not in new_df.columns:
                new_df = new_df.withColumn(
                    c, F.lit(None).cast(old_df.schema[c].dataType)
                )
        old_df = old_df.select(*new_df.columns)
        added = new_df.exceptAll(old_df).withColumn("change_type", F.lit("added"))
        removed = old_df.exceptAll(new_df).withColumn("change_type", F.lit("removed"))
        return added.unionByName(removed)

    def watch(self, since: str, key: str = "_id") -> DataFrame:
        """Change-stream analogue of Mongo ``watch()``/``$changeStream``
        (batch form over retained versions): one event row per document
        that changed between ``since`` and the current version, shaped
        like change-stream events —

          - ``operationType``: 'insert' | 'update' | 'delete'
          - ``documentKey``: the ``key`` column's value (native type)
          - ``fullDocument``: post-image as a JSON string (null on
            delete) — JSON keeps the event schema stable across
            collection schemas, as Mongo's open document does
          - ``fullDocumentBeforeChange``: pre-image (null on insert) —
            Mongo 6.0 ``changeStreamPreAndPostImages`` semantics for
            free, since both endpoint versions are retained datasets

        Endpoint semantics (documented divergence): events are derived
        from the version DIFF, so intermediate states between the two
        versions collapse — a document updated then deleted emits one
        'delete' whose pre-image is its ``since``-version state. A
        replaced document emits 'update' (batch diffs cannot tell
        update from replace). Requires ``set_retention`` ≥ the window
        you want to watch.

        Physical shape (round 14, guide §2.4): pre/post images pair via
        ONE union + one key-partitioned window + one (key, rn) group —
        2 exchanges and 1 sort where the previous full-outer
        SortMergeJoin shape paid 4 exchanges and 4 sorts over the same
        (key, rn, json) rows. Multiset-safe: duplicate keys pair by
        per-side row_number, exactly as the join did — the per-side
        rank comes from one shared sort ordered (side, doc), with the
        removed side's rank offset by the key's added-count (a count
        over the same window spec, folded into the same Window exec).
        All columns ride as one JSON string each side, so the shuffle
        carries (key, rn, json) only.
        """
        from pyspark.sql.window import Window

        diff = self.diff_versions(since)
        cols = [c for c in diff.columns if c != "change_type"]
        if key not in cols:
            raise ValueError(f"watch key column {key!r} not in {cols}")
        doc = F.to_json(F.struct(*[F.col(c) for c in cols]))
        tagged = diff.where(
            F.col("change_type").isin("added", "removed")
        ).select(
            F.col(key).alias("_k"),
            F.col("change_type").alias("_side"),
            doc.alias("_doc"),
        )
        w = Window.partitionBy("_k").orderBy("_side", "_doc")
        n_added = F.count(F.when(F.col("_side") == "added", 1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        ranked = tagged.withColumn(
            "_rn",
            F.row_number().over(w)
            - F.when(F.col("_side") == "removed", n_added).otherwise(F.lit(0)),
        )
        paired = ranked.groupBy("_k", "_rn").agg(
            F.max(F.when(F.col("_side") == "added", F.col("_doc"))).alias("_post"),
            F.max(F.when(F.col("_side") == "removed", F.col("_doc"))).alias("_pre"),
        )
        return paired.select(
            F.when(F.col("_post").isNull(), F.lit("delete"))
            .when(F.col("_pre").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("operationType"),
            F.col("_k").alias("documentKey"),
            F.col("_post").alias("fullDocument"),
            F.col("_pre").alias("fullDocumentBeforeChange"),
            # resume-token analogue: the diff's endpoint version —
            # watch(resumeAfterVersion) continues exactly where this
            # batch of events left off (Mongo's event _id plays this
            # role against the oplog)
            F.lit(self._pointer()).alias("resumeAfterVersion"),
        )

    def optimize(self) -> None:
        """Compact the collection into a fresh fully-clustered version
        (the lakehouse OPTIMIZE analogue). Appends and partial COW
        rewrites add files that OVERLAP the clustered ranges (they link
        old files untouched — re-clustering them would defeat the
        file-level write path); running optimize() after heavy append
        churn restores the non-overlapping layout, re-sharpening footer
        min/max pruning. One full read→write job; same atomic pointer
        swap as every version."""
        self._rewrite(self.df())

    @staticmethod
    def _version_ordinal(name: str | None) -> int | None:
        """Leading ordinal of a version dir name: ``v7`` and
        ``v7.txn.ab12cd34`` are both ordinal 7; anything else None."""
        if not name or not name.startswith("v"):
            return None
        m = re.match(r"v(\d+)(?:\.txn\.[0-9a-f]+)?$", name)
        return int(m.group(1)) if m else None

    def _next_version(self) -> tuple[str, str | None]:
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        os.makedirs(self._store_dir, exist_ok=True)
        ptr = self._pointer()
        ordinal = self._version_ordinal(ptr)
        n = ordinal + 1 if ordinal is not None else 1
        if self.engine._txn is not None:
            # transaction scope: stage under a txn-private name so an
            # uncommitted stage can never squat on the version NAME an
            # independent (non-transactional) writer is about to commit
            # — conflicts resolve at commit-time CAS, not by dir-name
            # collision
            return f"v{n}.txn.{uuid.uuid4().hex[:8]}", ptr
        return f"v{n}", ptr

    def _swap_pointer(
        self,
        version: str,
        old_ptr: str | None,
        meta_update: Mapping[str, str] | None = None,
    ) -> None:
        """Atomic tmp+rename pointer swap, then reap version dirs older
        than the retention window (``set_retention``; default keeps only
        the new current). Versions share data files via hard links —
        removing a directory's entries leaves shared inodes alive.
        Existing pointer metadata (``pointer_meta``) is carried forward;
        ``meta_update`` merges new keys in the SAME atomic rename, so a
        metadata fact and the version it describes commit together.

        Optimistic concurrency: under an exclusive flock on the store's
        ``_LOCK`` file, the pointer is re-read and compared to
        ``old_ptr`` (the mutation's read snapshot); if another writer
        committed in between, WriteConflictError is raised and the
        just-written version directory is removed — a concurrent loser
        can never silently overwrite the winner (best-effort on
        filesystems without POSIX locks: the compare-and-swap check
        still runs, only lock-free)."""
        import contextlib

        meta = self.pointer_meta()
        if meta_update:
            meta.update({str(k): str(v) for k, v in meta_update.items()})
        txn = self.engine._txn
        if txn is not None:
            # transaction scope: stage the swap (CAS + publication happen
            # together at commit); data files are already on disk
            txn._stage(self, version, old_ptr, meta)
            return
        tmp = os.path.join(self._store_dir, f"_CURRENT.tmp.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(version)
            for k in sorted(meta):
                fh.write(f"\n{k}={meta[k]}")

        @contextlib.contextmanager
        def _store_lock():
            lockpath = os.path.join(self._store_dir, "_LOCK")
            lf = open(lockpath, "a+")  # noqa: SIM115 — held across yield
            try:
                try:
                    import fcntl

                    fcntl.flock(lf, fcntl.LOCK_EX)
                except (ImportError, OSError):
                    pass  # lock-free fallback: CAS check below still runs
                yield
            finally:
                lf.close()  # releases the flock

        with _store_lock():
            committed = self._pointer()
            if committed != old_ptr:
                os.remove(tmp)
                shutil.rmtree(
                    os.path.join(self._store_dir, version), ignore_errors=True
                )
                raise WriteConflictError(
                    f"{self.namespace}: version {committed!r} was committed by "
                    f"another writer after this mutation read {old_ptr!r}; "
                    "retry against the new current version"
                )
            os.replace(tmp, os.path.join(self._store_dir, "_CURRENT"))
        self._reap_versions(version)

    def _reap_versions(self, version: str) -> None:
        # reap versions beyond the retention window (default 1 = only
        # the new current). Hard-linked files mean a retained version
        # costs directory entries, not data bytes, unless rewritten.
        # Staged dirs of a CONCURRENT still-active transaction can fall
        # below the window and be reclaimed here — that transaction's
        # commit-time CAS is already doomed (the pointer moved), so
        # only its read-your-writes view is cut short (documented).
        keep = max(1, self.retention())
        current_n = self._version_ordinal(version) or 0
        for name in os.listdir(self._store_dir):
            o = self._version_ordinal(name)
            if o is not None and o <= current_n - keep:
                shutil.rmtree(
                    os.path.join(self._store_dir, name), ignore_errors=True
                )

    def _zorder_key(self, df: DataFrame, cols: Sequence[str]) -> Any:
        """Interleaved-bits Z-order key over ``cols`` as one long
        Column. Numeric/timestamp/date columns bucket by range (min/max
        via ONE small aggregate job — the same scan the range exchange
        pays anyway); other types bucket by hash (equality pruning
        only). Nulls sort first (bucket 0)."""
        from pyspark.sql import types as T

        bits = min(16, 62 // max(1, len(cols)))
        nb = (1 << bits) - 1

        def rank_expr(c: str):
            dt = df.schema[c].dataType
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                num = F.unix_micros(F.col(c)).cast("double")
            elif isinstance(dt, T.DateType):
                num = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
            elif isinstance(dt, T.NumericType):
                num = F.col(c).cast("double")
            else:
                return F.pmod(F.xxhash64(F.col(c)), F.lit(nb + 1)).cast("long")
            return num  # bucketed below once min/max are known

        numeric = [
            c for c in cols
            if isinstance(
                df.schema[c].dataType,
                (T.NumericType, T.TimestampType, T.TimestampNTZType, T.DateType),
            )
        ]
        stats = {}
        if numeric:
            row = df.agg(
                *[F.min(rank_expr(c)).alias(f"lo_{i}") for i, c in enumerate(numeric)],
                *[F.max(rank_expr(c)).alias(f"hi_{i}") for i, c in enumerate(numeric)],
            ).collect()[0]
            for i, c in enumerate(numeric):
                stats[c] = (row[f"lo_{i}"], row[f"hi_{i}"])

        buckets = []
        for c in cols:
            if c in stats:
                lo, hi = stats[c]
                if lo is None or hi is None or hi <= lo:
                    buckets.append(F.lit(0).cast("long"))
                    continue
                b = F.floor(
                    (rank_expr(c) - F.lit(float(lo)))
                    / F.lit((float(hi) - float(lo)) / nb)
                ).cast("long")
                buckets.append(
                    F.coalesce(F.least(b, F.lit(nb)), F.lit(0)).cast("long")
                )
            else:
                buckets.append(F.coalesce(rank_expr(c), F.lit(0)).cast("long"))
        zkey = F.lit(0).cast("long")
        for i in range(bits):
            for j, b in enumerate(buckets):
                bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
                zkey = zkey + F.shiftleft(bit, i * len(buckets) + j)
        return zkey

    def _write_version(
        self, df: DataFrame, version: str, pcols: Sequence[str] | None = None
    ) -> str:
        raw_ccols, n_shards = self.clustering_columns()
        ccols = [c for c in raw_ccols if c in df.columns]
        if ccols and self.clustering_layout() == "zorder" and len(ccols) > 1:
            # Z-order layout: range-partition + sort on the interleaved
            # key so every clustering column gets min/max locality
            df = df.withColumn("__zkey", self._zorder_key(df, ccols))
            df = (
                df.repartitionByRange(n_shards, F.col("__zkey"))
                if n_shards
                else df.repartitionByRange(F.col("__zkey"))
            ).sortWithinPartitions("__zkey").drop("__zkey")
        elif ccols:
            # clustered layout: range-partition + sort so every written
            # file covers a narrow, non-overlapping key range — parquet
            # footer min/max stats become selective (see set_clustering)
            cexprs = [F.col(c) for c in ccols]
            df = (
                df.repartitionByRange(n_shards, *cexprs)
                if n_shards
                else df.repartitionByRange(*cexprs)
            ).sortWithinPartitions(*ccols)
        writer = df.write.mode("overwrite")
        pcols = self.partition_columns() if pcols is None else list(pcols)
        pcols = [c for c in pcols if c in df.columns]
        if pcols:
            writer = writer.partitionBy(*pcols)
        vdir = os.path.join(self._store_dir, version)
        # exclusive version-dir creation: write to a scratch dir, then
        # one atomic rename. rename refuses a non-empty target, so two
        # writers racing to the same version NUMBER can never clobber
        # each other's files — the loser detects the race here instead
        # of silently overwriting the winner and failing CAS later
        # (retention listings skip the scratch names: "N.w.x" isn't
        # a digit string).
        scratch = f"{vdir}.w.{uuid.uuid4().hex[:8]}"
        writer.parquet(scratch)
        try:
            os.rename(scratch, vdir)
        except OSError:
            shutil.rmtree(scratch, ignore_errors=True)
            raise WriteConflictError(
                f"{self.namespace}: version {version} was concurrently "
                "created by another writer; retry against the new current "
                "version"
            )
        if not pcols:
            # known schema ⇒ the first read of this version skips the
            # footer-inference job (round 14; COW callers that link
            # more files in afterwards re-prime at their tail — the
            # mtime-stamped entry self-invalidates in between).
            # Partitioned layouts skip: inference re-adds pcols.
            from anser_spark.sources.readers import prime_schema_cache

            prime_schema_cache(vdir, df.schema)
        return vdir

    def _rewrite(
        self, df: DataFrame, meta_update: Mapping[str, str] | None = None
    ) -> None:
        """Write the next dataset version and swap the pointer atomically."""
        version, ptr = self._next_version()
        self._write_version(df, version)
        self._swap_pointer(version, ptr, meta_update)
        # a full rewrite breaks every insert-manifest chain (file names
        # change; earlier deltas are no longer addressable in the new
        # layout) — clear them so a recreated collection can never
        # chain through a previous incarnation's manifests. Losing a
        # manifest is always SAFE: consumers fall back to the
        # diff/rebuild path (round 10).
        shutil.rmtree(self._deltas_dir(), ignore_errors=True)

    # -- insert manifests (round 10) ------------------------------------
    # Every insert-only commit records WHICH files it appended, so
    # incremental consumers (search-index refresh) can read exactly the
    # appended rows instead of diffing two corpus-wide snapshots — at
    # 100 TB that is the difference between an O(delta) batch and ~3
    # full-corpus scans per refresh. Manifests live outside the version
    # dirs (they must survive retention reaping: appended files keep
    # their relative paths through later appends via the hard-link COW,
    # so the CURRENT version dir can serve any chain suffix).

    def _deltas_dir(self) -> str:
        return os.path.join(self._store_dir, "_deltas")

    def _write_insert_manifest(
        self,
        version: str,
        prev: str | None,
        rel_files: Sequence[str],
        pre_rel: str | None = None,
        ins_rel: str | None = None,
        ins_cols: Sequence[str] | None = None,
    ) -> None:
        """Record a commit's manifest: ``kind:"insert"`` (this commit
        only appended the listed files) or — when ``pre_rel`` names a
        pre-image parquet under ``_deltas/`` — ``kind:"mutation"``
        (round 11: the listed files are the REWRITTEN files carrying
        the mutated ids' post-state plus bystander pass-through rows;
        the pre-image holds exactly the matched rows as they were,
        so index refresh can tombstone + re-index O(mutated docs)).
        ``ins_rel`` (insert commits, when an index exists) names a
        small parquet of the appended ids: with it, a LATER mutation
        may rewrite this commit's files without breaking the refresh
        chain — the inserted ids stay enumerable and their current
        rows are recovered from the rewrite's bystander carries.
        A mutation manifest may ALSO carry ``ins_rel`` + ``ins_cols``
        (round 12, HYBRID): per-id-column sidecars under
        ``{ins_rel}/{quoted col}`` enumerating ids the rewrite
        introduced (upsert-synthesized bulk inserts, rewritten custom
        id fields) — ``_chain_delta`` classifies those as inserts."""
        os.makedirs(self._deltas_dir(), exist_ok=True)
        m: dict[str, Any] = {"prev": prev, "files": list(rel_files)}
        if pre_rel is not None:
            m["kind"] = "mutation"
            m["pre"] = pre_rel
            if ins_rel is not None and ins_cols:
                m["ins"] = ins_rel
                m["ins_cols"] = list(ins_cols)
        elif ins_rel is not None:
            m["ins"] = ins_rel
        tmp = os.path.join(self._deltas_dir(), f".{version}.tmp")
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.replace(tmp, os.path.join(self._deltas_dir(), f"{version}.json"))

    def _index_id_cols(self) -> set[str]:
        """Document-id column names across this collection's
        incrementally-refreshable (bm25/minhash) index definitions."""
        out: set[str] = set()
        for nm in self.list_search_indexes():
            try:
                dd = self._load_search_index(nm, warn_stale=False)
            except NotFoundError:
                continue
            if dd.get("kind") in ("bm25", "minhash") or (
                dd.get("kind") in ("ivf", "ivfpq") and dd.get("cells_dir")
            ):
                out.add(str(dd.get("id_col", "_id")))
        return out

    def _insert_manifest(self, version: str) -> dict[str, Any] | None:
        p = os.path.join(self._deltas_dir(), f"{version}.json")
        if not os.path.exists(p):
            return None
        try:
            with open(p) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None

    def _manifest_delta(self, since: str) -> DataFrame | None:
        """The rows appended between version ``since`` and the current
        version, read from ONLY the appended files (O(delta), no diff
        shuffle) — or None when any intervening version was not an
        insert-only append (update/remove/rewrite breaks the chain) or
        a manifest is missing. Round 11: mutation commits now record
        manifests too (``kind: "mutation"``) — those still return None
        HERE, because this fast path's contract is insert-only windows
        (watch()/diff_versions); index refresh consumes mutations via
        ``_chain_delta``. Appended files keep their relative paths
        through subsequent appends (hard-link COW), so the chain's
        files are all read out of the CURRENT version directory;
        ``basePath`` keeps hive-partition columns intact."""
        events = self._chain_events(since)
        if events is None or any(e["kind"] != "insert" for e in events):
            return None
        cur_dir = os.path.join(self._store_dir, str(self._pointer()))
        paths = [p for e in events for p in e["paths"]]
        if not paths:
            return self.df().limit(0)  # pointer moved, zero new rows
        reader = self.engine.spark.read
        union = self._read_version_schema(cur_dir)
        if union is not None:
            # mixed-schema dir (round 13): pre-evolution insert files
            # null-fill the added columns under the recorded union
            reader = reader.schema(union)
        return reader.option("basePath", cur_dir).parquet(*paths)

    def _chain_events(self, since: str) -> list[dict[str, Any]] | None:
        """The commit chain from ``since`` (exclusive) to the current
        version as an oldest-first manifest-event list, or None when
        any commit in the window recorded no manifest (full rewrite,
        schema change, pre-manifest lineage), a referenced file is no
        longer addressable in the current version directory, or a
        mutation pre-image was garbage-collected. Each event carries
        ``kind`` ("insert" | "mutation"), ``paths`` (this commit's
        written data files, resolved in the CURRENT dir — appends keep
        relative paths through later hard-link commits, and a later
        mutation that rewrites one of them breaks the chain via the
        existence check, conservatively), and for mutations
        ``pre_path`` (the matched rows' pre-image parquet)."""
        cur = self._pointer()
        if cur is None or since is None:
            return None
        events: list[dict[str, Any]] = []
        v: str | None = cur
        seen: set[str] = set()
        while v != since:
            if v is None or v in seen:
                return None  # fell off the chain start / cycle guard
            seen.add(v)
            m = self._insert_manifest(v)
            if m is None:
                return None  # a commit with no manifest breaks the chain
            kind = str(m.get("kind") or "insert")
            if kind not in ("insert", "mutation"):
                return None  # future manifest kind — be conservative
            events.append({"version": v, "kind": kind, "m": m})
            v = m.get("prev")
        events.reverse()
        cur_dir = os.path.join(self._store_dir, cur)
        for e in events:
            paths = [
                os.path.join(cur_dir, r) for r in (e["m"].get("files") or [])
            ]
            if e["kind"] == "mutation":
                # a LATER mutation may have rewritten this event's
                # output files — that's fine: every still-live row of a
                # rewritten file was carried forward into the later
                # event's files as a bystander, so the surviving subset
                # plus later events' files still hold every mutated
                # id's final state (consumers pick the max-seq copy).
                # The pre-image, by contrast, is immutable and REQUIRED.
                e["paths"] = [p for p in paths if os.path.exists(p)]
                pre = e["m"].get("pre")
                pre_path = (
                    os.path.join(self._deltas_dir(), str(pre)) if pre else ""
                )
                if not pre or not os.path.isdir(pre_path):
                    return None  # pre-image reaped — fall back
                e["pre_path"] = pre_path
                # hybrid manifest (round 12): per-id-column sidecars of
                # ids this rewrite INTRODUCED (upsert-synthesized bulk
                # inserts). Like the pre-image they are REQUIRED — a
                # reaped sidecar would make those rows look like
                # bystanders and silently skip indexing them.
                subs: dict[str, str] = {}
                ins = e["m"].get("ins")
                if ins:
                    ins_path = os.path.join(self._deltas_dir(), str(ins))
                    for c in e["m"].get("ins_cols") or []:
                        sp = os.path.join(ins_path, _ins_col_rel(str(c)))
                        if not os.path.isdir(sp):
                            return None  # insert sidecar reaped
                        subs[str(c)] = sp
                e["ins_subs"] = subs
            else:
                # insert files enumerate WHICH ids the commit added.
                # With the manifest's id sidecar (round 11) they may
                # vanish — a later mutation that rewrote them carried
                # every still-live row forward, and the sidecar keeps
                # the ids enumerable; without a sidecar they must ALL
                # survive (carried rows alone are indistinguishable
                # from bystanders).
                ins = e["m"].get("ins")
                ins_path = (
                    os.path.join(self._deltas_dir(), str(ins)) if ins else ""
                )
                e["ins_path"] = (
                    ins_path if ins and os.path.isdir(ins_path) else None
                )
                if e["ins_path"] is not None:
                    e["paths"] = [p for p in paths if os.path.exists(p)]
                else:
                    if any(not os.path.exists(p) for p in paths):
                        return None  # rewritten/vanished — fall back
                    e["paths"] = paths
        return events

    def _chain_delta(
        self, since: str, id_col: str
    ) -> dict[str, DataFrame | None] | None:
        """The NET document-level change between ``since`` and the
        current version, computed entirely from the manifest chain —
        O(rows touched in the window), never a corpus read (round 11;
        this is what lets one ``update()`` or ``remove()`` refresh a
        search index incrementally instead of forcing a full rebuild).

        Returns None when the chain is broken (caller rebuilds), else
        ``{"added", "tomb_pre", "remut"}``:

        - ``added`` — current rows of ids whose FIRST event in the
          window is an insert (genuinely new documents; an id inserted
          then removed inside the window appears nowhere);
        - ``tomb_pre`` — the state AT ``since`` of ids whose first
          event is a mutation (its pre-image: no earlier event touched
          the id, so the first mutation's pre-image IS the ``since``
          state). These are the documents whose indexed rows must be
          tombstoned and whose statistics must roll DOWN;
        - ``remut`` — the current rows of those same ids when they
          still exist (update ⇒ tombstone + re-insert); a tomb_pre id
          absent from remut was removed.

        Multiple events on one id net out (update×3 ⇒ one tombstone +
        one re-insert; remove+re-insert of the same id classifies as
        an update — no uniqueness hazard). For an all-insert window
        the fast path returns the appended files as ``added`` with no
        shuffle at all, exactly the round-10 behavior."""
        events = self._chain_events(since)
        if events is None:
            return None
        spark = self.engine.spark
        cur_dir = os.path.join(self._store_dir, str(self._pointer()))
        cur_union = self._read_version_schema(cur_dir)

        def read_paths(paths: list[str]) -> DataFrame:
            if not paths:
                return self.df().limit(0)
            reader = spark.read
            if cur_union is not None:
                # mixed-schema dir (round 13): normalize every event's
                # files to the union so the chain accumulations align
                reader = reader.schema(cur_union)
            return reader.option("basePath", cur_dir).parquet(*paths)

        if all(e["kind"] == "insert" for e in events):
            paths = [p for e in events for p in e["paths"]]
            return {
                "added": read_paths(paths), "tomb_pre": None, "remut": None
            }
        if id_col not in self.df().columns:
            return None  # mutation netting needs the document id
        ic = F.col(id_col)
        tall = None  # (__cid, __seq, __mut): every touch of every id
        pres = None  # mutation pre-image rows + __pseq
        copies = None  # surviving row copies (insert files + rewrites) + __pseq
        for seq, e in enumerate(events):
            if e["kind"] == "insert":
                rows = read_paths(e["paths"])
                if id_col not in rows.columns:
                    return None
                if e.get("ins_path"):
                    # the manifest's id sidecar enumerates the commit's
                    # ids even when a later rewrite replaced its files
                    ids_src = _read_pt(spark, e["ins_path"])
                    if id_col not in ids_src.columns:
                        return None
                    t = ids_src.select(
                        ic.alias("__cid"),
                        F.lit(seq).alias("__seq"),
                        F.lit(False).alias("__mut"),
                    )
                else:
                    t = rows.select(
                        ic.alias("__cid"),
                        F.lit(seq).alias("__seq"),
                        F.lit(False).alias("__mut"),
                    )
                c = rows.withColumn("__pseq", F.lit(seq))
            else:
                pre = _read_pt(spark, e["pre_path"])
                if id_col not in pre.columns:
                    return None
                t = pre.select(
                    ic.alias("__cid"),
                    F.lit(seq).alias("__seq"),
                    F.lit(True).alias("__mut"),
                )
                sub = (e.get("ins_subs") or {}).get(id_col)
                if sub:
                    # hybrid manifest (round 12): ids this rewrite
                    # INTRODUCED touch the chain as inserts — disjoint
                    # from the pre-image ids by construction (extras
                    # were anti-joined against the affected files), so
                    # the first-event classification can never tie
                    ii = _read_pt(spark, sub)
                    if id_col not in ii.columns:
                        return None
                    t = t.unionByName(
                        ii.select(
                            ic.alias("__cid"),
                            F.lit(seq).alias("__seq"),
                            F.lit(False).alias("__mut"),
                        )
                    )
                p = pre.withColumn("__pseq", F.lit(seq))
                # allowMissingColumns: a pre-image written before a
                # schema-adding mutation lacks the later columns —
                # null-filled here, exactly the missing-field semantics
                pres = (
                    p if pres is None
                    else pres.unionByName(p, allowMissingColumns=True)
                )
                c = read_paths(e["paths"]).withColumn("__pseq", F.lit(seq))
            copies = c if copies is None else copies.unionByName(c)
            tall = t if tall is None else tall.unionByName(t)
        bounds = (
            tall.groupBy("__cid")
            .agg(
                F.min("__seq").alias("__first_seq"),
                F.max("__seq").alias("__last_seq"),
                F.min_by("__mut", "__seq").alias("__first_mut"),
            )
            .localCheckpoint()
        )

        def _at(rows: DataFrame | None, seq_col: str) -> DataFrame | None:
            # rows of each id at its first/last event — the (id, seq)
            # semi-join filters an event's bystander rows out (a
            # mutation's rewritten files carry unmatched pass-through
            # rows of OTHER ids; those ids are untouched here, or their
            # own files would have broken the chain's existence check)
            if rows is None:
                return None
            want = bounds.select(
                F.col("__cid"), F.col(seq_col).alias("__pseq"),
                F.col("__first_mut"),
            )
            return (
                rows.join(
                    want,
                    (rows[id_col] == want["__cid"])
                    & (rows["__pseq"] == want["__pseq"]),
                    "inner",
                )
                .drop("__cid", "__pseq")
            )

        tomb_pre = _at(pres, "__first_seq").where(
            F.col("__first_mut")
        ).drop("__first_mut")
        # finals: per touched id, the HIGHEST-seq surviving copy — the
        # last touching event's own output when its file survived, else
        # a bystander carry in a later rewrite's files (a rewrite
        # copies every still-live row of its hit files forward). A
        # removed id has no surviving copy anywhere — that absence IS
        # the removal signal; a STALE copy cannot outlive its
        # supersession, because the event that superseded an id's row
        # rewrote exactly the file holding it.
        from pyspark.sql.window import Window

        want = bounds.select("__cid", "__first_mut")
        cp = copies.join(
            want, copies[id_col] == want["__cid"], "inner"
        ).drop("__cid")
        w = Window.partitionBy(F.col(id_col)).orderBy(
            F.col("__pseq").desc()
        )
        finals = (
            cp.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__pseq")
        )
        added = finals.where(~F.col("__first_mut")).drop("__first_mut")
        remut = finals.where(F.col("__first_mut")).drop("__first_mut")
        return {"added": added, "tomb_pre": tomb_pre, "remut": remut}

    def _data_files(self, base: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(base):
            for f in files:
                if f.endswith(".parquet") and not f.startswith((".", "_")):
                    out.append(os.path.join(root, f))
        return out

    # -- schema-evolving partial COW (round 13) --------------------------
    # A `$set` introducing a new field, a `$rename`, or an insert batch
    # carrying a column the collection has never seen — the reference's
    # flagship migration shapes (example_test.go:50-66, README.rst:34-38)
    # — used to fall back to a FULL corpus rewrite (and with it, wiping
    # the manifest chain and forcing a full index rebuild). When the
    # evolution is purely ADDITIVE (every existing column keeps its name
    # and exact type; new nullable columns appended), the rewrite now
    # stays file-level: untouched files hard-link unchanged, and the
    # version directory records the union schema in a `_SCHEMA.json`
    # sidecar that `read_parquet_table` applies as an explicit read
    # schema — Spark null-fills columns a file lacks, which is exactly
    # Mongo's missing-field semantics. Non-additive changes (dropped
    # columns, type changes, struct-internal evolution) still full-
    # rewrite: null-filling cannot reconcile those.

    @staticmethod
    def _additive_union_schema(
        old: T.StructType, new: T.StructType
    ) -> T.StructType | None:
        """The union schema when ``new`` evolves ``old`` purely
        additively — every ``old`` column present in ``new`` with the
        IDENTICAL type — else None. All fields are forced nullable (old
        files null-fill the added columns; parquet's reader permits the
        relaxation on existing ones)."""
        new_by = {f.name: f for f in new.fields}
        for f in old.fields:
            g = new_by.get(f.name)
            if g is None:
                return None  # dropped column
            if g.dataType.simpleString() != f.dataType.simpleString():
                return None  # type change (incl. struct-internal)
        return T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in new.fields]
        )

    def _read_version_schema(self, vdir: str | None) -> T.StructType | None:
        from anser_spark.sources.readers import version_schema

        return version_schema(vdir) if vdir else None

    def _write_version_schema(self, vdir: str, schema: T.StructType) -> None:
        from anser_spark.sources.readers import VERSION_SCHEMA_SIDECAR

        forced = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        )
        tmp = os.path.join(vdir, f".{VERSION_SCHEMA_SIDECAR}.tmp")
        with open(tmp, "w") as fh:
            json.dump(forced.jsonValue(), fh)
        os.replace(tmp, os.path.join(vdir, VERSION_SCHEMA_SIDECAR))

    @staticmethod
    def _local_path(uri: str) -> str:
        # _metadata.file_path URIs come as file:/abs or file:///abs
        if uri.startswith("file:"):
            from urllib.parse import unquote, urlparse

            return unquote(urlparse(uri).path)
        return uri

    @staticmethod
    def _hive_partition_keys(base: str, files: list[str]) -> list[str] | None:
        """Ordered hive partition keys reconstructed from data-file
        paths (``key=value`` directory segments). Returns ``[]`` for a
        flat layout, the key list for a consistent hive layout, and
        ``None`` when the layout is inconsistent (mixed depths or
        non-hive directory levels) — partial rewrites can't preserve
        partition values there."""
        keys: list[str] | None = None
        saw_hive = False
        for f in files:
            segs = os.path.relpath(f, base).split(os.sep)[:-1]
            fkeys = [s.split("=", 1)[0] for s in segs if "=" in s]
            if len(fkeys) != len(segs):
                return None  # a directory level that isn't key=value
            if fkeys:
                saw_hive = True
            if keys is None:
                keys = fkeys
            elif keys != fkeys:
                return None
        return (keys or []) if saw_hive else []

    @staticmethod
    def _pred_nondeterministic(pred: F.Column) -> bool:
        """True when the predicate draws randomness ($sampleRate, $rand
        in $expr): each evaluation is a fresh draw, so file detection,
        the mutation, and caller-side counts would disagree unless the
        draw is materialized once."""
        s = str(pred)
        return any(tok in s for tok in ("rand(", "randn(", "random(", "uuid(", "shuffle("))

    def _cow_rewrite(
        self,
        pred: F.Column,
        transform,
        want_count: bool = False,
        hit_files: set[str] | None = None,
        ids_preserved: bool | None = None,
    ) -> tuple[bool, int | None]:
        """File-level copy-on-write: rewrite ONLY the parquet files that
        contain rows matching ``pred``; hard-link every untouched file
        into the new version unchanged (copy if linking fails). The
        match-file detection is one pushed-down scan — Parquet footer
        min/max stats prune non-matching files/row-groups without reading
        them — so an update touching one partition reads and rewrites one
        partition, not the dataset. The atomic pointer swap is unchanged.

        ``transform(df_of_affected_files) -> replacement rows`` must
        return the full replacement content for the affected files
        (matched rows transformed, unmatched rows passed through).

        Falls back to a full rewrite when file-level surgery can't apply:
        single-file datasets, every file hit, ns-timestamp sources (new
        µs files + old ns files can't share one dataset), layouts with
        inconsistent/non-hive directory levels, or a schema-changing
        transform (rewritten files would carry columns the linked files
        lack — the plain reader silently drops them). Hive-partitioned
        layouts the engine did NOT create are handled: partition keys
        are reconstructed from ``key=value`` path segments and the
        replacement is written partitionBy those keys, so a
        one-partition update rewrites one partition.

        Returns ``(wrote, matched)``: ``wrote`` is True iff a new
        version was written (False ⇒ no row matched ``pred`` and the
        current version stands); ``matched`` is the matching-row count
        when ``want_count`` (fused into the SAME detection scan — at
        scale this halves the read work vs a separate ``count()`` job),
        else None. The nondeterministic-predicate branch never computes
        a count (a second evaluation would be a different draw) —
        callers that need counts for random predicates must materialize
        the draw themselves first. ``transform`` may be called twice
        (schema-change fallback) — driver-side side effects inside it
        must be re-entrant.
        """
        from anser_spark.sources.readers import _ns_timestamp_columns, read_parquet_table

        path = self.current_path()
        if path is None:
            raise NotFoundError(f"collection does not exist: {self.namespace}")
        if self._pred_nondeterministic(pred):
            # a random predicate re-draws per scan: the detected files,
            # the mutated rows, and reported counts would be three
            # different samples — full rewrite evaluates it in ONE job
            self._rewrite(transform(self.df()))
            return True, None
        if os.path.isfile(path) or _ns_timestamp_columns(path):
            base = self.df()
            matched = base.where(pred).count() if want_count else None
            self._rewrite(transform(base))
            return True, matched
        all_files = self._data_files(path)
        if not all_files:
            # non-parquet directory source (e.g. an ORC mount): file-level
            # surgery doesn't apply — materialize as a parquet version
            base = self.df()
            matched = base.where(pred).count() if want_count else None
            self._rewrite(transform(base))
            return True, matched
        write_pcols: Sequence[str] | None = None  # default: managed partitioning
        if not self.partition_columns():
            # layout we didn't create: reconstruct partition keys from
            # the key=value path segments so a partial rewrite keeps
            # writing into the same hive structure (Spark reads the
            # values back via basePath partition discovery)
            hive_keys = self._hive_partition_keys(path, all_files)
            if hive_keys is None:
                # inconsistent layout — partition values wouldn't
                # survive a partial rewrite
                base = self.df()
                matched = base.where(pred).count() if want_count else None
                self._rewrite(transform(base))
                return True, matched
            write_pcols = hive_keys
        if hit_files is not None:
            # caller already knows the affected files (e.g. the victim
            # file captured in a first-match scan) — skip detection
            hit_files = {self._local_path(f) for f in hit_files}
            matched = None
        else:
            tagged = read_parquet_table(self.engine.spark, path, file_col="__file")
            # ONE pushed-down scan yields both the hit-file set and the
            # matched-row count (footer min/max stats still prune)
            per_file = tagged.where(pred).groupBy("__file").count().collect()
            hit_files = {self._local_path(r["__file"]) for r in per_file}
            matched = sum(r["count"] for r in per_file) if want_count else None
        if not hit_files:
            return False, 0  # no matching rows anywhere — current version stands
        # every-file-hit mutations flow through the normal path (with
        # an empty link loop) so the mutation manifest still records —
        # a remove that happens to touch all files stays incrementally
        # refreshable (round 11). When NO incrementally-refreshable
        # index exists the manifest is the only reason to be here, so
        # short-circuit to the plain full rewrite (round 12: the r10
        # fast path restored — the partial-COW detour's explicit-file
        # read, schema-shape compare, and version bookkeeping are pure
        # overhead on unindexed collections).
        untouched = [p for p in all_files if p not in hit_files]
        if not untouched and not self._index_id_cols():
            self._rewrite(transform(self.df()))
            return True, matched
        affected = read_parquet_table(self.engine.spark, path, files=sorted(hit_files))
        replacement = transform(affected)
        shape = lambda s: sorted((f.name, f.dataType.simpleString()) for f in s.fields)  # noqa: E731
        evolved: T.StructType | None = None
        if shape(replacement.schema) != shape(affected.schema):
            # schema evolved. ADDITIVE evolution ($set new field,
            # $rename's added column — the reference's flagship
            # migration shapes) keeps the partial rewrite: untouched
            # files link unchanged and the union-schema sidecar
            # null-fills their missing columns at read (round 13).
            # Non-additive (dropped column / type change) still
            # full-rewrites — a mixed dataset can't reconcile those.
            evolved = self._additive_union_schema(
                affected.schema, replacement.schema
            )
            if evolved is None:
                self._rewrite(transform(self.df()))
                return True, matched
        version, ptr = self._next_version()
        pre_rel: str | None = None
        ins_rel: str | None = None
        ins_cols: list[str] = []
        plan = self._mutation_manifest_plan(affected, replacement, ids_preserved)
        if plan is not None:
            # round 11: record the mutation so search-index refresh can
            # stay incremental (tombstone + re-index O(mutated docs)
            # instead of a full rebuild). The PRE-IMAGE — the matched
            # rows exactly as they are now — must be materialized
            # BEFORE the pointer swap: the swap's retention reap can
            # delete the old version's rewritten-away files. Gated on
            # an incrementally-refreshable index existing, so unindexed
            # collections' mutation path stays zero-overhead.
            pre_rel = f"{version}_pre"
            affected.where(pred).write.mode("overwrite").parquet(
                os.path.join(self._deltas_dir(), pre_rel)
            )
            if plan:
                # HYBRID manifest (round 12): the rewrite introduced
                # ids the affected files didn't carry — the bulk path
                # unions its upsert-synthesized docs into the
                # replacement, and an update may rewrite a custom id
                # field. Enumerating them per index id column (a slim
                # O(extras) sidecar) makes them distinguishable from
                # bystander pass-through rows at refresh time:
                # _chain_delta classifies them as inserts, so an
                # upsert-heavy bulk no longer forces a full rebuild of
                # every index on the collection.
                ins_rel = f"{version}_ins"
                for col, extras in plan.items():
                    extras.write.mode("overwrite").parquet(
                        os.path.join(
                            self._deltas_dir(), ins_rel, _ins_col_rel(col)
                        )
                    )
                    ins_cols.append(col)
        vdir = self._write_version(replacement, version, pcols=write_pcols)
        rewritten_rels = [
            os.path.relpath(f, vdir) for f in self._data_files(vdir)
        ]
        for src_file in untouched:
            rel = os.path.relpath(src_file, path)
            dst = os.path.join(vdir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src_file, dst)
            except OSError:
                shutil.copy2(src_file, dst)
        if evolved is not None or self._read_version_schema(path) is not None:
            # the new version dir mixes schemas (this rewrite evolved
            # it, or an earlier one did and its files were linked
            # forward) — record the union before the swap so no reader
            # ever sees the mixed dir without it. When not evolving,
            # replacement.schema IS the prior union (affected was read
            # through the sidecar).
            self._write_version_schema(
                vdir, evolved if evolved is not None else replacement.schema
            )
        try:
            self._swap_pointer(version, ptr)
        except WriteConflictError:
            for rel in (pre_rel, ins_rel):  # orphaned CAS-loser deltas
                if rel is not None:
                    shutil.rmtree(
                        os.path.join(self._deltas_dir(), rel),
                        ignore_errors=True,
                    )
            raise
        if pre_rel is not None:
            # after the swap, same contract as _cow_append's manifest: a
            # CAS loser raised above; a transaction-staged swap records
            # under its txn-unique version name, only ever referenced if
            # that transaction commits
            self._write_insert_manifest(
                version, ptr, rewritten_rels, pre_rel=pre_rel,
                ins_rel=ins_rel, ins_cols=ins_cols,
            )
        if evolved is None and not any(os.sep in r for r in rewritten_rels):
            # re-prime after the hard-links changed the dir stamp (the
            # _write_version prime self-invalidated): non-evolved COW
            # keeps the read schema == replacement's, so the follow-up
            # read skips its footer job. Sidecar dirs skip inside.
            from anser_spark.sources.readers import prime_schema_cache

            prime_schema_cache(vdir, replacement.schema)
        return True, matched

    def _mutation_preserves_ids(self, update: Any) -> bool | None:
        """True when an operator-form update document provably cannot
        modify any search-index id column (its target paths avoid them
        all — the overwhelmingly common case, since Mongo forbids _id
        updates outright), letting the COW rewrite skip its new-id
        detection scan. None = unknown (pipeline-form updates,
        replacement documents, $rename onto an id) — the scan decides."""
        id_cols = self._index_id_cols()
        if not id_cols:
            return True  # no manifest will be recorded anyway
        if not isinstance(update, Mapping) or not update:
            return None
        if any(not str(k).startswith("$") for k in update):
            return None  # replacement document: every column rewrites
        for op, arg in update.items():
            if not isinstance(arg, Mapping):
                return None
            paths = [str(p) for p in arg]
            if op == "$rename":
                paths += [str(v) for v in arg.values()]
            for p in paths:
                if p.split(".", 1)[0] in id_cols:
                    return None
        return True

    def _mutation_manifest_plan(
        self,
        affected: DataFrame,
        replacement: DataFrame,
        ids_preserved: bool | None = None,
    ) -> dict[str, DataFrame] | None:
        """What manifest this partial COW rewrite should record:

        - ``None`` — no manifest: no incrementally-refreshable index
          (bm25/minhash) exists, so the pre-image write would be pure
          overhead;
        - ``{}`` — a plain mutation manifest: the transform introduced
          NO id the affected files didn't already carry (the
          overwhelmingly common case);
        - ``{col: extras}`` — a HYBRID manifest (round 12): the
          transform introduced new ids under ``col`` (the bulk path
          unions upsert-synthesized docs into its rewrite; an update
          may rewrite a custom id field). ``extras`` is the slim
          distinct frame of those id values, recorded as a per-column
          insert sidecar so ``_chain_delta`` can classify their rows
          as inserts instead of silently skipping them as bystanders —
          round 11 refused the manifest here, which made every
          upsert-mixing bulk a full index rebuild.

        One anti-join over the hit files per distinct index id column
        decides (``limit(1)`` probe first, materialized only when
        extras exist). A swapped id — one doc removed while another is
        renamed onto its id in the same commit — stays in the id set
        and nets as an update of that id, which is exactly correct.

        ``ids_preserved=True`` — the caller statically proved the
        transform cannot touch an index id column (removes, and
        operator-form updates whose paths avoid them;
        ``_mutation_preserves_ids``) — skips the detection scan."""
        id_cols = self._index_id_cols()
        if not id_cols:
            return None
        if ids_preserved:
            return {}
        plan: dict[str, DataFrame] = {}
        for ic in sorted(id_cols):
            if ic not in replacement.columns or ic not in affected.columns:
                continue  # netting skips this index anyway (id missing)
            extras = (
                replacement.select(F.col(ic))
                .distinct()
                .join(affected.select(F.col(ic)), ic, "left_anti")
            )
            if extras.limit(1).count():
                if extras.where(F.col(ic).isNull()).limit(1).count():
                    # a NULL id can't be netted (every join in the
                    # chain walk is an equi-join) — record no manifest
                    # so refresh falls back to a rebuild, conservative
                    return None
                plan[ic] = extras
        return plan

    def _cow_append(
        self, new_df: DataFrame, meta_update: Mapping[str, str] | None = None
    ) -> None:
        """Append-only copy-on-write: link EVERY existing file unchanged
        and write just the new rows as additional files. Requires an
        exactly matching schema (else parquet files in one dataset
        diverge); falls back to a full rewrite otherwise."""
        from anser_spark.sources.readers import _ns_timestamp_columns

        path = self.current_path()
        if path is None:
            self._rewrite(new_df, meta_update=meta_update)
            return
        base_schema = self.df().schema
        aligned = self._align(new_df, base_schema)
        shape = lambda s: [(f.name, f.dataType.simpleString()) for f in s.fields]  # noqa: E731
        existing = [] if os.path.isfile(path) else self._data_files(path)
        write_pcols: Sequence[str] | None = None  # None ⇒ managed partitioning
        bad_layout = False
        if not self.partition_columns() and not os.path.isfile(path):
            write_pcols = self._hive_partition_keys(path, existing)
            bad_layout = write_pcols is None
        evolved: T.StructType | None = None
        if shape(aligned.schema) != shape(base_schema):
            # a batch carrying columns the collection has never seen:
            # additive evolution appends the new files with the wider
            # schema, links every existing file unchanged, and records
            # the union sidecar (round 13 — previously ANY new column
            # in an insert rewrote the whole corpus)
            evolved = self._additive_union_schema(base_schema, aligned.schema)
        if (
            os.path.isfile(path)
            or not existing  # non-parquet directory source (e.g. ORC)
            or _ns_timestamp_columns(path)
            or (shape(aligned.schema) != shape(base_schema) and evolved is None)
            or bad_layout
        ):
            self._rewrite(
                self.df().unionByName(aligned, allowMissingColumns=True),
                meta_update=meta_update,
            )
            return
        version, ptr = self._next_version()
        vdir = self._write_version(aligned, version, pcols=write_pcols)
        # the files present BEFORE linking are exactly this commit's
        # appended rows — recorded as an insert manifest after the swap
        # (round 10: O(delta) index refresh reads only these)
        delta_rels = [
            os.path.relpath(f, vdir) for f in self._data_files(vdir)
        ]
        for src_file in existing:
            rel = os.path.relpath(src_file, path)
            dst = os.path.join(vdir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src_file, dst)
            except OSError:
                shutil.copy2(src_file, dst)
        if evolved is not None or self._read_version_schema(path) is not None:
            # mixed-schema dir: this append evolved it, or linked files
            # from an earlier evolution — carry the union sidecar
            # forward (aligned.schema == prior union when not evolving)
            self._write_version_schema(
                vdir, evolved if evolved is not None else aligned.schema
            )
        self._swap_pointer(version, ptr, meta_update)
        # after the swap: a CAS loser raised above and never records a
        # manifest; a transaction-staged swap records under its
        # uuid-unique version name, which is only ever referenced if
        # that transaction commits
        ins_rel: str | None = None
        id_cols = sorted(
            c for c in self._index_id_cols() if c in aligned.columns
        )
        flat_layout = not any(os.sep in r for r in delta_rels)
        if id_cols and delta_rels:
            # id sidecar for this insert (round 11): one O(batch)
            # column read of the just-written files, so a later
            # mutation rewriting them cannot force an index rebuild
            ins_rel = f"{version}_ins"
            reader = self.engine.spark.read.option("basePath", vdir)
            if flat_layout:
                # files we just wrote — skip the footer-inference job
                reader = reader.schema(aligned.schema)
            (
                reader
                .parquet(*[os.path.join(vdir, r) for r in delta_rels])
                .select(*id_cols)
                .write.mode("overwrite")
                .parquet(os.path.join(self._deltas_dir(), ins_rel))
            )
        self._write_insert_manifest(version, ptr, delta_rels, ins_rel=ins_rel)
        if evolved is None and flat_layout:
            # re-prime after linking (see _cow_rewrite): appends keep
            # the base schema, so the next read skips its footer job
            from anser_spark.sources.readers import prime_schema_cache

            prime_schema_cache(vdir, aligned.schema)

    def drop(self) -> None:
        if self.engine._txn is not None:
            raise RuntimeError(
                "drop() is not transactional — run it outside the transaction"
            )
        vp = os.path.join(self._store_dir, "_VIEW")
        if os.path.exists(vp):
            os.remove(vp)  # dropping a view removes only its definition
            return
        os.makedirs(self._store_dir, exist_ok=True)
        tmp = os.path.join(self._store_dir, f"_CURRENT.tmp.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write("DROPPED")
        os.replace(tmp, os.path.join(self._store_dir, "_CURRENT"))

    # -- read path -----------------------------------------------------
    def find(self, query: Mapping[str, Any] | None = None) -> "Query":
        from anser_spark.plans.query import Query

        return Query(self, query)

    def find_id(self, id_value: Any) -> "Query":
        return self.find({"_id": id_value})

    def find_one(self, query: Mapping[str, Any] | None = None) -> dict[str, Any]:
        return self.find(query).one()

    def count(self) -> int:
        return self.df().count()

    def estimated_document_count(self) -> int:
        """Metadata-only count from Parquet footers (reference
        backup/backup.go:91 EstimatedDocumentCount) — no data scan."""
        path = self.current_path()
        if path is None:
            raise NotFoundError(f"collection does not exist: {self.namespace}")
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            if os.path.isfile(path):
                return pq.ParquetFile(path).metadata.num_rows
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            return total
        except (OSError, pa.lib.ArrowException):
            # IO/footer corruption must not silently look like a fast
            # metadata count — log and degrade to the exact scan
            _LOG.debug(
                "estimated_document_count: footer walk failed for %s; "
                "falling back to df().count()", self.namespace, exc_info=True,
            )
            return self.df().count()

    def pipe(
        self,
        pipeline: Sequence[Mapping[str, Any]],
        let: Mapping[str, Any] | None = None,
        allow_disk_use: bool | None = None,
        collation: Mapping[str, Any] | None = None,
        comment: str | None = None,
        hint: Any = None,
    ) -> "Aggregation":
        """Aggregate. Mongo ``aggregate`` options: ``let`` binds
        pipeline-level CONSTANT variables (``$$name`` references are
        substituted as ``$literal``s before compilation — Mongo's let
        values cannot read document fields either); ``allow_disk_use``
        and ``comment`` are accepted and ignored (Spark always spills;
        comments are profiler annotations); ``hint`` is advisory;
        ``collation`` maps to Spark's native ICU collations (round 7:
        locale + strength 1/2/3 — string $match comparisons and $sort
        keys; options ICU can't express raise; functions/collation.py)."""
        from anser_spark.functions.collation import spark_collation_name
        from anser_spark.plans.pipeline import Aggregation

        coll_name = spark_collation_name(collation)
        if let:
            pipeline = _substitute_let(list(pipeline), dict(let))
        pipeline = self._resolve_coll_stats(pipeline)
        pipeline = self._resolve_list_search_indexes(pipeline)
        pipeline = self._resolve_text_indexes(pipeline)
        stages = list(pipeline)
        if stages and isinstance(stages[0], Mapping) and "$changeStream" in stages[0]:
            # Mongo's $changeStream as a leading stage: the rest of the
            # pipeline composes over the change-event frame (the stage
            # IS Collection.watch() — batch form over retained
            # versions).  Divergence from Mongo's resume tokens: the
            # resume point is a retained VERSION id (startAtVersion),
            # since batch change streams are version diffs, not oplog
            # tails; `key` names the document-key column (default _id).
            arg = stages[0]["$changeStream"] or {}
            since = arg.get("startAtVersion")
            if since is None:
                raise ValueError(
                    "$changeStream requires startAtVersion: batch change "
                    "streams diff retained versions (see set_retention/"
                    "versions); there is no oplog to tail"
                )
            ev = self.watch(str(since), key=arg.get("key", "_id"))
            return Aggregation(
                ev, self._resolve_search_indexes(stages[1:]), coll_name
            )
        if any(
            isinstance(s, Mapping) and "$changeStream" in s for s in stages
        ):
            raise ValueError("$changeStream must be the first pipeline stage")
        return Aggregation(self, self._resolve_search_indexes(pipeline), coll_name)

    aggregate = pipe

    def _resolve_coll_stats(self, stages: Sequence[Mapping[str, Any]]):
        """``$collStats`` (must be the first stage, as in Mongo): emit
        one stats document for this collection — ``count`` (exact
        document count) and/or ``storageStats`` (data bytes, file
        count, current version, partition columns) — rewritten into a
        ``$documents`` literal so the rest of the pipeline composes
        normally. Storage stats are pure driver-side metadata (an
        os.walk of the current version directory — no Spark job);
        ``count`` runs one count job. Fixed-schema divergence from
        Mongo's host/localTime-bearing output: deterministic fields
        only."""
        stages = list(stages)
        if not stages or not isinstance(stages[0], Mapping) or "$collStats" not in stages[0]:
            if any(isinstance(s, Mapping) and "$collStats" in s for s in stages):
                raise ValueError("$collStats must be the first pipeline stage")
            return stages
        arg = stages[0]["$collStats"] or {}
        doc: dict[str, Any] = {"ns": str(self.namespace)}
        if "count" in arg:
            doc["count"] = self.count()
        if "storageStats" in arg:
            path = self.current_path()
            size = n_files = 0
            if path and os.path.isfile(path):
                size, n_files = os.path.getsize(path), 1
            elif path:
                for root, _dirs, files in os.walk(path):
                    for f in files:
                        if not f.startswith((".", "_")):
                            size += os.path.getsize(os.path.join(root, f))
                            n_files += 1
            doc["storage_size_bytes"] = size
            doc["file_count"] = n_files
            doc["version"] = self._pointer() or "source"
            # comma-joined (a bare [] has no inferable element type in
            # the $documents literal)
            doc["partition_columns"] = ",".join(self.partition_columns())
        return [{"$documents": [doc]}, *stages[1:]]

    def _resolve_list_search_indexes(self, stages: Sequence[Mapping[str, Any]]):
        """``$listSearchIndexes`` (leading stage, as Atlas): one document
        per search index on this collection — name, kind (divergence:
        Atlas reports type search/vectorSearch; ours are the engine's
        index kinds), indexed path, freshness (built_at_version /
        current_version / stale) — rewritten to a ``$documents`` literal
        so the rest of the pipeline composes. Driver-side metadata only,
        no Spark job. An optional ``{name: <n>}`` argument filters."""
        stages = list(stages)
        if (
            not stages
            or not isinstance(stages[0], Mapping)
            or "$listSearchIndexes" not in stages[0]
        ):
            if any(
                isinstance(s, Mapping) and "$listSearchIndexes" in s for s in stages
            ):
                raise ValueError("$listSearchIndexes must be the first pipeline stage")
            return stages
        arg = stages[0]["$listSearchIndexes"] or {}
        names = self.list_search_indexes()
        if isinstance(arg, Mapping) and arg.get("name"):
            names = [n for n in names if n == arg["name"]]
        docs = []
        for n in names:
            st = self.search_index_status(n)
            d = self._load_search_index(n, warn_stale=False)
            docs.append(
                {
                    "name": n,
                    "kind": str(st["kind"]),
                    "path": str(d.get("path") or ""),
                    # None pointers (source-mounted collections) become
                    # "source" so the literal keeps a string type
                    "built_at_version": st["built_at_version"] or "source",
                    "current_version": st["current_version"] or "source",
                    "stale": bool(st["stale"]),
                    "queryable": True,
                }
            )
        if not docs:
            # an empty $documents literal has no schema — synthesize the
            # empty frame through a never-true filter on a typed stub
            return [
                {"$documents": [{"name": "", "kind": "", "path": "",
                                 "built_at_version": "", "current_version": "",
                                 "stale": False, "queryable": False}]},
                {"$match": {"queryable": True}},
                *stages[1:],
            ]
        return [{"$documents": docs}, *stages[1:]]

    # -- search indexes (Atlas createSearchIndex surface) --------------
    def _search_index_dir(self) -> str:
        return os.path.join(self._store_dir, "_search_indexes")

    def create_search_index(self, name: str, definition: Mapping[str, Any]) -> None:
        """Create (or rebuild) a named search index — the Atlas model:
        indexes are built ahead of queries and the query path only
        reads them. Both kinds are snapshots: rebuild after bulk
        mutations (re-run create_search_index).

        ``kind: "ivf"`` trains sample-based centroids NOW and persists
        them, so ``$vectorSearch {index: "<name>"}`` probes a prebuilt
        index instead of training inline.

        ``kind: "ivfpq"`` (round 13) additionally trains per-subspace
        product-quantization codebooks (``m`` subvectors × ``2^nbits``
        codes, FAISS's IVF-PQ layout) and rides the codes plus the
        vector norm on the cell-assignment table: a ``$vectorSearch``
        candidate pass then reads only the codes columns (ADC
        shortlist, ``numCandidates`` beam) and the exact rerank reads
        stored vectors for the bounded shortlist alone — at 100 TB the
        candidate IO drops ~10-30× vs scoring full vectors.

        ``kind: "bm25"`` precomputes the text-relevance corpus
        statistics — N, avgdl, and the per-term document frequencies
        (one tokenize+distinct+count job, written as a parquet term
        table) — so ``$search {index: "<name>", text: …}`` resolves a
        query's idf values with a pushed-down point lookup on the term
        table instead of re-aggregating the corpus per query.

        Round 9: the build also writes an INVERTED POSTINGS table —
        one row per (document, analyzed term) carrying the term
        frequency, the diacritic-folded term, and the document's token
        count, range-partitioned and sorted by folded term so parquet
        min/max footers prune a term lookup to a handful of files.
        With a fresh index, ``$text`` queries answer from the postings
        (``operators.ranking.text_match_postings``): filter postings on
        the O(query) analyzed terms → pushed-down point lookup, one
        bounded groupBy over the matching postings, one join back to
        the collection on ``_id`` — no corpus scan and no Python
        stemmer kernel at query time.  At 100 TB that turns query cost
        from O(corpus) into O(df of the query terms).  Postings need a
        unique ``_id`` to join back on; when the collection lacks one
        (or ids duplicate) the build skips the postings table and
        queries keep the single-scan path, stats-only.

        Round 10: postings rows also carry each term's POSITION array
        (its indexes in the analyzed token stream), so ``$search
        phrase`` — adjacency and slop — answers from the index too
        (``operators.ranking.search_phrase_postings``); pass
        ``positions: False`` in the definition to skip storing them
        (phrase queries then keep the scan path)."""
        definition = dict(definition)
        # a rebuild from a stored definition must not inherit computed
        # pointers the new build may legitimately NOT produce (e.g. a
        # postings_dir when ids stopped being unique) — they re-add
        # below only when earned. Incremental-delta pointers likewise:
        # a full build subsumes every staged delta (round 10).
        definition.pop("postings_dir", None)
        definition.pop("ids_dir", None)
        definition.pop("raw_postings_dir", None)
        definition.pop("raw_terms_dir", None)
        definition.pop("cells_dir", None)
        definition.pop("removed_dir", None)
        definition.pop("assign_mean_dist", None)
        definition.pop("codebooks", None)
        for dk in (
            "postings_deltas", "sig_deltas", "bands_deltas",
            "postings_tombs", "tombs", "ids_deltas",
            "raw_postings_deltas", "cells_deltas",
        ):
            definition.pop(dk, None)
        kind = definition.get("kind", "ivf")
        if kind in ("ivf", "ivfpq"):
            path = definition.get("path", "embedding")
            nlist = int(definition.get("nlist", 16))
            from anser_spark.operators.ivf import (
                IVFIndex,
                ivf_assign_dist,
                ivf_train_sample,
            )

            docs = self.df()
            ivf = ivf_train_sample(docs, k=nlist, vec_col=path)
            id_col = str(definition.get("id_col", "_id"))
            definition.update(
                {
                    "kind": kind, "path": path, "nlist": nlist,
                    "centroids": ivf.centroids, "id_col": id_col,
                }
            )
            if "." not in path and id_col in docs.columns:
                # materialize the CELL-ASSIGNMENT table (round 12):
                # ``(id, __vec, __cell, __dist)`` range-partitioned and
                # sorted by cell, so a $vectorSearch probe footer-prunes
                # to the probed cells — at 100 TB a query reads
                # O(nprobe/nlist) of the index instead of evaluating the
                # nearest-centroid expression over the whole corpus.
                # __dist (assignment distance) feeds the drift statistic
                # that decides when fixed centroids must retrain. Null
                # vectors are excluded exactly as the inline path drops
                # them (a null assignment never matches a probe).
                # Unique ids required — the candidate join-back keys on
                # them; a duplicate-id corpus keeps centroids-only.
                os.makedirs(self._search_index_dir(), exist_ok=True)
                cur0 = self._pointer()
                cells_dir = os.path.join(
                    self._search_index_dir(), f"{name}_cells_{cur0}"
                )
                vecs = docs.select(
                    F.col(id_col).alias("id"),
                    F.col(path).alias("__vec"),
                ).where(F.col("__vec").isNotNull())
                cells = ivf_assign_dist(
                    vecs,
                    IVFIndex(
                        centroids=ivf.centroids,
                        vec_col="__vec",
                        id_col="id",
                    ),
                )
                if kind == "ivfpq":
                    # kind="ivfpq" (round 13): PQ codes + the stored
                    # vector norm RIDE the cells table. A $vectorSearch
                    # candidate pass then reads only (id, __codes[,
                    # __norm]) — parquet column pruning never touches
                    # the float vectors until the bounded exact rerank,
                    # a 10-30× candidate-IO cut at 768-dim scale.
                    # Codebooks train on a bounded sample exactly like
                    # the centroids and persist in the definition;
                    # training errors (dim % m, sample < 2^nbits)
                    # surface at build time, not query time.
                    from anser_spark.operators.pq import (
                        pq_encode,
                        pq_train_sample,
                    )

                    pq_m = int(definition.get("m", 8))
                    pq_nbits = int(definition.get("nbits", 8))
                    cb = pq_train_sample(
                        vecs, m=pq_m, nbits=pq_nbits, vec_col="__vec",
                        id_col="id",
                        max_sample=int(definition.get(
                            "train_sample", 100_000)),
                        seed=int(definition.get("train_seed", 42)),
                    )
                    cells = pq_encode(cells, cb, out="__codes").withColumn(
                        "__norm",
                        F.sqrt(F.aggregate(
                            F.transform(
                                F.col("__vec"), lambda x: x * x
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )),
                    )
                    definition.update(
                        {"m": pq_m, "nbits": pq_nbits,
                         "codebooks": cb.codebooks}
                    )
                # small corpus ⇒ one sorted cells file (on-disk source
                # bytes as the no-job proxy for the table's size; the
                # cells table carries the same vectors the source does)
                src_bytes = 0
                src_path = self.current_path()
                if src_path and os.path.isfile(src_path):
                    src_bytes = os.path.getsize(src_path)
                elif src_path and os.path.isdir(src_path):
                    for _r, _d2, _fs in os.walk(src_path):
                        for _f in _fs:
                            if not _f.startswith((".", "_")):
                                src_bytes += os.path.getsize(
                                    os.path.join(_r, _f)
                                )
                else:
                    src_bytes = 1 << 62
                (
                    _range_sorted(
                        cells, [F.col("__cell"), F.col("id")],
                        src_bytes
                        <= _single_file_vector_bytes(self.engine.spark),
                    )
                    .write.mode("overwrite")
                    .parquet(cells_dir)
                )
                st = (
                    _read_pt(self.engine.spark, cells_dir)
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.count_distinct(F.col("id")).alias("nid"),
                        F.avg(F.sqrt(F.col("__dist"))).alias("md"),
                    )
                    .collect()[0]
                )
                if int(st["n"]) and int(st["n"]) == int(st["nid"]):
                    definition["cells_dir"] = cells_dir
                    definition["assign_mean_dist"] = float(st["md"] or 0.0)
                    # UPPER BOUND on live index rows (round 14):
                    # incremental refresh adds its insert count and
                    # never subtracts tombstones, so `numCandidates ≥
                    # n_vectors` proves the ADC shortlist would contain
                    # every candidate — the query path then skips the
                    # ADC pass outright (full beam made it pure
                    # overhead; r13 ADVICE)
                    definition["n_vectors"] = int(st["n"])
                else:
                    # duplicate ids — the unreferenced dir is swept
                    # below and queries keep the inline-assignment
                    # path; an ivfpq degrades to centroids-only, so
                    # its codebooks would never be read — drop them
                    definition.pop("codebooks", None)
        elif kind == "bm25":
            from anser_spark.operators.ranking import _tokens as _rank_tokens

            path = definition.get("path", "text")
            language = definition.get("default_language", "none")
            if language in ("en", "english"):
                language = "english"
            docs = self.df()
            # THE tokenizer (operators.ranking._tokens) — index build and
            # query analysis must agree on the analyzer (round 7:
            # default_language 'english' = stopwords + s-stemming)
            if definition.get("weights"):
                # round 11: Mongo multi-field weighted text indexes
                # ({title: 10, body: 1}) — field-tagged postings + term
                # table, per-field avgdl, weighted BM25 sum at query
                # time (ranking.text_match_weighted_*). Previously
                # rejected (round 9); the reference's find surface
                # accepts these queries verbatim (db/interface.go:26).
                return self._create_weighted_bm25_index(name, definition)
            toks = _rank_tokens(path, language)
            id_col = str(definition.get("id_col", "_id"))
            # tokenize the corpus ONCE (the english analyzer's Porter2
            # kernel is the expensive part of a build) and let the
            # stats aggregate, the term table, and the postings table
            # all derive from the checkpointed token frame — round 9:
            # previously each of the three jobs re-stemmed the corpus
            has_id = id_col in docs.columns
            tok_cols = [toks.alias("__toks")]
            if has_id:
                tok_cols.insert(0, F.col(id_col).alias("id"))
            from pyspark.storagelevel import StorageLevel

            # persist ONLY when the analyzer is expensive (round 10):
            # english tokenization runs the Porter2 Arrow kernel, so
            # the three consumers (stats, terms, postings) should pay
            # it once — persist (not localCheckpoint) so unpersist
            # below frees the scratch deterministically. The 'none'
            # analyzer is a codegen'd split: recomputing it per job is
            # cheaper than materializing corpus-size token arrays to
            # memory+disk (at 100 TB the persist IS the bottleneck).
            tok_frame = docs.select(*tok_cols)
            if language == "english":
                tok_frame = tok_frame.persist(StorageLevel.MEMORY_AND_DISK)
            stats_aggs = [
                F.count(F.lit(1)).alias("n"),
                F.avg(F.size("__toks")).alias("avgdl"),
                # exact token totals so refresh_search_index can roll
                # avgdl forward incrementally (avg skips null-text
                # docs, so n alone can't reconstruct the sum)
                F.coalesce(F.sum(F.size("__toks")), F.lit(0)).alias("sum_tokens"),
                F.count(F.size("__toks")).alias("n_text_docs"),
            ]
            if has_id:
                stats_aggs.append(F.count_distinct(F.col("id")).alias("n_ids"))
            stats = tok_frame.agg(*stats_aggs).collect()[0]
            terms_dir = os.path.join(self._search_index_dir(), f"{name}_terms")
            build_postings = bool(has_id and stats["n"] == stats["n_ids"])
            # small build ⇒ single-file sorted tables (see _range_sorted)
            single = int(stats["sum_tokens"]) <= int(
                self.engine.spark.conf.get(
                    "spark.anser.index.singleFileTokens", "4000000"
                )
            )
            if build_postings:
                # postings-bearing build (round 14): write the postings
                # FIRST and derive the term table FROM them — postings
                # hold exactly one row per (id, term), so
                # count-per-term over the written table IS df. The
                # terms job then reads the (already shuffled, much
                # smaller) postings instead of re-tokenizing and
                # re-exploding the corpus: one full corpus pass fewer
                # per build (two with the raw sidecar below), which is
                # the build's dominant cost at scale under the 'none'
                # analyzer where the token frame is not persisted.
                postings_dir = os.path.join(
                    self._search_index_dir(), f"{name}_postings"
                )
                store_pos = bool(definition.get("positions", True))
                postings = self._postings_rows(tok_frame, store_pos)

                def _postings_write():
                    # range-partition + sort by folded term: each
                    # parquet file covers a tight term range, so a
                    # query's isin lookup prunes on footer min/max
                    # instead of scanning. The id joins the range key
                    # so a HOT term (under the 'none' analyzer
                    # stopwords survive — 'the' can be in every
                    # document) splits across partitions instead of
                    # landing on one writer; term_fold leads, so footer
                    # min/max stays tight per file either way.
                    (
                        _range_sorted(
                            postings, [F.col("term_fold"), F.col("id")],
                            single,
                        )
                        .write.mode("overwrite")
                        .parquet(postings_dir)
                    )

                def _terms_write(src):
                    (
                        # range+sort by term: point lookups and
                        # autocomplete PREFIX scans prune on footer
                        # min/max (round 10)
                        _range_sorted(
                            src.groupBy("term")
                            .agg(F.count(F.lit(1)).alias("df")),
                            [F.col("term")], single,
                        )
                        .write.mode("overwrite")
                        .parquet(terms_dir)
                    )

                if single:
                    # measured-tiny build: terms aggregate straight
                    # from the postings FRAME (the token-volume guard
                    # bounds the recompute), so the terms write no
                    # longer serializes behind the postings write and
                    # every chain overlaps (guide §2.6) — count per
                    # (id, term) row is df either way
                    def _main_chain():
                        _postings_write()

                    def _terms_chain():
                        _terms_write(postings)
                else:
                    # at scale: derive from the WRITTEN table — a
                    # column-pruned read of the (already shuffled, much
                    # smaller) postings beats re-exploding the corpus
                    # token stream; schema supplied so the readback
                    # skips footer inference
                    _terms_chain = None

                    def _main_chain():
                        _postings_write()
                        _terms_write(
                            self.engine.spark.read.schema(postings.schema)
                            .parquet(postings_dir)
                        )
            else:
                terms_src = (
                    tok_frame.select(
                        F.explode(F.array_distinct("__toks")).alias("term")
                    )
                    .groupBy("term")
                    .agg(F.count(F.lit(1)).alias("df"))
                )
                (
                    # range+sort by term: the query-side point lookups
                    # and autocomplete PREFIX scans prune on footer
                    # min/max (round 10; previously unsorted)
                    _range_sorted(terms_src, [F.col("term")], single)
                    .write.mode("overwrite")
                    .parquet(terms_dir)
                )
            from anser_spark.operators.ranking import ANALYZER_VERSION

            definition.update(
                {
                    "kind": "bm25",
                    "path": path,
                    "default_language": language,
                    "n_docs": int(stats["n"]),
                    "avgdl": float(stats["avgdl"] or 0.0),
                    "sum_tokens": int(stats["sum_tokens"]),
                    "n_text_docs": int(stats["n_text_docs"]),
                    "terms_dir": terms_dir,
                    # round 8: a stemmer/tokenizer upgrade must surface
                    # as staleness, not silently-wrong df lookups
                    "analyzer_version": ANALYZER_VERSION.get(language),
                }
            )
            # round 9: inverted postings — only when a unique id exists
            # to join matches back on (docstring above; the table
            # itself was written BEFORE the term table so terms could
            # derive from it — round 14)
            if build_postings:
                definition.update({
                    "postings_dir": postings_dir,
                    "id_col": id_col,
                    # stamped fact (vs the "positions" OPTION): phrase
                    # queries check this before trusting the layout,
                    # and refresh rebuilds when option and stamp drift
                    "postings_positions": store_pos,
                })
                # round 11: ID SIDECAR — a slim range-sorted table of
                # every indexed id. Refresh-time uniqueness probes read
                # THIS instead of the corpus id column (point lookups
                # footer-prune to O(delta) row groups), so a default-
                # settings incremental refresh touches no corpus data
                # file at all.
                ids_dir = os.path.join(
                    self._search_index_dir(), f"{name}_ids"
                )

                def _ids_task():
                    (
                        _range_sorted(
                            tok_frame.select(F.col("id")), [F.col("id")],
                            single,
                        )
                        .write.mode("overwrite")
                        .parquet(ids_dir)
                    )

                definition["ids_dir"] = ids_dir
                raw_chain = None
                if language == "english" and store_pos and bool(
                    definition.get("raw_sidecar", True)
                ):
                    # round 11: RAW-TOKEN SIDECAR — a second postings
                    # (+ term) table over the 'none'-analyzer stream,
                    # so $search phrase / autocomplete / moreLikeThis
                    # (whose query terms are raw lowered tokens) answer
                    # from the index under a stemmed analyzer too;
                    # previously every english-corpus phrase query paid
                    # an O(corpus) scan. The 'none' tokenize is a
                    # codegen'd split — no second stemmer pass — and
                    # the sidecar's delta layers advance in lockstep
                    # with the main table's, sharing its tombstone
                    # generations. Opt out with raw_sidecar: False.
                    raw_frame = docs.select(
                        F.col(id_col).alias("id"),
                        _rank_tokens(path, "none").alias("__toks"),
                    )
                    raw_post = os.path.join(
                        self._search_index_dir(), f"{name}_rawpostings"
                    )
                    raw_post_df = self._postings_rows(raw_frame, True)
                    raw_terms = os.path.join(
                        self._search_index_dir(), f"{name}_rawterms"
                    )

                    def raw_chain():
                        (
                            _range_sorted(
                                raw_post_df,
                                [F.col("term_fold"), F.col("id")], single,
                            )
                            .write.mode("overwrite")
                            .parquet(raw_post)
                        )
                        (
                            # derive from the just-written raw postings
                            # (one row per (id, term) ⇒ count = df) —
                            # the second corpus tokenize pass this
                            # table used to pay is gone (round 14);
                            # schema supplied so the readback skips
                            # footer inference
                            _range_sorted(
                                self.engine.spark.read
                                .schema(raw_post_df.schema)
                                .parquet(raw_post)
                                .groupBy("term")
                                .agg(F.count(F.lit(1)).alias("df")),
                                [F.col("term")], single,
                            )
                            .write.mode("overwrite")
                            .parquet(raw_terms)
                        )

                    definition["raw_postings_dir"] = raw_post
                    definition["raw_terms_dir"] = raw_terms
                # the chains are independent (ids from the token
                # frame, postings[→terms], terms-from-frame on tiny
                # builds, raw postings→raw terms) — run them
                # concurrently so each straggler tail back-fills
                # (guide §2.6); internal steps stay ordered
                _run_build_actions(
                    _main_chain, _terms_chain, _ids_task, raw_chain
                )
            # free the tokenized-corpus scratch now (a failed build
            # falls back to GC reclaim, same as any cached frame)
            tok_frame.unpersist()
        elif kind == "minhash":
            # incremental-dedup index: per-document MinHash signatures +
            # hashed shingle sets, plus the banded (id, band, bhash)
            # table the candidate join reads. New batches match against
            # the stored corpus via near_dups_against_index without
            # re-signaturing history — the steady-state ingest shape.
            path = definition.get("path", "text")
            id_col = definition.get("id_col", "_id")
            k = int(definition.get("k", 3))
            num_hashes = int(definition.get("numHashes", 32))
            bands_n = int(definition.get("bands", 16))
            seed = int(definition.get("seed", 42))
            from anser_spark.operators.dedup import (
                banded_signatures,
                minhash_signature_arrow,
            )

            os.makedirs(self._search_index_dir(), exist_ok=True)
            sig_dir = os.path.join(self._search_index_dir(), f"{name}_minhash")
            minhash_signature_arrow(
                self.df(), id_col, path, k, num_hashes, seed
            ).write.mode("overwrite").parquet(sig_dir)
            stored = _read_pt(self.engine.spark, sig_dir)
            bands_dir = os.path.join(self._search_index_dir(), f"{name}_bands")
            banded_signatures(stored, id_col, num_hashes, bands_n).write.mode(
                "overwrite"
            ).parquet(bands_dir)
            definition.update(
                {
                    "kind": "minhash",
                    "path": path,
                    "id_col": id_col,
                    "k": k,
                    "numHashes": num_hashes,
                    "bands": bands_n,
                    "seed": seed,
                    "sig_dir": sig_dir,
                    "bands_dir": bands_dir,
                }
            )
        else:
            raise ValueError(f"unsupported search index kind: {kind!r}")
        # staleness tracking: remember which collection version the
        # index snapshot was built against (Atlas indexes track the
        # collection continuously; ours are explicit snapshots)
        definition["built_at_version"] = self._pointer()
        self._write_search_index(name, definition)
        # a full build re-points at the base table names — sweep the
        # versioned dirs earlier refreshes left behind (round 10;
        # ADVICE r9: each refresh→rebuild cycle leaked one terms dir)
        # and reclaim mutation pre-images the fresher built_at makes
        # unreachable (round 11)
        self._sweep_index_dirs(name, definition)
        self._gc_deltas()

    @staticmethod
    def _weighted_postings_rows(
        frame: DataFrame, fields: Sequence[str], store_positions: bool
    ) -> DataFrame:
        """Field-tagged postings rows ``(id, field, term, term_fold,
        tf, n_tokens[, positions])`` from a tokenized ``(id, __t0,
        __t1, …)`` frame — shared by the weighted build and the
        weighted refresh delta so the layouts can never drift (round
        12: positions stored, so single-path ``$search phrase`` /
        sequential autocomplete answer from the weighted index too)."""
        from anser_spark.operators.ranking import _FOLD_DST, _FOLD_SRC

        post = None
        for i, f in enumerate(fields):
            aggs: list = [
                F.count(F.lit(1)).alias("tf"),
                F.max("n_tokens").alias("n_tokens"),
            ]
            if store_positions:
                aggs.append(
                    F.sort_array(F.collect_list("pos")).alias("positions")
                )
            rows = (
                frame.select(
                    "id",
                    F.size(f"__t{i}").alias("n_tokens"),
                    F.posexplode(f"__t{i}").alias("pos", "term"),
                )
                .groupBy("id", "term")
                .agg(*aggs)
                .withColumn("field", F.lit(f))
                .withColumn(
                    "term_fold", F.translate("term", _FOLD_SRC, _FOLD_DST)
                )
            )
            post = rows if post is None else post.unionByName(rows)
        return post

    def _create_weighted_bm25_index(
        self, name: str, definition: dict[str, Any]
    ) -> None:
        """Multi-field WEIGHTED text index (round 11) — the Mongo
        shape ``{weights: {title: 3, body: 1}}`` the find surface
        accepts verbatim (reference db/interface.go:26). One tokenize
        pass per field over one corpus scan, then:

        - per-field corpus stats (avgdl / token totals) + the shared
          ``n_docs`` — queries weight each field's BM25 by its own
          length normalization, as Mongo weights its per-field scores;
        - a FIELD-TAGGED term table ``(field, term, df)``, range-sorted
          by term (leading) so the same point lookups prune;
        - field-tagged postings ``(id, field, term, term_fold, tf,
          n_tokens)`` under the single-field layout's range key
          (``term_fold``, id) — one pushed-down lookup covers all
          fields (``text_match_weighted_postings``);
        - the id sidecar, as for single-field indexes.

        Refresh: incremental via :meth:`_refresh_weighted_bm25` (the
        same netting/tombstone machinery, per-field). Round 12: the
        postings store POSITIONS (skip with ``positions: False``) and
        stemmed indexes also build a field-tagged RAW-TOKEN SIDECAR,
        so single-path ``$search`` ``phrase`` / ``autocomplete`` on
        one weighted field answer from the index through its
        field-filtered view (``_weighted_field_view``) exactly like a
        dedicated single-field index."""
        from pyspark.storagelevel import StorageLevel

        from anser_spark.operators.ranking import (
            ANALYZER_VERSION,
            _FOLD_DST,
            _FOLD_SRC,
            _tokens as _rank_tokens,
        )

        language = definition.get("default_language", "none")
        if language in ("en", "english"):
            language = "english"
        weights = {
            str(f): float(w) for f, w in dict(definition["weights"]).items()
        }
        if not weights or any(w <= 0 for w in weights.values()):
            raise ValueError(
                "bm25 'weights' must map field names to positive numbers"
            )
        docs = self.df()
        missing = sorted(f for f in weights if f not in docs.columns)
        if missing:
            raise ValueError(
                f"weighted bm25 index fields not on the collection: {missing}"
            )
        fields = sorted(weights)
        id_col = str(definition.get("id_col", "_id"))
        has_id = id_col in docs.columns
        tok_cols = [
            _rank_tokens(f, language).alias(f"__t{i}")
            for i, f in enumerate(fields)
        ]
        if has_id:
            tok_cols.insert(0, F.col(id_col).alias("id"))
        tok_frame = docs.select(*tok_cols)
        if language == "english":
            tok_frame = tok_frame.persist(StorageLevel.MEMORY_AND_DISK)
        stats_aggs: list = [F.count(F.lit(1)).alias("n")]
        if has_id:
            stats_aggs.append(F.count_distinct(F.col("id")).alias("n_ids"))
        for i, _f in enumerate(fields):
            stats_aggs.extend([
                F.avg(F.size(f"__t{i}")).alias(f"avgdl{i}"),
                F.coalesce(
                    F.sum(F.size(f"__t{i}")), F.lit(0)
                ).alias(f"sum_tokens{i}"),
                F.count(F.size(f"__t{i}")).alias(f"n_text{i}"),
            ])
        stats = tok_frame.agg(*stats_aggs).collect()[0]
        idx_dir = self._search_index_dir()
        terms_dir = os.path.join(idx_dir, f"{name}_terms")
        build_postings = bool(
            has_id and int(stats["n"]) == int(stats["n_ids"])
        )
        # small build ⇒ single-file sorted tables (see _range_sorted)
        single = sum(
            int(stats[f"sum_tokens{i}"]) for i in range(len(fields))
        ) <= int(
            self.engine.spark.conf.get(
                "spark.anser.index.singleFileTokens", "4000000"
            )
        )
        main_chain = None
        terms_chain = None
        if build_postings:
            # postings first, field-tagged term table FROM them (round
            # 14): one row per (id, field, term) ⇒ count = per-field
            # df; the terms job reads the written postings instead of
            # re-exploding every field's token stream (one fewer full
            # pass over the tokenized corpus per build)
            store_positions = bool(definition.get("positions", True))
            postings_dir = os.path.join(idx_dir, f"{name}_postings")
            w_postings = self._weighted_postings_rows(
                tok_frame, fields, store_positions
            )

            def _w_postings_write():
                (
                    _range_sorted(
                        w_postings,
                        [F.col("term_fold"), F.col("id")], single,
                    )
                    .write.mode("overwrite")
                    .parquet(postings_dir)
                )

            def _w_terms_write(src):
                (
                    _range_sorted(
                        src.groupBy("field", "term")
                        .agg(F.count(F.lit(1)).alias("df")),
                        [F.col("term"), F.col("field")], single,
                    )
                    .write.mode("overwrite")
                    .parquet(terms_dir)
                )

            if single:
                # measured-tiny build: terms aggregate straight from
                # the postings FRAME (token-volume guard bounds the
                # recompute; the weighted tok_frame is persisted) so
                # the terms write overlaps the postings write
                # (guide §2.6) instead of serializing behind it
                def main_chain():
                    _w_postings_write()

                def terms_chain():
                    _w_terms_write(w_postings)
            else:

                def main_chain():
                    _w_postings_write()
                    _w_terms_write(
                        self.engine.spark.read.schema(w_postings.schema)
                        .parquet(postings_dir)
                    )
        else:
            terms = None
            for i, f in enumerate(fields):
                t = tok_frame.select(
                    F.lit(f).alias("field"),
                    F.explode(F.array_distinct(f"__t{i}")).alias("term"),
                )
                terms = t if terms is None else terms.unionByName(t)
            terms_src = terms.groupBy("field", "term").agg(
                F.count(F.lit(1)).alias("df")
            )
            (
                _range_sorted(
                    terms_src, [F.col("term"), F.col("field")], single
                )
                .write.mode("overwrite")
                .parquet(terms_dir)
            )
        definition.update({
            "kind": "bm25",
            "weights": weights,
            "default_language": language,
            "n_docs": int(stats["n"]),
            "fields": {
                f: {
                    "avgdl": float(stats[f"avgdl{i}"] or 0.0),
                    "sum_tokens": int(stats[f"sum_tokens{i}"]),
                    "n_text_docs": int(stats[f"n_text{i}"]),
                }
                for i, f in enumerate(fields)
            },
            "terms_dir": terms_dir,
            "analyzer_version": ANALYZER_VERSION.get(language),
        })
        definition.pop("path", None)  # weighted indexes have no single path
        if build_postings:
            ids_dir = os.path.join(idx_dir, f"{name}_ids")

            def ids_task():
                (
                    _range_sorted(
                        tok_frame.select(F.col("id")), [F.col("id")], single
                    )
                    .write.mode("overwrite")
                    .parquet(ids_dir)
                )

            definition.update({
                "postings_dir": postings_dir,
                "ids_dir": ids_dir,
                "id_col": id_col,
                "postings_positions": store_positions,
            })
            raw_chain = None
            if language != "none":
                # field-tagged RAW-TOKEN SIDECAR (round 12): phrase /
                # autocomplete query terms are raw lowered tokens a
                # stemmed table doesn't store — same layout and
                # tombstone generations as the main table, exactly the
                # single-field sidecar generalized per field
                raw_frame = docs.select(
                    F.col(id_col).alias("id"),
                    *[
                        _rank_tokens(f, "none").alias(f"__t{i}")
                        for i, f in enumerate(fields)
                    ],
                )
                raw_postings_dir = os.path.join(
                    idx_dir, f"{name}_rawpostings"
                )
                raw_terms_dir = os.path.join(idx_dir, f"{name}_rawterms")
                raw_post_df = self._weighted_postings_rows(
                    raw_frame, fields, True
                )

                def raw_chain():
                    (
                        _range_sorted(
                            raw_post_df,
                            [F.col("term_fold"), F.col("id")], single,
                        )
                        .write.mode("overwrite")
                        .parquet(raw_postings_dir)
                    )
                    (
                        # derive from the just-written raw postings
                        # (one row per (id, field, term) ⇒ count =
                        # per-field df) — drops the second per-field
                        # explode pass over the raw token streams
                        # (round 14)
                        _range_sorted(
                            self.engine.spark.read
                            .schema(raw_post_df.schema)
                            .parquet(raw_postings_dir)
                            .groupBy("field", "term")
                            .agg(F.count(F.lit(1)).alias("df")),
                            [F.col("term"), F.col("field")], single,
                        )
                        .write.mode("overwrite")
                        .parquet(raw_terms_dir)
                    )

                definition.update({
                    "raw_postings_dir": raw_postings_dir,
                    "raw_terms_dir": raw_terms_dir,
                })
            # independent chains overlap (guide §2.6): postings→terms,
            # the id sidecar, and the raw sidecar chain
            _run_build_actions(main_chain, terms_chain, ids_task, raw_chain)
        tok_frame.unpersist()
        definition["built_at_version"] = self._pointer()
        self._write_search_index(name, definition)
        self._sweep_index_dirs(name, definition)
        self._gc_deltas()

    def _weighted_stats_loader(self, d: Mapping[str, Any]):
        """Per-field stats loader for the weighted scan path — see
        :func:`anser_spark.operators.ranking.weighted_stats_loader`."""
        from anser_spark.operators.ranking import weighted_stats_loader

        return weighted_stats_loader(self.engine.spark, d)

    @staticmethod
    def _postings_rows(tok_frame: DataFrame, store_positions: bool) -> DataFrame:
        """``(id, term, tf, n_tokens, term_fold[, positions])`` rows
        from a tokenized ``(id, __toks)`` frame — shared by the full
        build and the incremental-refresh delta so the two layouts can
        never drift. ``positions`` (round 10) are the term's 0-based
        indexes in the analyzed token array, sorted: ``$search phrase``
        answers adjacency/slop from them over the bounded candidates
        without touching the corpus. ``tf`` stays an explicit column so
        term queries never deserialize the array."""
        from anser_spark.operators.ranking import _FOLD_DST, _FOLD_SRC

        base = tok_frame.select(
            "id",
            F.size("__toks").alias("n_tokens"),
            F.posexplode("__toks").alias("pos", "term"),
        )
        aggs = [
            F.count(F.lit(1)).alias("tf"),
            F.max("n_tokens").alias("n_tokens"),
        ]
        if store_positions:
            aggs.append(
                F.sort_array(F.collect_list("pos")).alias("positions")
            )
        return (
            base.groupBy("id", "term")
            .agg(*aggs)
            .withColumn(
                "term_fold", F.translate("term", _FOLD_SRC, _FOLD_DST)
            )
        )

    def refresh_search_index(self, name: str) -> dict[str, Any]:
        """Bring a snapshot search index up to the collection's current
        version — INCREMENTALLY when the change is insert-only (round
        9: the steady-state ingest shape, e.g. a foreachBatch loop
        appending documents), otherwise by full rebuild.

        All three index kinds refresh incrementally. ``kind="ivf"``
        (round 12): centroids stay FIXED — the steady-state shape is
        append, and a trained quantizer remains valid while the data
        distribution holds — so the delta assigns to cells with the
        stored centroids (the same bounded expression as the query-time
        probe), lands as a staged cells delta, and mutated ids die via
        the shared generation-stamped tombstones. Centroids retrain
        (full rebuild) only when the delta's mean assignment distance
        drifts past ``spark.anser.index.ivfDriftRatio`` (default 2.0)
        times the trained mean, judged once the delta has at least
        ``spark.anser.index.ivfDriftMinDelta`` (default 4) vectors —
        a distribution shift is the one thing fixed centroids cannot
        absorb. Centroids-only ivf indexes (dotted path or duplicate
        ids — no cells table) still rebuild. ``kind="ivfpq"`` (round
        13) refreshes through the same cells machinery with the stored
        codebooks held fixed alongside the centroids: delta rows carry
        freshly-encoded PQ codes and norms, and a drift-triggered
        rebuild retrains centroids and codebooks together.

        ``kind="minhash"``: the new documents' signatures and banded
        rows land in staged delta directories beside the stored tables
        (per-document MinHash is independent of the rest of the
        corpus, so the union is exactly a fresh rebuild); readers
        union base + deltas, and the same compaction threshold folds
        them back together.

        ``kind="bm25"``: the insert delta applies to the postings index:

        - the NEW documents' postings write to a STAGED delta directory
          (range-sorted — footer pruning holds per directory), published
          atomically by the definition swap; once the staged deltas
          pass ``spark.anser.index.compactThreshold`` they fold back
          into one globally range-partitioned base table;
        - the term table merges document frequencies (new docs are
          disjoint from old, so df adds) into a fresh directory;
        - ``n_docs`` / ``avgdl`` roll forward EXACTLY from the stored
          token totals — the refreshed index is equal to a full
          rebuild, not an approximation (tested);
        - ``built_at_version`` re-stamps, so queries immediately take
          the postings path again.

        Crash safety (round 10): nothing mutates the live tables — a
        refresh that dies before the swap leaves ``built_at_version``
        old, and the retry overwrites the same staged paths (named by
        the target version), so postings can never double-append.

        The delta comes from the INSERT-MANIFEST chain (round 10):
        every insert-only commit records which files it appended, so
        the refresh reads exactly the appended rows — O(delta), no
        diff shuffle, and no retention requirement (the chain spans
        reaped versions because appended files keep their relative
        paths in the current version dir). When the chain is broken
        (an old manifest-less lineage) it falls back to the retained-
        version diff, which needs ``set_retention`` ≥ 2.

        Round 11 — UPDATE/REMOVE-AWARE: mutation commits record their
        matched rows' pre-image (``_cow_rewrite``), so a window
        containing updates/removes still refreshes incrementally. The
        chain nets per-document change (``_chain_delta``); mutated ids'
        old index rows die via a generation-stamped TOMBSTONE the
        layered readers anti-join (no table rewrite — compaction folds
        tombstoned rows away physically), updated docs re-index from
        their post-state, and ``n_docs`` / ``avgdl`` / per-term df roll
        BOTH ways exactly by re-tokenizing the O(mutated) pre-images —
        the refreshed index equals a fresh rebuild, not an
        approximation (tested). Updates that left the indexed column
        untouched (the migration-over-other-fields shape) net out to
        nothing at all.

        Falls back to a full rebuild (same definition) when the chain
        is broken (a full rewrite, schema change, a transform that
        introduced new ids mid-rewrite, or a GC'd pre-image), the
        index predates postings / the token-total stamps / the
        positions layout, the analyzer upgraded, no delta source is
        available, or ids stopped being unique (checked delta-scoped:
        duplicate ids inside the delta, plus a point-lookup probe of
        the persisted ID SIDECAR — O(delta) row groups, no corpus data
        file; corpus-column semi-join for sidecar-less indexes;
        ``assume_unique_ids`` engines skip the probe).  Cost: the
        incremental path tokenizes ONLY the touched documents — at
        100 TB that's the difference between a batch and a rebuild.
        Returns ``{"mode": "noop" | "incremental" | "rebuild",
        "inserted": k}`` (plus ``"tombstoned"`` when mutations were
        netted)."""
        d = dict(self._load_search_index(name, warn_stale=False))
        cur = self._pointer()
        if d.get("built_at_version") == cur and not self._analyzer_stale(d):
            return {"mode": "noop", "inserted": 0}

        def _rebuild() -> dict[str, Any]:
            self.create_search_index(name, d)
            return {"mode": "rebuild", "inserted": 0}

        def _netted(id_col: str, paths: str | list[str]):
            # (added, tomb_pre, remut) frames, or None → caller
            # rebuilds. Round 11: the manifest chain now nets
            # update/remove commits too (_chain_delta) — an all-insert
            # window still reads only the appended files with no
            # shuffle, and a mutation window costs O(rows touched).
            # The unchanged-content skip drops ids whose indexed
            # column(s) did not actually change (the reference's
            # flagship workload is per-doc migration updates, which
            # routinely touch only non-indexed fields — those become
            # free here); weighted indexes pass ALL their fields.
            # Fallback for manifest-less lineages: the retained-version
            # diff, insert-only as before (needs set_retention ≥ 2).
            cols = [paths] if isinstance(paths, str) else list(paths)
            built = str(d["built_at_version"])
            info = self._chain_delta(built, id_col)
            if info is None:
                try:
                    diff = self.diff_versions(built)
                    if diff.where(
                        F.col("change_type") == "removed"
                    ).limit(1).count():
                        return None
                except NotFoundError:
                    return None
                info = {
                    "added": diff.where(
                        F.col("change_type") == "added"
                    ).drop("change_type"),
                    "tomb_pre": None,
                    "remut": None,
                }
            added = info["added"]
            tomb_pre, remut = info["tomb_pre"], info["remut"]
            if id_col not in added.columns or any(
                p not in added.columns for p in cols
            ):
                return None
            if tomb_pre is not None:
                key = F.struct(*[F.col(p) for p in cols])
                pre_t = tomb_pre.select(
                    F.col(id_col).alias("__uid"), key.alias("__a")
                )
                post_t = remut.select(
                    F.col(id_col).alias("__uid"), key.alias("__b")
                )
                unchanged = (
                    pre_t.join(post_t, "__uid")
                    .where(F.col("__a").eqNullSafe(F.col("__b")))
                    .select("__uid")
                    .localCheckpoint()
                )
                tomb_pre = tomb_pre.join(
                    unchanged,
                    tomb_pre[id_col] == unchanged["__uid"],
                    "left_anti",
                )
                remut = remut.join(
                    unchanged,
                    remut[id_col] == unchanged["__uid"],
                    "left_anti",
                )
            return added, tomb_pre, remut

        if d.get("kind") in ("ivf", "ivfpq"):
            if not d.get("cells_dir") or d.get("built_at_version") is None:
                return _rebuild()  # centroids-only index — no table
            if d.get("kind") == "ivfpq" and not d.get("codebooks"):
                return _rebuild()  # codes table without codebooks
            path = str(d.get("path", "embedding"))
            id_col = str(d.get("id_col", "_id"))
            net = _netted(id_col, path)
            if net is None:
                return _rebuild()
            added, tomb_pre, remut = net
            from anser_spark.operators.ivf import IVFIndex, ivf_assign_dist

            ivf = IVFIndex(
                centroids=[list(map(float, c)) for c in d["centroids"]],
                vec_col="__vec",
                id_col="id",
            )
            new_docs = added if remut is None else added.unionByName(remut)
            delta = ivf_assign_dist(
                new_docs.select(
                    F.col(id_col).alias("id"), F.col(path).alias("__vec")
                ).where(F.col("__vec").isNotNull()),
                ivf,
            )
            if d.get("kind") == "ivfpq":
                # codes + norm ride every delta row exactly as the full
                # build lays them out; the codebooks stay FIXED like the
                # centroids (a drifted delta rebuilds, retraining both)
                from anser_spark.operators.pq import PQCodebooks, pq_encode

                cb = PQCodebooks(
                    codebooks=[
                        [[float(v) for v in c] for c in book]
                        for book in d["codebooks"]
                    ],
                    vec_col="__vec",
                    id_col="id",
                )
                delta = pq_encode(delta, cb, out="__codes").withColumn(
                    "__norm",
                    F.sqrt(F.aggregate(
                        F.transform(F.col("__vec"), lambda x: x * x),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )),
                )
            delta = delta.localCheckpoint()  # assign ONCE (stats+probe+write)
            stats = delta.agg(
                F.count(F.lit(1)).alias("k"),
                F.count_distinct(F.col("id")).alias("kid"),
                F.avg(F.sqrt(F.col("__dist"))).alias("md"),
            ).collect()[0]
            k = int(stats["k"])
            tomb_ids = (
                tomb_pre.select(F.col(id_col)).localCheckpoint()
                if tomb_pre is not None else None
            )
            n_tomb = tomb_ids.count() if tomb_ids is not None else 0
            if k == 0 and n_tomb == 0:
                d["built_at_version"] = cur
                self._write_search_index(name, d)
                self._gc_deltas()
                return {"mode": "incremental", "inserted": 0}
            if k and int(stats["kid"]) != k:
                return _rebuild()  # duplicate ids inside the delta
            # drift gate: fixed centroids stay valid while the delta
            # assigns about as tightly as the trained corpus did; a
            # delta whose mean assignment distance blows past the
            # trained mean is a distribution shift — retrain (rebuild).
            # Tiny deltas skip the check: one far vector is noise, and
            # its recall cost is bounded by its own size.
            base_md = float(d.get("assign_mean_dist") or 0.0)
            if k and base_md > 0.0:
                try:
                    ratio_max = float(self.engine.spark.conf.get(
                        "spark.anser.index.ivfDriftRatio", "2.0"))
                    min_delta = int(self.engine.spark.conf.get(
                        "spark.anser.index.ivfDriftMinDelta", "4"))
                except Exception:
                    ratio_max, min_delta = 2.0, 4
                md = float(stats["md"] or 0.0)
                if k >= min_delta and md > ratio_max * base_md:
                    return _rebuild()  # drifted — centroids retrain
            spark = self.engine.spark
            # live-id collision probe against the LAYERED cells table
            # itself (its tombstone anti-join excludes dead ids, so
            # reuse of a removed id is automatically a plain insert
            # here — no separate removed-id set needed)
            if not self.engine.assume_unique_ids:
                added_ids = added.select(F.col(id_col).alias("id"))
                ka = added_ids.count()
                if ka:
                    live = _read_index_table(
                        spark, d, "cells_dir", "cells_deltas", "id"
                    )
                    try:
                        isin_max = int(spark.conf.get(
                            "spark.anser.index.idProbeIsinMax", "100000"))
                    except Exception:
                        isin_max = 100_000
                    if ka <= isin_max:
                        vals = [r["id"] for r in added_ids.collect()]
                        hit = live.where(
                            F.col("id").isin(vals)).limit(1).count()
                    else:
                        hit = live.join(
                            added_ids, "id", "inner").limit(1).count()
                    if hit:
                        return _rebuild()  # collides with a live id
            idx_dir = self._search_index_dir()
            cells_deltas = list(d.get("cells_deltas") or [])
            tombs = list(d.get("tombs") or [])
            if n_tomb:
                gen = len(cells_deltas) + 1
                tomb_dir = os.path.join(idx_dir, f"{name}_tomb_{cur}")
                (
                    tomb_ids.select(
                        F.col(id_col).alias("__tomb_id"),
                        F.lit(gen).alias("__tomb_gen"),
                    ).write.mode("overwrite").parquet(tomb_dir)
                )
                tombs.append(tomb_dir)
            # exact delta/total row counts × dim ⇒ single-file choice
            # (see _range_sorted); dim from the persisted centroids
            dim = len((d.get("centroids") or [[]])[0]) or 1
            vb = _single_file_vector_bytes(spark)
            single = float(k) * dim * 4 <= vb
            single_full = (
                float(d.get("n_vectors") or (1 << 40)) * dim * 4 <= vb
            )
            if k:
                cdelta = os.path.join(idx_dir, f"{name}_cells_delta_{cur}")
                (
                    _range_sorted(
                        delta, [F.col("__cell"), F.col("id")], single
                    )
                    .write.mode("overwrite")
                    .parquet(cdelta)
                )
                cells_deltas.append(cdelta)
            thr = self._index_compact_threshold()
            if len(cells_deltas) >= thr or len(tombs) >= thr:
                probe_d = {
                    **d, "cells_deltas": cells_deltas, "tombs": tombs,
                }
                new_cells = os.path.join(
                    idx_dir, f"{name}_cells_compact_{cur}"
                )
                (
                    _range_sorted(
                        _read_index_table(
                            spark, probe_d, "cells_dir", "cells_deltas", "id"
                        ),
                        [F.col("__cell"), F.col("id")], single_full,
                    )
                    .write.mode("overwrite")
                    .parquet(new_cells)
                )
                d["cells_dir"] = new_cells
                cells_deltas, tombs = [], []
            d["cells_deltas"] = cells_deltas
            d["tombs"] = tombs
            if k and "n_vectors" in d:
                # keep the full-beam bound an UPPER bound: add inserts,
                # never subtract tombstones (see build-time stamp)
                d["n_vectors"] = int(d["n_vectors"]) + int(k)
            d["built_at_version"] = cur
            self._write_search_index(name, d)
            self._sweep_index_dirs(name, d)
            self._gc_deltas()
            out = {"mode": "incremental", "inserted": int(k)}
            if n_tomb:
                out["tombstoned"] = int(n_tomb)
            return out

        if d.get("kind") == "minhash" and d.get("sig_dir") and d.get(
            "bands_dir"
        ):
            path = d.get("path", "text")
            id_col = d.get("id_col", "_id")
            net = (
                _netted(id_col, path)
                if d.get("built_at_version") is not None else None
            )
            if net is None:
                return _rebuild()
            added, tomb_pre, remut = net
            from anser_spark.operators.dedup import (
                banded_signatures,
                minhash_signature_arrow,
            )

            new_docs = (
                added if remut is None else added.unionByName(remut)
            )
            sig = minhash_signature_arrow(
                new_docs, id_col, path, int(d["k"]), int(d["numHashes"]),
                int(d["seed"]),
            ).localCheckpoint()
            n_new = sig.count()
            tomb_ids = (
                tomb_pre.select(F.col(id_col)).localCheckpoint()
                if tomb_pre is not None else None
            )
            n_tomb = tomb_ids.count() if tomb_ids is not None else 0
            idx_dir = self._search_index_dir()
            sig_deltas = list(d.get("sig_deltas") or [])
            bands_deltas = list(d.get("bands_deltas") or [])
            tombs = list(d.get("tombs") or [])
            if n_tomb:
                # round 11: mutated ids' old signatures/bands are
                # invalidated by a generation-stamped tombstone the
                # layered reader anti-joins (read_layered_table) — no
                # table rewrite. gen = one past the highest existing
                # layer, so a re-inserted signature published by THIS
                # refresh (next layer) survives while every older row
                # of the same id dies.
                gen = len(sig_deltas) + 1
                tomb_dir = os.path.join(idx_dir, f"{name}_tomb_{cur}")
                (
                    tomb_ids.select(
                        F.col(id_col).alias("__tomb_id"),
                        F.lit(gen).alias("__tomb_gen"),
                    ).write.mode("overwrite").parquet(tomb_dir)
                )
                tombs.append(tomb_dir)
            if n_new:
                # round 10 (crash safety): the delta writes to STAGED
                # directories, published only by the atomic definition
                # swap below. A refresh that dies mid-write leaves
                # built_at_version old, and the retry OVERWRITES the
                # same staged paths (names are keyed by the target
                # version) instead of double-appending rows into the
                # live tables — duplicated signatures would re-propose
                # duplicate candidate pairs.
                sig_delta = os.path.join(
                    idx_dir, f"{name}_minhash_delta_{cur}"
                )
                bands_delta = os.path.join(
                    idx_dir, f"{name}_bands_delta_{cur}"
                )
                sig.write.mode("overwrite").parquet(sig_delta)
                banded_signatures(
                    sig, id_col, int(d["numHashes"]), int(d["bands"])
                ).write.mode("overwrite").parquet(bands_delta)
                sig_deltas.append(sig_delta)
                bands_deltas.append(bands_delta)
            if n_new or n_tomb:
                thr = self._index_compact_threshold()
                if len(sig_deltas) >= thr or len(tombs) >= thr:
                    # many small refreshes → file-count bloat (and a
                    # growing tombstone broadcast); fold the deltas back
                    # into single base tables with tombstoned rows
                    # physically dropped
                    spark = self.engine.spark
                    probe = {
                        **d, "sig_deltas": sig_deltas,
                        "bands_deltas": bands_deltas, "tombs": tombs,
                    }
                    new_sig = os.path.join(
                        idx_dir, f"{name}_minhash_compact_{cur}"
                    )
                    new_bands = os.path.join(
                        idx_dir, f"{name}_bands_compact_{cur}"
                    )
                    _read_index_table(
                        spark, probe, "sig_dir", "sig_deltas", id_col
                    ).write.mode("overwrite").parquet(new_sig)
                    _read_index_table(
                        spark, probe, "bands_dir", "bands_deltas", id_col
                    ).write.mode("overwrite").parquet(new_bands)
                    d["sig_dir"], d["bands_dir"] = new_sig, new_bands
                    sig_deltas, bands_deltas, tombs = [], [], []
                d["sig_deltas"] = sig_deltas
                d["bands_deltas"] = bands_deltas
                d["tombs"] = tombs
            d["built_at_version"] = cur
            self._write_search_index(name, d)
            self._sweep_index_dirs(name, d)
            self._gc_deltas()
            out = {"mode": "incremental", "inserted": int(n_new)}
            if n_tomb:
                out["tombstoned"] = int(n_tomb)
            return out

        if d.get("kind") == "bm25" and d.get("weights"):
            # round 11: weighted multi-field indexes refresh through
            # the same netting/tombstone machinery, with per-field
            # tokenization and stat rolls
            return self._refresh_weighted_bm25(name, d, cur, _rebuild, _netted)

        if (
            d.get("kind") != "bm25"
            or not d.get("postings_dir")
            or "sum_tokens" not in d
            or self._analyzer_stale(d)
            or d.get("built_at_version") is None
            # positions stamp drifted from the option (e.g. a pre-
            # positions index under round-10 code): delta files would
            # not schema-match the base postings — rebuild once
            or bool(d.get("postings_positions", False))
            != bool(d.get("positions", True))
        ):
            return _rebuild()
        path = d.get("path", "text")
        id_col = d.get("id_col", "_id")
        net = _netted(id_col, path)
        if net is None:
            return _rebuild()
        added, tomb_pre, remut = net

        from anser_spark.operators.ranking import _tokens as _rank_tokens

        language = d.get("default_language", "none")
        toks = _rank_tokens(path, language)
        new_docs = added if remut is None else added.unionByName(remut)
        delta = new_docs.select(
            F.col(id_col).alias("id"), toks.alias("__toks")
        ).localCheckpoint()  # tokenize the delta ONCE (stats + terms + postings)
        # neg: the mutated docs' PRE-IMAGES, tokenized — this is how
        # df / sum_tokens / n_docs roll DOWN exactly without ever
        # reading the postings table by id (round 11: the postings
        # layout is keyed by term, so an id-keyed lookup would be an
        # O(index) scan; the pre-image re-tokenize is O(mutated docs))
        neg = (
            tomb_pre.select(
                F.col(id_col).alias("id"), toks.alias("__toks")
            ).localCheckpoint()
            if tomb_pre is not None else None
        )
        stats = delta.agg(
            F.count(F.lit(1)).alias("k"),
            F.count_distinct(F.col("id")).alias("k_ids"),
            F.coalesce(F.sum(F.size("__toks")), F.lit(0)).alias("sum_tokens"),
            F.count(F.size("__toks")).alias("n_text_docs"),
        ).collect()[0]
        k = int(stats["k"])
        k_added = added.count() if neg is not None else k
        if neg is not None:
            neg_stats = neg.agg(
                F.count(F.lit(1)).alias("k"),
                F.coalesce(
                    F.sum(F.size("__toks")), F.lit(0)
                ).alias("sum_tokens"),
                F.count(F.size("__toks")).alias("n_text_docs"),
            ).collect()[0]
            k_neg = int(neg_stats["k"])
        else:
            k_neg = 0
        if k == 0 and k_neg == 0:
            # pointer moved but the net change is empty (a no-op
            # rewrite, or mutations that left the indexed column
            # untouched): just re-stamp
            d["built_at_version"] = cur
            self._write_search_index(name, d)
            self._gc_deltas()
            return {"mode": "incremental", "inserted": 0}
        # delta-scoped id-uniqueness (round 10): the index was built —
        # and every prior refresh re-verified — under corpus-wide
        # uniqueness, and the chain nets to added + re-indexed ids, so
        # the only NEW ways to break it are duplicate ids inside the
        # delta (checked on the delta alone, above) or a genuinely-NEW
        # id colliding with an existing one. Round 11: the collision
        # probe prefers the persisted ID SIDECAR (a slim sorted id
        # table maintained beside the postings) — small batches push an
        # isin literal filter down to its footer-pruned row groups, so
        # the probe reads O(delta) and NO corpus data file at all;
        # larger batches pay one semi-join over the sidecar's single
        # column. Corpus-column semi-join remains the fallback for
        # sidecar-less (pre-round-11) indexes. assume_unique_ids
        # engines skip the probe entirely (the engine-level contract).
        if int(stats["k_ids"]) != k:
            return _rebuild()  # duplicate ids inside the delta
        added_ids = added.select(F.col(id_col).alias("id"))
        revived: DataFrame | None = None
        if not self.engine.assume_unique_ids and k_added:
            ok, revived = self._probe_new_ids(d, added_ids, k_added)
            if not ok:
                return _rebuild()  # an added id collides with a LIVE id
        # removed-id set maintenance (round 12): this window's removals
        # join the dead set, revived ids leave it — BEFORE the sidecar
        # compaction below, which anti-joins the up-to-date set
        k_removed_now = k_neg - (k - k_added)
        if k_removed_now > 0 or revived is not None:
            removed_frame = None
            if k_removed_now > 0:
                removed_frame = tomb_pre.select(
                    F.col(id_col).alias("id")
                ).join(
                    remut.select(F.col(id_col).alias("id")),
                    "id",
                    "left_anti",
                )
            self._roll_removed_ids(d, name, cur, removed_frame, revived)

        # 1. delta postings → a STAGED directory, published only by the
        # atomic definition swap in step 3 (round 10; a crash between
        # the old in-place append and the swap made the retry
        # double-append the same postings, silently doubling tf).
        # Retries overwrite the same staged path — idempotent. Round
        # 11: a mutation window additionally stages a generation-
        # stamped TOMBSTONE of the mutated ids (their old postings die
        # in the layered reader's anti-join) and an id-sidecar delta
        # for genuinely-new ids.
        spark = self.engine.spark
        idx_dir = self._search_index_dir()
        postings_deltas = list(d.get("postings_deltas") or [])
        postings_tombs = list(d.get("postings_tombs") or [])
        ids_deltas = list(d.get("ids_deltas") or [])
        # exact delta token volume ⇒ small deltas land as one sorted
        # file (no RangePartitioner sampling job); compaction folds the
        # FULL table, so it sizes off the rolled-forward total
        single = int(stats["sum_tokens"]) <= _single_file_tokens(spark)
        single_full = (
            int(d.get("sum_tokens") or 0) + int(stats["sum_tokens"])
        ) <= _single_file_tokens(spark)
        if k_neg:
            gen = len(postings_deltas) + 1
            ptomb = os.path.join(idx_dir, f"{name}_ptomb_{cur}")
            (
                neg.select(
                    F.col("id").alias("__tomb_id"),
                    F.lit(gen).alias("__tomb_gen"),
                ).write.mode("overwrite").parquet(ptomb)
            )
            postings_tombs.append(ptomb)
        if k:
            post_delta = os.path.join(
                idx_dir, f"{name}_postings_delta_{cur}"
            )
            (
                _range_sorted(
                    self._postings_rows(
                        delta, bool(d.get("postings_positions"))
                    ),
                    [F.col("term_fold"), F.col("id")], single,
                )
                .write.mode("overwrite")
                .parquet(post_delta)
            )
            postings_deltas.append(post_delta)
        # raw-token sidecar maintenance (round 11): the sidecar's delta
        # layers must advance in LOCKSTEP with the main table's (they
        # share the tombstone generations), so a delta is appended iff
        # the main path appended one; the 'none' re-tokenize of the
        # delta is a codegen'd split, no stemmer pass
        raw_postings_deltas = list(d.get("raw_postings_deltas") or [])
        raw_delta = None
        raw_neg = None
        if d.get("raw_postings_dir"):
            raw_toks = _rank_tokens(path, "none")
            if k:
                raw_delta = new_docs.select(
                    F.col(id_col).alias("id"), raw_toks.alias("__toks")
                ).localCheckpoint()
                raw_post_delta = os.path.join(
                    idx_dir, f"{name}_rawpostings_delta_{cur}"
                )
                (
                    _range_sorted(
                        self._postings_rows(raw_delta, True),
                        [F.col("term_fold"), F.col("id")], single,
                    )
                    .write.mode("overwrite")
                    .parquet(raw_post_delta)
                )
                raw_postings_deltas.append(raw_post_delta)
            if k_neg:
                raw_neg = tomb_pre.select(
                    F.col(id_col).alias("id"), raw_toks.alias("__toks")
                ).localCheckpoint()
        if k_added and d.get("ids_dir"):
            ids_delta = os.path.join(idx_dir, f"{name}_ids_delta_{cur}")
            (
                _range_sorted(added_ids, [F.col("id")], single)
                .write.mode("overwrite")
                .parquet(ids_delta)
            )
            ids_deltas.append(ids_delta)
        thr = self._index_compact_threshold()
        if len(postings_deltas) >= thr or len(postings_tombs) >= thr:
            # compaction: many incremental refreshes accumulate small
            # range-sorted files that erode footer pruning (and a
            # growing tombstone broadcast) — fold base + deltas back
            # into ONE globally range-partitioned table with
            # tombstoned rows physically dropped
            from anser_spark.operators.ranking import _postings_frame

            new_post = os.path.join(
                idx_dir, f"{name}_postings_compact_{cur}"
            )
            probe = {
                **d,
                "postings_deltas": postings_deltas,
                "postings_tombs": postings_tombs,
            }
            (
                _range_sorted(
                    _postings_frame(spark, probe),
                    [F.col("term_fold"), F.col("id")], single_full,
                )
                .write.mode("overwrite")
                .parquet(new_post)
            )
            d["postings_dir"] = new_post
            if d.get("raw_postings_dir"):
                # the sidecar folds together with the main table — the
                # tombstone list is shared, so clearing it must clear
                # both tables' dead rows at once
                new_raw = os.path.join(
                    idx_dir, f"{name}_rawpostings_compact_{cur}"
                )
                probe_raw = {
                    **d,
                    "raw_postings_deltas": raw_postings_deltas,
                    "postings_tombs": postings_tombs,
                }
                (
                    _range_sorted(
                        _postings_frame(spark, probe_raw, raw=True),
                        [F.col("term_fold"), F.col("id")], single_full,
                    )
                    .write.mode("overwrite")
                    .parquet(new_raw)
                )
                d["raw_postings_dir"] = new_raw
                raw_postings_deltas = []
            postings_deltas, postings_tombs = [], []
        if d.get("ids_dir") and len(ids_deltas) >= thr:
            new_ids = os.path.join(idx_dir, f"{name}_ids_compact_{cur}")
            merged_ids = _read_pt_star(spark, 
                str(d["ids_dir"]), *map(str, ids_deltas)
            )
            if d.get("removed_dir"):
                # fold the dead ids out physically (the removed set was
                # rolled BEFORE this block, so revived ids survive: the
                # set no longer contains them) and clear the set — the
                # compacted sidecar is exactly the live ids
                merged_ids = merged_ids.join(
                    _read_pt(spark, str(d["removed_dir"])),
                    "id",
                    "left_anti",
                )
                d.pop("removed_dir", None)
            (
                _range_sorted(
                    merged_ids.distinct(), [F.col("id")], single_full
                )
                .write.mode("overwrite")
                .parquet(new_ids)
            )
            d["ids_dir"] = new_ids
            ids_deltas = []
        # 2. term-table merge into a FRESH dir (can't overwrite a dir
        # while reading it); the old dir is swept after the swap.
        # Round 11: mutated docs' pre-image terms merge with NEGATIVE
        # document frequencies — a term whose df reaches 0 leaves the
        # table, exactly as a fresh rebuild would have it.
        old_terms_dir = str(d["terms_dir"])
        new_terms_dir = os.path.join(idx_dir, f"{name}_terms_{cur}")
        new_terms = (
            delta.select(F.explode(F.array_distinct("__toks")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        merged = _read_pt(spark, old_terms_dir).unionByName(new_terms)
        if k_neg:
            neg_terms = (
                neg.select(
                    F.explode(F.array_distinct("__toks")).alias("term")
                )
                .groupBy("term")
                .agg((-F.count(F.lit(1))).alias("df"))
            )
            merged = merged.unionByName(neg_terms)
        (
            _range_sorted(
                merged.groupBy("term")
                .agg(F.sum("df").alias("df"))
                .where(F.col("df") > 0),
                [F.col("term")], single_full,
            )
            .write.mode("overwrite")
            .parquet(new_terms_dir)
        )
        if d.get("raw_postings_dir") and d.get("raw_terms_dir"):
            # the sidecar's term table (the phrase/autocomplete cost
            # gate's df source) rolls the same signed merge
            new_raw_terms_dir = os.path.join(
                idx_dir, f"{name}_rawterms_{cur}"
            )
            merged_raw = _read_pt(spark, str(d["raw_terms_dir"]))
            if raw_delta is not None:
                merged_raw = merged_raw.unionByName(
                    raw_delta.select(
                        F.explode(F.array_distinct("__toks")).alias("term")
                    )
                    .groupBy("term")
                    .agg(F.count(F.lit(1)).alias("df"))
                )
            if raw_neg is not None:
                merged_raw = merged_raw.unionByName(
                    raw_neg.select(
                        F.explode(F.array_distinct("__toks")).alias("term")
                    )
                    .groupBy("term")
                    .agg((-F.count(F.lit(1))).alias("df"))
                )
            (
                _range_sorted(
                    merged_raw.groupBy("term")
                    .agg(F.sum("df").alias("df"))
                    .where(F.col("df") > 0),
                    [F.col("term")], single_full,
                )
                .write.mode("overwrite")
                .parquet(new_raw_terms_dir)
            )
            d["raw_terms_dir"] = new_raw_terms_dir
        # 3. exact stats roll-forward + atomic definition swap, then
        # sweep directories the new definition no longer references.
        # Removed docs leave n_docs; updated docs replace their token
        # contribution (pre-image out, post-state in) — the refreshed
        # stats equal a fresh rebuild's, not an approximation (tested).
        k_removed = k_neg - (k - k_added)
        d["n_docs"] = int(d["n_docs"]) + k_added - k_removed
        d["sum_tokens"] = (
            int(d["sum_tokens"]) + int(stats["sum_tokens"])
            - (int(neg_stats["sum_tokens"]) if k_neg else 0)
        )
        d["n_text_docs"] = (
            int(d["n_text_docs"]) + int(stats["n_text_docs"])
            - (int(neg_stats["n_text_docs"]) if k_neg else 0)
        )
        d["avgdl"] = (
            d["sum_tokens"] / d["n_text_docs"] if d["n_text_docs"] else 0.0
        )
        d["terms_dir"] = new_terms_dir
        d["postings_deltas"] = postings_deltas
        d["postings_tombs"] = postings_tombs
        d["ids_deltas"] = ids_deltas
        if d.get("raw_postings_dir"):
            d["raw_postings_deltas"] = raw_postings_deltas
        d["built_at_version"] = cur
        self._write_search_index(name, d)
        self._sweep_index_dirs(name, d)
        self._gc_deltas()
        out = {"mode": "incremental", "inserted": k}
        if k_neg:
            out["tombstoned"] = k_neg
        return out

    def _refresh_weighted_bm25(
        self, name: str, d: dict[str, Any], cur: str | None,
        _rebuild, _netted,
    ) -> dict[str, Any]:
        """Incremental refresh for WEIGHTED multi-field bm25 indexes
        (round 11): the single-field machinery generalized — the
        unchanged-content skip compares ALL weighted fields (a
        migration touching none of them nets to nothing), the delta
        and pre-image tokenize once PER FIELD, the ``(field, term)``
        term table merges signed dfs, per-field avgdl / token totals
        roll both ways exactly, and mutated ids die via the same
        id-keyed generation-stamped tombstones (field-agnostic by
        construction). Rebuilds when the index predates the per-field
        stamps, the analyzer upgraded, or the chain broke."""
        from anser_spark.operators.ranking import (
            _FOLD_DST,
            _FOLD_SRC,
            _postings_frame,
            _tokens as _rank_tokens,
        )

        weights = {
            str(f): float(w) for f, w in dict(d["weights"]).items()
        }
        fields = sorted(weights)
        fmeta = {str(f): dict(v) for f, v in (d.get("fields") or {}).items()}
        if (
            not d.get("postings_dir")
            or d.get("built_at_version") is None
            or self._analyzer_stale(d)
            or any(
                f not in fmeta or "sum_tokens" not in fmeta[f]
                for f in fields
            )
            # positions stamp drifted from the option (round 12: new
            # weighted builds store positions; a pre-positions index
            # under this code would write schema-mismatched delta
            # files) — rebuild once onto the new layout
            or bool(d.get("postings_positions", False))
            != bool(d.get("positions", True))
            # a stemmed weighted index without the raw sidecar predates
            # round 12 — rebuild once so phrase/autocomplete serve
            or (
                (d.get("default_language", "none") or "none") != "none"
                and not d.get("raw_postings_dir")
            )
        ):
            return _rebuild()
        id_col = str(d.get("id_col", "_id"))
        language = d.get("default_language", "none")
        net = _netted(id_col, fields)
        if net is None:
            return _rebuild()
        added, tomb_pre, remut = net
        new_docs = added if remut is None else added.unionByName(remut)

        def tok_cols():
            return [
                _rank_tokens(f, language).alias(f"__t{i}")
                for i, f in enumerate(fields)
            ]

        def field_aggs(prefix_k: bool):
            aggs: list = [F.count(F.lit(1)).alias("k")]
            if prefix_k:
                aggs.append(F.count_distinct(F.col("id")).alias("k_ids"))
            for i, _f in enumerate(fields):
                aggs.extend([
                    F.coalesce(
                        F.sum(F.size(f"__t{i}")), F.lit(0)
                    ).alias(f"st{i}"),
                    F.count(F.size(f"__t{i}")).alias(f"nt{i}"),
                ])
            return aggs

        delta = new_docs.select(
            F.col(id_col).alias("id"), *tok_cols()
        ).localCheckpoint()
        neg = (
            tomb_pre.select(
                F.col(id_col).alias("id"), *tok_cols()
            ).localCheckpoint()
            if tomb_pre is not None else None
        )
        stats = delta.agg(*field_aggs(True)).collect()[0]
        k = int(stats["k"])
        k_added = added.count() if neg is not None else k
        if neg is not None:
            neg_stats = neg.agg(*field_aggs(False)).collect()[0]
            k_neg = int(neg_stats["k"])
        else:
            k_neg = 0
        if k == 0 and k_neg == 0:
            d["built_at_version"] = cur
            self._write_search_index(name, d)
            self._gc_deltas()
            return {"mode": "incremental", "inserted": 0}
        if int(stats["k_ids"]) != k:
            return _rebuild()
        added_ids = added.select(F.col(id_col).alias("id"))
        revived: DataFrame | None = None
        if not self.engine.assume_unique_ids and k_added:
            ok, revived = self._probe_new_ids(d, added_ids, k_added)
            if not ok:
                return _rebuild()
        # removed-id set maintenance (round 12) — see the single-field
        # branch; must precede the ids-sidecar compaction below
        k_removed_now = k_neg - (k - k_added)
        if k_removed_now > 0 or revived is not None:
            removed_frame = None
            if k_removed_now > 0:
                removed_frame = tomb_pre.select(
                    F.col(id_col).alias("id")
                ).join(
                    remut.select(F.col(id_col).alias("id")),
                    "id",
                    "left_anti",
                )
            self._roll_removed_ids(d, name, cur, removed_frame, revived)

        spark = self.engine.spark
        idx_dir = self._search_index_dir()
        postings_deltas = list(d.get("postings_deltas") or [])
        postings_tombs = list(d.get("postings_tombs") or [])
        ids_deltas = list(d.get("ids_deltas") or [])
        # exact delta token volume ⇒ small deltas land as one sorted
        # file (no RangePartitioner sampling job); compaction sizes off
        # the rolled-forward per-field totals (see _range_sorted)
        delta_tokens = sum(
            int(stats[f"st{i}"]) for i in range(len(fields))
        )
        single = delta_tokens <= _single_file_tokens(spark)
        single_full = (
            sum(
                int(fd.get("sum_tokens") or 0)
                for fd in (d.get("fields") or {}).values()
            )
            + delta_tokens
        ) <= _single_file_tokens(spark)
        if k_neg:
            gen = len(postings_deltas) + 1
            ptomb = os.path.join(idx_dir, f"{name}_ptomb_{cur}")
            (
                neg.select(
                    F.col("id").alias("__tomb_id"),
                    F.lit(gen).alias("__tomb_gen"),
                ).write.mode("overwrite").parquet(ptomb)
            )
            postings_tombs.append(ptomb)
        if k:
            post_delta = os.path.join(
                idx_dir, f"{name}_postings_delta_{cur}"
            )
            (
                _range_sorted(
                    self._weighted_postings_rows(
                        delta, fields, bool(d.get("postings_positions"))
                    ),
                    [F.col("term_fold"), F.col("id")], single,
                )
                .write.mode("overwrite")
                .parquet(post_delta)
            )
            postings_deltas.append(post_delta)
        # raw-token sidecar maintenance (round 12): delta layers advance
        # in LOCKSTEP with the main table's (shared tombstone
        # generations) — a delta is appended iff the main path appended
        # one; same contract as the single-field sidecar
        raw_postings_deltas = list(d.get("raw_postings_deltas") or [])
        raw_delta = None
        raw_neg = None
        if d.get("raw_postings_dir"):
            raw_toks = [
                _rank_tokens(f, "none").alias(f"__t{i}")
                for i, f in enumerate(fields)
            ]
            if k:
                raw_delta = new_docs.select(
                    F.col(id_col).alias("id"), *raw_toks
                ).localCheckpoint()
                raw_post_delta = os.path.join(
                    idx_dir, f"{name}_rawpostings_delta_{cur}"
                )
                (
                    _range_sorted(
                        self._weighted_postings_rows(raw_delta, fields, True),
                        [F.col("term_fold"), F.col("id")], single,
                    )
                    .write.mode("overwrite")
                    .parquet(raw_post_delta)
                )
                raw_postings_deltas.append(raw_post_delta)
            if k_neg:
                raw_neg = tomb_pre.select(
                    F.col(id_col).alias("id"), *raw_toks
                ).localCheckpoint()
        if k_added and d.get("ids_dir"):
            ids_delta = os.path.join(idx_dir, f"{name}_ids_delta_{cur}")
            (
                _range_sorted(added_ids, [F.col("id")], single)
                .write.mode("overwrite")
                .parquet(ids_delta)
            )
            ids_deltas.append(ids_delta)
        thr = self._index_compact_threshold()
        if len(postings_deltas) >= thr or len(postings_tombs) >= thr:
            new_post = os.path.join(
                idx_dir, f"{name}_postings_compact_{cur}"
            )
            probe = {
                **d,
                "postings_deltas": postings_deltas,
                "postings_tombs": postings_tombs,
            }
            (
                _range_sorted(
                    _postings_frame(spark, probe),
                    [F.col("term_fold"), F.col("id")], single_full,
                )
                .write.mode("overwrite")
                .parquet(new_post)
            )
            d["postings_dir"] = new_post
            if d.get("raw_postings_dir"):
                # the sidecar folds together with the main table — the
                # tombstone list is shared, so clearing it must clear
                # both tables' dead rows at once
                new_raw = os.path.join(
                    idx_dir, f"{name}_rawpostings_compact_{cur}"
                )
                probe_raw = {
                    **d,
                    "raw_postings_deltas": raw_postings_deltas,
                    "postings_tombs": postings_tombs,
                }
                (
                    _range_sorted(
                        _postings_frame(spark, probe_raw, raw=True),
                        [F.col("term_fold"), F.col("id")], single_full,
                    )
                    .write.mode("overwrite")
                    .parquet(new_raw)
                )
                d["raw_postings_dir"] = new_raw
                raw_postings_deltas = []
            postings_deltas, postings_tombs = [], []
        if d.get("ids_dir") and len(ids_deltas) >= thr:
            new_ids = os.path.join(idx_dir, f"{name}_ids_compact_{cur}")
            merged_ids = _read_pt_star(spark, 
                str(d["ids_dir"]), *map(str, ids_deltas)
            )
            if d.get("removed_dir"):
                # fold the dead ids out physically (the removed set was
                # rolled BEFORE this block, so revived ids survive: the
                # set no longer contains them) and clear the set — the
                # compacted sidecar is exactly the live ids
                merged_ids = merged_ids.join(
                    _read_pt(spark, str(d["removed_dir"])),
                    "id",
                    "left_anti",
                )
                d.pop("removed_dir", None)
            (
                _range_sorted(
                    merged_ids.distinct(), [F.col("id")], single_full
                )
                .write.mode("overwrite")
                .parquet(new_ids)
            )
            d["ids_dir"] = new_ids
            ids_deltas = []
        # (field, term) term-table merge with signed dfs
        new_terms_dir = os.path.join(idx_dir, f"{name}_terms_{cur}")
        merged = _read_pt(spark, str(d["terms_dir"]))
        for i, f in enumerate(fields):
            pos_f = (
                delta.select(
                    F.lit(f).alias("field"),
                    F.explode(F.array_distinct(f"__t{i}")).alias("term"),
                )
                .groupBy("field", "term")
                .agg(F.count(F.lit(1)).alias("df"))
            )
            merged = merged.unionByName(pos_f)
            if k_neg:
                neg_f = (
                    neg.select(
                        F.lit(f).alias("field"),
                        F.explode(
                            F.array_distinct(f"__t{i}")
                        ).alias("term"),
                    )
                    .groupBy("field", "term")
                    .agg((-F.count(F.lit(1))).alias("df"))
                )
                merged = merged.unionByName(neg_f)
        (
            _range_sorted(
                merged.groupBy("field", "term")
                .agg(F.sum("df").alias("df"))
                .where(F.col("df") > 0),
                [F.col("term"), F.col("field")], single_full,
            )
            .write.mode("overwrite")
            .parquet(new_terms_dir)
        )
        if d.get("raw_postings_dir") and d.get("raw_terms_dir"):
            # the sidecar's (field, term) table rolls the same signed
            # merge — the phrase/autocomplete cost gate's df source
            new_raw_terms_dir = os.path.join(
                idx_dir, f"{name}_rawterms_{cur}"
            )
            merged_raw = _read_pt(spark, str(d["raw_terms_dir"]))
            for i, f in enumerate(fields):
                if raw_delta is not None:
                    merged_raw = merged_raw.unionByName(
                        raw_delta.select(
                            F.lit(f).alias("field"),
                            F.explode(
                                F.array_distinct(f"__t{i}")
                            ).alias("term"),
                        )
                        .groupBy("field", "term")
                        .agg(F.count(F.lit(1)).alias("df"))
                    )
                if raw_neg is not None:
                    merged_raw = merged_raw.unionByName(
                        raw_neg.select(
                            F.lit(f).alias("field"),
                            F.explode(
                                F.array_distinct(f"__t{i}")
                            ).alias("term"),
                        )
                        .groupBy("field", "term")
                        .agg((-F.count(F.lit(1))).alias("df"))
                    )
            (
                _range_sorted(
                    merged_raw.groupBy("field", "term")
                    .agg(F.sum("df").alias("df"))
                    .where(F.col("df") > 0),
                    [F.col("term"), F.col("field")], single_full,
                )
                .write.mode("overwrite")
                .parquet(new_raw_terms_dir)
            )
            d["raw_terms_dir"] = new_raw_terms_dir
        # exact per-field stat roll-forward + atomic swap
        k_removed = k_neg - (k - k_added)
        d["n_docs"] = int(d["n_docs"]) + k_added - k_removed
        for i, f in enumerate(fields):
            fm = fmeta[f]
            fm["sum_tokens"] = (
                int(fm["sum_tokens"]) + int(stats[f"st{i}"])
                - (int(neg_stats[f"st{i}"]) if k_neg else 0)
            )
            fm["n_text_docs"] = (
                int(fm["n_text_docs"]) + int(stats[f"nt{i}"])
                - (int(neg_stats[f"nt{i}"]) if k_neg else 0)
            )
            fm["avgdl"] = (
                fm["sum_tokens"] / fm["n_text_docs"]
                if fm["n_text_docs"] else 0.0
            )
        d["fields"] = fmeta
        d["terms_dir"] = new_terms_dir
        d["postings_deltas"] = postings_deltas
        d["postings_tombs"] = postings_tombs
        d["ids_deltas"] = ids_deltas
        if d.get("raw_postings_dir"):
            d["raw_postings_deltas"] = raw_postings_deltas
        d["built_at_version"] = cur
        self._write_search_index(name, d)
        self._sweep_index_dirs(name, d)
        self._gc_deltas()
        out = {"mode": "incremental", "inserted": k}
        if k_neg:
            out["tombstoned"] = k_neg
        return out

    def _write_search_index(self, name: str, definition: Mapping[str, Any]) -> None:
        os.makedirs(self._search_index_dir(), exist_ok=True)
        tmp = os.path.join(self._search_index_dir(), f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump(dict(definition), fh)
        os.replace(tmp, os.path.join(self._search_index_dir(), f"{name}.json"))

    def _probe_new_ids(
        self, d: Mapping[str, Any], added_ids: DataFrame, k_added: int
    ) -> tuple[bool, DataFrame | None]:
        """``(ok, revived)``: ``ok`` is False when one of the delta's
        genuinely-new ids collides with a LIVE id the index already
        carries (the caller rebuilds). Prefers the persisted ID
        SIDECAR (round 11): a slim ``(id)`` parquet table, range-sorted
        so a small batch's ``isin`` literal filter footer-prunes to
        O(delta) row groups — the refresh then reads NO corpus data
        file at all (plan-asserted in tests). Batches past
        ``spark.anser.index.idProbeIsinMax`` (default 100k ids) pay one
        semi-join over the sidecar's single column instead — still far
        cheaper than the corpus id column it replaces.

        The sidecar keeps REMOVED ids too; round 12 pairs it with the
        REMOVED-ID set (``removed_dir`` — ids whose latest event is a
        removal), so re-using a removed doc's id no longer forces a
        rebuild: a collision where EVERY colliding id is marked dead is
        plain id reuse — the old postings died under an earlier
        tombstone generation, so the re-added doc indexes as an
        ordinary insert. Those ids return as ``revived`` and the caller
        strikes them from the removed set (they are live again).

        Sidecar-less (pre-round-11) indexes fall back to the round-10
        corpus-column semi-join, where the corpus itself is ground
        truth on live-ness (removed ids aren't in it), so id reuse
        passes there by construction."""
        spark = self.engine.spark
        if d.get("ids_dir"):
            side = _read_pt_star(spark, 
                str(d["ids_dir"]),
                *[str(p) for p in (d.get("ids_deltas") or [])],
            )
            try:
                isin_max = int(
                    spark.conf.get(
                        "spark.anser.index.idProbeIsinMax", "100000"
                    )
                )
            except Exception:
                isin_max = 100_000
            if k_added <= isin_max:
                vals = [r["id"] for r in added_ids.collect()]
                colliding = side.where(F.col("id").isin(vals)).select("id")
            else:
                colliding = side.join(added_ids, "id", "inner").select("id")
            if not colliding.limit(1).count():
                return True, None  # the common case: no collision at all
            if not d.get("removed_dir"):
                return False, None  # collision, no dead set to excuse it
            colliding = colliding.distinct().localCheckpoint()
            dead = _read_pt(spark, str(d["removed_dir"]))
            if colliding.join(dead, "id", "left_anti").limit(1).count():
                return False, None  # collides with a LIVE id
            return True, colliding
        id_col = str(d.get("id_col", "_id"))
        ids = added_ids
        if k_added <= 2_000_000:
            ids = F.broadcast(ids)
        hits = (
            self.df()
            .select(F.col(id_col).alias("id"))
            .join(ids, "id", "inner")
            .count()
        )
        # each added id must match exactly its own just-appended corpus
        # row; any extra match is a collision with an older document
        return hits == k_added, None

    def _roll_removed_ids(
        self,
        d: dict[str, Any],
        name: str,
        cur: str | None,
        removed_ids: DataFrame | None,
        revived: DataFrame | None,
    ) -> None:
        """Maintain the REMOVED-ID set (round 12): the ids whose latest
        event is a removal. This window's removals join the set;
        re-added (revived) ids leave it, so a future reuse of a LIVE id
        still reads as a collision in ``_probe_new_ids``. Cost: one
        O(dead set) rewrite, only on windows that actually removed or
        revived ids — the steady-state insert/update refresh never
        touches it. Staged under the target version (a crashed
        refresh's retry overwrites the same path) and published by the
        atomic definition swap; the ids-sidecar compaction folds dead
        ids out of the sidecar physically and clears the set."""
        spark = self.engine.spark
        new_dead = (
            _read_pt(spark, str(d["removed_dir"]))
            if d.get("removed_dir") else None
        )
        if revived is not None and new_dead is not None:
            new_dead = new_dead.join(revived, "id", "left_anti")
        if removed_ids is not None:
            add = removed_ids.distinct()
            new_dead = (
                add if new_dead is None
                else new_dead.unionByName(add).distinct()
            )
        if new_dead is None:
            return
        out = os.path.join(
            self._search_index_dir(), f"{name}_removed_{cur}"
        )
        new_dead.write.mode("overwrite").parquet(out)
        d["removed_dir"] = out

    def _gc_deltas(self) -> None:
        """Reclaim mutation pre-images no refresh can still need: a
        chain walk starts strictly AFTER an index's built_at version,
        so once every stored index is built at ordinal ≥ N, mutation
        manifests (and their pre-image parquet) at ordinal ≤ N are
        unreachable — delete them (round 11; without this, pre-images
        would accumulate O(total mutated rows) forever). Insert
        manifests stay: they are a few bytes and still serve the
        watch()/diff_versions fast path, which rejects mutation
        manifests anyway."""
        dd = self._deltas_dir()
        if not os.path.isdir(dd):
            return
        min_built: float = float("inf")  # no index ⇒ all pre-images dead
        for nm in self.list_search_indexes():
            try:
                od = self._load_search_index(nm, warn_stale=False)
            except NotFoundError:
                continue
            o = self._version_ordinal(str(od.get("built_at_version") or ""))
            if o is None:
                return  # an index with unknowable lineage — keep all
            min_built = min(min_built, o)
        for entry in os.listdir(dd):
            if not entry.endswith(".json") or entry.startswith("."):
                continue
            v = entry[: -len(".json")]
            o = self._version_ordinal(v)
            m = self._insert_manifest(v)
            if m is None or o is None or o > min_built:
                continue
            if (m.get("kind") or "insert") == "mutation":
                if m.get("pre"):
                    shutil.rmtree(
                        os.path.join(dd, str(m["pre"])), ignore_errors=True
                    )
                if m.get("ins"):  # hybrid manifest's insert sidecars
                    shutil.rmtree(
                        os.path.join(dd, str(m["ins"])), ignore_errors=True
                    )
                try:
                    os.remove(os.path.join(dd, entry))
                except OSError:
                    pass
            elif m.get("ins"):
                # an unreachable insert commit's id sidecar is dead
                # weight (O(batch) each); the tiny manifest json stays
                # for the watch()/diff fast path — the chain walker
                # tolerates a reclaimed sidecar by requiring the files
                shutil.rmtree(
                    os.path.join(dd, str(m["ins"])), ignore_errors=True
                )
        # orphan sweep (round 12, ADVICE): {version}_pre / {version}_ins
        # directories whose version never recorded a manifest — a crash
        # between the pointer swap and the manifest write, or an aborted
        # transaction (pre-images materialize before the staged swap) —
        # previously accumulated forever. A dir is an orphan when no
        # manifest json exists for its version AND the version cannot
        # still be in flight: non-txn versions write their pre-image
        # BEFORE the swap, so anything at ordinal ≥ the current
        # pointer's may be a commit in progress (this also covers the
        # swap→manifest window) — reclaim strictly below it; txn-staged
        # names are skipped entirely while this engine has an open
        # transaction, and otherwise belong to a committed txn (manifest
        # exists) or an aborted one (reclaim).
        ptr_o = self._version_ordinal(self._pointer())
        if ptr_o is None:
            return
        for entry in os.listdir(dd):
            if not (entry.endswith("_pre") or entry.endswith("_ins")):
                continue
            v = entry[:-4]
            if os.path.exists(os.path.join(dd, f"{v}.json")):
                continue
            o = self._version_ordinal(v)
            if o is None:
                continue
            if ".txn." in v:
                if self.engine._txn is not None:
                    continue  # possibly staged by the open transaction
                # a txn staged by ANOTHER engine/process on the same
                # store is invisible to self.engine._txn; only reclaim
                # txn-named orphans past an age threshold so a sidecar
                # in the stage→manifest window survives (round-13
                # ADVICE — previously a cross-process race degraded
                # the chain to a full rebuild)
                try:
                    age = time.time() - os.path.getmtime(
                        os.path.join(dd, entry)
                    )
                except OSError:
                    continue
                if age < self._txn_orphan_age_s():
                    continue
            elif o >= ptr_o:
                continue  # possibly a commit in flight
            shutil.rmtree(os.path.join(dd, entry), ignore_errors=True)

    def _txn_orphan_age_s(self) -> float:
        """Minimum age before a txn-staged pre-image/insert sidecar with
        no manifest is treated as abandoned and reclaimed. Covers the
        stage→commit window of transactions opened by OTHER processes
        on the same store (in-process ones are gated on self._txn)."""
        try:
            return float(
                self.engine.spark.conf.get(
                    "spark.anser.index.txnOrphanAgeSeconds", "3600"
                )
            )
        except Exception:
            return 3600.0

    def _index_compact_threshold(self) -> int:
        """Delta-directory count at which an incremental refresh folds
        its staged deltas back into one base table (round 10): unbounded
        small appends erode the footer pruning the range layout exists
        for. Session-tunable for operational control."""
        try:
            return max(2, int(
                self.engine.spark.conf.get(
                    "spark.anser.index.compactThreshold", "8"
                )
            ))
        except Exception:
            return 8

    def _sweep_index_dirs(self, name: str, definition: Mapping[str, Any]) -> None:
        """Remove index ``name``'s table directories that its
        just-published definition no longer references — old versioned
        term tables, compacted-away postings/signature deltas, staged
        dirs from a crashed refresh (round 10; previously each
        refresh→rebuild cycle leaked the last versioned terms dir).
        Directories referenced by ANY stored index definition are never
        touched, so an index whose name happens to prefix another's
        cannot sweep its neighbor's tables."""
        base = self._search_index_dir()
        if not os.path.isdir(base):
            return
        referenced: set[str] = set()
        defs: list[Mapping[str, Any]] = [definition]
        for other in self.list_search_indexes():
            if other == name:
                continue
            try:
                defs.append(self._load_search_index(other, warn_stale=False))
            except NotFoundError:
                continue
        for od in defs:
            for key in (
                "terms_dir", "postings_dir", "sig_dir", "bands_dir",
                "ids_dir", "raw_postings_dir", "raw_terms_dir",
                "removed_dir", "cells_dir",
            ):
                v = od.get(key)
                if v:
                    referenced.add(os.path.normpath(str(v)))
            for key in (
                "postings_deltas", "sig_deltas", "bands_deltas",
                "postings_tombs", "tombs", "ids_deltas",
                "raw_postings_deltas", "cells_deltas",
            ):
                for v in od.get(key) or []:
                    referenced.add(os.path.normpath(str(v)))
        for entry in os.listdir(base):
            owned = any(
                entry == f"{name}_{t}" or entry.startswith(f"{name}_{t}_")
                for t in (
                    "terms", "postings", "minhash", "bands",
                    "ids", "tomb", "ptomb", "rawpostings", "rawterms",
                    "removed", "cells",
                )
            )
            if not owned:
                continue
            p = os.path.join(base, entry)
            if os.path.isdir(p) and os.path.normpath(p) not in referenced:
                shutil.rmtree(p, ignore_errors=True)

    def search_index_status(self, name: str) -> dict[str, Any]:
        """Freshness of a snapshot index vs the collection's current
        version: ``stale`` is True once any mutation committed after
        the index was built (rebuild with ``create_search_index``)."""
        definition = self._load_search_index(name, warn_stale=False)
        built = definition.get("built_at_version")
        current = self._pointer()
        return {
            "name": name,
            "kind": definition.get("kind"),
            "built_at_version": built,
            "current_version": current,
            "stale": built != current or self._analyzer_stale(definition),
        }

    @staticmethod
    def _analyzer_stale(definition: Mapping[str, Any]) -> bool:
        """True when a persisted bm25 index's term table was built by an
        older analyzer pipeline than the one queries run now (round 8:
        the s-stemmer → Porter2 swap made pre-upgrade english term
        tables silently miss every stemmed lookup — df=0 → maximal idf
        — with no signal; now they read as stale)."""
        if definition.get("kind") != "bm25":
            return False
        from anser_spark.operators.ranking import ANALYZER_VERSION

        language = definition.get("default_language", "none")
        stamped = definition.get("analyzer_version")
        if stamped is None:
            # pre-stamp index: only the english analyzer has ever
            # changed (s-stemmer → Porter2); a 'none' term table
            # (whitespace + lower, unchanged since inception) is still
            # exact — don't push users into a needless rebuild
            return language == "english"
        return stamped != ANALYZER_VERSION.get(language)

    def list_search_indexes(self) -> list[str]:
        d = self._search_index_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            f[: -len(".json")] for f in os.listdir(d)
            if f.endswith(".json") and not f.startswith(".")
        )

    def _query_pred(self, df: DataFrame, query: Mapping[str, Any] | None):
        """Mutation-targeting predicate: compile_filter plus the legacy
        top-level ``$text`` clause Mongo also allows in update/delete
        filters (scored match only — no textScore surface on
        mutations)."""
        from anser_spark.functions.filters import extract_text_spec
        from anser_spark.operators.ranking import text_match

        spec, residual = extract_text_spec(query)
        if spec is None:
            return compile_filter(query, df.schema)
        weighted = self._weighted_bm25_for(df)
        if weighted is not None:
            from anser_spark.operators.ranking import (
                text_match_weighted_frame,
            )

            d, _fresh = weighted
            pred, _score = text_match_weighted_frame(
                df, spec, d["weights"],
                d.get("default_language", "none"),
                need_score=False,  # mutations never surface textScore
            )
            if residual:
                pred = pred & compile_filter(residual, df.schema)
            return pred
        text_col, stats_loader, language = self._text_index_info(df)
        if text_col is None:
            if "text" not in df.columns:
                raise ValueError(
                    "$text needs a bm25 search index or a column named "
                    "'text' on the collection"
                )
            text_col = "text"
        pred, _score = text_match(
            df, spec, text_col, stats_loader, default_language=language,
            need_score=False,  # mutations never surface textScore
        )
        pred = F.coalesce(pred, F.lit(False))
        if residual:
            pred = pred & compile_filter(residual, df.schema)
        return pred

    def _fresh_bm25_index(self, df: DataFrame) -> Mapping[str, Any] | None:
        """The first FRESH bm25 search index usable against ``df``:
        built at the collection's current version, by the current
        analyzer pipeline (round 9 — an analyzer-stale index previously
        slipped through when the collection itself hadn't moved), and
        naming a column ``df`` actually carries.  Returns the full
        stored definition, or None (callers fall back to inline
        stats / the scan path)."""
        for name in self.list_search_indexes():
            try:
                d = self._load_search_index(name, warn_stale=False)
            except NotFoundError:
                continue
            if d.get("kind") != "bm25":
                continue
            if d.get("built_at_version") != self._pointer():
                continue  # stale snapshot — don't score against old idf
            if self._analyzer_stale(d):
                continue  # term table stems predate the current stemmer
            if d.get("weights"):
                if any(f not in df.columns for f in d["weights"]):
                    continue
            elif d.get("path", "text") not in df.columns:
                continue
            return d
        return None

    def _any_bm25_index(self, df: DataFrame) -> Mapping[str, Any] | None:
        """The first bm25 index naming a column ``df`` carries,
        REGARDLESS of freshness.  A stale index's statistics and
        postings are unusable, but its ``path`` and
        ``default_language`` are the user's standing intent — Mongo's
        $text always analyzes with the text index's language, so a
        mutation must not silently flip an english collection back to
        exact-token matching (round 9)."""
        for name in self.list_search_indexes():
            try:
                d = self._load_search_index(name, warn_stale=False)
            except NotFoundError:
                continue
            if d.get("kind") != "bm25":
                continue
            if d.get("weights"):
                if any(f not in df.columns for f in d["weights"]):
                    continue
            elif d.get("path", "text") not in df.columns:
                continue
            return d
        return None

    def _weighted_bm25_for(self, df: DataFrame):
        """The weighted multi-field bm25 index a ``$text`` on this
        collection should route through, respecting the same fresh-
        first precedence as the single-field flow: ``(definition,
        fresh)`` — or None when the governing index is single-field
        (callers then take the existing paths)."""
        d = self._fresh_bm25_index(df)
        if d is not None:
            return (d, True) if d.get("weights") else None
        d = self._any_bm25_index(df)
        if d is not None and d.get("weights"):
            return (d, False)
        return None

    def _text_index_info(self, df: DataFrame):
        """(text column, stats loader) for the legacy ``$text`` find
        operator, from the first FRESH bm25 search index on this
        collection — the loader resolves query-term document
        frequencies with a pushed-down point lookup on the persisted
        term table, so no corpus aggregate runs at query time.  A STALE
        index keeps supplying the text column and analyzer language
        (the user's intent — round 9) while the loader drops to None so
        scores come from inline stats over the CURRENT corpus instead
        of a stale snapshot's idf."""
        d = self._fresh_bm25_index(df)
        if d is None:
            d = self._any_bm25_index(df)
            if d is None:
                return None, None, "none"
            return (
                d.get("path", "text"),
                None,
                d.get("default_language", "none"),
            )
        n_docs = int(d["n_docs"])
        avgdl = float(d["avgdl"])
        terms_dir = str(d["terms_dir"])
        spark = self.engine.spark

        def loader(terms: list[str]):
            from anser_spark.operators.ranking import terms_lookup_rows

            rows = terms_lookup_rows(
                spark, terms_dir, [t.lower() for t in terms]
            )
            return n_docs, avgdl, {r["term"]: r["df"] for r in rows}

        return d.get("path", "text"), loader, d.get("default_language", "none")

    def drop_search_index(self, name: str) -> None:
        p = os.path.join(self._search_index_dir(), f"{name}.json")
        if os.path.exists(p):
            os.remove(p)
            # reclaim the index's table directories (round 10) — the
            # sweep never touches a dir some OTHER stored definition
            # still references
            self._sweep_index_dirs(name, {})

    def _load_search_index(
        self, name: str, warn_stale: bool = True
    ) -> Mapping[str, Any]:
        p = os.path.join(self._search_index_dir(), f"{name}.json")
        try:
            st = os.stat(p)
        except FileNotFoundError:
            raise NotFoundError(
                f"search index does not exist: {name}"
            ) from None
        # mtime_ns+size-validated parse cache (see Engine.__init__):
        # _write_search_index goes through os.replace, so any publish
        # moves mtime_ns and invalidates naturally
        cache = self.engine._index_def_cache
        # st_ino rides the stamp (round 14, r13 ADVICE): os.replace
        # always publishes a new inode, so a same-tick rewrite with an
        # identical byte size (fixed-length version fingerprints make
        # that likely) can never serve a stale cached definition
        stamp = (st.st_mtime_ns, st.st_size, st.st_ino)
        ent = cache.get(p)
        if ent is not None and ent[0] == stamp:
            definition = ent[1]
        else:
            with open(p) as fh:
                definition = json.load(fh)
            if len(cache) >= 256:
                cache.pop(next(iter(cache)))
            cache[p] = (stamp, definition)
        if warn_stale and "built_at_version" in definition:
            current = self._pointer()
            if definition["built_at_version"] != current:
                import warnings

                warnings.warn(
                    f"search index {name!r} on {self.namespace} was built at "
                    f"version {definition['built_at_version']!r} but the "
                    f"collection is at {current!r} — results reflect the "
                    "older snapshot; rebuild with create_search_index()",
                    stacklevel=3,
                )
        if warn_stale and self._analyzer_stale(definition):
            import warnings

            warnings.warn(
                f"search index {name!r} on {self.namespace} was built by an "
                "older text analyzer (its term table's stems no longer match "
                "query-side analysis — relevance will be silently wrong); "
                "rebuild with create_search_index()",
                stacklevel=3,
            )
        return definition

    def near_dups_against_index(
        self, new_df: DataFrame, index: str, threshold: float = 0.7
    ) -> DataFrame:
        """Match a new batch against this collection's persisted
        ``kind="minhash"`` index (see create_search_index): returns
        (new_id, old_id, jaccard ≥ threshold) without re-signaturing
        the stored corpus. The index is a snapshot — rebuild it after
        bulk mutations, like the other index kinds."""
        d = self._load_search_index(index, warn_stale=False)
        if d.get("kind") != "minhash":
            raise ValueError(
                f"index {index!r} is kind={d.get('kind')!r}, expected minhash"
            )
        from anser_spark.operators.dedup import near_dups_against_sigs

        spark = self.engine.spark
        return near_dups_against_sigs(
            new_df,
            _read_index_table(spark, d, "sig_dir", "sig_deltas"),
            _read_index_table(spark, d, "bands_dir", "bands_deltas"),
            id_col=d["id_col"],
            text_col=d["path"],
            k=d["k"],
            num_hashes=d["numHashes"],
            bands=d["bands"],
            seed=d["seed"],
            threshold=threshold,
        )

    def dedup_batch_against_index(
        self, new_df: DataFrame, index: str, threshold: float = 0.7
    ) -> DataFrame:
        """Drop every batch document that near-duplicates a stored
        corpus document (the incremental-ingest filter)."""
        d = self._load_search_index(index, warn_stale=False)
        pairs = self.near_dups_against_index(new_df, index, threshold)
        victims = pairs.select(
            F.col("new_id").alias(d["id_col"])
        ).distinct()
        return new_df.join(victims, on=d["id_col"], how="left_anti")

    def append_to_minhash_index(self, index: str, new_df: DataFrame) -> None:
        """Extend a ``kind="minhash"`` index with a new batch's
        signatures — incremental maintenance, no corpus re-signaturing.

        Crash safety (round 11, ADVICE): the batch lands in STAGED
        delta directories published only by the atomic definition swap
        — never an in-place append into the live tables (a crash
        mid-append double-appended signatures, the exact failure mode
        the round-10 refresh machinery eliminated). The staged name is
        keyed by a deterministic batch fingerprint, so a crashed
        append's retry OVERWRITES the same staged paths instead of
        duplicating rows; an orphaned stage from an abandoned batch is
        reclaimed by the post-publish sweep. The same compaction
        threshold as refresh folds deltas back into one base table."""
        d = dict(self._load_search_index(index, warn_stale=False))
        if d.get("kind") != "minhash":
            raise ValueError(
                f"index {index!r} is kind={d.get('kind')!r}, expected minhash"
            )
        from pyspark.storagelevel import StorageLevel

        from anser_spark.operators.dedup import (
            banded_signatures,
            minhash_signature_arrow,
        )

        id_col = d["id_col"]
        sigs = minhash_signature_arrow(
            new_df, id_col, d["path"], d["k"], d["numHashes"], d["seed"]
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # the stage key folds CONTENT in, not just the id multiset
            # (round 12, ADVICE): two batches with the same ids but
            # different text must land in different staged dirs —
            # keying on ids alone overwrote the first batch's published
            # delta in place and silently dropped the second from the
            # delta list. The signature row is a pure function of
            # (id, text), so hashing the minhash values IS hashing the
            # content.
            fp = sigs.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(F.xxhash64(F.col(id_col))), F.lit(0)
                ).alias("h"),
                F.coalesce(
                    F.sum(F.xxhash64(F.col("__minhash").cast("string"))),
                    F.lit(0),
                ).alias("c"),
            ).collect()[0]
            if not int(fp["n"]):
                return  # empty batch: nothing to stage
            key = (
                f"{int(fp['n'])}_{int(fp['h']) & 0xFFFFFFFFFFFF:012x}"
                f"{int(fp['c']) & 0xFFFFFFFFFFFF:012x}"
            )
            idx_dir = self._search_index_dir()
            sig_delta = os.path.join(idx_dir, f"{index}_minhash_delta_{key}")
            bands_delta = os.path.join(idx_dir, f"{index}_bands_delta_{key}")
            sigs.write.mode("overwrite").parquet(sig_delta)
            banded_signatures(
                sigs, id_col, d["numHashes"], d["bands"]
            ).write.mode("overwrite").parquet(bands_delta)
        finally:
            sigs.unpersist()
        sig_deltas = list(d.get("sig_deltas") or [])
        bands_deltas = list(d.get("bands_deltas") or [])
        if sig_delta not in sig_deltas:
            sig_deltas.append(sig_delta)
            bands_deltas.append(bands_delta)
        if len(sig_deltas) >= self._index_compact_threshold():
            spark = self.engine.spark
            probe = {
                **d, "sig_deltas": sig_deltas, "bands_deltas": bands_deltas,
            }
            new_sig = os.path.join(idx_dir, f"{index}_minhash_compact_{key}")
            new_bands = os.path.join(idx_dir, f"{index}_bands_compact_{key}")
            _read_index_table(
                spark, probe, "sig_dir", "sig_deltas", id_col
            ).write.mode("overwrite").parquet(new_sig)
            _read_index_table(
                spark, probe, "bands_dir", "bands_deltas", id_col
            ).write.mode("overwrite").parquet(new_bands)
            d["sig_dir"], d["bands_dir"] = new_sig, new_bands
            sig_deltas, bands_deltas, d["tombs"] = [], [], []
        d["sig_deltas"] = sig_deltas
        d["bands_deltas"] = bands_deltas
        # incremental maintenance keeps the snapshot current — advance
        # the freshness marker to the collection's present version
        d["built_at_version"] = self._pointer()
        self._write_search_index(index, d)
        self._sweep_index_dirs(index, d)

    def _resolve_text_indexes(self, stages: Sequence[Mapping[str, Any]]):
        """Embed a fresh bm25 index's stats into a leading
        ``{$match: {$text: ...}}`` stage (Mongo requires $text in the
        first $match) so the stage scores with a term-table point
        lookup instead of a corpus aggregate — same contract as the
        find() path's ``_text_index_info``."""
        stages = list(stages)
        if not stages or not isinstance(stages[0], Mapping):
            return stages
        match_arg = stages[0].get("$match")
        if not isinstance(match_arg, Mapping) or "$text" not in match_arg:
            return stages
        spec = match_arg["$text"]
        if not isinstance(spec, Mapping) or "$_index" in spec:
            return stages
        d = self._fresh_bm25_index(self.df())
        if d is not None and d.get("weights"):
            # round 11: weighted multi-field index — the stage routes
            # through text_match_weighted_* with per-field stats
            spec = dict(spec)
            spec["$_index"] = {
                "weights": dict(d["weights"]),
                "fields": dict(d.get("fields") or {}),
                "n_docs": int(d["n_docs"]),
                "terms_dir": str(d["terms_dir"]),
                "default_language": d.get("default_language", "none"),
                "postings_dir": d.get("postings_dir"),
                "postings_deltas": list(d.get("postings_deltas") or []),
                "postings_tombs": list(d.get("postings_tombs") or []),
                "id_col": d.get("id_col", "_id"),
            }
            match_arg = dict(match_arg)
            match_arg["$text"] = spec
            stages[0] = {**stages[0], "$match": match_arg}
            return stages
        if d is not None:
            spec = dict(spec)
            spec["$_index"] = {
                "path": d.get("path", "text"),
                "n_docs": int(d["n_docs"]),
                "avgdl": float(d["avgdl"]),
                "terms_dir": str(d["terms_dir"]),
                "default_language": d.get("default_language", "none"),
                # round 9: inverted-postings query path (when the
                # build wrote one — see create_search_index)
                "postings_dir": d.get("postings_dir"),
                # round 11 (ADVICE fix): staged incremental-refresh
                # deltas are part of the postings table — omitting them
                # made a pipeline $match:{$text} silently miss every
                # document inserted since the last full build, while
                # find() (which passes the whole definition) saw them.
                # Tombstones ride along for the same reason: without
                # them the $match path would resurrect updated/removed
                # docs' old postings.
                "postings_deltas": list(d.get("postings_deltas") or []),
                "postings_tombs": list(d.get("postings_tombs") or []),
                "id_col": d.get("id_col", "_id"),
            }
        else:
            # stale index: its stats/postings are unusable, but the
            # text column + analyzer language remain the user's intent
            # (round 9) — scores fall back to inline stats
            d = self._any_bm25_index(self.df())
            if d is None:
                return stages
            spec = dict(spec)
            if d.get("weights"):
                spec["$_index"] = {
                    "weights": dict(d["weights"]),
                    "default_language": d.get("default_language", "none"),
                    "stale": True,
                }
            else:
                spec["$_index"] = {
                    "path": d.get("path", "text"),
                    "default_language": d.get("default_language", "none"),
                    "stale": True,
                }
        match_arg = dict(match_arg)
        match_arg["$text"] = spec
        stages[0] = {**stages[0], "$match": match_arg}
        return stages

    def _resolve_search_indexes(self, stages: Sequence[Mapping[str, Any]]):
        """Replace ``$search``/``$vectorSearch`` ``{index: "<name>"}``
        references with the stored index definition (centroids / bm25
        corpus stats included), recursing into
        $rankFusion/$scoreFusion/$facet sub-pipelines."""

        def walk(stage_list):
            out = []
            for stage in stage_list:
                if not isinstance(stage, Mapping) or len(stage) != 1:
                    out.append(stage)
                    continue
                op, arg = next(iter(stage.items()))
                if (
                    op in ("$search", "$vectorSearch", "$searchMeta")
                    and isinstance(arg, Mapping)
                    and isinstance(arg.get("index"), str)
                ):
                    arg = dict(arg)
                    idx = dict(self._load_search_index(arg["index"]))
                    # freshness stamp (round 13, ADVICE): the compile
                    # has no pointer access, so record here whether the
                    # snapshot is behind the live collection — the ivf
                    # cells path falls back to live inline assignment
                    # when it is, restoring pre-r12 result freshness
                    # between refreshes
                    idx["__stale"] = (
                        idx.get("built_at_version") is not None
                        and idx["built_at_version"] != self._pointer()
                    )
                    arg["index"] = idx
                    stage = {op: arg}
                elif op in ("$rankFusion", "$scoreFusion") and isinstance(arg, Mapping):
                    arg = dict(arg)
                    inp = dict(arg.get("input") or {})
                    inp["pipelines"] = {
                        k: walk(v) for k, v in (inp.get("pipelines") or {}).items()
                    }
                    arg["input"] = inp
                    stage = {op: arg}
                elif op == "$facet" and isinstance(arg, Mapping):
                    stage = {op: {k: walk(v) for k, v in arg.items()}}
                elif (
                    op == "$unionWith"
                    and isinstance(arg, Mapping)
                    and arg.get("pipeline")
                ):
                    # the sub-pipeline runs against the OTHER collection
                    # — its named indexes resolve there, not here
                    target = self.engine.db(self.db_name).collection(
                        str(arg["coll"])
                    )
                    stage = {op: {
                        **arg,
                        "pipeline": target._resolve_search_indexes(
                            arg["pipeline"]
                        ),
                    }}
                elif (
                    op == "$lookup"
                    and isinstance(arg, Mapping)
                    and arg.get("pipeline")
                    and isinstance(arg.get("from"), str)
                ):
                    target = self.engine.db(self.db_name).collection(
                        str(arg["from"])
                    )
                    stage = {op: {
                        **arg,
                        "pipeline": target._resolve_search_indexes(
                            arg["pipeline"]
                        ),
                    }}
                out.append(stage)
            return out

        return walk(list(stages))

    def distinct(
        self,
        field: str,
        query: Mapping[str, Any] | None = None,
        collation: Mapping[str, Any] | None = None,
    ) -> list[Any]:
        """Mongo `distinct` command: distinct values of a (dotted) field
        among matching docs, as a driver-side list. Array fields
        distinct over their elements (Mongo semantics).  ``collation``
        (round 7) dedups string values under an ICU collation — one
        representative per equivalence class, as in Mongo.

        BOUNDED-CARDINALITY ONLY: like the Mongo command (16 MB reply
        cap), the list materializes on the driver — a high-cardinality
        field at scale belongs on :meth:`distinct_df`, which keeps the
        result distributed."""
        rows = self.distinct_df(field, query, collation).collect()
        return sorted(r["v"] for r in rows)

    def distinct_df(
        self,
        field: str,
        query: Mapping[str, Any] | None = None,
        collation: Mapping[str, Any] | None = None,
    ) -> DataFrame:
        """DataFrame variant of :meth:`distinct`: the distinct values of
        ``field`` (column ``v``) as a lazy, distributed frame — one
        hash-aggregate shuffle, safe at any cardinality; compose or
        write it without driver materialization."""
        from anser_spark.functions.collation import (
            decollate,
            spark_collation_name,
            use_collation,
        )
        from anser_spark.functions.filters import field_type, resolve_field

        coll_name = spark_collation_name(collation)
        df = self.df()
        if query:
            with use_collation(coll_name):
                df = df.where(compile_filter(query, df.schema))
        col = resolve_field(field)
        dt = field_type(df.schema, field)
        if isinstance(dt, T.ArrayType):
            col = F.explode(col)
            dt = dt.elementType
        if coll_name is not None and isinstance(dt, T.StringType):
            # dedup under the collation, return one representative per
            # class, de-collated so the result schema stays plain string
            return (
                df.select(F.collate(col, coll_name).alias("v"))
                .where(F.col("v").isNotNull())
                .distinct()
                .select(decollate(F.col("v")).alias("v"))
            )
        return df.select(col.alias("v")).where(F.col("v").isNotNull()).distinct()

    # -- write path ----------------------------------------------------
    def _align(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        cols = []
        for f_ in schema.fields:
            if f_.name in df.columns:
                cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        extras = [c for c in df.columns if c not in schema.fieldNames()]
        return df.select(*cols, *[F.col(c) for c in extras])

    def _docs_to_df(self, docs: Sequence[Mapping[str, Any]]) -> DataFrame:
        docs = [dict(d) for d in docs]
        for d in docs:
            d.setdefault("_id", new_object_id())
        fast = self._scalar_docs_df(docs)
        if fast is not None:
            return fast
        try:
            df = self.engine.spark.createDataFrame(docs)  # type: ignore[arg-type]
        except Exception as exc:
            # a field that is null in EVERY doc of the batch has no
            # inferable type (round 10; a perfectly normal Mongo batch
            # like [{"text": None}, …]). The existing collection schema
            # types the known fields; an all-null field the collection
            # has never seen is Mongo "missing" — dropping it stores
            # the identical document, since the columnar insert
            # null-fills absent columns (the _upsert_doc contract).
            if "CANNOT_DETERMINE_TYPE" not in str(exc):
                raise
            keys: set[str] = set()
            for d in docs:
                keys.update(d)
            all_null = {
                k for k in keys if all(d.get(k) is None for d in docs)
            }
            if not all_null:
                raise
            known: dict[str, Any] = {}
            if not self.is_view() and self.current_path() is not None:
                known = {
                    f.name: f.dataType for f in self.df().schema.fields
                }
            pruned = [
                {k: v for k, v in d.items() if k not in all_null}
                for d in docs
            ]
            df = self.engine.spark.createDataFrame(pruned)  # type: ignore[arg-type]
            for k in sorted(all_null):
                if k in known:  # typed null column; unknown → missing
                    df = df.withColumn(k, F.lit(None).cast(known[k]))
        # createDataFrame slices even a handful of docs across
        # defaultParallelism partitions — a tiny insert would run a
        # 32-task write job and append 32 near-empty files per version.
        # One partition per ~10k docs keeps file counts proportional to
        # data. (repartition, NOT coalesce or .rdd introspection: both
        # measured ~2-5s of needless materialization on a local batch.)
        return df.repartition(max(1, len(docs) // 10_000))

    def _scalar_docs_df(
        self, docs: Sequence[Mapping[str, Any]]
    ) -> DataFrame | None:
        """Arrow fast path for all-scalar doc batches (round 14, guide
        §4/§6): ``createDataFrame(list-of-dicts)`` parallelizes even two
        docs across defaultParallelism pickled RDD slices and the
        repartition that fixes the file count adds a shuffle — measured
        0.43s/2 jobs per tiny batch vs 0.10s/1 job for Arrow-serialized
        pandas plus a narrow coalesce. Inference goes through Spark's
        OWN ``_inferSchemaFromList`` (the exact routine the slow path
        calls), object-dtype pandas columns cast to that schema under
        Arrow, so names/types/order/null handling are identical — the
        equality is asserted in tests. None (caller falls back) for any
        non-scalar value, an all-null column, unavailable private API,
        or any inference/conversion error."""
        if not docs:
            return None
        for d in docs:
            for v in d.values():
                if v is not None and type(v) not in (bool, int, float, str):
                    return None
        infer = getattr(self.engine.spark, "_inferSchemaFromList", None)
        if infer is None:
            return None
        try:
            import pandas as pd

            schema = infer(docs, None)
            pdf = pd.DataFrame({
                f.name: pd.Series(
                    [d.get(f.name) for d in docs], dtype="object"
                )
                for f in schema.fields
            })
            df = self.engine.spark.createDataFrame(pdf, schema=schema)
        except Exception:
            return None  # slow path reproduces (or raises) the real error
        # arrow batches arrive pre-sliced; coalesce is narrow (no
        # shuffle, unlike the slow path's repartition) and keeps file
        # counts proportional to data exactly as the slow path does
        return df.coalesce(max(1, len(docs) // 10_000))

    def insert(self, *docs: Mapping[str, Any]) -> None:
        """InsertOne/InsertMany (reference db/wrapper.go:117-125)."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        if not docs:
            return
        new_df = self._docs_to_df(list(docs))
        self._validate_incoming(new_df)
        if self.exists():
            self._cow_append(new_df)
        else:
            self._rewrite(new_df)

    def insert_df(
        self, df: DataFrame, pointer_meta: Mapping[str, str] | None = None
    ) -> None:
        """Bulk append a whole DataFrame (the scale path for inserts):
        existing files are linked unchanged, only the new rows write.
        ``pointer_meta`` commits atomically with the new version (see
        ``pointer_meta()``) — the hook streaming ingestion uses to make
        batch appends idempotent."""
        self._validate_incoming(df)
        if self.exists():
            self._cow_append(df, meta_update=pointer_meta)
        else:
            self._rewrite(df, meta_update=pointer_meta)

    def _order_key(self, df: DataFrame) -> F.Column:
        return F.col("_id") if "_id" in df.columns else F.col(df.columns[0])

    def _first_match_pred(self, df: DataFrame, pred) -> tuple[Any, Any, set[str] | None] | None:
        """Pick the deterministic 'first' matching doc (by _id order) —
        Mongo's UpdateOne/DeleteOne semantics need a single victim; we
        define natural order as _id order and document non-atomicity.

        Also resolves the parquet files the follow-up copy-on-write must
        rewrite, so it can skip its file-detection scan. The victim's own
        file comes back from the SAME limit(1) job
        (``_metadata.file_path``); because the engine never enforces _id
        uniqueness, a second pushed-down key-equality scan then collects
        EVERY file containing the victim's key — duplicate-key rows in
        other files are rewritten exactly as the pre-victim-capture code
        did, instead of being silently left behind. Engines constructed
        with ``assume_unique_ids=True`` skip that second scan (the
        single-file fast path: one victim lookup + one file rewrite).
        The mutation applies to the victim's key within the resolved
        files; victim selection itself is always deterministic."""
        from pyspark.errors import AnalysisException

        key = self._order_key(df)
        try:
            victim = (
                df.where(pred)
                .orderBy(key)
                .limit(1)
                .select("*", F.col("_metadata.file_path").alias("__victim_file"))
                .collect()
            )
            if not victim:
                return None
            row = victim[0]
            files: set[str] | None = {row["__victim_file"]}
        except AnalysisException:
            # non-parquet-backed frame (ns-timestamp path, view sources):
            # no file metadata — leave detection to the COW itself.
            # Genuine predicate/compile errors propagate; only the
            # missing-_metadata analysis error falls back.
            victim = df.where(pred).orderBy(key).limit(1).collect()
            if not victim:
                return None
            row = victim[0]
            files = None
        value = row["_id"] if "_id" in df.columns else row[df.columns[0]]
        if files is not None and not self.engine.assume_unique_ids:
            # every file holding this key, not just the victim's: a
            # pushed-down point lookup (footer min/max prune; only the
            # key column + file metadata are read)
            per_file = (
                df.where(key == F.lit(value))
                .select(F.col("_metadata.file_path").alias("__f"))
                .groupBy("__f")
                .count()
                .collect()
            )
            files = {r["__f"] for r in per_file} or files
        return key, value, files

    def _upsert_doc(
        self, query: Mapping[str, Any] | None, update: Any
    ) -> dict[str, Any]:
        """Insert-path document for an unmatched upsert.  The Mongo 4.2
        pipeline update form runs the stage list over the document
        synthesized from the filter's equality fields (server
        semantics); operator/replacement forms go straight to
        synthesize_upsert_doc."""
        if not is_pipeline_update(update):
            return synthesize_upsert_doc(query, update)
        from anser_spark.plans.pipeline import compile_pipeline

        base = synthesize_upsert_doc(query, {})
        stages = [dict(s) for s in validate_pipeline_update(update)]
        # Mongo evaluates a missing field as null/missing; the
        # synthesized frame only has the filter's equality fields, so
        # seed null columns for every field the stage list references
        # ("$path" strings) — otherwise compile_expr raises an
        # unresolved-column AnalysisException on a perfectly normal
        # update like {$set: {y: {$ifNull: ["$x", 0]}}}. (Seeded as
        # NullType lit(None) columns on the frame — createDataFrame
        # cannot infer a schema from bare None dict values, and an
        # untyped null coerces freely inside $ifNull/$add/… exactly
        # like Mongo's missing.)
        frame = self._docs_to_df([base])
        # dotted references need a STRUCT-typed null seed — getItem on
        # an untyped VOID column is an AnalysisException, while a null
        # struct<tail: void> extracts to null exactly like Mongo's
        # missing (e.g. {$set: {y: {$ifNull: ["$meta.count", 0]}}})
        by_head: dict[str, list[list[str]]] = {}
        for ref in _pipeline_field_refs(stages):
            parts = ref.split(".")
            if parts[0] not in frame.columns:
                by_head.setdefault(parts[0], []).append(parts[1:])
        for head, tails in by_head.items():
            frame = frame.withColumn(head, _null_seed_column(tails))
        out = compile_pipeline(frame, stages, None, None)
        rows = out.limit(1).collect()
        doc = rows[0].asDict(recursive=True) if rows else dict(base)
        # drop null fields: a seeded field the stages never assigned is
        # still "missing", and a stage output that EVALUATED to null
        # (e.g. $multiply over a missing operand) is untyped — either
        # way the columnar insert null-fills it, so the stored result
        # is identical and schema inference can't trip on NullType
        doc = {k: v for k, v in doc.items() if v is not None}
        doc.setdefault("_id", base.get("_id"))
        return doc

    def update(self, query: Mapping[str, Any] | None, update: Mapping[str, Any]) -> ChangeInfo:
        """Update/replace the first match or apply a Mongo 4.2 update
        pipeline to it; NotFoundError if none (reference
        db/wrapper.go:188-210 forwards any update shape)."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        df = self.df()
        pred = self._query_pred(df, query)
        hit = self._first_match_pred(df, pred)
        if hit is None:
            raise NotFoundError(f"no document matches {query!r}")
        key, value, files = hit
        vpred = key == F.lit(value)
        self._cow_rewrite(
            vpred,
            lambda sub: apply_update(sub, vpred, update, sub.schema),
            hit_files=files,
            ids_preserved=self._mutation_preserves_ids(update),
        )
        return ChangeInfo(updated=1)

    def update_id(self, id_value: Any, update: Mapping[str, Any]) -> ChangeInfo:
        return self.update({"_id": id_value}, update)

    def update_all(
        self,
        query: Mapping[str, Any] | None,
        update: Mapping[str, Any],
        array_filters: Sequence[Mapping[str, Any]] | None = None,
    ) -> ChangeInfo:
        """UpdateMany (reference db/wrapper.go:237-244) — ONE distributed
        copy-on-write rewrite. ``array_filters`` supports ``$[ident]``
        positional array updates."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        df = self.df()
        pred = self._query_pred(df, query)

        def _full_match_drops(n_matched: int) -> list[str]:
            # $unset/$rename null the source column on a partial match
            # (fixed-schema divergence); when EVERY row matched the
            # column carries only nulls, so honor BSON semantics and
            # drop it. The count() is only paid when the update
            # contains such an operator.
            if is_pipeline_update(update) or not has_dollar_key(update):
                return []
            plan = compile_update(update, df.schema, array_filters)
            if plan.drop_if_all_matched and n_matched == df.count():
                return sorted(plan.drop_if_all_matched)
            return []

        if self._pred_nondeterministic(pred):
            # materialize the random draw ONCE (localCheckpoint) so the
            # reported count and the mutated rows are the same sample
            snap = df.withColumn(
                "__nd_m", F.coalesce(pred, F.lit(False))
            ).localCheckpoint()
            matched = snap.where(F.col("__nd_m")).count()
            out = apply_update(
                snap, F.col("__nd_m"), update, snap.schema, array_filters=array_filters
            ).drop("__nd_m", *_full_match_drops(matched))
            self._rewrite(out)
            return ChangeInfo(updated=matched)
        may_drop = bool(
            not is_pipeline_update(update)
            and has_dollar_key(update)
            and compile_update(update, df.schema, array_filters).drop_if_all_matched
        )
        if may_drop:
            # the drop-column decision needs the matched count BEFORE
            # building the transform — pay the extra scan only when the
            # update carries $unset/$rename
            matched = df.where(pred).count()
            drops = _full_match_drops(matched)
            self._cow_rewrite(
                pred,
                lambda sub: apply_update(
                    sub, pred, update, sub.schema, array_filters=array_filters
                ).drop(*drops),
                ids_preserved=self._mutation_preserves_ids(update),
            )
            return ChangeInfo(updated=matched)
        # common path: matched count fused into the COW detection scan —
        # one pushed-down read instead of two
        _, matched = self._cow_rewrite(
            pred,
            lambda sub: apply_update(
                sub, pred, update, sub.schema, array_filters=array_filters
            ),
            want_count=True,
            ids_preserved=self._mutation_preserves_ids(update),
        )
        return ChangeInfo(updated=matched or 0)

    def upsert(self, query: Mapping[str, Any] | None, update: Mapping[str, Any]) -> ChangeInfo:
        """Update-or-insert (reference db/wrapper.go:146-165): MERGE
        semantics — matched ⇒ update, not matched ⇒ synthesize a row from
        the filter's equality fields + the update document."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        if not self.exists():
            doc = self._upsert_doc(query, update)
            self.insert(doc)
            return ChangeInfo(updated=1, upserted_id=doc.get("_id"))
        df = self.df()
        pred = self._query_pred(df, query)
        hit = self._first_match_pred(df, pred)
        if hit is not None:
            key, value, files = hit
            vpred = key == F.lit(value)
            self._cow_rewrite(
                vpred,
                lambda sub: apply_update(sub, vpred, update, sub.schema),
                hit_files=files,
                ids_preserved=self._mutation_preserves_ids(update),
            )
            return ChangeInfo(updated=1)
        doc = self._upsert_doc(query, update)
        self._cow_append(self._docs_to_df([doc]))
        return ChangeInfo(updated=1, upserted_id=doc.get("_id"))

    def upsert_id(self, id_value: Any, update: Mapping[str, Any]) -> ChangeInfo:
        return self.upsert({"_id": id_value}, update)

    def remove(self, query: Mapping[str, Any] | None) -> ChangeInfo:
        """DeleteOne (reference db/wrapper.go:127-130)."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        df = self.df()
        pred = self._query_pred(df, query)
        hit = self._first_match_pred(df, pred)
        if hit is None:
            raise NotFoundError(f"no document matches {query!r}")
        key, value, files = hit
        vpred = key.eqNullSafe(F.lit(value))
        self._cow_rewrite(
            vpred, lambda sub: sub.where(~vpred), hit_files=files,
            ids_preserved=True,  # removes only drop rows
        )
        return ChangeInfo(removed=1)

    def remove_id(self, id_value: Any) -> ChangeInfo:
        return self.remove({"_id": id_value})

    def remove_all(self, query: Mapping[str, Any] | None) -> ChangeInfo:
        """DeleteMany (reference db/wrapper.go:137-144)."""
        if self.is_view():
            raise TypeError(f"{self.namespace} is a view — views are read-only")
        df = self.df()
        pred = self._query_pred(df, query)
        if self._pred_nondeterministic(pred):
            # one materialized draw — count and survivors agree exactly
            snap = df.withColumn(
                "__nd_m", F.coalesce(pred, F.lit(False))
            ).localCheckpoint()
            removed = snap.where(F.col("__nd_m")).count()
            if removed:
                self._rewrite(snap.where(~F.col("__nd_m")).drop("__nd_m"))
            return ChangeInfo(removed=removed)
        # removed count fused into the COW detection scan (one read)
        _, removed = self._cow_rewrite(
            pred,
            lambda sub: sub.where(~F.coalesce(pred, F.lit(False))),
            want_count=True,
            ids_preserved=True,  # removes only drop rows
        )
        return ChangeInfo(removed=removed or 0)

    def find_and_modify(
        self,
        query: Mapping[str, Any] | None = None,
        sort: Sequence[str] | None = None,
        update: Mapping[str, Any] | None = None,
        remove: bool = False,
        upsert: bool = False,
        return_new: bool = False,
    ) -> dict[str, Any] | None:
        """findAndModify / Apply(Change) (reference db/data.go:18-25,
        db/wrapper.go:395-450): select ONE doc by filter+sort, update or
        remove it, return the pre- or post-image. Batch engine ⇒ not
        atomic; victim choice is deterministic (sort, then _id)."""
        from pyspark.errors import AnalysisException

        from anser_spark.functions.sort import parse_sort_keys

        if remove and update is not None:
            raise ValueError("cannot specify both remove and update")
        if remove and return_new:
            raise ValueError("cannot specify both remove and return_new")
        if not remove and update is None:
            raise ValueError("must specify update or remove")
        df = self.df()
        pred = self._query_pred(df, query)
        order = parse_sort_keys(sort) or [self._order_key(df)]
        try:
            # capture the victim's file in the same job — the COW below
            # then skips its detection scan (see _first_match_pred)
            victim = (
                df.where(pred)
                .orderBy(*order)
                .limit(1)
                .select("*", F.col("_metadata.file_path").alias("__victim_file"))
                .collect()
            )
        except AnalysisException:  # _metadata absent: non-parquet frame
            _LOG.debug(
                "find_and_modify: _metadata.file_path unavailable for %s; "
                "COW falls back to the detection scan", self.namespace,
            )
            victim = df.where(pred).orderBy(*order).limit(1).collect()
        if not victim:
            if upsert and not remove:
                doc = self._upsert_doc(query, update)
                self.insert(doc)
                if return_new:
                    return self.find_id(doc["_id"]).one()
                return None
            raise NotFoundError(f"no document matches {query!r}")
        row = victim[0].asDict(recursive=True)
        files = {row.pop("__victim_file")} if "__victim_file" in row else None
        key = self._order_key(df)
        key_value = row["_id"] if "_id" in df.columns else row[df.columns[0]]
        vpred = key.eqNullSafe(F.lit(key_value))
        if remove:
            self._cow_rewrite(
                vpred, lambda sub: sub.where(~vpred), hit_files=files,
                ids_preserved=True,
            )
            return row
        self._cow_rewrite(
            vpred,
            lambda sub: apply_update(sub, vpred, update, sub.schema),
            hit_files=files,
            ids_preserved=self._mutation_preserves_ids(update),
        )
        if return_new:
            return self.find({"_id": key_value} if "_id" in df.columns else None).one()
        return row

    def bulk(self, ordered: bool = True) -> "Bulk":
        return Bulk(self, ordered=ordered)

    # -- PyMongo-style aliases ------------------------------------------
    # The reference exposes mgo-style Go names; Python users expect the
    # PyMongo verbs. Thin aliases with PyMongo's no-match semantics
    # (matched 0 is a result, not an error). Results stay ChangeInfo —
    # documented divergence from PyMongo's UpdateResult/DeleteResult.

    def insert_one(self, doc: Mapping[str, Any]) -> None:
        self.insert(doc)

    def insert_many(self, docs: Sequence[Mapping[str, Any]]) -> None:
        self.insert(*docs)

    def find_one(self, query: Mapping[str, Any] | None = None):
        """First match as a dict, or None (PyMongo's contract; the
        fluent ``find().one()`` raises NotFoundError instead)."""
        try:
            return self.find(query).one()
        except NotFoundError:
            return None

    def count_documents(self, query: Mapping[str, Any] | None = None) -> int:
        return self.find(query).count()

    def update_one(
        self,
        query: Mapping[str, Any] | None,
        update: Mapping[str, Any],
        upsert: bool = False,
    ) -> ChangeInfo:
        if upsert:
            return self.upsert(query, update)
        try:
            return self.update(query, update)
        except NotFoundError:
            return ChangeInfo()

    def update_many(
        self,
        query: Mapping[str, Any] | None,
        update: Mapping[str, Any],
        upsert: bool = False,
    ) -> ChangeInfo:
        ci = self.update_all(query, update)
        if upsert and not ci.updated:
            return self.upsert(query, update)
        return ci

    def replace_one(
        self,
        query: Mapping[str, Any] | None,
        replacement: Mapping[str, Any],
        upsert: bool = False,
    ) -> ChangeInfo:
        if any(str(k).startswith("$") for k in replacement):
            raise ValueError("replacement document must not contain $-operators")
        return self.update_one(query, replacement, upsert=upsert)

    def delete_one(self, query: Mapping[str, Any] | None) -> ChangeInfo:
        try:
            return self.remove(query)
        except NotFoundError:
            return ChangeInfo()

    def delete_many(self, query: Mapping[str, Any] | None) -> ChangeInfo:
        return self.remove_all(query)

    def find_one_and_update(
        self,
        query: Mapping[str, Any] | None,
        update: Any,
        sort: Sequence[str] | None = None,
        upsert: bool = False,
        return_document: str = "before",
    ) -> dict[str, Any] | None:
        """PyMongo's findOneAndUpdate: pre-image by default
        (``return_document="after"`` for the post-image); None when
        nothing matched and no upsert."""
        try:
            return self.find_and_modify(
                query=query, sort=sort, update=update, upsert=upsert,
                return_new=return_document == "after",
            )
        except NotFoundError:
            return None

    def find_one_and_replace(
        self,
        query: Mapping[str, Any] | None,
        replacement: Mapping[str, Any],
        sort: Sequence[str] | None = None,
        upsert: bool = False,
        return_document: str = "before",
    ) -> dict[str, Any] | None:
        if any(str(k).startswith("$") for k in replacement):
            raise ValueError("replacement document must not contain $-operators")
        return self.find_one_and_update(
            query, replacement, sort=sort, upsert=upsert,
            return_document=return_document,
        )

    def find_one_and_delete(
        self,
        query: Mapping[str, Any] | None,
        sort: Sequence[str] | None = None,
    ) -> dict[str, Any] | None:
        """PyMongo's findOneAndDelete: the removed document, or None."""
        try:
            return self.find_and_modify(query=query, sort=sort, remove=True)
        except NotFoundError:
            return None

    # -- misc ----------------------------------------------------------
    def write_manifest(self) -> str:
        """Schema + layout manifest (the 'index metadata' analogue used
        by backup, reference backup/backup.go:152-200)."""
        df = self.df()
        return json.dumps(
            {
                "namespace": str(self.namespace),
                "schema": json.loads(df.schema.json()),
                "num_columns": len(df.columns),
            }
        )


class Bulk:
    """Bulk writer (reference db/interface.go:59-73, db/wrapper.go:246-344):
    queue heterogeneous write models, submit as ONE batch = one
    copy-on-write rewrite ("one round trip"). Ordered ⇒ ops applied in
    queue order; unordered ⇒ same plan, order license unused.
    """

    def __init__(self, collection: Collection, ordered: bool = True) -> None:
        self.collection = collection
        self.ordered = ordered
        self._ops: list[tuple[str, Any]] = []

    def unordered(self) -> "Bulk":
        self.ordered = False
        return self

    def insert(self, *docs: Mapping[str, Any]) -> "Bulk":
        for doc in docs:
            self._ops.append(("insert", dict(doc)))
        return self

    @staticmethod
    def _pairs(args: Sequence[Any], op: str) -> list[tuple[Any, Any]]:
        if len(args) % 2 != 0:
            # reference panics on odd arity (db/wrapper.go:276-300)
            raise ValueError(f"Bulk.{op} requires (selector, update) pairs")
        return [(args[i] or {}, args[i + 1]) for i in range(0, len(args), 2)]

    def update(self, *pairs: Any) -> "Bulk":
        for sel, upd in self._pairs(pairs, "update"):
            self._ops.append(("update", (sel, upd)))
        return self

    def update_all(self, *pairs: Any) -> "Bulk":
        for sel, upd in self._pairs(pairs, "update_all"):
            self._ops.append(("update_all", (sel, upd)))
        return self

    def upsert(self, *pairs: Any) -> "Bulk":
        for sel, upd in self._pairs(pairs, "upsert"):
            self._ops.append(("upsert", (sel, upd)))
        return self

    def remove(self, *selectors: Mapping[str, Any]) -> "Bulk":
        for sel in selectors:
            self._ops.append(("remove", sel or {}))
        return self

    def remove_all(self, *selectors: Mapping[str, Any]) -> "Bulk":
        for sel in selectors:
            self._ops.append(("remove_all", sel or {}))
        return self

    def run(self) -> BulkResult:
        """Submit the batch as ONE copy-on-write rewrite. The op chain
        runs over only the parquet files hit by the OR of every op's
        selector (evaluated against the pre-bulk data): a row first
        touched by op k matched op k's selector in its original state,
        so the union-predicate file set contains every row any op can
        match — files outside it pass through as hard links.
        """
        coll = self.collection
        result = BulkResult()
        if not self._ops:
            # reference errors on empty bulk (db/wrapper.go:320-322)
            raise ValueError("cannot run an empty bulk operation")
        exists = coll.exists()
        inserts: list[Mapping[str, Any]] = []

        def chain(df: DataFrame | None) -> DataFrame | None:
            # re-entrant: _cow_rewrite may call the transform twice on
            # its schema-change fallback — reset accumulators each call
            result.matched = result.modified = 0
            inserts.clear()
            for kind, payload in self._ops:
                if kind == "insert":
                    inserts.append(payload)
                    continue
                if df is None:
                    raise NotFoundError(f"collection does not exist: {coll.namespace}")
                if kind in ("update", "upsert"):
                    sel, upd = payload
                    pred = coll._query_pred(df, sel)
                    hit = df.where(pred).orderBy(coll._order_key(df)).limit(1).collect()
                    if hit:
                        key = coll._order_key(df)
                        value = hit[0][0] if "_id" not in df.columns else hit[0]["_id"]
                        df = apply_update(df, key.eqNullSafe(F.lit(value)), upd, df.schema)
                        result.matched += 1
                        result.modified += 1
                    elif kind == "upsert":
                        inserts.append(coll._upsert_doc(sel, upd))
                elif kind == "update_all":
                    sel, upd = payload
                    pred = coll._query_pred(df, sel)
                    n = df.where(pred).count()
                    df = apply_update(df, pred, upd, df.schema)
                    result.matched += n
                    result.modified += n
                elif kind == "remove":
                    pred = coll._query_pred(df, payload)
                    hit = df.where(pred).orderBy(coll._order_key(df)).limit(1).collect()
                    if hit:
                        key = coll._order_key(df)
                        value = hit[0][0] if "_id" not in df.columns else hit[0]["_id"]
                        df = df.where(~key.eqNullSafe(F.lit(value)))
                        result.matched += 1
                elif kind == "remove_all":
                    pred = coll._query_pred(df, payload)
                    result.matched += df.where(pred).count()
                    df = df.where(~F.coalesce(pred, F.lit(False)))
            return df

        def with_inserts(df: DataFrame | None) -> DataFrame | None:
            if not inserts:
                return df
            new_df = coll._docs_to_df(inserts)
            if df is None:
                return new_df
            return df.unionByName(
                coll._align(new_df, df.schema), allowMissingColumns=True
            )

        if not exists:
            out = with_inserts(chain(None))
            if out is not None:
                coll._rewrite(out)
            return result

        # combined selector over the PRE-bulk schema; a selector only
        # compilable mid-chain (references a column an earlier op adds)
        # falls back to the full-rewrite path
        df0 = coll.df()
        preds: list[F.Column] = []
        cow_ok = True
        try:
            for kind, payload in self._ops:
                if kind == "insert":
                    continue
                sel = payload if kind in ("remove", "remove_all") else payload[0]
                preds.append(compile_filter(sel, df0.schema))
        except (FilterCompileError, ValueError, AnalysisException):
            # selector not compilable against the pre-bulk schema (e.g.
            # references a column an earlier op adds, or a $text clause
            # that needs the scoring path) — take the full-rewrite path,
            # whose chain() compiles each op with full context
            cow_ok = False

        if not cow_ok:
            coll._rewrite(with_inserts(chain(df0)))
            return result
        if not preds:
            # insert-only bulk: append files, link everything else
            chain(df0.limit(0))
            coll._cow_append(coll._docs_to_df(inserts))
            return result
        combined = functools.reduce(
            lambda a, b: a | b, [F.coalesce(p, F.lit(False)) for p in preds]
        )
        did, _ = coll._cow_rewrite(combined, lambda sub: with_inserts(chain(sub)))
        if not did:
            # zero rows matched any selector: the op chain over an empty
            # frame yields exactly the upsert-synthesized + literal
            # inserts, with zero matched/modified
            chain(df0.limit(0))
            if inserts:
                coll._cow_append(coll._docs_to_df(inserts))
        return result


_OID_COUNTER = [0]


def new_object_id() -> str:
    """Deterministic-enough ObjectId stand-in (hex string)."""
    _OID_COUNTER[0] += 1
    return uuid.uuid4().hex[:18] + f"{_OID_COUNTER[0]:06x}"


def _substitute_let(node: Any, let: Mapping[str, Any]) -> Any:
    """Replace ``$$name`` references to aggregate-level ``let``
    variables with ``{"$literal": value}`` (Mongo: let values are
    constants, evaluated once, no document access).  Strings under
    ``$literal`` stay untouched; undeclared ``$$`` names (system
    variables, $lookup lets) pass through for the expression compiler
    to resolve.  Dotted access into a let document is unsupported and
    raises rather than silently matching nothing."""
    if isinstance(node, str) and node.startswith("$$"):
        head, _, rest = node[2:].partition(".")
        if head in let:
            if rest:
                raise ValueError(
                    f"dotted access into aggregate let variable "
                    f"{head!r} is not supported ({node!r})"
                )
            return {"$literal": let[head]}
        return node
    if isinstance(node, Mapping):
        if len(node) == 1 and "$literal" in node:
            return node
        return {k: _substitute_let(v, let) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_substitute_let(v, let) for v in node]
    return node


def _null_seed_column(tails: Sequence[Sequence[str]]):
    """A null column shaped for the dotted tails referenced under one
    seeded head: no tails → untyped null; tails → null cast to a
    nested struct whose leaves are NullType, so every referenced
    extraction analyzes and evaluates to null (Mongo's missing)."""
    paths = [list(t) for t in tails if t]
    if not paths:
        return F.lit(None)

    def build(subpaths: list[list[str]]) -> T.StructType:
        children: dict[str, list[list[str]]] = {}
        for p in subpaths:
            children.setdefault(p[0], []).append(p[1:])
        fields = []
        for name, rest in children.items():
            deeper = [r for r in rest if r]
            dt = build(deeper) if deeper else T.NullType()
            fields.append(T.StructField(name, dt))
        return T.StructType(fields)

    return F.lit(None).cast(build(paths))


def _pipeline_field_refs(stages: Sequence[Mapping[str, Any]]) -> list[str]:
    """Dotted field paths referenced by "$path" strings anywhere in
    an update-pipeline stage list ("$$" variables and operator keys are
    not references). Used to null-seed the one-row frame an unmatched
    pipeline upsert evaluates over, so references to fields absent from
    the filter behave as Mongo's missing→null instead of raising."""
    refs: list[str] = []

    def walk(node: Any) -> None:
        if isinstance(node, str):
            if node.startswith("$") and not node.startswith("$$"):
                path = node[1:]
                if path and not path.startswith("$"):
                    refs.append(path)
        elif isinstance(node, Mapping):
            if len(node) == 1 and "$literal" in node:
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    for stage in stages:
        walk(stage)
    # $unset names fields by bare key strings, not "$path" refs
    for stage in stages:
        arg = stage.get("$unset")
        if isinstance(arg, str):
            refs.append(arg)
        elif isinstance(arg, (list, tuple)):
            refs.extend(str(a).split(".", 1)[0] for a in arg)
    seen: dict[str, None] = {}
    for r in refs:
        seen.setdefault(r, None)
    return list(seen)


def synthesize_upsert_doc(
    query: Mapping[str, Any] | None, update: Mapping[str, Any]
) -> dict[str, Any]:
    """Build the inserted document for an unmatched upsert: equality
    fields from the filter + the update doc's effects (Mongo server
    semantics; reference relies on server, db/wrapper.go:146-165)."""
    doc: dict[str, Any] = {}
    for key, value in (query or {}).items():
        if key.startswith("$"):
            continue
        if isinstance(value, Mapping):
            eq = value.get("$eq") if all(str(k).startswith("$") for k in value) else value
            if isinstance(eq, Mapping) or eq is None and "$eq" not in value:
                continue
            doc[key] = eq
        else:
            doc[key] = value
    if has_dollar_key(update):
        for op, fields in update.items():
            if op in ("$set", "$setOnInsert"):
                doc.update(fields)
            elif op == "$inc":
                for k, v in fields.items():
                    doc[k] = doc.get(k, 0) + v
            elif op in ("$push", "$addToSet"):
                for k, v in fields.items():
                    each = v["$each"] if isinstance(v, Mapping) and "$each" in v else [v]
                    doc[k] = list(each)
            elif op in ("$min", "$max"):
                for k, v in fields.items():
                    doc.setdefault(k, v)
    else:
        merged = dict(update)
        merged.setdefault("_id", doc.get("_id", new_object_id()))
        doc.update(merged)
    doc.setdefault("_id", new_object_id())
    return doc

"""Application orchestration — the reference's two-phase Setup/Run
(anser.go:63-129) re-shaped for Spark:

The reference fans out one queue job per matched document (generators
scan with an `_id`-only projection, then jobs run on a rate-limited
worker pool). On Spark the per-document job boundary collapses into
partition parallelism: each migration is ONE distributed transform over
its matched set. What survives the translation:

- dependency-driven ordering with cycle/undefined validation
  (dependency_network.go:94-122) → topo waves,
- DryRun = plan + count, no writes (model/config.go:16-20),
- Limit = cap on processed documents per generator
  (model/generator.go:13),
- per-migration metadata events upserted on completion
  (migration_helper_iterator.go:80-107) gating dependents via
  Satisfied() (model/metadata.go:12, dependency_manager.go:46-93).

Manual migrations run the registered fn per matched row via an
Arrow-batched mapInPandas; stream migrations hand the registered
processor an iterator over all matched rows (client/processor.go:8-21).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Mapping
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from anser_spark.engine import ChangeInfo, Collection, Engine, Namespace
from anser_spark.functions.filters import compile_filter
from anser_spark.functions.updates import apply_update
from anser_spark.migrations.model import (
    ManualMigration,
    MigrationMetadata,
    SimpleMigration,
    StreamMigration,
)
from anser_spark.migrations.network import DependencyNetwork

__all__ = ["Application", "ApplicationOptions", "MigrationResult"]


@dataclass
class ApplicationOptions:
    """model.ApplicationOptions (model/config.go:16-20)."""

    dry_run: bool = False
    limit: int = 0  # cap on total migrations executed (0 = unlimited)


@dataclass
class MigrationResult:
    migration_id: str
    matched: int = 0
    modified: int = 0
    error: str | None = None
    dry_run: bool = False
    skipped_blocked: bool = False


class Application:
    """Setup → Run lifecycle over a list of migration definitions."""

    def __init__(self, engine: Engine, options: ApplicationOptions | None = None) -> None:
        self.engine = engine
        self.options = options or ApplicationOptions()
        self.migrations: list[SimpleMigration | ManualMigration | StreamMigration] = []
        self.network = DependencyNetwork()
        self._setup = False

    def add(self, *migrations: SimpleMigration | ManualMigration | StreamMigration) -> "Application":
        self.migrations.extend(migrations)
        return self

    # -- setup (anser.go:63-84) ----------------------------------------
    def setup(self) -> None:
        if self._setup:
            return
        errors: list[str] = []
        seen: set[str] = set()
        for mig in self.migrations:
            if not mig.is_valid():
                errors.append(f"invalid migration definition: {mig!r}")
                continue
            job_id = mig.options.job_id
            if job_id in seen:
                errors.append(f"duplicate migration id {job_id!r}")
            seen.add(job_id)
            self.network.add(job_id, *mig.depends_on)
            if isinstance(mig, ManualMigration) and mig.name not in self.engine.manual_ops:
                errors.append(f"manual operation {mig.name!r} is not registered")
            if isinstance(mig, StreamMigration) and mig.name not in self.engine.stream_processors:
                errors.append(f"stream processor {mig.name!r} is not registered")
        errors.extend(self.network.validate())
        if errors:
            raise ValueError("application setup failed: " + "; ".join(errors))
        self._setup = True

    # -- metadata (migration_helper_iterator.go:80-107) -----------------
    def _metadata_collection(self) -> Collection:
        ns = self.engine.metadata_namespace()
        return self.engine.db(ns.db).collection(ns.collection)

    def _record(self, meta: MigrationMetadata) -> None:
        coll = self._metadata_collection()
        doc = meta.to_doc()
        if coll.exists():
            coll.upsert_id(doc["_id"], {"$set": doc})
        else:
            coll.insert(doc)

    def _dependency_satisfied(self, job_id: str, completed: dict[str, bool]) -> bool:
        """Job ready iff every edge's metadata row Satisfied()
        (dependency_manager.go:46-93); missing rows ⇒ blocked."""
        for dep in self.network.resolve(job_id):
            if not completed.get(dep, False):
                return False
        return True

    # -- run (anser.go:86-129) ------------------------------------------
    def run(self) -> list[MigrationResult]:
        self.setup()
        by_id = {m.options.job_id: m for m in self.migrations}
        results: list[MigrationResult] = []
        completed: dict[str, bool] = {}
        executed = 0
        for wave in self.network.waves():
            for job_id in wave:
                mig = by_id[job_id]
                if self.options.limit and executed >= self.options.limit:
                    continue
                if not self._dependency_satisfied(job_id, completed):
                    results.append(
                        MigrationResult(job_id, skipped_blocked=True, error="dependencies not satisfied")
                    )
                    completed[job_id] = False
                    self._record(MigrationMetadata(job_id, job_id, has_errors=True, completed=False))
                    continue
                executed += 1
                result = self._run_one(job_id, mig)
                results.append(result)
                ok = result.error is None
                completed[job_id] = ok
                if not self.options.dry_run:
                    self._record(
                        MigrationMetadata(job_id, job_id, has_errors=not ok, completed=True)
                    )
        return results

    def _run_one(self, job_id: str, mig) -> MigrationResult:
        coll = self.engine.collection(mig.options.ns)
        try:
            df = coll.df()
            pred = compile_filter(dict(mig.options.query), df.schema)
            matched_df = df.where(pred)
            update_base = df
            if mig.options.limit:
                # generator Limit caps processed docs (model/generator.go:13):
                # deterministic choice by _id order. The limited-id set
                # stays a DataFrame (left join marks members) — never a
                # driver-side isin literal, which at a 10M-doc Limit would
                # be a 10M-element expression.
                from pyspark.sql import functions as F

                key = coll._order_key(df)
                limited_ids = (
                    matched_df.select(key.alias("__k")).orderBy("__k").limit(mig.options.limit)
                )
                lim = limited_ids.withColumn("__limit_hit", F.lit(True))
                annotated = df.join(lim, on=key.eqNullSafe(lim["__k"]), how="left").drop("__k")
                pred = F.coalesce(F.col("__limit_hit"), F.lit(False))
                matched_df = annotated.where(pred).drop("__limit_hit")
                update_base = annotated
            matched = matched_df.count()
            if self.options.dry_run:
                return MigrationResult(job_id, matched=matched, dry_run=True)
            if isinstance(mig, SimpleMigration):
                out = apply_update(update_base, pred, dict(mig.update), update_base.schema)
                if "__limit_hit" in out.columns:
                    out = out.drop("__limit_hit")
                # every row matched ⇒ $unset/$rename sources carry only
                # nulls: drop them (BSON semantics; same rule as
                # Collection.update_all). The count() is only paid when
                # the update contains such an operator.
                from anser_spark.functions.updates import compile_update, has_dollar_key

                upd = dict(mig.update)
                if has_dollar_key(upd):
                    plan = compile_update(upd, update_base.schema)
                    if plan.drop_if_all_matched and matched == df.count():
                        out = out.drop(*sorted(plan.drop_if_all_matched))
                coll._rewrite(out)
                return MigrationResult(job_id, matched=matched, modified=matched)
            if isinstance(mig, ManualMigration):
                fn = self.engine.manual_ops[mig.name]
                self._run_manual(coll, matched_df, fn)
                return MigrationResult(job_id, matched=matched, modified=matched)
            if isinstance(mig, StreamMigration):
                processor = self.engine.stream_processors[mig.name]
                self._run_stream(coll, matched_df, processor)
                return MigrationResult(job_id, matched=matched, modified=matched)
            return MigrationResult(job_id, error=f"unknown migration type {type(mig).__name__}")
        except Exception as exc:  # noqa: BLE001 — error propagation = job failure
            return MigrationResult(job_id, error=str(exc))

    # -- the UDF surfaces (SURVEY.md §2.9) -------------------------------
    def _run_manual(
        self,
        coll: Collection,
        matched_df: DataFrame,
        fn: Callable[[dict[str, Any]], dict[str, Any] | None],
    ) -> None:
        """Manual migration: registered fn maps one document → replacement
        document (or None = keep). Runs Arrow-batched on executors via
        mapInPandas; the transformed rows are merged back by _id in one
        copy-on-write rewrite."""
        import pandas as pd

        schema = matched_df.schema

        def transform(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                records = pdf.to_dict(orient="records")
                out = [fn(dict(r)) or r for r in records]
                yield pd.DataFrame(out, columns=pdf.columns)

        transformed = matched_df.mapInPandas(transform, schema=schema)
        base = coll.df()
        key = "_id" if "_id" in base.columns else base.columns[0]
        merged = base.join(transformed.select(key), on=key, how="left_anti").unionByName(
            transformed, allowMissingColumns=True
        )
        coll._rewrite(merged)

    def _run_stream(self, coll: Collection, matched_df: DataFrame, processor: Any) -> None:
        """Stream migration: processor.migrate(iterator_of_docs, collection)
        — 'reduce-like operations over all matched documents'
        (reference migration.go:30-34). The iterator is served from
        toLocalIterator (bounded memory); processors that only need
        per-partition semantics should implement process_partition
        instead, which runs distributed via mapInPandas."""
        if hasattr(processor, "process_partition"):
            import pandas as pd

            fn = processor.process_partition
            schema = matched_df.schema

            def transform(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
                for pdf in batches:
                    out = fn(pdf)
                    if out is not None:
                        yield out

            transformed = matched_df.mapInPandas(transform, schema=schema)
            base = coll.df()
            key = "_id" if "_id" in base.columns else base.columns[0]
            merged = base.join(transformed.select(key), on=key, how="left_anti").unionByName(
                transformed, allowMissingColumns=True
            )
            coll._rewrite(merged)
            return
        migrate = getattr(processor, "migrate", processor)
        docs = (row.asDict(recursive=True) for row in matched_df.toLocalIterator())
        migrate(docs, coll)

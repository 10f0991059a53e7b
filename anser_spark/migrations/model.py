"""Migration definitions — the reference's three forms
(model/migrations.go:10-70, README.rst:32-48):

- simple: declarative Mongo update doc applied to matched docs
  (server-side there; here the update compiler + one rewrite).
- manual: named registered function run per matched document
  (client/processor.go:15-21) → applyInPandas-style row fn.
- stream: named registered processor that receives an iterator over all
  matched docs (client/processor.go:8-13) → mapInPandas iterator fn.

Plus GeneratorOptions (model/generator.go:6-32) and MigrationMetadata
(model/metadata.go:4-13).
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field
from typing import Any

from anser_spark.engine import Namespace

__all__ = [
    "GeneratorOptions",
    "SimpleMigration",
    "ManualMigration",
    "StreamMigration",
    "MigrationMetadata",
]


@dataclass
class GeneratorOptions:
    """Mirror of model.GeneratorOptions (model/generator.go:6-32):
    namespace + query + job id + optional limit."""

    ns: Namespace
    query: Mapping[str, Any] = field(default_factory=dict)
    job_id: str = ""
    limit: int = 0

    def is_valid(self) -> bool:
        # model/generator.go IsValid: NS + JobID + Limit >= 0
        return self.ns.is_valid() and bool(self.job_id) and self.limit >= 0


@dataclass
class SimpleMigration:
    """model.Simple (model/migrations.go:10-29): update doc + options."""

    options: GeneratorOptions
    update: Mapping[str, Any] = field(default_factory=dict)
    depends_on: list[str] = field(default_factory=list)

    def is_valid(self) -> bool:
        return self.options.is_valid() and bool(self.update)


@dataclass
class ManualMigration:
    """model.Manual (model/migrations.go:31-49): named registered op."""

    options: GeneratorOptions
    name: str = ""
    depends_on: list[str] = field(default_factory=list)

    def is_valid(self) -> bool:
        return self.options.is_valid() and bool(self.name)


@dataclass
class StreamMigration:
    """model.Stream (model/migrations.go:51-70): named processor."""

    options: GeneratorOptions
    name: str = ""
    depends_on: list[str] = field(default_factory=list)

    def is_valid(self) -> bool:
        return self.options.is_valid() and bool(self.name)


@dataclass
class MigrationMetadata:
    """model.MigrationMetadata (model/metadata.go:4-13)."""

    id: str
    migration: str
    has_errors: bool = False
    completed: bool = False

    def satisfied(self) -> bool:
        # model/metadata.go:12
        return self.completed and not self.has_errors

    def to_doc(self) -> dict[str, Any]:
        return {
            "_id": self.id,
            "migration": self.migration,
            "has_errors": self.has_errors,
            "completed": self.completed,
        }

"""Configuration-file applications (reference config.go:16-80,
model/config.go:7-37): build an Application from a declarative
Configuration{options, simple/manual/stream migration lists}, validating
each generator and that named ops are registered.

JSON always supported; YAML when a yaml module is importable (gated —
not a hard dependency).
"""

from __future__ import annotations

import json
from collections.abc import Mapping
from typing import Any

from anser_spark.engine import Engine, Namespace
from anser_spark.migrations.application import Application, ApplicationOptions
from anser_spark.migrations.model import (
    GeneratorOptions,
    ManualMigration,
    SimpleMigration,
    StreamMigration,
)

__all__ = ["load_configuration", "application_from_config"]


def load_configuration(path: str) -> dict[str, Any]:
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError("YAML configuration requires a yaml module") from exc
        return yaml.safe_load(text)
    return json.loads(text)


def _gen_options(doc: Mapping[str, Any]) -> GeneratorOptions:
    ns = doc.get("ns", {})
    return GeneratorOptions(
        ns=Namespace(ns.get("db", ""), ns.get("collection", "")),
        query=doc.get("query", {}),
        job_id=doc.get("job_id", doc.get("jobId", "")),
        limit=int(doc.get("limit", 0)),
    )


def application_from_config(engine: Engine, config: Mapping[str, Any] | str) -> Application:
    """Validates exactly what the reference validates (config.go:36-76):
    per-generator IsValid + registered op names (checked in
    Application.setup)."""
    if isinstance(config, str):
        config = load_configuration(config)
    opts = config.get("options", {})
    app = Application(
        engine,
        ApplicationOptions(
            dry_run=bool(opts.get("dry_run", opts.get("dryRun", False))),
            limit=int(opts.get("limit", 0)),
        ),
    )
    for doc in config.get("simple_migrations", config.get("simple", [])) or []:
        app.add(
            SimpleMigration(
                options=_gen_options(doc),
                update=doc.get("update", {}),
                depends_on=list(doc.get("depends_on", [])),
            )
        )
    for doc in config.get("manual_migrations", config.get("manual", [])) or []:
        app.add(
            ManualMigration(
                options=_gen_options(doc),
                name=doc.get("name", ""),
                depends_on=list(doc.get("depends_on", [])),
            )
        )
    for doc in config.get("stream_migrations", config.get("stream", [])) or []:
        app.add(
            StreamMigration(
                options=_gen_options(doc),
                name=doc.get("name", ""),
                depends_on=list(doc.get("depends_on", [])),
            )
        )
    app.setup()
    return app

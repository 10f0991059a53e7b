"""anser_spark — a PySpark-native analytics engine with the data-processing
capabilities of mongodb/anser (document queries, updates, aggregation
pipelines, migrations), re-expressed Spark-first.

The reference (mongodb/anser) forwards MongoDB query/update/pipeline
documents to a server; here those dialects are *compiled* to PySpark
DataFrame expressions so Catalyst/Tungsten do the planning and execution.
See SURVEY.md for the full operator inventory and file:line citations.

Layout:
    engine       Engine / Database / Collection handles (environment.go analogue)
    functions/   filter, update, sort-key and expression compilers
    plans/       fluent Query + aggregation pipeline compiler
    operators/   beyond-reference large-scale ops (dedup, similarity, text)
    migrations/  Simple/Manual/Stream migrations + DAG orchestration
    sources/     backup/export sinks
    streaming/   APM-style windowed event aggregation
"""

from anser_spark.engine import (
    Engine,
    Database,
    Collection,
    Namespace,
    ChangeInfo,
    NotFoundError,
    WriteConflictError,
)
from anser_spark.functions.expressions import ExprCompileError
from anser_spark.functions.filters import FilterCompileError
from anser_spark.functions.updates import UpdateCompileError
from anser_spark.plans.pipeline import PipelineCompileError
from anser_spark.session import get_spark

__all__ = [
    "Engine",
    "Database",
    "Collection",
    "Namespace",
    "ChangeInfo",
    "NotFoundError",
    "WriteConflictError",
    "ExprCompileError",
    "FilterCompileError",
    "UpdateCompileError",
    "PipelineCompileError",
    "get_spark",
]

__version__ = "0.5.0"

from anser_spark.migrations.model import (
    GeneratorOptions,
    SimpleMigration,
    ManualMigration,
    StreamMigration,
    MigrationMetadata,
)
from anser_spark.migrations.network import DependencyNetwork
from anser_spark.migrations.application import Application, ApplicationOptions

__all__ = [
    "GeneratorOptions",
    "SimpleMigration",
    "ManualMigration",
    "StreamMigration",
    "MigrationMetadata",
    "DependencyNetwork",
    "Application",
    "ApplicationOptions",
]

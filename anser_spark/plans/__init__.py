from anser_spark.plans.query import Query
from anser_spark.plans.pipeline import Aggregation, compile_pipeline

__all__ = ["Query", "Aggregation", "compile_pipeline"]

from anser_spark.functions.filters import compile_filter
from anser_spark.functions.sort import parse_sort_keys
from anser_spark.functions.updates import compile_update, has_dollar_key
from anser_spark.functions.expressions import compile_expr

__all__ = [
    "compile_filter",
    "parse_sort_keys",
    "compile_update",
    "has_dollar_key",
    "compile_expr",
]

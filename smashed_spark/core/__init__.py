from .lint import assert_plan, plan_report
from .mapper import SparkMapper
from .order import ROW_ID, with_order_key, with_row_index
from .pipeline import Pipeline, make_pipeline

__all__ = [
    "SparkMapper",
    "assert_plan",
    "plan_report",
    "Pipeline",
    "make_pipeline",
    "ROW_ID",
    "with_row_index",
    "with_order_key",
]

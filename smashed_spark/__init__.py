"""smashed_spark — a PySpark-native rebuild of the capabilities of
allenai/smashed (dataset-transformation mappers for NLP preprocessing),
plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis) a 100 TB corpus needs.

Reference: allenai/smashed v0.21.5 (read-only study copy at
/root/reference).  See SURVEY.md for the blueprint.
"""

from .core import Pipeline, SparkMapper, make_pipeline

__version__ = "0.1.0"

__all__ = ["SparkMapper", "Pipeline", "make_pipeline", "__version__"]

from .cache import EndCachingMapper, StartCachingMapper, run_with_cache
from .loaders import (
    CsvLoaderMapper,
    DatasetLoaderMapper,
    JsonlLoaderMapper,
    concatenate_datasets,
    interleave_datasets,
)

__all__ = [
    "CsvLoaderMapper",
    "DatasetLoaderMapper",
    "EndCachingMapper",
    "JsonlLoaderMapper",
    "StartCachingMapper",
    "concatenate_datasets",
    "interleave_datasets",
    "run_with_cache",
]

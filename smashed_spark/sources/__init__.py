from .cache import EndCachingMapper, StartCachingMapper, run_with_cache
from .io_utils import (
    SmartPath,
    copy_directory,
    exists,
    open_file_for_read,
    open_file_for_write,
    recursively_list_files,
    remove_directory,
    remove_file,
    stream_file_for_read,
)
from .loaders import (
    CsvLoaderMapper,
    DatasetLoaderMapper,
    JsonlLoaderMapper,
    concatenate_datasets,
    interleave_datasets,
    sample_mix,
)

__all__ = [
    "CsvLoaderMapper",
    "DatasetLoaderMapper",
    "EndCachingMapper",
    "JsonlLoaderMapper",
    "SmartPath",
    "StartCachingMapper",
    "concatenate_datasets",
    "copy_directory",
    "exists",
    "interleave_datasets",
    "open_file_for_read",
    "open_file_for_write",
    "recursively_list_files",
    "remove_directory",
    "remove_file",
    "run_with_cache",
    "sample_mix",
    "stream_file_for_read",
]

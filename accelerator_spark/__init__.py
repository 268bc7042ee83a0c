"""accelerator_spark — a PySpark-native analytics/pipeline engine with the
query and data-processing capabilities of eBay/accelerator (reference at
/root/reference, studied in SURVEY.md), re-expressed Spark-first.

Layers:
- ``session``    SparkSession factory (AQE on, UTC, zstd parquet)
- ``dataset``    Dataset = Parquet dir + JSON manifest; chains; zone maps
- ``build``      memoized step execution + urd-lite registry
- ``operators``  csvimport/export, typing, hashpart, sort, merge, dedup,
                 similarity, text analysis, asof, checksum, ...
- ``functions``  the dataset_type conversion menu as Spark expressions
- ``streaming``  incremental chains + Structured Streaming wrappers
"""

from .session import get_spark, tune_for_session
from .dataset import Dataset, with_lineno, LINENO
from .build import BuildContext, Urd, OptionEnum, RequiredOption

__all__ = [
    "get_spark", "tune_for_session",
    "Dataset", "with_lineno", "LINENO",
    "BuildContext", "Urd", "OptionEnum", "RequiredOption",
]

__version__ = "0.1.0"

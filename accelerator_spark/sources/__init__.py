"""Sources/sinks: CSV import/export with the reference's bad/skipped-line
capture semantics (SURVEY §2.1), plus JSONL with the same contract."""

from .csv import csvimport, csvexport
from .jsonl import jsonlexport, jsonlimport

__all__ = ["csvimport", "csvexport", "jsonlimport", "jsonlexport"]

"""Sources/sinks: CSV import/export with the reference's bad/skipped-line
capture semantics (SURVEY §2.1)."""

from .csv import csvimport, csvexport

__all__ = ["csvimport", "csvexport"]

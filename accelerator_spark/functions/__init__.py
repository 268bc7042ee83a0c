"""Scalar-function layer: the reference concentrates all scalar conversion
in dataset_type (SURVEY §2.8); everything else is Spark's native F.*
superset. This package holds the conversion menu + helpers."""

from .conversions import convert_expr, dataset_type, CONVERSION_MENU

__all__ = ["convert_expr", "dataset_type", "CONVERSION_MENU"]

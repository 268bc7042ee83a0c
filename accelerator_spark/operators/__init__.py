"""Operator library — each module maps a SURVEY.md §2 inventory row (or a
north-star extension) onto idiomatic PySpark."""

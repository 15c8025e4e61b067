"""Composite operators built from DataFrame primitives — the pieces
the reference lacks that a 100 TB training-data pipeline needs
(dedup, similarity search), plus reusable relational helpers.
"""

"""Large-scale training-data operators: dedup, similarity, text analysis.

These extend the reference's operator surface (SURVEY.md §2) with the
operations a 100 TB training-data pipeline needs; each is exposed as a
``queries()`` entry in ``__ray_entry__`` with a DuckDB oracle where
SQL-expressible.
"""

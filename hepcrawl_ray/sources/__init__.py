"""Source operators: enumerate + expand work into record rows.

Ray-Data equivalents of the reference's source layer (SURVEY.md §2.1):
archive expansion, XML feed iteration, JSONL parsing with error rows,
paged enumeration, and listing anti-joins.
"""

"""Batch operators.

``core`` carries the reference's own operator surface (SURVEY.md §2
rows O5-O16); the sibling modules carry the [EXT] operator families
(aggregates, windows, joins, dedup, similarity, text, multimodal).
"""

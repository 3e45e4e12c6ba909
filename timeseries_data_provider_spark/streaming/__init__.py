"""Ingestion collector + retention maintenance (reference index.js
scheduler loop, SURVEY.md §3.2-3.3), on Structured Streaming."""

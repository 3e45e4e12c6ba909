"""Grafana JSON-datasource serving layer (thin, non-Spark HTTP
adapter over the batch operators — SURVEY.md §7 step 5)."""

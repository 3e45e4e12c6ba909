"""PySpark-native analytics engine with the query/data-processing
capabilities of m-adamski/timeseries-data-provider (reference studied at
/root/reference; see SURVEY.md), re-expressed Spark-first.

The reference is a Grafana JSON-datasource backend + HTTP metrics
collector that delegates query execution to InfluxDB. This package
implements its data model, ingestion, retention and query semantics
natively on Spark DataFrames / Structured Streaming, and extends the
operator surface with large-scale LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session    -- tuned SparkSession builder + runtime conf guard
    tables     -- schema-normalizing loaders for the driver testdata
    operators  -- batch operators (core reference semantics + [EXT])
    streaming  -- ingestion collector + retention maintenance
    serving    -- Grafana JSON-datasource wire encoding / HTTP adapter
"""

__version__ = "0.1.0"

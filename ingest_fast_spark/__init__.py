"""ingest_fast_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
nypl-registry/ingest-fast (reference at /root/reference), re-expressed as
idiomatic Spark DataFrame/SQL plans, plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    session     SparkSession factory with scale-oriented defaults
    catalog     loaders for the synthetic star-schema / documents / embeddings
    sources     N-Triples scan + parse (the reference's input format)
    functions   scalar/column function library (id extraction, normalization,
                text stats, vector math)
    operators   relational + pipeline operators (FAST aggregation pipeline,
                dedup, similarity, text analysis)
    streaming   Structured Streaming variants over the events table
"""

__version__ = "0.1.0"

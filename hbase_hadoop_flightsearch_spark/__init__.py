"""PySpark-native analytics engine with the capabilities of
sumersb/HBase-Hadoop-FlightSearch, re-expressed Spark-first.

The reference (read-only at /root/reference/) is three Hadoop MapReduce jobs
computing a per-carrier monthly average arrival-delay report over BTS
on-time-performance CSV stored in HBase (see SURVEY.md). This engine keeps
the reference's query semantics (including its rounding quirks, in "compat"
mode) but is a new design: DataFrame/SQL on Catalyst, Parquet-first storage,
Structured Streaming for event data, plus the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns)
required for 100 TB-scale training-data work.

Layout:
    session.py    SparkSession factory (AQE, Arrow, sane shuffle defaults)
    schemas.py    explicit StructTypes for every table
    sources/      readers (parquet catalog, derived flights view, CSV ingest)
    operators/    joins, aggregates, windows, set ops, top-k, dedup, similarity
    functions/    scalar/text/multimodal column function library
    plans/        named query plans + the central query registry
    streaming/    Structured Streaming builders (batch/stream dual-use)
"""

__version__ = "0.1.0"

"""employee_analytics_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
(akash-patro-coder/employee-analytics-etl, surveyed in SURVEY.md) as an
idiomatic Spark DataFrame/SQL engine, extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, streaming windows).

Layout
------
- ``session``    : SparkSession factory tuned for the target workload
- ``config``     : pipeline configuration (pinned ``as_of`` date, paths)
- ``sources``    : schema registry, readers (CSV/Parquet), sinks (CSV/JDBC)
- ``operators``  : cleaning, summaries, dedup, similarity, text, windows
- ``functions``  : reusable Column-expression helpers (null-parity, exact
                   decimal aggregation for cross-engine determinism)
- ``plans``      : pipeline orchestration, validation suite, reporting
- ``streaming``  : Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"

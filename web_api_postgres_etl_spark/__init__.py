"""web_api_postgres_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline
(Meisam984/Web-API_Postgres_ETL: pandas + Postgres + Airflow) as an
idiomatic Spark engine:

- ``session``     — SparkSession builder (AQE on, tuned shuffle partitions)
- ``sources``     — REST/JSON/JDBC/parquet connectors, JSON flattener,
                    Jalali dim_date generator
- ``operators``   — projections, filters, joins, aggregates, last-wins
                    dedup, near-dup dedup (MinHash-LSH / SimHash /
                    n-gram Jaccard), similarity search, multimodal
- ``functions``   — scalar column functions (Jalali date reformat,
                    pct-change ratios, array extraction, text analysis)
- ``plans``       — medallion pipeline runners (full refresh /
                    incremental) and the watermark manager
- ``streaming``   — Structured Streaming face over the incremental path

Everything is expressed with the DataFrame API so Catalyst owns
predicate pushdown, column pruning, and join strategy; Python UDFs are
avoided in all hot paths (reference needs none — SURVEY.md §2.8).
"""

__version__ = "0.1.0"

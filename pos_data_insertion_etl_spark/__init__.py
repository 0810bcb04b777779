"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference POS ETL pipeline
(prachikabra121/POS-DATA-INSERTION-ETL, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first.

Layout:
    session    -- SparkSession factory (AQE on, UTC, tuned shuffle partitions)
    catalog    -- table registry over the parquet test tables
    functions/ -- column-level helpers (text analytics, vector math)
    operators/ -- engine operators (dedup, similarity, fixed-width, top-k, ...)
    sources/   -- custom sources (zip-of-fixed-width text, file streams)
    pipeline/  -- the POS mart pipeline (the reference's stored-proc contracts)
    streaming/ -- Structured Streaming jobs (windows, watermarks, sessions)
    plans/     -- the declared query inventory + DuckDB oracle SQL
"""

__version__ = "0.1.0"

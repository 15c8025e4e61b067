"""pythondataingestionprocess_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``mtlachinom/pythonDataIngestionProcess``
(a single-node pandas + psycopg2 ETL tool), rebuilt Spark-first:

- declarative DataFrame / SQL plans (Catalyst optimizes; we don't hand-schedule)
- built-in column expressions for every cleaning / derivation rule
  (UDFs only where semantics genuinely require Python)
- Structured Streaming for the file-queue ingestion surface
- beyond-reference LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing) designed for
  100 TB scale.

See SURVEY.md for the operator inventory this package implements.
"""

__version__ = "0.1.0"

from pythondataingestionprocess_spark.session import get_spark  # noqa: F401

"""PySpark-native analytics engine with the data-processing capabilities of
Nancy-Ramirez/Data_Warehouse_Punta_Fina (a pandas/PostgreSQL Kimball-style
dimensional ETL), re-expressed Spark-first.

Everything here is a composition of public Apache Spark DataFrame/SQL APIs.
The reference's operator inventory (SURVEY.md §2) maps onto:

- ``sources``   — schema-enforced readers/writers + generated sources
- ``functions`` — scalar helpers (dates, money, strings, text, vectors)
- ``operators`` — reusable relational operators (SK lookup joins, windows,
                  pivots, journal explode, dedup, validation, similarity)
- ``plans``     — the star-schema builders (dims, facts, pipeline)
- ``streaming`` — Structured Streaming wrappers (checkpointed file streams)
"""

__version__ = "0.1.0"

from data_warehouse_punta_fina_spark.session import get_spark  # noqa: F401

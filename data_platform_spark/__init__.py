"""data_platform_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference layered ELT warehouse (``MechaelDodo/data-platform``), re-expressed
Spark-first: DataFrame/SQL declarative plans optimized by Catalyst, Parquet
storage, Structured Streaming for event data, and Arrow-vectorized Pandas
UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, tuned shuffle partitions)
- ``schemas``    single-source-of-truth StructType registry
- ``ops``        reusable operator library (SCD2, upsert, change detection…)
- ``sources``    ingestion (paginated REST → bronze) + testdata loaders
- ``layers``     raw / staging / dwh builders (the reference's ELT surface)
- ``queries``    declared analytic query inventory (oracle-checked)
- ``functions``  text analysis, dedup, similarity-search libraries
- ``streaming``  Structured Streaming pipelines over event data
"""

__version__ = "0.1.0"

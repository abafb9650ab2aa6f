"""udacity_capstone_data_engineering_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL project
``maleksaati/udacity-Capstone-Data-Engineering`` (star-schema ETL, typed
ingestion, cleaning, dimensional joins, date derivation, data-quality
checking), generalized into a reusable operator catalog and extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design principles (see SURVEY.md §7):
  - DataFrame/SQL only; no RDDs; Catalyst owns the physical plan.
  - Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
    pandas UDFs only where built-ins genuinely cannot express semantics.
  - Every operator is shuffle- and pushdown-aware: broadcast small dims,
    pre-aggregate before joins, keep filters/projections at the scan.
"""

from udacity_capstone_data_engineering_spark.session import get_spark, session_builder

__all__ = ["get_spark", "session_builder"]

__version__ = "0.1.0"

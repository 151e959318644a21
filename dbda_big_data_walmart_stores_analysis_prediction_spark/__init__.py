"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo
``Abhishekshete0808/dbda-big-data-walmart-stores-analysis-prediction``
(a PySpark ETL + EDA + MLlib pipeline over the Walmart store-sales dataset),
extended with the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns, event-time windows)
that a 100 TB deployment needs.

Design tenets (see SURVEY.md §4 for the anti-patterns these replace):

* Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategies.
* Explicit schemas — never ``inferSchema`` (reference ``Scripts/etl.py:86-89``).
* One stat job for N columns, not N jobs (reference ``Scripts/etl.py:16-32``).
* No ``coalesce(1)`` sinks (reference ``Scripts/etl.py:123,126``).
* Built-in JVM expressions in the hot path; Arrow-batched pandas UDFs only
  where the semantics genuinely need Python.
"""

from dbda_big_data_walmart_stores_analysis_prediction_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.star_queries import (
    ORACLE_SQL,
    QUERIES,
    flagship_top_customers_rolling,
)
from dbda_big_data_walmart_stores_analysis_prediction_spark.plans import (  # noqa: F401
    northstar_queries as _northstar,  # registers q22+ into QUERIES/ORACLE_SQL
)

__all__ = ["QUERIES", "ORACLE_SQL", "flagship_top_customers_rolling"]

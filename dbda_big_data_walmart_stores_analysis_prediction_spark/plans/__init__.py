from dbda_big_data_walmart_stores_analysis_prediction_spark.plans.star_queries import (
    ORACLE_SQL,
    QUERIES,
    flagship_top_customers_rolling,
)

__all__ = ["QUERIES", "ORACLE_SQL", "flagship_top_customers_rolling"]

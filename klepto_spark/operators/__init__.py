from klepto_spark.operators.pipeline import build_table_df, build_table_sql

__all__ = ["build_table_df", "build_table_sql"]

from klepto_spark.functions.anonymise import (
    FAKER_NAMES,
    anonymise_expr,
    anonymise_sql,
    validate_spec,
)

__all__ = ["FAKER_NAMES", "anonymise_expr", "anonymise_sql", "validate_spec"]

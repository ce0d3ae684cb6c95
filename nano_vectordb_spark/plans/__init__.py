from nano_vectordb_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    physical_plan,
)

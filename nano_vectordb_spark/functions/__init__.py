from nano_vectordb_spark.functions.vector import (  # noqa: F401
    as_double_array,
    cosine_expr,
    dot_expr,
    l2sq_expr,
    norm_expr,
    normalize_expr,
)

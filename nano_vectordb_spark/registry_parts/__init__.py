"""Sequential domain parts of the query registry — imported in
declaration order by nano_vectordb_spark.registry (the facade),
which owns the gate-basket ordering. Import the facade, not the
parts."""

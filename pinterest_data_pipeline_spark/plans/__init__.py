"""Query plan builders: canonical Pinterest queries, driver-table analogs,
and the generic relational operator matrix."""

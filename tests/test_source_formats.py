"""Source-format breadth: CSV and ORC round-trips under declared
schemas, schema evolution via mergeSchema, and parameterized SQL.

Parquet is the engine's primary format (TESTDATA + all sinks); these pin
that the same declared-schema discipline holds for the other built-in
formats a migrating user may bring along. Avro is NOT covered: it needs
the external spark-avro package, absent in this container (documented
scope boundary, same class as Delta jars)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.sources.parquet import load_table


def test_csv_round_trip_with_declared_schema(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_csv")
    cust.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema(cust.schema)  # declared, never inferSchema
        .option("header", "true")
        .csv(out)
    )
    assert back.schema == cust.schema
    assert back.count() == cust.count()
    # numeric content survives the text round-trip exactly (2-dec money)
    a = cust.agg(F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))).collect()[0][0]
    b = back.agg(F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))).collect()[0][0]
    assert a == b


def test_orc_round_trip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert set(back.columns) == set(orders.columns)
    assert back.count() == orders.count()
    a = orders.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))).collect()[0][0]
    b = back.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))).collect()[0][0]
    assert a == b


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution on read: files written before a column existed
    merge with later files; old rows surface NULL for the new column."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        out + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 7.5)], "id long, v string, score double"
    ).write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) >= {"id", "v", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 7.5


def test_parameterized_sql_binds_named_args(spark, sf_dir):
    """spark.sql named-parameter binding: the safe form of dynamic SQL
    (no string interpolation, plans cache by template)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("p_orders")
    got = spark.sql(
        "SELECT count(*) AS n FROM p_orders WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    ).collect()[0]["n"]
    want = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert got == want


def test_file_metadata_hidden_columns(spark, sf_dir):
    """The _metadata hidden struct (file_path/file_name/size/row_index)
    rides every file-source scan — the audit/lineage columns a curation
    pipeline stamps into provenance records without any extra bookkeeping
    table."""
    from pinterest_data_pipeline_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("row_index"),
    )
    rows = docs.collect()
    assert all(r["file_name"] == "documents.parquet" for r in rows)
    # row_index is the within-file ordinal: dense 0..n-1 for one file
    idx = sorted(r["row_index"] for r in rows)
    assert idx == list(range(len(rows)))

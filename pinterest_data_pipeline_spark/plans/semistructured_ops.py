"""Semi-structured data queries: Spark 4 VARIANT over JSON payloads and
higher-order array functions over embedding vectors.

`relational_ops.json_extract_events` pins the classic path-string
extraction (`get_json_object`); this module adds the Spark 4 way — parse
once into a VARIANT value, then typed `variant_get` extractions, which at
scale beats repeated string parsing because the binary variant encoding
is parsed once per row regardless of how many fields are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.plans.registry import register
from pinterest_data_pipeline_spark.sources.parquet import load_table


@register(
    "variant_extract_events",
    # nullif: DuckDB's json_extract THROWS on '' where the engine's
    # try_parse_json yields a NULL variant — both sides read an empty
    # payload as a missing one
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(nullif(props, ''), '$.k')
                         AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(nullif(props, ''), '$.k')
                         AS INTEGER)) AS INTEGER) AS max_k,
           CAST(COUNT(*) FILTER (
                WHERE CAST(json_extract_string(nullif(props, ''), '$.k')
                           AS INTEGER) > 50
           ) AS BIGINT) AS n_big
    FROM events GROUP BY event_type
    """,
)
def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed JSON processing: ``parse_json`` decodes the props
    payload into Spark 4's binary variant encoding ONCE per row, then all
    downstream field reads are typed ``variant_get`` path accesses — no
    re-tokenizing of the JSON string per extracted field (the
    ``get_json_object`` twin in relational_ops re-parses per call site).

    The oracle reads the same fields with DuckDB's JSON string functions,
    so the variant decode path is value-checked against an independent
    JSON parser.

    ``try_parse_json``, not ``parse_json``: a malformed or empty payload
    becomes a NULL variant (and NULL extractions) instead of throwing —
    the same one-dirty-row-must-not-kill-the-job quarantine as the
    try_* arithmetic family. The oracle nullifs '' to match.

    Scale: parse + extract run scan-side in codegen; the aggregate is the
    only exchange, over |event_types| groups.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, True)).alias("n_big"),
        )
    )


@register(
    "hof_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
               AS n_pos,
           len(list_filter(embedding, x -> x < 0)) > 0 AS has_neg,
           round(list_reduce(
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
               (a, b) -> a + b), 6) AS l1_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem
    FROM embeddings
    """,
)
def hof_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class query surface:
    ``filter`` (positive-element count), ``exists`` (any negative),
    ``aggregate`` (sequential-fold L1 norm — same left-fold the cosine
    kernel in operators/similarity.py relies on; DuckDB's ``list_reduce``
    folds in the same order, so the doubles agree bit-for-bit), and
    ``array_max``. All run scan-side in codegen — zero shuffles, no UDF.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.exists(vec, lambda x: x < 0).alias("has_neg"),
        F.round(
            F.aggregate(
                vec,
                F.lit(0.0),
                lambda acc, x: acc + F.abs(x.cast("double")),
            ),
            6,
        ).alias("l1_norm"),
        F.round(F.array_max(vec).cast("double"), 6).alias("max_elem"),
    )


@register(
    "hof_map_ops",
    oracle="""
    WITH counts AS (
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderpriority IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT status, priority, n * 2 AS n_doubled
    FROM counts WHERE n >= 20
    """,
)
def hof_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions, round-tripped: per order status the
    (priority → count) map is BUILT (`map_from_entries` over collected
    structs), FILTERED (`map_filter` keeps entries with count ≥ 20),
    TRANSFORMED (`transform_values` doubles), and EXPLODED back to rows.
    The oracle states the same result relationally, so the driver hash
    checks that a value survives the full map pipeline unchanged.

    A NULL priority cannot be a map key (Spark throws NULL_MAP_KEY at
    map_from_entries, per map semantics), so NULL-priority rows are
    excluded up front on both sides — a map pipeline only carries
    identifiable keys.

    Scale note: per-group maps hold |priorities| entries (bounded domain)
    — collect_list into a map is safe ONLY for such metadata-sized
    domains; an unbounded key domain stays relational.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isNotNull()
    )
    counts = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n"))
    mapped = counts.groupBy("status").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("priority", "n")))
        ).alias("m")
    )
    processed = mapped.select(
        "status",
        F.transform_values(
            F.map_filter(F.col("m"), lambda _k, v: v >= 20),
            lambda _k, v: v * 2,
        ).alias("m2"),
    )
    return processed.select(
        "status", F.explode(F.col("m2")).alias("priority", "n_doubled")
    )


@register(
    "parse_url_features",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || nullif(source, '') || '.example.com:8443/corpus/'
               || nullif(lang, '')
               || '/doc?id=' || CAST(doc_id AS VARCHAR) || '&rev=2' AS u
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN u IS NULL THEN NULL
                ELSE split_part(split_part(u, '://', 2), ':', 1) END
               AS host,
           CASE WHEN u IS NULL THEN NULL
                ELSE '/corpus/'
                     || split_part(split_part(u, '/corpus/', 2), '/', 1)
                     || '/doc' END AS path,
           CASE WHEN u IS NULL THEN NULL
                ELSE split_part(split_part(u, 'id=', 2), '&', 1) END
               AS id_param,
           CASE WHEN u IS NULL THEN NULL
                ELSE split_part(u, '://', 1) END AS protocol
    FROM urls
    """,
)
def parse_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the dedicated `parse_url` kernel (HOST /
    PATH / QUERY-parameter / PROTOCOL) over deterministic synthesized
    URLs — the web-corpus provenance columns (registrable domain, path,
    tracking params) a crawl-derived training pipeline extracts for
    per-domain quality stats and dedup blocking. The oracle reassembles
    the same fields with generic string splitting, so the URL grammar
    Spark implements is cross-checked against a parser-free
    decomposition. A NULL — or empty — source or lang makes the
    synthesized URL NULL (nullif then concat-propagate) and every
    parsed field NULL with it; the oracle's CASEs replay that. The
    empty case matters because '' provenance would synthesize
    'https://.example.com' — a URL Spark's URI parser half-rejects
    (NULL host, parseable path) while the oracle's string splitting
    happily decomposes: empty provenance IS missing provenance, decided
    before any parser sees it.

    Scale: pure scan-side codegen; the synthesized-URL column exercises
    the identical expression pipeline a real `url` column would.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.concat(
        F.lit("https://"),
        F.nullif(F.col("source"), F.lit("")),
        F.lit(".example.com:8443/corpus/"),
        F.nullif(F.col("lang"), F.lit("")),
        F.lit("/doc?id="),
        F.col("doc_id").cast("string"),
        F.lit("&rev=2"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.parse_url(u, F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "regex_function_matrix",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
               AS n_number_runs,
           COALESCE(regexp_extract(text, '[0-9]+'), '') AS first_number,
           CAST(regexp_matches(text, '[.!?]\\s*$') AS INTEGER)
               AS ends_terminal
    FROM documents
    """,
)
def regex_function_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting/locating regex kernels beyond extract/replace:
    `regexp_count` (occurrences), `regexp_substr` (first match —
    NULL-safe, coalesced to '' so both engines agree on no-match), and
    an anchored `rlike` (terminal punctuation). NULL text propagates to
    NULL counts/flags (the oracle casts the bare boolean rather than
    CASE-defaulting it to 0, matching rlike's NULL). All scan-side
    codegen; RE2-safe patterns (no backtracking blowup on adversarial
    documents, same discipline as the PII redaction pass).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("[0-9]+")).alias("n_number_runs"),
        F.coalesce(
            F.regexp_substr("text", F.lit("[0-9]+")), F.lit("")
        ).alias("first_number"),
        F.col("text")
        .rlike("[.!?]\\s*$")
        .cast("int")
        .alias("ends_terminal"),
    )


@register(
    "from_csv_embedded_records",
    # nullif: DuckDB's split_part on a NULL line returns '' (not NULL),
    # and a valid synthesized line never carries an empty field, so
    # nullif maps the NULL-line case back to NULL fields — mirroring
    # the engine's NULL-line -> NULL-struct parse
    oracle="""
    SELECT o_orderkey AS orderkey,
           nullif(split_part(csv_line, ',', 1), '') AS status,
           CAST(nullif(split_part(csv_line, ',', 2), '') AS BIGINT) AS cents,
           CAST(nullif(split_part(csv_line, ',', 3), '') AS INTEGER) AS yr
    FROM (
        SELECT o_orderkey,
               o_orderstatus || ',' ||
               CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               || ',' || CAST(year(o_orderdate) AS VARCHAR) AS csv_line
        FROM orders
    )
    """,
)
def from_csv_embedded_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-column CSV codec (`from_csv`, the sibling of from_json /
    parse_json): a CSV line embedded in a string column is parsed with a
    DECLARED schema into a struct, then unpacked — the landing pattern
    for log lines and legacy feeds that arrive CSV-in-a-field. The line
    is synthesized deterministically from orders so the oracle can parse
    it back with generic string splitting.

    Scale: schema-declared single-pass parse in codegen — no inference
    scan, no Python; malformed lines yield NULL fields rather than
    failures (PERMISSIVE mode), the same quarantine discipline as the
    JSON landing reader.
    """
    orders = load_table(spark, sf_dir, "orders")
    # concat, NOT concat_ws: concat_ws SKIPS a NULL field, silently
    # shifting every later field one slot left in the parsed struct
    # (a NULL status would make from_csv read cents as status and the
    # year as cents). concat propagates the NULL so a record missing
    # any field yields a NULL line and a NULL-parsed struct instead.
    line = F.concat(
        F.col("o_orderstatus"),
        F.lit(","),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.lit(","),
        F.year("o_orderdate").cast("string"),
    )
    parsed = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.from_csv(
            line, F.lit("status string, cents bigint, yr int")
        ).alias("rec"),
    )
    return parsed.select(
        "orderkey",
        F.col("rec.status").alias("status"),
        F.col("rec.cents").alias("cents"),
        F.col("rec.yr").alias("yr"),
    )

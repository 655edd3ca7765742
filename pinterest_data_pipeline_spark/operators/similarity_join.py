"""EXACT similarity joins — the deterministic companions to the
approximate LSH family (operators/dedup.py, similarity.py): when the
contract is "every qualifying pair, provably", approximation is not an
option, and the scale question becomes candidate generation.

Two classic algorithms, both content-derived (no block-key assumption,
unlike the (p_type, p_size)-blocked `levenshtein_similar_names`):

- FastSS deletion neighborhoods (Bocek et al., 2007): two strings are
  at edit distance ≤ 1 iff they share a member of their 1-deletion
  neighborhoods (the string itself + each single-character deletion),
  so one equi-join on variant keys finds EXACTLY the ED ≤ 1 pairs —
  Σ(len+1) variant rows instead of an n² distance matrix.
- Prefix-filter set-similarity join (Chaudhuri/SSJoin 2006, PPJoin
  Xiao et al. 2008): under a global token order (rarest first), two
  sets with Jaccard ≥ τ MUST share a token within each set's first
  |X| − ⌈τ|X|⌉ + 1 tokens, so candidates come from a join on prefix
  tokens only; exact verification follows.

Exactness discipline: thresholds are RATIONALS (num/den) so the verify
predicate is a pure integer comparison (den·|A∩B| ≥ num·|A∪B|) — no
float ever decides membership; edit distances are integers both
engines compute identically (`levenshtein`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.dedup import (
    cap_bucket_size,
    cap_drop_report,
)

TOKEN_RE = "[a-z0-9]+"


def edit_distance_one_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All unordered pairs at Levenshtein distance ≤ 1, exactly, via
    FastSS 1-deletion neighborhoods. Returns
    (key_a, key_b, name_a, name_b, ed) with key_a < key_b, ordered by
    the keys. ed ∈ {0, 1} (0 = identical strings — the exact-duplicate
    subfamily rides along for free).

    Completeness: equal strings share their i=0 variant; a substitution
    at position i shares the delete-i variant; an insertion/deletion
    shares the variant that deletes the extra character. So the variant
    equi-join loses nothing, and `levenshtein ≤ 1` removes the false
    candidates (two deletions from different strings CAN collide).

    Uniqueness (why there is NO pair-level distinct): with the variant
    relation distinct per (id, value), an UNEQUAL pair at Levenshtein
    distance 1 shares EXACTLY ONE variant value — a substitution at p
    shares only delete-p, an insertion/deletion shares only the shorter
    string itself (verified exhaustively over a 2-char alphabet to
    length 4 plus 200k randomized single-edit pairs, and pinned by the
    brute-force property test). Equal pairs share every variant, so
    they are carved out into their own name-equality equi-join and the
    variant join takes only ``name_a != name_b`` rows. Each true pair
    is therefore emitted exactly once by construction; only false
    candidates (distance-2 collisions) can repeat, and the levenshtein
    verify drops them. The previous formulation's pair-level
    ``.distinct()`` shuffled the ENTIRE candidate stream — a 21.8e9-row
    total candidate relation at the ×100 stress point (sum of g² over
    variant groups × 100², computed exactly; PERF.md), of which ~4e9
    rows had already shuffled with >52 GB of spill when the run was
    killed — the kind of shuffle that dies at 100 TB — and is gone.

    Scale: Σ(len+1) variant rows (the corpus character volume) through
    ONE equi-join shuffle on the variant key — no n² block, no block-key
    assumption; the verify runs only on candidates with no
    candidate-sized exchange (the returned plan's final
    ``orderBy(key_a, key_b)`` is an OUTPUT-sized range exchange, which
    ``count()``-based stress measurement eliminates and a real
    materialization would pay). Skewed keys are the hot spot in BOTH
    joins — a common short name makes one variant key quadratic in its
    group size, and a heavily duplicated name does the same to the
    name-equality join. ``max_bucket_size`` bounds both the same way
    the LSH family does (:func:`~pinterest_data_pipeline_spark.
    operators.dedup.cap_bucket_size`): each oversized variant bucket
    and each oversized equal-name group keeps its ``max_bucket_size``
    smallest-id members and trims the rest, so recall DEGRADES (min-id
    survivors still meet) instead of the job dying; trimmed volume is
    queryable via :func:`edit_distance_one_trim_report` — no silent
    caps. The retention is replayable by an oracle as
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY id) <= cap``, and
    each rank window shuffles on the same key its join shuffles on."""
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError(
            f"max_bucket_size must be >= 2 (a pair needs two rows in a "
            f"bucket), got {max_bucket_size}"
        )
    base = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name")
    )
    variants = _deletion_variants(base)
    eq_base = base
    if max_bucket_size is not None:
        variants = cap_bucket_size(variants, ["__v"], max_bucket_size)
        eq_base = cap_bucket_size(base, ["__name"], max_bucket_size)
    # Materialize each (possibly capped) relation ONCE: both self-joins
    # below consume their relation on BOTH sides, and without the
    # barrier the explode + distinct + rank-window subtree executed
    # twice per join (the plan showed two full scan→Generate→
    # HashAggregate→Window chains). The variant relation is exactly the
    # FastSS deletion-neighborhood index — building it once is the
    # algorithm's own contract; its size is Σ(len+1) rows, the same
    # volume the join shuffle already pays.
    # eager=False: lineage truncation and single-compute (block-lock)
    # are unchanged; the materializing count jobs fold into the first
    # consuming action, and explain-only flows no longer execute the
    # index build just to print a plan.
    variants = variants.localCheckpoint(eager=False)
    eq_base = eq_base.localCheckpoint(eager=False)
    eq = (
        eq_base.select(
            F.col("__id").alias("key_a"), F.col("__name").alias("name_a")
        )
        .join(
            eq_base.select(
                F.col("__id").alias("key_b"),
                F.col("__name").alias("name_b"),
            ),
            F.col("name_a") == F.col("name_b"),
        )
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b", "name_a", "name_b", F.lit(0).alias("ed")
        )
    )
    a = variants.select(
        F.col("__id").alias("key_a"),
        F.col("__name").alias("name_a"),
        "__v",
    )
    b = variants.select(
        F.col("__id").alias("key_b"),
        F.col("__name").alias("name_b"),
        "__v",
    )
    ne = (
        a.join(b, "__v")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.col("name_a") != F.col("name_b"))
        .select("key_a", "key_b", "name_a", "name_b")
        .withColumn("ed", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("ed") <= 1)
    )
    # Output-sized barrier before the sort: both union branches are
    # broadcast joins, so the range exchange's bound sampling would
    # re-execute them (including the levenshtein verify) a second time.
    return (
        eq.unionByName(ne)
        .localCheckpoint(eager=False)
        .orderBy("key_a", "key_b")
    )


def _deletion_variants(base: DataFrame) -> DataFrame:
    """FastSS 1-deletion neighborhood relation: one row per distinct
    (__id, __name, __v) where __v ranges over the string itself (i=0)
    plus each single-character deletion. ``fan_out`` first: the explode
    multiplies each row ~len(name)× and the distinct's partial
    aggregate runs in the scan stage, so a single-row-group input would
    otherwise serialize the whole neighborhood build into one task."""
    from pinterest_data_pipeline_spark.operators.parallel import fan_out

    return fan_out(base).select(
        "__id",
        "__name",
        F.explode(
            F.expr(
                "transform(sequence(0, length(__name)), i -> "
                "CASE WHEN i = 0 THEN __name "
                "ELSE concat(substring(__name, 1, i - 1), "
                "substring(__name, i + 1)) END)"
            )
        ).alias("__v"),
    ).distinct()


def edit_distance_one_trim_report(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """Queryable audit of what :func:`edit_distance_one_pairs` trims at
    ``max_bucket_size`` — "no silent caps". One row per capped join,
    labeled by ``join_side``:

    - ``variant``: the FastSS 1-deletion variant-key equi-join (a hot
      short name's deletion variants);
    - ``name_eq``: the equal-name equi-join (a heavily duplicated
      name).

    Columns per row mirror :func:`~pinterest_data_pipeline_spark.
    operators.dedup.cap_drop_report`: bucket counts, over-cap bucket
    counts, rows, rows trimmed by the min-id retention, and the
    trimmed-row share in integer ppm.

    Scale: one partial-combinable size aggregate per join key (the
    same shuffles the joins pay), each collapsing to a single row."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name")
    )
    var_row = cap_drop_report(
        _deletion_variants(base), ["__v"], max_bucket_size
    ).withColumn("join_side", F.lit("variant"))
    eq_row = cap_drop_report(
        base, ["__name"], max_bucket_size
    ).withColumn("join_side", F.lit("name_eq"))
    cols = [
        "join_side",
        "n_buckets",
        "n_buckets_capped",
        "n_rows",
        "n_rows_trimmed",
        "trimmed_rows_ppm",
    ]
    return var_row.select(*cols).unionByName(eq_row.select(*cols))


def _shingle_sets(
    df: DataFrame, id_col: str, text_col: str, k: int, num: int, den: int
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of both prefix-filter joins: the distinct
    (__id, __w) shingle relation (localCheckpointed — every consumer
    reads it once) and the per-doc (__id, __n, __s, __plen) relation
    with __s globally ordered rarest-first and __plen the prefix length
    |X| − ⌈(num/den)·|X|⌉ + 1 in exact integers."""
    if k < 1:
        raise ValueError(f"shingle_size must be >= 1, got {k}")
    toked = df.select(
        F.col(id_col).alias("__id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
        ).alias("__toks"),
    )
    if k == 1:
        words = F.explode("__toks")
    else:
        # pre-filter short docs: Spark's sequence(1, n) DESCENDS for
        # n < 1, which would emit garbage slices instead of nothing
        toked = toked.filter(F.size("__toks") >= k)
        words = F.explode(
            F.expr(
                f"transform(sequence(1, size(__toks) - {k - 1}), "
                f"i -> concat_ws(' ', slice(__toks, i, {k})))"
            )
        )
    toks = toked.select("__id", words.alias("__w")).distinct()
    toks = toks.localCheckpoint(eager=False)
    freq = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__f"))
    sets = (
        toks.join(freq, "__w")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__f", "__w"))
            ).alias("__ordered"),
            F.count(F.lit(1)).cast("bigint").alias("__n"),
        )
        .select(
            "__id",
            "__n",
            F.expr("transform(__ordered, x -> x.__w)").alias("__s"),
        )
    )
    plen = (
        F.col("__n")
        - F.expr(f"({num} * __n + {den} - 1) div {den}")
        + 1
    )
    sets = sets.withColumn("__plen", plen.cast("int")).localCheckpoint(
        eager=False
    )
    return toks, sets


def jaccard_exact_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_size: int = 3,
    max_posting_size: int | None = None,
) -> DataFrame:
    """All unordered document pairs whose SHINGLE-SET Jaccard
    similarity is ≥ num/den, exactly, via prefix filtering. Returns
    (id_a, id_b, n_inter, n_union, jaccard_r6) with id_a < id_b,
    ordered by the ids.

    ``shingle_size`` is the set element: ``k`` consecutive tokens
    joined by a space (1 = raw tokens). Shingles matter: set-similarity
    over a LOW-CARDINALITY universe is degenerate — on this synthetic
    corpus the word vocabulary is 31 tokens, so every document
    resembles every other and both the candidate relation AND the true
    answer are quadratic (measured: 1.6e9 candidates at ×30). Word
    k-shingles lift the universe to |vocab|^k-scale (16k+ observed),
    exactly why the MinHash family shingles too. Documents with fewer
    than ``shingle_size`` tokens have an empty set and never pair.

    The global token order is (corpus frequency ASC, token ASC) —
    rarest first, the order that makes prefixes selective. Prefix
    length is |X| − ⌈τ·|X|⌉ + 1 computed in INTEGERS
    (⌈n·s/d⌉ = (n·s + d − 1) div d), and the verify predicate is
    den·|A∩B| ≥ num·|A∪B| — membership is never decided by a float.

    The candidate join applies PPJoin's two extra integer filters ON
    the join (both provably lossless — the earliest common token of a
    qualifying pair passes them):

    - LENGTH: J ≥ τ forces den·|A| ≥ num·|B| and vice versa.
    - POSITIONAL: sharing a token at (1-based) positions p_a/p_b of
      the globally-ordered lists bounds the overlap by
      min(|A|−p_a, |B|−p_b) + 1, which must reach the equivalent
      overlap threshold α = ⌈τ(|A|+|B|)/(1+τ)⌉.

    Without them a low-vocabulary corpus (prefix tokens shared by
    thousands of documents) explodes the candidate relation far past
    the output — measured as a stuck ×30 stress stage before the
    filters landed.

    Scale: one token-frequency aggregate (broadcast back), one sorted
    per-doc collect, candidates from the prefix-token equi-join only
    (the higher τ, the shorter the prefix), exact set intersection on
    candidates. Against an all-duplicated corpus the output itself is
    quadratic — time tracking output is the correct asymptotic (the
    winnowing precedent). ``max_posting_size`` is the skew guard (the
    edit_distance_one_pairs / LSH contract): each prefix-token posting
    group keeps only its ``max_posting_size`` smallest-id rows in the
    CANDIDATE join — a degenerate boilerplate shingle that survives
    into prefixes can no longer make one join key quadratic. Emitted
    pairs stay EXACT (verification always runs on the full sets); only
    recall degrades, min-id survivors keep every hot cluster
    detectable, and trim volume is queryable via
    :func:`jaccard_trim_report`. Verify-join strategy is deliberately
    AQE's (PERF.md "Verify-join strategy study"); driver-heap sizing
    for the broadcast it may pick lives in README "Deployment
    thresholds (verify-join broadcast)"."""
    toks, sets = _shingle_sets(
        df, id_col, text_col, shingle_size, threshold_num, threshold_den
    )
    pre = sets.select(
        "__id",
        "__n",
        F.posexplode(F.expr("slice(__s, 1, __plen)")).alias(
            "__p0", "__w"
        ),
    ).select(
        "__id", "__n", (F.col("__p0") + 1).alias("__p"), "__w"
    )
    if max_posting_size is not None:
        pre = cap_bucket_size(pre, ["__w"], max_posting_size)
    pa = pre.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        F.col("__p").alias("__pa"),
        "__w",
    )
    pb = pre.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.col("__p").alias("__pb"),
        "__w",
    )
    num, den = threshold_num, threshold_den
    alpha = F.expr(
        f"({num} * (__na + __nb) + {num + den} - 1) div {num + den}"
    )
    cand = (
        pa.join(pb, "__w")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.lit(den) * F.col("__na") >= F.lit(num) * F.col("__nb"))
            & (F.lit(den) * F.col("__nb") >= F.lit(num) * F.col("__na"))
        )
        .filter(
            F.least(
                F.col("__na") - F.col("__pa"),
                F.col("__nb") - F.col("__pb"),
            )
            + 1
            >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
        F.col("__n").alias("__na"),
    )
    sb = sets.select(
        F.col("__id").alias("id_b"),
        F.col("__s").alias("__sb"),
        F.col("__n").alias("__nb"),
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", inter)
        .withColumn(
            "n_union", F.col("__na") + F.col("__nb") - F.col("n_inter")
        )
        .filter(
            F.lit(threshold_den) * F.col("n_inter")
            >= F.lit(threshold_num) * F.col("n_union")
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            F.round(
                F.col("n_inter").cast("double")
                / F.col("n_union").cast("double"),
                6,
            ).alias("jaccard_r6"),
        )
    )
    # Materialize the (output-sized) verified relation before the final
    # sort: the range exchange's bound-sampling pass otherwise
    # RE-EXECUTES the whole verify subtree — the candidate probe and
    # the exact array_intersect run twice per query because every join
    # above the candidate shuffle is a broadcast, so there is no
    # materialized stage for the sampler to read (measured: the sort
    # doubled the verify cost at sf0.1; output was 256 rows).
    return verified.localCheckpoint(eager=False).orderBy("id_a", "id_b")


def containment_exact_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
    shingle_size: int = 3,
    max_posting_size: int | None = None,
) -> DataFrame:
    """All ORDERED pairs (a, b) where a's shingle set is ≥ num/den
    CONTAINED in b's (|A∩B| ≥ τ·|A|, a ≠ b) — the asymmetric
    "document a is mostly inside document b" detector behind quote /
    excerpt / superset-page analysis, where symmetric Jaccard goes
    blind (a 10-shingle quote inside a 1000-shingle page has Jaccard
    ≈ 0.01 but containment 1.0). Returns
    (id_a, id_b, n_a, n_b, n_inter, containment_r6) ordered by the ids.

    Candidate generation is the containment variant of prefix
    filtering: only the PROBE side (a) is cut to its prefix
    (|A| − ⌈τ|A|⌉ + 1 rarest shingles — if fewer than that many of A's
    shingles hit B, containment cannot reach τ), joined against the
    FULL posting list of every other document; no length filter exists
    (b may legitimately be much larger). Verification is the integer
    predicate den·|A∩B| ≥ num·|A|.

    Scale: candidates = Σ over a's prefix shingles of their posting
    lists — the rare-shingle postings bound the work; the exact
    intersection runs on candidates only. Self-pairs are excluded;
    both directions of a near-equal pair can legitimately appear.
    ``max_posting_size`` is the skew guard on BOTH candidate-join sides
    (probe prefixes and full posting lists — the posting side is the
    hot spot here, since b-side lists are uncut by design): min-id
    retention per shingle, emitted pairs stay exact, recall degrades,
    trim volume queryable via :func:`containment_trim_report`.
    Verify-join strategy is deliberately AQE's (PERF.md "Verify-join
    strategy study"); driver-heap sizing for the broadcast it may pick
    lives in README "Deployment thresholds (verify-join broadcast)"."""
    num, den = threshold_num, threshold_den
    toks, sets = _shingle_sets(
        df, id_col, text_col, shingle_size, num, den
    )
    pre_a = sets.select(
        F.col("__id").alias("id_a"),
        F.explode(F.expr("slice(__s, 1, __plen)")).alias("__w"),
    )
    post_b = toks
    if max_posting_size is not None:
        pre_a = cap_bucket_size(
            pre_a, ["__w"], max_posting_size, id_col="id_a"
        )
        post_b = cap_bucket_size(post_b, ["__w"], max_posting_size)
    cand = (
        pre_a.join(
            post_b.select(F.col("__id").alias("id_b"), "__w"), "__w"
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
        F.col("__n").alias("n_a"),
    )
    sb = sets.select(
        F.col("__id").alias("id_b"),
        F.col("__s").alias("__sb"),
        F.col("__n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", inter)
        .filter(
            F.lit(den) * F.col("n_inter") >= F.lit(num) * F.col("n_a")
        )
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(
                F.col("n_inter").cast("double")
                / F.col("n_a").cast("double"),
                6,
            ).alias("containment_r6"),
        )
    )
    # Same barrier as jaccard_exact_join: without it the final sort's
    # range-bound sampling re-executes the broadcast-only verify
    # subtree (exact intersections run twice per query).
    return verified.localCheckpoint(eager=False).orderBy("id_a", "id_b")


def jaccard_trim_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_size: int = 3,
    max_posting_size: int = 64,
) -> DataFrame:
    """One-row audit of what :func:`jaccard_exact_join` trims at
    ``max_posting_size`` — the prefix-token posting groups that exceed
    the cap, and the rows min-id retention removes. "No silent caps":
    the companion that prices the recall degradation as a queryable
    number. Columns mirror :func:`~pinterest_data_pipeline_spark.
    operators.dedup.cap_drop_report` plus the ``join_side`` label.

    Scale: the same shingle pipeline as the join up to the prefix
    relation, then one partial-combinable size aggregate."""
    _, sets = _shingle_sets(
        df, id_col, text_col, shingle_size, threshold_num, threshold_den
    )
    pre = sets.select(
        "__id", F.explode(F.expr("slice(__s, 1, __plen)")).alias("__w")
    )
    return cap_drop_report(pre, ["__w"], max_posting_size).withColumn(
        "join_side", F.lit("prefix")
    )


def containment_trim_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
    shingle_size: int = 3,
    max_posting_size: int = 64,
) -> DataFrame:
    """Two-row audit of what :func:`containment_exact_join` trims at
    ``max_posting_size``, labeled by ``join_side``: ``probe_prefix``
    (a's rarest-shingle prefixes) and ``posting`` (the FULL b-side
    posting lists — the hot spot, uncut by design in the exact join).
    Columns mirror :func:`~pinterest_data_pipeline_spark.operators.
    dedup.cap_drop_report`."""
    toks, sets = _shingle_sets(
        df, id_col, text_col, shingle_size, threshold_num, threshold_den
    )
    pre_a = sets.select(
        "__id", F.explode(F.expr("slice(__s, 1, __plen)")).alias("__w")
    )
    cols = [
        "join_side",
        "n_buckets",
        "n_buckets_capped",
        "n_rows",
        "n_rows_trimmed",
        "trimmed_rows_ppm",
    ]
    probe = cap_drop_report(pre_a, ["__w"], max_posting_size).withColumn(
        "join_side", F.lit("probe_prefix")
    )
    post = cap_drop_report(toks, ["__w"], max_posting_size).withColumn(
        "join_side", F.lit("posting")
    )
    return probe.select(*cols).unionByName(post.select(*cols))

"""Information-theoretic corpus audits — the distribution-level
readouts a mixture build runs per ingest, beside the KL drift gate
(`unigram_kl_by_source`):

- :func:`js_divergence_by_group`: Jensen-Shannon divergence of each
  group's unigram distribution from the pooled corpus distribution —
  the SYMMETRIC, BOUNDED (≤ ln 2) companion to KL. KL(P_s‖P) explodes
  when a source has near-zero mass on a corpus-heavy term and cannot
  rank "how far" beyond that; JSD stays finite and comparable across
  sources, which is what a mixture dashboard actually plots.
- :func:`mutual_information_categorical`: exact mutual information
  (and normalized MI) between two categorical columns — the
  feature-leakage audit ("does `source` give away `lang`?") and the
  feature-selection number over any pair of low-cardinality columns.

Exactness discipline: every probability is a ratio of BIGINT counts
computed in one grouped aggregate; the log terms are summed as doubles
and rounded to 6 decimals (the `unigram_kl_by_source` precedent — the
magnitudes involved keep order-dependent double error far below 1e-6,
re-verified by the two-SF strict-mirror parity tests).

Absent-term folding (what keeps JSD join-sized, not vocab×groups-sized):
for a term t absent from group s, p = 0, so the p·ln(p/m) term vanishes
and m = q/2 makes the q·ln(q/m) term exactly q·ln 2. Those terms
therefore NEVER need rows — with Q_s = Σ_{t∈s} q_t the corpus mass of
the terms the group does have,

    JSD_s = ½·Σ_{t∈s} [p·ln(p/m) + q·ln(q/m)] + ½·ln 2·(1 − Q_s)

runs entirely on the (group, term) relation the grouped count already
produced. No |vocab| × |groups| expansion exists at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LN2 = math.log(2.0)


def js_divergence_by_group(
    toks: DataFrame,
    group_col: str,
    term_col: str,
) -> DataFrame:
    """Per-group Jensen-Shannon divergence vs the pooled corpus over an
    already-exploded token relation (one row per token OCCURRENCE).
    Returns one row per group:

        (group_col, n_terms, n_tokens, jsd_nats_r6, jsd_norm_r6)

    ``n_terms`` is the group's distinct-term count, ``n_tokens`` its
    occurrence total, ``jsd_norm_r6`` = JSD/ln 2 ∈ [0, 1] (1 = disjoint
    vocabularies). The corpus distribution POOLS ALL GROUPS (including
    the group under audit — the standard drift-dashboard convention;
    a leave-one-out variant is the same algebra with cc − c).

    Scale: one (group, term) grouped count feeds everything — corpus
    marginals (shuffle on term), per-group totals and the grand total
    (broadcast: |groups| rows / 1 row). The JSD fold runs on the
    (group, term) relation only; absent-term mass folds in closed form
    (see module docstring). Same shape as `unigram_kl_by_source`."""
    g, t = group_col, term_col
    sc = toks.groupBy(g, t).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    # one tokenize pass, guaranteed: four consumers read this relation
    # (corpus marginal, group totals, grand total, the scored join) —
    # materialize it once instead of trusting runtime exchange reuse
    # (the jaccard_exact_join / burrows_delta discipline)
    sc = sc.localCheckpoint(eager=False)
    corpus = sc.groupBy(t).agg(F.sum("__c").cast("bigint").alias("__cc"))
    tot = sc.groupBy(g).agg(F.sum("__c").cast("bigint").alias("__ns"))
    nn = corpus.agg(F.sum("__cc").cast("bigint").alias("__nn"))
    p = F.col("__c").cast("double") / F.col("__ns").cast("double")
    q = F.col("__cc").cast("double") / F.col("__nn").cast("double")
    m = (p + q) / F.lit(2.0)
    present = p * F.log(p / m) + q * F.log(q / m)
    scored = (
        sc.join(corpus, t)
        .join(F.broadcast(tot), g)
        .crossJoin(F.broadcast(nn))
        .groupBy(g)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.max("__ns").cast("bigint").alias("n_tokens"),
            F.sum(present).alias("__present"),
            F.sum(q).alias("__q_mass"),
        )
    )
    jsd = (
        F.lit(0.5) * F.col("__present")
        + F.lit(0.5 * LN2) * (F.lit(1.0) - F.col("__q_mass"))
    )
    return scored.select(
        g,
        "n_terms",
        "n_tokens",
        F.round(jsd, 6).alias("jsd_nats_r6"),
        F.round(jsd / F.lit(LN2), 6).alias("jsd_norm_r6"),
    ).orderBy(g)


def mutual_information_categorical(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """ONE-row exact mutual information between two categorical
    columns:

        (n_rows, n_x_values, n_y_values, n_cells,
         h_x_r6, h_y_r6, mi_nats_r6, nmi_r6)

    MI = Σ_cells (n_xy/N)·ln(n_xy·N / (n_x·n_y)); entropies from the
    marginals; NMI = MI / sqrt(H(x)·H(y)) (NULL when either entropy is
    zero — a constant column carries no information to normalize by).
    NULL category values form their own class, matching the
    privacy-audit convention — they are coalesced to the '__NULL__'
    sentinel BEFORE grouping, because the marginal joins and the
    distinct counts below would otherwise silently drop NULL-keyed
    cells (equi-joins never match NULL = NULL; count_distinct ignores
    NULLs).

    Scale: ONE grouped count over (x, y) (map-side combine) — marginals,
    entropies and the MI fold all run on the |x|×|y| cell relation,
    which is metadata-sized for any sane categorical pair. No second
    pass over the data exists."""

    def _cat(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("__NULL__"))

    cells = df.groupBy(
        _cat(x_col).alias("__x"), _cat(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__nxy"))
    mx = cells.groupBy("__x").agg(
        F.sum("__nxy").cast("bigint").alias("__nx")
    )
    my = cells.groupBy("__y").agg(
        F.sum("__nxy").cast("bigint").alias("__ny")
    )
    nn = cells.agg(F.sum("__nxy").cast("bigint").alias("__nn"))
    joined = (
        cells.join(F.broadcast(mx), "__x")
        .join(F.broadcast(my), "__y")
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("__nn").cast("double")
    p_xy = F.col("__nxy").cast("double") / nd
    mi_term = p_xy * F.log(
        F.col("__nxy").cast("double")
        * nd
        / (F.col("__nx").cast("double") * F.col("__ny").cast("double"))
    )
    agg = joined.agg(
        F.max("__nn").cast("bigint").alias("n_rows"),
        F.count_distinct(F.col("__x")).cast("bigint").alias("n_x_values"),
        F.count_distinct(F.col("__y")).cast("bigint").alias("n_y_values"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(mi_term).alias("__mi"),
    )

    def _entropy(marg: DataFrame, cnt: str) -> Column:
        # H = ln N − Σ n·ln n / N, exact from the bigint counts
        return (
            marg.crossJoin(F.broadcast(nn))
            .agg(
                F.log(F.max("__nn").cast("double"))
                - F.sum(
                    F.col(cnt).cast("double")
                    * F.log(F.col(cnt).cast("double"))
                )
                / F.max("__nn").cast("double")
            )
            .toDF("__h")
        )

    hx = _entropy(mx, "__nx").select(F.col("__h").alias("__hx"))
    hy = _entropy(my, "__ny").select(F.col("__h").alias("__hy"))
    out = agg.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    nmi = F.when(
        (F.col("__hx") > 0) & (F.col("__hy") > 0),
        F.col("__mi") / F.sqrt(F.col("__hx") * F.col("__hy")),
    )
    return out.select(
        "n_rows",
        "n_x_values",
        "n_y_values",
        "n_cells",
        F.round(F.col("__hx"), 6).alias("h_x_r6"),
        F.round(F.col("__hy"), 6).alias("h_y_r6"),
        F.round(F.col("__mi"), 6).alias("mi_nats_r6"),
        F.round(nmi, 6).alias("nmi_r6"),
    )


def psi_fixed_bins(
    df: DataFrame,
    bin_col: str,
    is_current_col: str,
    n_bins: int,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    slice over PRE-ASSIGNED fixed bins — the industry drift dashboard
    number beside the bounded JSD (PSI's ubiquity in model monitoring
    earns it its own formulation: the 0.1 / 0.25 action thresholds are
    quoted against THIS statistic, not against JSD nats).

    Input: one row per observation with an integer bin id in
    [0, n_bins) (``bin_col``) and a 0/1 current-slice flag
    (``is_current_col``). Rows with a NULL bin or flag are excluded up
    front; an OUT-OF-RANGE bin id is dropped by the spine join — by
    contract the caller's binner clamps into range (the registered
    query's ``least(..., n_bins−1)``), so a row outside it is a binner
    bug, and the slice totals deliberately count only in-range rows so
    the shares still sum to 1. Returns one row per bin id 0..n_bins−1 (ALL bins, including
    empty ones — the smoothed shares below give every bin a defined
    term) plus a TOTAL row (bin_id = −1):

        (bin_id, n_base, n_cur, psi_term_r6)

    where the total row's ``psi_term_r6`` is the PSI itself and its
    counts are the slice totals. Shares are Laplace-smoothed:
    p = (c + 1)/(n + n_bins) on BOTH sides, so empty bins contribute a
    finite, replayable term instead of log(0) — the smoothing is part
    of the statistic's published definition here, stated so the oracle
    replays it exactly.

    Scale: ONE map-side-combinable grouped count over ≤ n_bins keys, a
    broadcast join to the n_bins-row spine, single-row total folds.
    Doubles appear only in the final ln terms over exact-integer
    ratios."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    base = df.select(
        F.col(bin_col).cast("int").alias("__b"),
        F.col(is_current_col).cast("int").alias("__cur"),
    ).filter(F.col("__b").isNotNull() & F.col("__cur").isNotNull())
    counts = base.groupBy("__b").agg(
        F.sum(1 - F.col("__cur")).cast("bigint").alias("__nb"),
        F.sum("__cur").cast("bigint").alias("__nc"),
    )
    spine = (
        base.sparkSession.range(0, int(n_bins))
        .select(F.col("id").cast("int").alias("__b"))
    )
    cells = (
        spine.join(F.broadcast(counts), "__b", "left")
        .select(
            "__b",
            F.coalesce("__nb", F.lit(0)).cast("bigint").alias("n_base"),
            F.coalesce("__nc", F.lit(0)).cast("bigint").alias("n_cur"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n_base").cast("bigint").alias("__tb"),
        F.sum("n_cur").cast("bigint").alias("__tc"),
    )
    k = F.lit(float(n_bins))
    pb = (F.col("n_base").cast("double") + F.lit(1.0)) / (
        F.col("__tb").cast("double") + k
    )
    pc = (F.col("n_cur").cast("double") + F.lit(1.0)) / (
        F.col("__tc").cast("double") + k
    )
    term = (pc - pb) * (F.log(pc) - F.log(pb))
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "__b", "n_base", "n_cur", term.alias("__t")
    )
    per_bin = scored.select(
        F.col("__b").alias("bin_id"),
        "n_base",
        "n_cur",
        F.round("__t", 6).alias("psi_term_r6"),
    )
    total = scored.agg(
        F.lit(-1).alias("bin_id"),
        F.sum("n_base").cast("bigint").alias("n_base"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
        F.round(F.sum("__t"), 6).alias("psi_term_r6"),
    )
    return per_bin.unionByName(total).orderBy("bin_id")

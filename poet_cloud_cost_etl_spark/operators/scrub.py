"""X11: PII scrubbing / text cleaning for training-data curation
(SURVEY §2.11 extension family) — redact emails, URLs, and phone
numbers; strip HTML tags; collapse whitespace.

All patterns are native ``regexp_replace`` chains (scan-stage narrow
maps, whole-stage codegen, no UDF) and deliberately restricted to the
regex subset that means the same thing in Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, alternation — no
lookaround, no backreferences. That keeps the operator oracle-
verifiable and portable to any engine a pipeline might mix in.

Recall/precision trade is the standard one for regex PII passes:
conservative patterns (low false-positive) — a production pass layers
NER models on top via ``mapInPandas`` (see operators/multimodal.py for
the vectorized-escape-hatch pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable Java-regex/RE2 patterns (single-quoted here; keep in sync
# with the oracle twins in oracles.py).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^ \\t\\n]+"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
HTML_TAG_RE = "<[^>]{1,200}>"


def scrub_pii(col: Column) -> Column:
    """Redact emails → ``<EMAIL>``, URLs → ``<URL>``, phone numbers →
    ``<PHONE>`` (order matters: URLs first so a mailto-ish URL isn't
    half-eaten by the email pass)."""
    out = F.regexp_replace(col, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def strip_html(col: Column) -> Column:
    """Drop HTML tags and collapse the leftover whitespace."""
    out = F.regexp_replace(col, HTML_TAG_RE, " ")
    return F.trim(F.regexp_replace(out, "[ \\t]+", " "))


def clean_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The standard cleaning pass: HTML strip → PII scrub."""
    return df.select(
        F.col(id_col),
        scrub_pii(strip_html(F.col(text_col))).alias("clean_text"),
    )


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """X90: k-anonymity audit (Sweeney 2002) over a quasi-identifier
    combination — the structured-data privacy gate that complements
    X11's free-text PII scrub: a row whose QI combo is shared by
    fewer than ``k`` rows is re-identifiable by linkage even after
    direct identifiers are gone, so a release/training freeze wants
    the census of rare combos BEFORE the data ships.  (The classic
    motivating join: 87% of the US population is unique on
    (zip, birthdate, sex) — rarity of the combo, not any one value,
    is the leak.)

    Output: one row per occupied QI combo — the combo values, its
    row count, and ``anonymous = n >= k``.  The risky slice (rare
    combos) plus the clean slice together are the audit artifact;
    suppression/generalization acts on the risky rows downstream.

    Scale: ONE map-side-combinable hash aggregate over the QI
    columns — combo-bounded output, no window, no join.  Exactly the
    plan a 100-TB release audit wants: the count table IS small
    (bounded by the QI domain product), only the scan is big."""
    return df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) >= int(k)).alias("anonymous"),
    )


def merge_spans(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    gap: int = 0,
    ordered: bool = True,
) -> DataFrame:
    """X122: span coalescing (the gaps-and-islands pattern) — merge
    overlapping or near-adjacent half-open [start, end) character
    spans per document into maximal intervals.  This is the
    primitive between span DETECTION and span ACTION: X66's
    duplicated-substring positions, this module's PII matches, or a
    toxicity tagger all emit overlapping fragments, and the rewrite
    /loss-mask/redaction step needs disjoint maximal regions
    (masking the same bytes twice corrupts offsets; two abutting
    redactions should be one).  ``gap`` merges spans separated by
    at most that many characters (0 = only touching/overlapping).

    Semantics: a span opens a new island iff its start exceeds
    gap + the running maximum end of all earlier spans (ordered by
    (start, end) — the end tie-break makes island numbering
    deterministic under duplicate starts); island id = cumulative
    count of openers.  Empty/inverted spans (end ≤ start) are
    dropped before merging.  All arithmetic integer-exact.

    Output: one row per merged interval — (id, span_start,
    span_end, n_merged), ordered for display when ``ordered``
    (the default).  Pipeline consumers that immediately regroup or
    join the spans (the ExactSubstr rewrite chain) pass
    ``ordered=False``: the display sort is a full range-partitioning
    of the span table whose range-sampling pass re-executes the
    whole detection subtree above it (r10 verdict, What's-wrong #2
    — the unprotected-presentation-sort tax class).

    Scale: ONE shuffle on the document key; both windows (running
    max, cumulative island count) share that partitioning so
    Catalyst plans a single Exchange; the final interval aggregate
    re-uses the same (id, island) key prefix.  Per-doc span counts
    are bounded by text length — no skew beyond document size
    itself."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).filter("e > s")
    w = (
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = Window.partitionBy("id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = base.withColumn(
        "__new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w), F.lit(-(2**62)))
            + F.lit(gap),
            1,
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new").over(wc))
    merged = (
        flagged.groupBy("id", "__island")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .select("id", "span_start", "span_end", "n_merged")
    )
    return merged.orderBy("id", "span_start") if ordered else merged


def pii_cooccurrence_audit(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """r10-queue: PII co-occurrence audit — the X11 scrub patterns ×
    the X90 re-identification question: a document carrying TWO OR
    MORE distinct PII classes (email + phone, email + URL, ...) is a
    linkage record, categorically worse than a lone address, and the
    per-source multi-PII rate is the dial for where a scrub-only
    policy stops being enough (Sweeney 2002's quasi-identifier
    argument applied to free text).

    Output: one row per source — n_docs, per-class hit counts, the
    three pairwise co-occurrence counts, n_any/n_multi, and
    multi_pii_ppm = ppm of docs with ≥2 classes.

    Exactness: flags are `rlike` on the SAME portable regex subset
    X11 pins (Java regex ∩ RE2, kept in sync with the oracle);
    counts are exact integers, the single ppm is integer division.

    Scale: ZERO shuffle to the |sources|-row aggregate — all three
    regex probes evaluate in the scan stage (whole-stage codegen,
    one text pass), the aggregate is map-side combinable."""
    e = F.col(text_col).rlike(EMAIL_RE)
    u = F.col(text_col).rlike(URL_RE)
    p = F.col(text_col).rlike(PHONE_RE)
    k = e.cast("int") + u.cast("int") + p.cast("int")
    flags = df.select(
        F.col(source_col),
        e.alias("__e"),
        u.alias("__u"),
        p.alias("__p"),
        k.alias("__k"),
    )
    cnt = lambda c: F.sum(c.cast("int")).cast("long")  # noqa: E731
    return (
        flags.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            cnt(F.col("__e")).alias("n_email"),
            cnt(F.col("__u")).alias("n_url"),
            cnt(F.col("__p")).alias("n_phone"),
            cnt(F.col("__e") & F.col("__p")).alias("n_email_phone"),
            cnt(F.col("__e") & F.col("__u")).alias("n_email_url"),
            cnt(F.col("__u") & F.col("__p")).alias("n_url_phone"),
            cnt(F.col("__k") >= 1).alias("n_any_pii"),
            cnt(F.col("__k") >= 2).alias("n_multi_pii"),
        )
        .withColumn(
            "multi_pii_ppm",
            F.expr("(1000000 * n_multi_pii) div n_docs").cast("long"),
        )
        .orderBy(source_col)
    )

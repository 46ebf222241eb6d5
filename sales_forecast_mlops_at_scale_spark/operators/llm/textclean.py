"""Text-cleaning operators for a training-data pipeline: PII redaction,
URL/domain statistics, paragraph-level dedup, and benchmark-contamination
checks.

All four are pure column-expression / relational plans (JVM regex +
explode + groupBy — no Python in the hot path), so they inherit
whole-stage codegen and scale with the scan.  Regexes are written in the
RE2-compatible subset (no backreferences, no lookaround) so the DuckDB
oracle twins (`plans/llm_queries`) run the IDENTICAL patterns.

The reference has no text pipeline at all (its documents are sales rows);
these are beyond-reference operators in the LLM-data family
(exact_dedup / minhash / simhash siblings).

The PII/URL/paragraph queries run over the committed ``web_documents``
fixture (the star ``documents`` fixture is a synthetic word salad with no
emails/URLs/newlines — checks over it would be vacuous).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: RE2- and java.util.regex-compatible patterns (keep in sync with the
#: oracle SQL in plans/llm_queries.py).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 -]{6,}[0-9]"
URL_RE = r"https?://[^\s]+"
DOMAIN_RE = r"https?://([^/\s]+)"

WEB_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures_data",
    "web_documents.parquet",
)


def web_documents_fixture(spark: SparkSession) -> DataFrame:
    """200 deterministic docs with paragraphs, emails, phones and URLs."""
    return spark.read.parquet(WEB_FIXTURE_PATH)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails then phone numbers; emit counts + a digest of the
    redacted text (the digest pins the exact redaction output without
    shipping full text downstream).

    Output: ``doc_id, n_emails, n_phones, redacted_digest``.
    Redaction order matters (an email's local part may contain digits);
    emails are replaced first so the phone pass sees no mail addresses.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PHONE_RE), 0)).alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_digest"),
    )


def url_domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain link statistics: how many URLs and distinct documents
    reference each domain.  Output: ``domain, n_urls, n_docs``."""
    urls = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)).alias(
            "url"
        ),
    )
    return (
        urls.select("doc", F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("doc").alias("n_docs"),
        )
    )


def paragraph_dedup_keys(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Paragraph-level exact dedup: split on blank lines, fingerprint each
    normalized paragraph, group by fingerprint.

    Output: ``fingerprint, keep_id (min doc), n_occurrences, n_docs`` —
    the paragraph twin of document exact-dedup (a near-universal training
    -data step: boilerplate paragraphs repeat across pages)."""
    paras = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), r"\n\n")).alias("para"),
    ).select("doc", F.trim(F.col("para")).alias("para"))
    paras = paras.filter(F.length("para") > 0)
    return (
        paras.select("doc", F.md5("para").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc").alias("keep_id"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc").alias("n_docs"),
        )
    )


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Benchmark-contamination scan: for every candidate doc, how many of
    its distinct word ``n``-grams appear anywhere in the benchmark corpus
    (the standard decontamination step before training on scraped data).

    Output: ``doc_id, n_ngrams, n_contaminated, contamination`` (ratio,
    rounded).  The benchmark side collapses to a DISTINCT n-gram set —
    usually small enough to broadcast; the candidate side streams."""
    from .jaccard import shingle_index

    cand = shingle_index(df, text_col, id_col, n=n)
    bench_grams = (
        shingle_index(benchmark, text_col, id_col, n=n).select("s").distinct()
    )
    # One pass over the candidate n-gram explode (optimization r12;
    # guide §2.4): the former per_doc/hits split consumed the expensive
    # `cand` subtree twice and joined two aggregates back together.  A
    # LEFT join against the DISTINCT benchmark grams (no row fan-out)
    # lets one groupBy produce both counts — count(hit) over a left
    # join ≡ the inner-join count, with 0 (not NULL) for clean docs.
    marked = cand.join(
        bench_grams.withColumn("hit", F.lit(1)), "s", "left"
    )
    return marked.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count("hit").alias("n_contaminated"),
    ).select(
        F.col("doc").alias("doc_id"),
        "n_ngrams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated") / F.col("n_ngrams"), ndigits
        ).alias("contamination"),
    )


def domain_quality_rollup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    keep_threshold: float = 0.65,
) -> DataFrame:
    """Per-domain curation statistics (the FineWeb/C4 pattern: quality is
    filtered per document but MONITORED per source domain — a domain
    whose keep-rate collapses signals a crawler or boilerplate problem,
    not 10^5 individually bad documents).

    Joins each document's heuristic quality score to every domain its
    text references (distinct doc×domain pairs) and aggregates:
    ``domain, n_docs, mean_quality, keep_rate``.

    ``mean_quality`` sums the 4-dp quality scores in 10^-4 fixed point
    (integer sum, ONE terminal double division) so the aggregate is
    shuffle-order-independent and the DuckDB twin matches bit-for-bit —
    a float sum's accumulation order is engine-defined.
    """
    from .textstats import text_quality

    pairs = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
            ).alias("url"),
        )
        .select("doc", F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"))
        .distinct()
    )
    quality = text_quality(df, text_col).select(
        F.col(id_col).alias("doc"), "quality_score"
    )
    joined = pairs.join(quality, "doc")
    fixed = F.round(F.col("quality_score") * 10000).cast("long")
    n = F.count(F.lit(1))
    return joined.groupBy("domain").agg(
        n.alias("n_docs"),
        F.round(F.sum(fixed) / (10000.0 * n), 6).alias("mean_quality"),
        F.round(
            F.sum(F.when(F.col("quality_score") >= keep_threshold, 1).otherwise(0))
            .cast("double")
            / n,
            6,
        ).alias("keep_rate"),
    )

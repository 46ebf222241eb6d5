"""Exact deduplication: hash-groupBy on a content fingerprint.

The scale-canonical exact dedup: one shuffle on ``md5(normalized text)``
(128-bit — collision probability negligible at any corpus size), keeping
the lowest id per group.  Shuffling the 32-byte digest instead of the
document text keeps shuffle volume independent of document length; the
kept-id join back to payload columns is a self-equi-join on the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text


def exact_dedup_keys(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct (normalized) text: fingerprint, kept id
    (minimum), duplicate count.  Columns: ``fingerprint, keep_id, n_dups``."""
    return (
        df.select(
            F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: all input columns, duplicates dropped
    (lowest ``id_col`` per fingerprint survives)."""
    keep = exact_dedup_keys(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # broadcast-friendly when the surviving-key set is small; at corpus
    # scale Catalyst plans a shuffled semi-join on the id.
    return df.join(keep, on=id_col, how="left_semi")

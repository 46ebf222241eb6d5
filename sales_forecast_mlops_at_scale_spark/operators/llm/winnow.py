"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
— the rolling-hash fingerprinting scheme behind MOSS.

Pipeline (all Catalyst built-ins, ZERO shuffle — the windows are array
higher-order functions evaluated inside each row):

1. normalize text, enumerate character ``k``-gram hashes as one array
   per document; the hash is an md5 prefix, which both Spark and DuckDB
   compute identically, so fingerprints are oracle-checkable (winnowing
   only needs *some* total order on hashes — lexicographic on hex works)
2. sliding minimum per ``w``-window via ``transform`` + ``slice`` +
   ``array_min`` over the hash array
3. the distinct window-minima are the document's fingerprint set —
   guaranteed to share members for any match of length ≥ ``w + k - 1``

This was first built as posexplode + ``min() over rowsBetween(0, w-1)``;
the per-row HOF form produces the identical set (regression-tested) with
no Sort+Exchange of the ~|text| exploded rows — a pure map at any scale.
At corpus scale swap char-grams for *word* k-grams or pre-truncate docs
to bound the per-row array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text

K_GRAM = 8
WINDOW = 4


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = K_GRAM,
    w: int = WINDOW,
) -> DataFrame:
    """Distinct winnowing fingerprints per document:
    ``(doc_id, fingerprint)`` rows; docs shorter than ``k + w - 1``
    normalized characters produce none.
    """
    norm = df.select(
        F.col(id_col).alias(id_col), normalized_text(F.col(text_col)).alias("norm")
    )
    # staged projections: gram hashes once per row, then the sliding min
    # (see jaccard.py on HOF common-subexpression behavior)
    hashed = norm.select(
        id_col,
        F.expr(
            f"transform(sequence(1, greatest(length(norm) - {k - 1}, 0)),"
            f" p -> substring(md5(substring(norm, p, {k})), 1, 16))"
        ).alias("__ghs"),
    )
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(__ghs) - {w - 1}, 0)),"
            f" i -> array_min(slice(__ghs, i, {w})))"
        )
    )
    return hashed.select(id_col, F.explode(fps).alias("fingerprint"))

"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
— the rolling-hash fingerprinting scheme behind MOSS.

Pipeline (all Catalyst built-ins, one shuffle for the per-doc window):

1. normalize text, enumerate character ``k``-gram positions
   (``posexplode`` over a ``sequence`` — same shape as the shingler)
2. hash each k-gram; the hash here is an md5 prefix, which both Spark and
   DuckDB compute identically, so fingerprints are oracle-checkable
   (winnowing only needs *some* total order on hashes — lexicographic on
   hex works)
3. slide a window of ``w`` consecutive gram hashes per document and keep
   the minimum of each window (``min() over rowsBetween(0, w-1)``)
4. the distinct window-minima are the document's fingerprint set —
   guaranteed to share members for any match of length ≥ ``w + k - 1``

Scale notes: char-gram explosion is ~|text| rows per doc; at corpus scale
run this on *word* k-grams (swap the gram expression) or pre-truncate
docs — the window/min/distinct dataflow is unchanged.  The whole operator
is one Sort+Exchange on (doc, pos); the distinct folds map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
        F.col(id_col).alias("doc"), normalized_text(F.col(text_col)).alias("norm")
    )
    grams = norm.select(
        "doc",
        F.posexplode(
            F.expr(f"transform(sequence(1, greatest(length(norm) - {k - 1}, 0)),"
                   f" p -> substring(norm, p, {k}))")
        ).alias("pos", "gram"),
    ).select("doc", "pos", F.substring(F.md5("gram"), 1, 16).alias("gh"))
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    n_grams = Window.partitionBy("doc")
    return (
        grams.withColumn("__n", F.count(F.lit(1)).over(n_grams))
        .withColumn("fingerprint", F.min("gh").over(win))
        # only full windows: pos 0-based from posexplode → last start = n - w
        .filter(F.col("pos") <= F.col("__n") - w)
        .select(F.col("doc").alias(id_col), "fingerprint")
        .distinct()
    )

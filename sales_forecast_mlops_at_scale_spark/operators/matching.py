"""Fuzzy entity matching: blocked edit-distance pairs.

The entity-resolution primitive — find records whose names are within a
small edit distance — expressed as blocking + verify so it never goes
all-pairs:

1. **block**: records join only within a blocking key (here: name length
   band + shared prefix).  Blocking bounds candidate pairs to
   O(Σ block²) instead of O(N²) — the same shape MinHash banding gives
   text dedup.
2. **verify**: ``levenshtein`` (a JVM built-in) on the candidates only.

At 100 TB the blocking key is the shuffle key; pick it so blocks stay
small (prefix length ↑, length band ↓) exactly like LSH band tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    prefix_len: int = 9,
) -> DataFrame:
    """Pairs (``id_a < id_b``) whose names are within ``max_distance``
    edits, candidates blocked on (prefix, length).  An edit can change
    the length by at most ``max_distance``, and a same-prefix block keeps
    the join selective; a production matcher unions several blocking
    passes (prefix, suffix, phonetic key) to cover prefix-divergent
    typos — one pass is the demonstrable core.

    Output: ``id_a, id_b, name_a, name_b, distance``.
    """
    sides = []
    for tag in ("a", "b"):
        sides.append(
            df.select(
                F.col(id_col).alias(f"id_{tag}"),
                F.col(name_col).alias(f"name_{tag}"),
                F.substring(F.col(name_col), 1, prefix_len).alias(f"pfx_{tag}"),
                F.length(F.col(name_col)).alias(f"len_{tag}"),
            )
        )
    a, b = sides
    cand = a.join(
        b,
        (F.col("pfx_a") == F.col("pfx_b"))
        & (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= max_distance),
    )
    return (
        cand.withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )

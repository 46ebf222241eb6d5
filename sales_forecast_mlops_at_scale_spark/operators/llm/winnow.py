"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
— the rolling-hash fingerprinting scheme behind MOSS.

Pipeline (a pure per-row map — ZERO shuffle at any scale):

1. normalize text, hash every character ``k``-gram with a Karp-Rabin
   polynomial over code points: ``h(p) = fold_j (h·257 + cp[p+j]) mod
   (2^31 - 1)`` — exact int64 arithmetic, so ANY engine reproduces the
   values bit-for-bit (the DuckDB oracle restates the same polynomial
   over ``ascii()`` code points; both engines agree on code-point
   semantics, verified for ASCII and BMP chars)
2. sliding minimum per ``w``-window
3. the distinct window-minima are the document's fingerprint set —
   guaranteed to share members for any match of length ≥ ``w + k - 1``

Execution is an Arrow-batched ``mapInPandas`` kernel: per doc, code
points come from one ``utf-32`` decode (vectorized, no per-char Python),
the rolling hash is ``k`` numpy passes, the sliding min ``w - 1``
``np.minimum`` passes — O(len) with C-speed constants.  Measured at
sf0.1 on local[32]: 0.8 s vs 3.5 s for the best JVM formulation (md5
``k``-gram via ``transform`` — higher-order-function lambdas are
interpreted per element, and a hand-inlined polynomial in the lambda is
4× slower still; this is the documented case where the Arrow kernel
beats every built-in shape).  Earlier shapes, kept for the record:
posexplode + ``min() over rowsBetween`` (Sort+Exchange of ~|text| rows
per doc), then per-row HOF md5 (no shuffle, JVM-bound on ~|text| md5
calls per doc).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .textstats import normalized_text

K_GRAM = 8
WINDOW = 4
#: Karp-Rabin modulus / base — shared verbatim with the SQL oracle.
POLY_MOD = 2_147_483_647
POLY_BASE = 257


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = K_GRAM,
    w: int = WINDOW,
) -> DataFrame:
    """Distinct winnowing fingerprints per document:
    ``(doc_id, fingerprint)`` rows (fingerprint = int64 Karp-Rabin hash);
    docs shorter than ``k + w - 1`` normalized characters produce none.
    """
    from pyspark.sql import functions as F

    norm = df.select(
        F.col(id_col).alias(id_col), normalized_text(F.col(text_col)).alias("norm")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "fingerprint": pd.Series(dtype="int64"),
            }
        )
        for pdf in batches:
            ids, outs = [], []
            for doc_id, s in zip(pdf[id_col], pdf["norm"]):
                if s is None:
                    continue  # NULL text → no fingerprints (the HOF
                    # formulation null-propagated to the same outcome)
                # one decode → the code-point array (matches ascii()
                # semantics on both engines; no per-char Python loop)
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                n = len(cp) - k + 1
                if n < w:
                    continue  # too short for one full window
                h = np.zeros(n, dtype=np.int64)
                for j in range(k):
                    h = (h * POLY_BASE + cp[j : j + n]) % POLY_MOD
                m = h[: n - w + 1].copy()
                for j in range(1, w):
                    np.minimum(m, h[j : j + n - w + 1], out=m)
                fps = np.unique(m)
                ids.append(np.full(len(fps), doc_id, dtype=np.int64))
                outs.append(fps)
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "fingerprint": np.concatenate(outs),
                    }
                )
            else:
                yield empty

    return norm.mapInPandas(kernel, f"{id_col} long, fingerprint long")

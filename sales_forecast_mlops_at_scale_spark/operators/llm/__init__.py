"""LLM-training-data pipeline operators (beyond-reference, BASELINE.json
north star): deduplication, similarity search, text analysis, multimodal
columns — all designed for 100 TB inputs.

Design rules for this package:

- Everything deterministic (seeded hash families, no RNG at runtime) so
  results are oracle-checkable.
- JVM-side built-ins wherever possible; Python appears only in Arrow-batched
  ``mapInPandas`` for the multimodal decode path.
- No driver-side collection of data-sized state: candidate generation is
  always a distributed join (inverted index / LSH band bucket), never a
  broadcast of the corpus.
"""

from .cluster import connected_components
from .curation import (
    cap_per_group,
    curation_decision,
    deterministic_sample,
    pack_shards,
    sample_threshold_hex,
)
from .embedsim import (
    brute_force_topk,
    ivf_topk,
    neardup_pairs,
    semantic_dedup,
    srp_topk,
)
from .exact_dedup import exact_dedup, exact_dedup_keys
from .jaccard import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix, shingles
from .minhash import (
    minhash_incremental_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)
from .simhash import simhash_pairs, simhash_signatures
from .textclean import (
    contamination_check,
    paragraph_dedup_keys,
    pii_redact,
    url_domain_stats,
    web_documents_fixture,
)
from .bpe import bpe_pair_counts, bpe_train, bpe_train_local, token_frequencies
from .cms import cms_heavy_hitters, cms_sketch
from .dupspan import dup_span_coverage, positional_grams
from .retrieval import bm25_topk, exemplar_query_terms, hybrid_rrf
from .sketches import kmv_distinct, kmv_overlap
from .winnow import winnow_fingerprints
from .textstats import (
    language_id,
    normalized_text,
    subtoken_count,
    text_fingerprint,
    text_quality,
    token_count,
)

__all__ = [
    "connected_components",
    "cap_per_group",
    "curation_decision",
    "deterministic_sample",
    "pack_shards",
    "sample_threshold_hex",
    "brute_force_topk",
    "ivf_topk",
    "neardup_pairs",
    "semantic_dedup",
    "srp_topk",
    "exact_dedup",
    "exact_dedup_keys",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "shingles",
    "minhash_incremental_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash_pairs",
    "simhash_signatures",
    "bm25_topk",
    "cms_heavy_hitters",
    "cms_sketch",
    "exemplar_query_terms",
    "hybrid_rrf",
    "kmv_distinct",
    "kmv_overlap",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_train_local",
    "token_frequencies",
    "dup_span_coverage",
    "positional_grams",
    "winnow_fingerprints",
    "contamination_check",
    "paragraph_dedup_keys",
    "pii_redact",
    "url_domain_stats",
    "web_documents_fixture",
    "language_id",
    "normalized_text",
    "subtoken_count",
    "text_fingerprint",
    "text_quality",
    "token_count",
]

"""Training-data pipeline operators over a document corpus.

Not part of the reference's kernel surface (it is a graph library), but
first-class for a 10^12-document web-corpus engine: before links are
extracted and ranked, the corpus itself must be deduplicated, quality-
scored, language-identified and similarity-indexed.  All operators are
DataFrame-native (built-in functions on the hot path; Arrow-vectorized
UDFs only where built-ins can't express the math) and designed to scale
linearly in |docs| — no all-pairs products except behind candidate
generation (LSH banding / bucket joins).
"""

from linkgraph.textops.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    simhash_near_duplicates,
)
from linkgraph.textops.quality import (
    bpe_piece_stats,
    doc_fingerprint,
    encoding_hygiene,
    language_id,
    pii_scan,
    quality_scores,
    token_counts,
)
from linkgraph.textops.ann import (
    cosine_topk,
    embedding_near_duplicates,
    lsh_cosine_topk,
)
from linkgraph.textops.corpus import (
    c4_filters,
    dedup_token_savings,
    host_rollup,
    mixture_plan,
    token_zipf_alpha,
)
from linkgraph.textops.dedup import dedup_clusters, mirror_host_pairs

__all__ = [
    "exact_duplicates",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "simhash_near_duplicates",
    "doc_fingerprint",
    "language_id",
    "quality_scores",
    "token_counts",
    "cosine_topk",
    "embedding_near_duplicates",
    "lsh_cosine_topk",
    "bpe_piece_stats",
    "encoding_hygiene",
    "pii_scan",
    "c4_filters",
    "host_rollup",
    "dedup_clusters",
    "mirror_host_pairs",
    "token_zipf_alpha",
    "mixture_plan",
    "dedup_token_savings",
]

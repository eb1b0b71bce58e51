"""Training-data pipeline operators over document / embedding corpora.

Large-scale curation primitives that the reference engine does not have but a
100 TB web-text pipeline needs alongside the inverted index: near-duplicate
detection (MinHash+LSH, SimHash banding, n-gram Jaccard), embedding
similarity search (brute-force and SRP-LSH-bucketed ANN), text analysis
(language ID, token counting, winnowing fingerprints, corpus-LM quality
scoring), curation gates (URL/domain blocklist, PII stats, Gopher quality +
repetition rules, C4 line dedup, C4 line/page cleaning and ExactSubstr span dedup), multimodal binary column plumbing,
semantic dedup (SemDeDup), and corpus assembly (benchmark decontamination,
deterministic stratified/quota/temperature sampling, DSIR importance
weights, train/val/test hash splits, skew-safe per-domain caps,
concat-then-chunk sequence packing, mixture reports).

Design rule shared by every operator here: all hashing is expressed with
engine-portable primitives (md5 hex strings, integer bit arithmetic) so the
same computation can be replayed by the DuckDB oracle byte-for-byte, and all
hot paths stay JVM-side (built-in ``pyspark.sql.functions`` — no Python UDFs).
"""

from .dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_bands,
    simhash_fingerprints,
    simhash_near_dup,
)
from .similarity import (
    cosine_similarity_col,
    ivf_assign,
    ivf_probe_lists,
    ivf_topk,
    knn_join,
    srp_banded,
    srp_bucketed_pairs,
    srp_probe_buckets,
    semantic_dedup,
    srp_signs,
    train_ivf_centroids,
)
from .multimodal import (
    binary_metadata,
    decode_features,
    repartition_by_bytes,
    resize_images,
    sample_frames,
)
from .curation import (
    bloom_dedup,
    c4_rules,
    dedup_lines,
    dedup_spans,
    gopher_quality,
    gopher_repetition,
    lm_quality,
    pii_stats,
    repetition_stats,
    url_blocklist_filter,
)
from .mixing import (
    decontaminate,
    domain_top_k,
    dsir_weights,
    hash_split,
    mix_report,
    pack_sequences,
    quota_sample,
    weighted_sample,
    stratified_sample,
    temperature_sample,
    word_ngrams,
)
from .pipeline import CurationReport, curate_corpus, quality_gate
from .sketches import cms_estimate, cms_heavy_hitters, cms_sketch, hll_distinct
from .textstats import (
    language_id,
    length_quantiles,
    tfidf_keywords,
    token_counts,
    winnowing_fingerprints,
)

__all__ = [
    "connected_components",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_bands",
    "simhash_near_dup",
    "cosine_similarity_col",
    "knn_join",
    "srp_banded",
    "srp_bucketed_pairs",
    "srp_probe_buckets",
    "srp_signs",
    "train_ivf_centroids",
    "semantic_dedup",
    "ivf_assign",
    "ivf_probe_lists",
    "ivf_topk",
    "language_id",
    "length_quantiles",
    "hll_distinct",
    "cms_sketch",
    "cms_estimate",
    "cms_heavy_hitters",
    "tfidf_keywords",
    "token_counts",
    "winnowing_fingerprints",
    "binary_metadata",
    "decode_features",
    "repartition_by_bytes",
    "resize_images",
    "sample_frames",
    "curate_corpus",
    "quality_gate",
    "CurationReport",
    "c4_rules",
    "decontaminate",
    "bloom_dedup",
    "dedup_lines",
    "dedup_spans",
    "domain_top_k",
    "dsir_weights",
    "gopher_quality",
    "gopher_repetition",
    "hash_split",
    "lm_quality",
    "pii_stats",
    "repetition_stats",
    "url_blocklist_filter",
    "mix_report",
    "pack_sequences",
    "quota_sample",
    "weighted_sample",
    "stratified_sample",
    "temperature_sample",
    "word_ngrams",
]

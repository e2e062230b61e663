from dbt_lakehouse_aws_spark.llmops.text import (
    doc_fingerprint,
    lang_id_scores,
    text_quality,
    word_shingles,
)
from dbt_lakehouse_aws_spark.llmops.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from dbt_lakehouse_aws_spark.llmops.similarity import (
    cosine_topk,
    embedding_norms,
    rp_lsh_buckets,
)

__all__ = [
    "doc_fingerprint",
    "lang_id_scores",
    "text_quality",
    "word_shingles",
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "cosine_topk",
    "embedding_norms",
    "rp_lsh_buckets",
]

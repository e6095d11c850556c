"""Relational + training-data operators (SURVEY.md §2.4-2.7 and the
large-scale pipeline extensions: dedup, similarity search, text analysis)."""

from .relational import (  # noqa: F401
    broadcast_hash_join,
    bucketed_hash_join,
    native_join,
    salted_groupby_sum,
    stratified_sample,
    asof_join,
    semi_join,
    anti_join,
    top_k,
    paginate,
    distinct_sorted,
    pre_aggregate,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_duplicates,
    simhash_buckets,
    ngram_jaccard_pairs,
    embedding_cosine_pairs,
    dup_clusters,
    dedup_keep_representatives,
    repeated_paragraphs,
    strip_repeated_paragraphs,
)
from .textstats import add_text_stats, langid_scores, doc_fingerprint  # noqa: F401
from .similarity import knn_brute_force, knn_lsh, knn_ivf, train_ivf_centroids  # noqa: F401
from .windows import time_bucket_agg, sessionize  # noqa: F401

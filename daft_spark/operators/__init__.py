"""Pipeline operators — the engine's training-data toolkit, one import
surface. Everything here goes BEYOND the reference's kernel functions
(its minhash/simhash/cosine kernels live on the daft_spark.functions
parity surface): full dedup pipelines with resolution, similarity
search, corpus analyses, and selection/packing stages, each designed
keys-only / in-row for the 100 TB posture and each backed by a
registered oracle query (see COVERAGE.md "Training-data pipeline
extensions")."""

from daft_spark.operators.asof_join import join_asof  # noqa: F401
from daft_spark.operators.checkpoint import (  # noqa: F401
    checkpointed_write,
    skip_existing,
)
from daft_spark.operators.cluster import (  # noqa: F401
    connected_components,
    duplicate_clusters,
)
from daft_spark.operators.dedup import (  # noqa: F401
    benchmark_contamination,
    containment_pairs,
    duplicated_span_stats,
    exact_dedup,
    jaccard_pairs,
    minhash_near_dups,
    minhash_signatures,
    near_dup_resolve,
    remove_duplicated_spans,
    simhash_near_dups,
    simhash_signatures,
)
from daft_spark.operators.classifier import (  # noqa: F401
    quality_auc,
    score_quality,
    train_quality_classifier,
)
from daft_spark.operators.dsir import dsir_log_weights, dsir_select  # noqa: F401
from daft_spark.operators.fuzzy import fuzzy_join, fuzzy_pairs  # noqa: F401
from daft_spark.operators.lm import bigram_lm_scores, perplexity_buckets  # noqa: F401
from daft_spark.operators.pca import (  # noqa: F401
    embedding_pca,
    pca_fit,
    pca_transform,
)
from daft_spark.operators.retrieval import bm25_score, bm25_topk  # noqa: F401
from daft_spark.operators.range_join import (  # noqa: F401
    interval_overlap_join,
    point_in_interval_join,
)
from daft_spark.operators.repetition import (  # noqa: F401
    ngram_repetition_fractions,
    top_ngrams,
)
from daft_spark.operators.sampling import (  # noqa: F401
    apply_mixture,
    chunk_text,
    hash_split,
    mixture_weights,
    pack_sequences,
    stratified_sample,
    token_budget_select,
)
from daft_spark.operators.shard import shard  # noqa: F401
from daft_spark.operators.skew import key_skew_report, salted_join  # noqa: F401
from daft_spark.operators.similarity import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    quantize_embeddings,
    embedding_near_dups,
    ivf_assign,
    ivf_train,
    pairs_above_threshold,
    semdedup,
    topk_cosine_bruteforce,
    topk_cosine_ivf,
    topk_cosine_lsh,
    topk_cosine_quantized,
    topk_cosine_quantized_ivf,
)

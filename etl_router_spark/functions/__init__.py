"""Large-scale training-data pipeline operators (SURVEY §7.3 M6).

Beyond the reference's transform surface: deduplication (exact, n-gram
Jaccard, MinHash-LSH, SimHash, embedding-cosine), similarity search
(brute-force and LSH-bucketed ANN), text analysis (tokenize, quality,
language-id, fingerprint) and multimodal binary-column plumbing. All
designed to run at 100 TB: shuffle-once aggregations, no driver
collects, candidate-pair pruning before any quadratic step.
"""

from etl_router_spark.functions.text import (  # noqa: F401
    tokenize,
    text_stats,
    language_id,
    fingerprint,
    shingles,
)
from etl_router_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    embedding_cosine_pairs,
)
from etl_router_spark.functions.similarity import (  # noqa: F401
    cosine_expr,
    brute_force_topk,
    lsh_bucketed_topk,
)
from etl_router_spark.functions.corpus import (  # noqa: F401
    contaminated_ids,
    decontaminate,
    hash_sample,
    pack_sequences,
)

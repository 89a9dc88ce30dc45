from tl_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from tl_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    lsh_bucket_candidates,
)

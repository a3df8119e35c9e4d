"""Large-scale training-data operators over ray.data Datasets:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding), similarity search (brute-force + IVF), text analysis
(token stats, quality, language id, fingerprints), multimodal plumbing.
"""

from .dedup import (exact_dedup, near_dup_text_groups, minhash_lsh_pairs,
                    simhash_pairs, embedding_neardup_pairs)  # noqa: F401
from .similarity import cosine_topk, ivf_topk  # noqa: F401
from .textops import token_counts, quality_scores, langid, fingerprints  # noqa: F401

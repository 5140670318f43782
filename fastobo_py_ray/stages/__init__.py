"""Pipeline stages (each a batch transform or actor-pool callable)."""

from .ann import LshBucketer, brute_force_topk, lsh_topk
from .canonicalize import (apply_representatives_batch, compact_ids_batch,
                           connected_components, decompact_ids_batch,
                           representatives_from_labels, union_find)
from .dedup import (MinHasher, embedding_near_dup,
                    embedding_near_dup_lsh, exact_dedup, jaccard,
                    minhash_candidate_pairs, minhash_dedup,
                    minhash_signature, ngram_jaccard_pairs, shingles,
                    simhash64)
from .extract import extract_text, extract_text_batch
from .graph import (ancestors, descendants, descendants_ds, is_dag,
                    isa_edges)
from .mentions import (OntologyIndex, PageAnnotator, annotate_page,
                       build_index, detect, link, make_page_annotator)
from .multimodal import (AudioFrameSampler, ImageFeatures,
                         VideoFrameSampler, byte_entropy,
                         byte_histogram, fake_decode_image, resize_nearest,
                         synth_media_table)
from .textstats import (LangId, content_hash_batch, fingerprint_batch,
                        quality_score_batch, token_stats_batch)

__all__ = [
    "brute_force_topk", "lsh_topk", "LshBucketer",
    "union_find", "connected_components", "representatives_from_labels",
    "apply_representatives_batch", "compact_ids_batch",
    "decompact_ids_batch",
    "exact_dedup", "minhash_dedup", "minhash_candidate_pairs", "MinHasher",
    "minhash_signature", "simhash64", "jaccard", "shingles",
    "ngram_jaccard_pairs", "embedding_near_dup", "embedding_near_dup_lsh",
    "extract_text", "extract_text_batch",
    "isa_edges", "is_dag", "descendants", "ancestors", "descendants_ds",
    "OntologyIndex", "build_index", "detect", "link", "annotate_page",
    "make_page_annotator", "PageAnnotator",
    "ImageFeatures", "AudioFrameSampler", "VideoFrameSampler",
    "byte_histogram", "byte_entropy",
    "fake_decode_image", "resize_nearest", "synth_media_table",
    "LangId", "token_stats_batch", "quality_score_batch",
    "fingerprint_batch", "content_hash_batch",
]

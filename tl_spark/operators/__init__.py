from tl_spark.operators.media_info import (  # noqa: F401
    image_header_info,
    media_payload_info,
    media_stream_info,
)
from tl_spark.operators.mp4 import (  # noqa: F401
    mp4_bytes,
    mp4_stream_info,
    synth_mp4_media,
    video_stream_info,
)
from tl_spark.operators.mp3 import (  # noqa: F401
    audio_stream_info,
    mp3_frame_bytes,
    mp3_stream_info,
    synth_mp3_media,
)
from tl_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_contamination,
    ngram_jaccard_pairs,
    simhash_cap_report,
    simhash_neardup_pairs,
    simhash_signatures,
)
from tl_spark.operators.similarity import (  # noqa: F401
    build_ivf_index,
    cosine_topk_bruteforce,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_bucket_candidates,
)
from tl_spark.operators.multimodal import (  # noqa: F401
    attach_media_meta,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
    synth_media,
    synth_ppm_media,
    synth_wav_media,
)
from tl_spark.operators.bpe import (  # noqa: F401
    bpe_apply_word,
    bpe_encode,
    train_bpe,
)
from tl_spark.operators.jpeg import (  # noqa: F401
    jpeg_bytes,
    jpeg_bytes_progressive,
    jpeg_decode,
    jpeg_decode_coefficients,
)
from tl_spark.operators.retrieval import (  # noqa: F401
    bm25_scores,
    bm25_topk,
)
from tl_spark.operators.graph import (  # noqa: F401
    connected_components,
    neardup_clusters,
)
from tl_spark.operators.dedup_index import (  # noqa: F401
    incremental_neardup,
    write_minhash_index,
)
from tl_spark.operators.winnow import (  # noqa: F401
    substring_overlap_pairs,
    winnow_fingerprints,
)
from tl_spark.operators.archives import (  # noqa: F401
    expand_archives,
    iter_archive_members,
)
from tl_spark.operators.urls import (  # noqa: F401
    cap_per_domain,
    domain_stats,
    url_host,
)
from tl_spark.operators.embed import hashed_embedding  # noqa: F401

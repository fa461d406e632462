from .candidates import candidate_pairs  # noqa: F401
from .dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    minhash_index_append,
    minhash_index_compact,
    minhash_index_lookup,
    minhash_index_write,
    minhash_lsh_pairs,
    minhash_lsh_pairs_eager,
    minhash_signatures,
    simhash,
    simhash_neardup_pairs,
)
from .job import JobHandle, JobState, Stage, start_job, start_map_reduce_job  # noqa: F401
from .merge import latest_wins, merge_upsert  # noqa: F401
from .map_reduce import MapReduceClient, map_reduce, run_map_reduce  # noqa: F401
from .multimodal import (  # noqa: F401
    attach_payload,
    decode_image,
    fake_decode_image,
    fake_image_features,
    metadata_stats,
    resize_images,
    resize_nearest,
    sample_frames,
)
from .pq import (  # noqa: F401
    ivfpq_search_batch,
    load_codebooks,
    pq_append,
    pq_append_residual,
    pq_encode,
    pq_encode_residual,
    pq_search_batch,
    pq_train,
    pq_train_residual,
    pq_write,
    save_codebooks,
)
from .similarity import (  # noqa: F401
    ivf_append,
    ivf_assign,
    ivf_index,
    ivf_index_compact,
    ivf_range_search_batch,
    ivf_search,
    ivf_search_batch,
    ivf_search_batch_indexed,
    ivf_search_indexed,
    ivf_write,
    kmeans_lloyd,
    range_search_batch,
    load_centroids,
    save_centroids,
    round_half_away,
    topk_to_query_batch,
    train_centroids_sample,
    lsh_bucketed_topk,
    lsh_bucket_assign,
    lsh_search_batch,
    lsh_search_batch_indexed,
    threshold_pairs,
    topk_pairs,
    topk_to_query,
)
from .skew import salted_agg, salted_join  # noqa: F401
from .linalg import gram_matrix_int, pca_topk  # noqa: F401
from .sq import sq_encode, sq_search_batch, sq_train  # noqa: F401
from .sketch import cms_build, cms_estimate, cms_merge  # noqa: F401

from mmvid_tpu.eval.prd import (
    compute_prd,
    compute_prd_from_embedding,
    prd_to_max_f_beta_pair,
)
from mmvid_tpu.eval.fvd import (
    frechet_distance,
    preprocess_videos,
    extend_video_pingpong,
)

__all__ = [
    'compute_prd', 'compute_prd_from_embedding', 'prd_to_max_f_beta_pair',
    'frechet_distance', 'preprocess_videos', 'extend_video_pingpong',
]

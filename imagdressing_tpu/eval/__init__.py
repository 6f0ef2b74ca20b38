from imagdressing_tpu.eval.cami import (  # noqa: F401
    cami_u,
    harris_keypoints,
    keypoint_matching,
    lbp_histogram_correlation,
    pose_overlap,
    ssim,
)

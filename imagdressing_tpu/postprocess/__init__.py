"""Post-processing applied to decoded images (host side, after the device
sampling program). Seat of the reference's modelscope face-fusion step
(/root/reference/app.py:172,244-252)."""

from imagdressing_tpu.postprocess.face_fusion import (  # noqa: F401
    FaceFusion,
    fuse_face,
    make_post_process,
    umeyama,
)

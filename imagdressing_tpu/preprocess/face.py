"""Face identity extraction for the IPA preset.

The reference uses insightface FaceAnalysis(buffalo_l) for detection +
512-d normed embedding + norm_crop 224 alignment
(/root/reference/inference_IMAGdressing_ipa_controlnetpose.py:201-208).
insightface (onnxruntime) is not part of this image; this module accepts
precomputed embeddings or delegates to insightface when it is installed.
"""

from __future__ import annotations

import numpy as np

from imagdressing_tpu.train.data import clip_preprocess_np


def face_embeds_from_image(path: str):
    """-> (faceid_embeds (1,512), face_clip_image (1,224,224,3)).

    Requires insightface. Install it (plus its onnx models) or precompute the
    embedding offline and call the pipeline with faceid_embeds= /
    face_clip_image= directly.
    """
    try:
        import cv2
        from insightface.app import FaceAnalysis
        from insightface.utils import face_align
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "insightface is required for automatic face embedding; pass "
            "faceid_embeds/face_clip_image to the pipeline instead"
        ) from e

    app = FaceAnalysis(name="buffalo_l",
                       providers=["CPUExecutionProvider"])
    app.prepare(ctx_id=0, det_size=(640, 640))
    image = cv2.imread(path)
    if image is None:
        raise FileNotFoundError(f"unreadable face image: {path}")
    faces = app.get(image)
    if not faces:
        raise ValueError(f"no face detected in {path}")
    faceid = faces[0].normed_embedding[None].astype(np.float32)
    crop = face_align.norm_crop(image, landmark=faces[0].kps, image_size=224)
    crop_rgb = crop[:, :, ::-1]
    face_clip = clip_preprocess_np(np.ascontiguousarray(crop_rgb))[None]
    return faceid, face_clip

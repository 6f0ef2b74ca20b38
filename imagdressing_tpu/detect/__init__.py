"""Person instance-segmentation (Mask R-CNN) — the TPU-native equivalent of
the reference's vendored-detectron2 mhp_extension detector
(/root/reference/preprocess/humanparsing/mhp_extension/detectron2/tools/
finetune_net.py + configs/Misc/parsing_finetune_cihp.yaml)."""

from imagdressing_tpu.detect.maskrcnn import (  # noqa: F401
    MaskRCNNConfig,
    apply_backbone_fpn,
    generate_anchors,
    init,
)

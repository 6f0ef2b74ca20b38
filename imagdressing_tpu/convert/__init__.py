from imagdressing_tpu.convert.torch_sd import (  # noqa: F401
    adapter_module_index_map,
    convert_clip_text,
    convert_clip_vision,
    convert_controlnet,
    convert_imagdressing_checkpoint,
    convert_ip_adapter_faceid,
    convert_proj_plus,
    convert_resampler,
    convert_unet,
    convert_vae,
)

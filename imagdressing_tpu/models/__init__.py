from imagdressing_tpu.models import (  # noqa: F401
    clip,
    conditioning,
    controlnet,
    resampler,
    unet,
    vae,
)

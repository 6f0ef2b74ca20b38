"""IMAGDressing-TPU: a TPU-native (JAX/XLA/Pallas/pjit) virtual-dressing framework.

A from-scratch rebuild of the capabilities of muzishen/IMAGDressing (AAAI 2025):
Stable-Diffusion-1.5 virtual dressing with a garment ("reference") UNet, hybrid
reference attention, Perceiver resampler cloth tokens, ControlNet pose/inpaint
plugins and IP-Adapter-FaceID conditioning — redesigned for TPU:

  * one UNet definition serving both the main (denoising) and garment roles
    (reference builds two diffusers UNets: /root/reference/train.py:320,367)
  * conditioning is data (a `Conditioning` pytree), not attention-processor
    monkey-patching (reference: /root/reference/adapter/attention_processor.py)
  * the garment K/V projections are hoisted out of the sampling loop — they are
    timestep-invariant (the reference recomputes them inside every attention
    call, 50 steps x 16 layers)
  * CFG runs as one batched UNet call instead of two sequential calls
    (reference: dressing_sd/pipelines/IMAGDressing_v1_pipeline.py:499-518)
  * the whole sampling loop is a single jitted `lax.scan`
  * hot attention runs through a Pallas dual-source flash-attention kernel
"""

__version__ = "0.1.0"

VAE_SCALING_FACTOR = 0.18215  # reference: IMAGDressing_v1_pipeline.py:458

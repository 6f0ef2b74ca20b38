from imagdressing_tpu.samplers import ddim, dpm, unipc  # noqa: F401

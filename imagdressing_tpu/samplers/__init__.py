from imagdressing_tpu.samplers import ddim  # noqa: F401

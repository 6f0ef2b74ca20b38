from imagdressing_tpu.kernels import flash_attention  # noqa: F401

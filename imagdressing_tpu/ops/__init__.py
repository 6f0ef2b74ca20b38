from imagdressing_tpu.ops import attention, nn  # noqa: F401

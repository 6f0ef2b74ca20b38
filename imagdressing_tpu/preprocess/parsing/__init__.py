from imagdressing_tpu.preprocess.parsing.infer import Parsing  # noqa: F401

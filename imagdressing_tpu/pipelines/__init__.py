from imagdressing_tpu.pipelines.dressing import (  # noqa: F401
    DressingModels,
    DressingPipeline,
)

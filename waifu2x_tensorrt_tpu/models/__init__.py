"""Model zoo: the waifu2x ``cunet`` and ``swin_unet`` families as JAX modules.

The reference treats models as opaque pre-exported ONNX artifacts
(src/main.cpp:201-204, README.md:11-12; upstream nagadomi/nunif waifu2x).
Here they are first-class JAX modules — the single biggest new component of
the rebuild (SURVEY.md §2 component 22).
"""

from waifu2x_tensorrt_tpu.models.registry import (  # noqa: F401
    MODEL_FAMILIES,
    ModelSpec,
    create_model,
    get_spec,
    model_file_stem,
)

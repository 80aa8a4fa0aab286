from archnemesis_tpu.core.types import (
    Atmosphere,
    LayerConfig,
    Layers,
)

__all__ = ["Atmosphere", "LayerConfig", "Layers"]

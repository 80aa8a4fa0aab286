from archnemesis_tpu.utils.interp import interp1d_extrap, simpson_weights
from archnemesis_tpu.utils.pytree import static_field, pytree_dataclass

__all__ = [
    "interp1d_extrap",
    "simpson_weights",
    "static_field",
    "pytree_dataclass",
]

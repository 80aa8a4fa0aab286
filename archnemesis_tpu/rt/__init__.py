from archnemesis_tpu.rt.layer import split_layers, average_layers, build_layers

__all__ = ["split_layers", "average_layers", "build_layers"]

from archnemesis_tpu.ops.planck import planck
from archnemesis_tpu.ops.ktab import interp_ktables
from archnemesis_tpu.ops.overlap import mix_gas_k
from archnemesis_tpu.ops.rayleigh import rayleigh_tau
from archnemesis_tpu.ops.cia import cia_tau
from archnemesis_tpu.ops.dust import dust_tau

__all__ = [
    "planck",
    "interp_ktables",
    "mix_gas_k",
    "rayleigh_tau",
    "cia_tau",
    "dust_tau",
]

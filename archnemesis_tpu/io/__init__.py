from archnemesis_tpu.io.ktables import read_kta, read_kls, KTableData

__all__ = ["read_kta", "read_kls", "KTableData"]

from archnemesis_tpu.retrieval.statevector import StateVector, read_apr, apply_state

__all__ = ["StateVector", "read_apr", "apply_state"]

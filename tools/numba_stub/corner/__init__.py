"""corner stub (plotting only; unused by oracle runs)."""
def corner(*a, **k):
    raise NotImplementedError("corner stub")

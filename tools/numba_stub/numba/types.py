"""Stub of numba.types — see package docstring.

The reference wraps scipy.special cython functions via WrapperAddressProtocol
(lineshape/_scipy_support.py). With this stub, a wrapped object named after a
scipy.special function simply calls that function directly.
"""


class _Signature:
    def __call__(self, *args, **kwargs):
        return None


float64 = _Signature()
float32 = _Signature()
int64 = _Signature()
int32 = _Signature()


class WrapperAddressProtocol:
    def __call__(self, *args, **kwargs):
        import scipy.special

        return getattr(scipy.special, type(self).__name__)(*args, **kwargs)

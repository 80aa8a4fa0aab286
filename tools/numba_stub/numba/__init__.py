"""Minimal functional numba stub.

The reference package (mounted read-only at /root/reference) compiles its hot
kernels with numba. numba is not installed in this image; this stub makes
``@njit``/``@jit`` identity decorators and ``prange`` an alias of ``range`` so
the reference can run as a slow pure-Python *oracle* for generating golden test
data. Never imported by the production framework.
"""


def _identity_decorator(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn

    return wrap


jit = _identity_decorator
njit = _identity_decorator
vectorize = _identity_decorator
guvectorize = _identity_decorator
prange = range


class config:  # noqa: N801 - mimic numba.config
    DISABLE_JIT = True

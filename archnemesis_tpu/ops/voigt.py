"""Line-shape functions: Voigt (Weideman-24 rational approximation of the
complex probability function), Gaussian, Lorentz.

Vectorized jnp versions of the reference lineshapes (lineshape/voigt_impl/
voigt_schreier.py:17 complex_err_fn_weideman_24a, :84 voigt_schreier;
lineshape/gaussian.py, lorentz.py). The Weideman coefficients are from
J.A.C. Weideman, SIAM J. Num. Anal. 31, 1497-1518 (1994), eq. 38.I, N=24 —
the same published constants the reference uses. Fully elementwise (VPU
ops + one 23-step Horner loop), so it vmaps/shards over (line, wave, layer)
blocks and feeds the Pallas LBL kernel.
"""

import jax.numpy as jnp
import numpy as np

SQRT_2 = np.sqrt(2.0)
SQRT_PI = np.sqrt(np.pi)
SQRT_LOG2 = np.sqrt(np.log(2.0))
INV_SQRT_PI = 1.0 / SQRT_PI
INV_SQRT_2PI = 1.0 / (SQRT_2 * SQRT_PI)

L24 = np.sqrt(24.0 / np.sqrt(2.0))

# Weideman (1994) N=24 expansion coefficients (a0..a24); a0 = L/sqrt(pi)
A24 = np.array([
    +2.3241983342526162e+00,
    +2.1978589365315417e+00, +1.8562864992055408e+00, +1.3948196733791203e+00,
    +9.2570871385886788e-01, +5.3611395357291292e-01, +2.6549639598807689e-01,
    +1.0838723484566792e-01, +3.3723366855316413e-02, +6.2150063629501763e-03,
    -4.9364269012806686e-04, -7.8166429956142650e-04, -2.0748431511424456e-04,
    +2.4331415462641969e-05, +3.0471066083243790e-05, +4.1394617248575527e-06,
    -3.0388931839840047e-06, -1.0856475790698251e-06, +2.5682641346701115e-07,
    +1.8738343486619108e-07, -1.9122258522976932e-08, -3.0082822811202271e-08,
    +1.3310461806370372e-09, +4.9048215867870488e-09, -1.5137461654527820e-10,
])


def _cpf_continued_fraction(z_r, z_i):
    """6-convergent Laplace continued fraction of w(z) for large |z|:

        w(z) = (i/sqrt(pi)) / (z - 1/2/(z - 1/(z - 3/2/(z - 2/(z - 5/2/(z - 3/z))))))

    Relative accuracy better than ~3e-7 for |z| >= 7 (far line wings;
    the switch threshold is _ASYM_R2 = 49 on |z|^2),
    where the Weideman rational expansion catastrophically cancels in
    float32 (its O(1) Horner terms vs a ~y/|z|^2 result).  Real-pair
    arithmetic so it lowers inside the Pallas TPU kernel (no complex64).
    """

    def cdiv_real(c, br, bi):
        m = br * br + bi * bi
        return c * br / m, -c * bi / m

    qr, qi = cdiv_real(3.0, z_r, z_i)
    d_r, d_i = z_r - qr, z_i - qi
    for c in (2.5, 2.0, 1.5, 1.0, 0.5):
        qr, qi = cdiv_real(c, d_r, d_i)
        d_r, d_i = z_r - qr, z_i - qi
    m = d_r * d_r + d_i * d_i
    # w = (i/sqrt(pi)) / d
    return INV_SQRT_PI * d_i / m, INV_SQRT_PI * d_r / m


# |z|^2 above which the continued fraction replaces the Weideman expansion
# in FLOAT32: the Weideman Horner sum cancels O(1) terms down to a
# ~y/|z|^2 result, so its f32 relative error blows up in the far wings
# (measured ~1% at |z|~12, ~18% at |z|~1e3); the 6-convergent CF truncation
# error is <3e-7 for |z|>=7 — below f32 rounding. FLOAT64 keeps pure
# Weideman everywhere: that is bit-comparable with the reference
# (voigt_schreier.py:17), which defines the parity contract.
_ASYM_R2 = 49.0


def complex_err_fn_weideman24(z_r, z_i):
    """Real/imag parts of w(z) = e^{-z^2} erfc(-iz): the Weideman-24
    rational expansion (matches reference complex_err_fn_weideman_24a),
    with a continued-fraction far-wing branch in float32 (see
    _cpf_continued_fraction)."""
    f32 = jnp.result_type(z_r) == jnp.float32
    if f32:
        r2 = z_r * z_r + z_i * z_i
        asym = r2 > _ASYM_R2
        # keep the untaken branch finite so jnp.where grads stay NaN-free
        zs_r = jnp.where(asym, z_r, 30.0)
        zs_i = jnp.where(asym, z_i, 0.0)
        cf_r, cf_i = _cpf_continued_fraction(zs_r, zs_i)

    lp_iz_r = L24 - z_i
    lp_iz_i = z_r
    lm_iz_r = L24 + z_i
    lm_iz_i = -z_r

    mag = lm_iz_r * lm_iz_r + lm_iz_i * lm_iz_i
    inv_r = lm_iz_r / mag
    inv_i = -lm_iz_i / mag

    zz_r = lp_iz_r * inv_r - lp_iz_i * inv_i
    zz_i = lp_iz_r * inv_i + lp_iz_i * inv_r

    poly_r = jnp.full_like(z_r, A24[-1])
    poly_i = jnp.zeros_like(z_r)
    for i in range(A24.size - 2, 0, -1):
        t_r = poly_r * zz_r - poly_i * zz_i
        t_i = poly_r * zz_i + poly_i * zz_r
        poly_r = t_r + A24[i]
        poly_i = t_i

    x_r = poly_r * inv_r - poly_i * inv_i
    x_i = poly_r * inv_i + poly_i * inv_r
    x_r = INV_SQRT_PI + 2.0 * x_r
    x_i = 2.0 * x_i
    w_r = x_r * inv_r - x_i * inv_i
    w_i = x_r * inv_i + x_i * inv_r
    if f32:
        return jnp.where(asym, cf_r, w_r), jnp.where(asym, cf_i, w_i)
    return w_r, w_i


def voigt(delta_wn, alpha_d, gamma_l):
    """Voigt profile (area-normalised), alpha_d = Gaussian HWHM, gamma_l =
    Lorentz HWHM. Broadcasts all arguments (reference voigt_schreier:84)."""
    scale = SQRT_LOG2 / alpha_d
    x = delta_wn * scale
    y = gamma_l * scale
    w_r, _ = complex_err_fn_weideman24(x, y)
    return w_r * scale * INV_SQRT_2PI * SQRT_2


def gaussian(delta_wn, alpha_d, gamma_l=None):
    """Doppler-only profile (reference lineshape/gaussian.py)."""
    sigma = alpha_d / np.sqrt(2.0 * np.log(2.0))
    return (
        jnp.exp(-0.5 * (delta_wn / sigma) ** 2)
        / (sigma * np.sqrt(2.0 * np.pi))
    )


def lorentz(delta_wn, alpha_d, gamma_l):
    """Pressure-only profile (reference lineshape/lorentz.py)."""
    return gamma_l / (np.pi * (gamma_l**2 + delta_wn**2))


def tonkov96_sublorentz_co2_venus(delta_wn, alpha_d, gamma_l):
    """CO2 Voigt with Tonkov+96 sub-Lorentzian chi-factor wings for the
    Venus near-infrared windows (reference
    lineshape/tonkov96_sublorentz_CO2_venus.py). The piecewise chi masks are
    elementwise selects — VPU-friendly, no control flow."""
    ad = jnp.abs(delta_wn)
    chi = jnp.where(
        ad < 3.0,
        1.0,
        jnp.where(
            ad < 150.0,
            1.084 * jnp.exp(-0.027 * ad),
            jnp.where(
                ad < 300.0,
                0.208 * jnp.exp(-0.016 * ad),
                0.025 * jnp.exp(-0.009 * ad),
            ),
        ),
    )
    return chi * voigt(delta_wn, alpha_d, gamma_l)


def hartmann_ch4_h2(delta_wn, alpha_d, gamma_l):
    """CH4-in-H2 Voigt with Hartmann (2002) empirical sub-Lorentzian wings
    (reference lineshape/hartmann_empirical_infrared_CH4_H2_broadening.py)."""
    ad = jnp.abs(delta_wn)
    chi = jnp.where(
        ad < 26.0,
        1.0,
        jnp.where(
            ad < 60.0,
            8.72 * jnp.exp(-ad / 12.0),
            0.0684 * jnp.exp(-ad / 393.0),
        ),
    )
    return chi * voigt(delta_wn, alpha_d, gamma_l)


def voigt_ch4_h2(delta_wn, alpha_d, gamma_l):
    """CH4-in-H2 Voigt with both widths scaled by 1/sqrt(2) (reference
    lineshape/voigt_CH4_H2_broadening.py — the factor matches existing
    NEMESIS LBL tables per the reference's own note)."""
    return voigt(delta_wn, alpha_d / SQRT_2, gamma_l / SQRT_2)


# name -> fn registry shared by the XLA panel path and the Pallas kernel
LINESHAPES = {
    "voigt": voigt,
    "gaussian": gaussian,
    "lorentz": lorentz,
    "tonkov96_sublorentz_co2_venus": tonkov96_sublorentz_co2_venus,
    "hartmann_ch4_h2": hartmann_ch4_h2,
    "voigt_ch4_h2": voigt_ch4_h2,
}

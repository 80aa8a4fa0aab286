"""Mie scattering: cross-sections and phase functions for aerosol
populations (the reference's Scatter_0 Mie stack: dmie:1399, miescat:1600,
makephase:1835, kk_new_sub:2169, subfithgm:1948).

TPU-first design: the reference's per-radius ``while`` Mie series (a ported
Fortran routine driven by data-dependent loop bounds) becomes a fixed-length
``lax.scan`` over the multipole order n, batched with ``vmap`` over the
(radius, wavelength) grid, with the reference's convergence test
(|a_n|^2+|b_n|^2 < 1e-14) applied as a masked "done" flag so results match
the early-exit series exactly. Everything is differentiable, so model 444
(retrieved particle size + imaginary refractive index) gets exact AD
Jacobians instead of the reference's finite differences.

Conventions follow the reference: refractive index m = n_r - i*n_i,
radii/wavelengths in microns, cross sections returned in cm^2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _log_derivative(mx, n_start: int, nmax: int):
    """Downward recurrence for the Mie logarithmic-derivative ratios
    (reference dmie acap recurrence, Scatter_0.py:1469-1472):
    A_{n_start} = 0;  A_n = (n+1)/mx - 1/((n+1)/mx + A_{n+1}).
    Returns A_1..A_nmax (complex, shape (nmax,)). n_start must exceed
    1.1*|m|x for convergence; any larger static value gives the same result
    to machine precision (downward recurrences are self-correcting).
    """
    rrfx = 1.0 / mx

    def step(a_next, nn):
        t = (nn + 1.0) * rrfx
        a = t - 1.0 / (t + a_next)
        return a, a

    ns = jnp.arange(n_start - 1, 0, -1, dtype=jnp.result_type(float))
    _, ys = lax.scan(step, jnp.zeros_like(mx), ns)
    return ys[::-1][:nmax]


def mie_single(x, m_re, m_im, cos_th, nmax: int, n_start: int):
    """Mie series for one homogeneous sphere (reference dmie
    Scatter_0.py:1399): size parameter x = 2*pi*r/lambda, refractive index
    m_re - i*m_im, scattering angles given by cos_th (theta <= 90 deg).

    Returns (qext, qscat, ctbrqs, i_fwd, i_bwd) where i_fwd/i_bwd are
    |S1|^2 + |S2|^2 at theta and at 180-theta, shape (ntheta,). ctbrqs is
    <cos(theta)> * qscat. nmax/n_start are static series caps; terms after
    the reference's |a_n|^2+|b_n|^2 < 1e-14 cutoff are masked out so the
    result equals the early-terminated series.
    """
    dtype = jnp.result_type(x, m_re, m_im, float)
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    m = (m_re - 1j * m_im).astype(cdtype)
    xc = x.astype(dtype) if hasattr(x, "astype") else jnp.asarray(x, dtype)
    rx = 1.0 / xc
    dn = _log_derivative(m * xc, n_start, nmax)  # (nmax,) A_1..A_nmax

    cos_th = jnp.asarray(cos_th, dtype)
    si2 = 1.0 - cos_th * cos_th

    # Riccati-Bessel start: psi_n = Re(w_n), chi_n = Im(w_n)
    # (Scatter_0.py:1496-1501)
    w_m1 = jnp.cos(xc) - 1j * jnp.sin(xc)  # w_{-1}
    w_0 = jnp.sin(xc) + 1j * jnp.cos(xc)  # w_0
    w_1 = rx * w_0 - w_m1

    def coeffs(n, d_n, w_nm1, w_n):
        ta = d_n / m + n * rx
        tb = d_n * m + n * rx
        a = (ta * jnp.real(w_n) - jnp.real(w_nm1)) / (ta * w_n - w_nm1)
        b = (tb * jnp.real(w_n) - jnp.real(w_nm1)) / (tb * w_n - w_nm1)
        return a, b

    a1, b1 = coeffs(1.0, dn[0], w_0, w_1)

    # n = 1 seed (pi_1 = 1, tau_1 = cos) with coefficient (2n+1)/(n(n+1))
    pi_prev = jnp.zeros_like(cos_th)
    pi_cur = jnp.ones_like(cos_th)
    tau_prev = jnp.zeros_like(cos_th)
    tau_cur = cos_th
    c1 = 1.5
    s1f = c1 * (a1 * pi_cur + b1 * tau_cur)
    s2f = c1 * (a1 * tau_cur + b1 * pi_cur)
    s1b = c1 * (a1 * pi_cur - b1 * tau_cur)
    s2b = c1 * (-a1 * tau_cur + b1 * pi_cur)
    qext = 3.0 * jnp.real(a1 + b1)
    qscat = 3.0 * (jnp.abs(a1) ** 2 + jnp.abs(b1) ** 2)

    def body(carry, n):
        (pi0, pi1, tau0, tau1, w_nm1, w_n, ap, bp, qe, qs, ct,
         s1f, s2f, s1b, s2b, done) = carry
        t0 = 2.0 * n - 1.0
        pi2 = (t0 * pi1 * cos_th - n * pi0) / (n - 1.0)
        tau2 = cos_th * (pi2 - pi0) - t0 * si2 * pi1 + tau0
        # freeze the Riccati-Bessel recurrence once the series has
        # converged: chi_n grows without bound past n ~ x and would
        # overflow to inf/NaN in the masked-out lanes (poisoning AD)
        w_np = jnp.where(done, w_n, t0 * rx * w_n - w_nm1)
        a, b = coeffs(n, dn[n.astype(jnp.int32) - 1], w_n, w_np)
        a = jnp.where(done, ap, a)
        b = jnp.where(done, bp, b)

        live = jnp.where(done, 0.0, 1.0).astype(dtype)
        g1 = (n - 1.0) * (n + 1.0) / n
        g2 = t0 / (n * (n - 1.0))
        ct = ct + live * (
            g1 * jnp.real(ap * jnp.conj(a) + bp * jnp.conj(b))
            + g2 * jnp.real(ap * jnp.conj(bp))
        )
        t2 = 2.0 * n + 1.0
        qe = qe + live * t2 * jnp.real(a + b)
        term = jnp.abs(a) ** 2 + jnp.abs(b) ** 2
        qs = qs + live * t2 * term
        cn = t2 / (n * (n + 1.0))
        sgn = jnp.where(jnp.mod(n, 2.0) == 0.0, -1.0, 1.0).astype(dtype)
        s1f = s1f + live * cn * (a * pi2 + b * tau2)
        s2f = s2f + live * cn * (a * tau2 + b * pi2)
        s1b = s1b + live * cn * sgn * (a * pi2 - b * tau2)
        s2b = s2b + live * cn * sgn * (b * pi2 - a * tau2)
        done = jnp.logical_or(done, term < 1e-14)
        return (
            (pi1, pi2, tau1, tau2, w_n, w_np, a, b, qe, qs, ct,
             s1f, s2f, s1b, s2b, done),
            None,
        )

    carry = (
        pi_prev, pi_cur, tau_prev, tau_cur, w_0, w_1, a1, b1,
        qext, qscat, jnp.zeros_like(qext), s1f, s2f, s1b, s2b,
        jnp.asarray(False),
    )
    ns = jnp.arange(2, nmax + 1, dtype=dtype)
    carry, _ = lax.scan(body, carry, ns)
    (_, _, _, _, _, _, _, _, qe, qs, ct, s1f, s2f, s1b, s2b, _) = carry

    scale = 2.0 * rx * rx
    i_fwd = jnp.abs(s1f) ** 2 + jnp.abs(s2f) ** 2
    i_bwd = jnp.abs(s1b) ** 2 + jnp.abs(s2b) ** 2
    return qe * scale, qs * scale, 2.0 * ct * scale, i_fwd, i_bwd


def size_distribution_number(iscat: int, rr, dsize):
    """n(r) for the supported distributions (reference miescat
    Scatter_0.py:1760-1777). dsize = (a, b, c/alpha)."""
    aa, bb, cc = dsize[0], dsize[1], dsize[2]
    if iscat == 1:  # standard gamma
        return jnp.where(
            bb != 0.0, rr**cc * jnp.exp(-rr / (aa * bb)), 1.0
        )
    if iscat == 2:  # log-normal
        return jnp.where(
            bb != 0.0,
            1.0
            / (rr * bb * jnp.sqrt(2.0 * jnp.pi))
            * jnp.exp(-((jnp.log(rr) - jnp.log(aa)) ** 2) / (2.0 * bb**2)),
            1.0,
        )
    if iscat == 3:  # MCS modified gamma
        return jnp.where(bb != 0.0, rr**aa * jnp.exp(-bb * rr**cc), 1.0)
    if iscat == 4:  # single size
        return jnp.ones_like(rr)
    raise ValueError(f"iscat={iscat} has no size distribution")


def _distribution_rmax(iscat: int, dsize):
    """Peak radius of the distribution (reference miescat
    Scatter_0.py:1693-1712) — used by the auto-termination cutoff."""
    aa, bb, cc = dsize[0], dsize[1], dsize[2]
    if iscat == 1:
        return cc * aa * bb
    if iscat == 2:
        return jnp.exp(jnp.log(aa) - bb**2)
    if iscat == 3:
        return (aa / (bb * cc)) ** (1.0 / cc)
    return jnp.asarray(0.0)


def _simpson_weights(inr: int, delr, open_ended: bool):
    """Reference Simpson weights (Scatter_0.py:1786-1792): delr/3 at the
    ends (first point always; last point only in explicit mode), else
    alternating 2delr/3 (even m) / 4delr/3 (odd m)."""
    m = np.arange(inr)
    vv = np.where(m % 2 == 0, 2.0 / 3.0, 4.0 / 3.0)
    vv[0] = 1.0 / 3.0
    if not open_ended:
        vv[-1] = 1.0 / 3.0
    # numpy, not jnp: this grid is STATIC. jnp.asarray inside a jit trace
    # returns a tracer for the embedded constant, which breaks the
    # float()/np.max series-cap derivations downstream (model 444 under
    # jit); numpy keeps it host-concrete and jnp ops convert at use.
    return vv * delr


def miescat_grid(
    xlam,
    iscat: int,
    dsize,
    radii,
    weights,
    m_re,
    m_im,
    cos_th,
    nmax: int,
    n_start: int,
    open_ended: bool = False,
):
    """Size-distribution-averaged Mie properties at one wavelength
    (reference miescat Scatter_0.py:1600): integrate qext/qscat/intensities
    over a static radius grid with Simpson weights.

    In open_ended mode the reference stops integrating once r exceeds the
    distribution peak AND n(r)*qscat drops below 1e-6 of its running max
    (Scatter_0.py:1778-1783); reproduced here with a cumulative mask over
    the (sufficiently long) static grid.

    Returns (xscat, xext, i_avg) with cross sections in cm^2 and i_avg the
    distribution-weighted 0.5*(M1+M2) over the full 0..180 angle set
    implied by cos_th ordering fwd then bwd (see makephase).
    """
    qe, qs, _, i_f, i_b = jax.vmap(
        lambda r: mie_single(
            2.0 * jnp.pi * r / xlam, m_re, m_im, cos_th, nmax, n_start
        )
    )(radii)

    anr = size_distribution_number(iscat, radii, dsize)

    if open_ended:
        rmax = _distribution_rmax(iscat, dsize)
        nqmax = lax.associative_scan(jnp.maximum, anr * qs)
        stop = (radii >= rmax) & (anr * qs <= 1e-6 * nqmax)
        # include everything up to and including the first stop index
        stop_cum = jnp.cumsum(stop.astype(jnp.int32))
        stopped_before = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), stop_cum[:-1]]
        ) > 0
        live = jnp.where(stopped_before, 0.0, 1.0)
    else:
        live = jnp.ones_like(anr)

    w = weights * anr * live
    area = jnp.pi * radii**2
    kscat = jnp.sum(w * area * qs)
    kext = jnp.sum(w * area * qe)
    anorm = jnp.sum(w)
    phas0 = jnp.sum(
        w[:, None] * 0.5 * jnp.concatenate([i_f, i_b], axis=1), axis=0
    )
    xscat = kscat / anorm * 1e-8
    xext = kext / anorm * 1e-8
    i_avg = xlam * xlam * phas0 / (jnp.pi * kscat)
    return xscat, xext, i_avg


def _theta_fold(theta):
    """Fold angles to <=90 and build the 0..180 output set (reference
    makephase Scatter_0.py:1884-1900). Returns (theta_half, thetax,
    n_unique) as numpy (static geometry)."""
    theta = np.asarray(theta, float)
    half = np.where(theta > 90.0, 180.0 - theta, theta)
    half = np.unique(half)
    ntheta = half.size
    nphas = 2 * ntheta - 1 if 90.0 in half else 2 * ntheta
    thetax = np.zeros(nphas)
    thetax[:ntheta] = half
    for i in range(ntheta, nphas):
        thetax[i] = 180.0 - thetax[nphas - i - 1]
    return half, thetax, nphas


def radius_grid(rs, cap: int = 2048):
    """Static radius grid from the reference's rs = (r1, r2, delr) spec
    (Scatter_0.py:1675-1686): explicit when r2 >= r1 (padded to even count),
    else open-ended with `cap` points."""
    r1, r2, delr = float(rs[0]), float(rs[1]), float(rs[2])
    if r2 < r1:
        inr = cap
        open_ended = True
    else:
        inr = 1 + int((r2 - r1) / delr)
        if inr > 1 and inr % 2 != 0:
            inr += 1
        open_ended = False
    # host-concrete numpy on purpose — see _simpson_weights
    radii = r1 + np.arange(inr) * delr
    return radii, _simpson_weights(inr, delr, open_ended), open_ended


def _henyey2(calpha, f, g1, g2):
    x1 = (1.0 - g1 * g1) / (1.0 + g1 * g1 - 2.0 * g1 * calpha) ** 1.5
    x2 = (1.0 - g2 * g2) / (1.0 + g2 * g2 - 2.0 * g2 * calpha) ** 1.5
    return f * x1 + (1.0 - f) * x2


def makephase(
    wavel,
    iscat: int,
    pars,
    rs,
    refindx,
    theta,
    nmax: int | None = None,
    n_start: int | None = None,
    rs_cap: int = 2048,
):
    """Cross sections and phase functions for one aerosol population over a
    wavelength grid (reference makephase Scatter_0.py:1835).

    wavel (NWAVE,) microns; refindx (NWAVE, 2) real/imag refractive index;
    theta (NTHETA,) degrees 0..90 (larger folds to 180-theta).
    iscat: 1 gamma / 2 log-normal / 3 MCS gamma / 4 single size /
    5 isotropic / 6 double-HG / 7 dipole.

    Returns (xscat, xext, thetax, phas): cross sections (NWAVE,) cm^2,
    output angles (NPHAS,) 0..180 deg, phase (NWAVE, NPHAS) normalised so
    that integral over 4pi of p/(4pi) is 1 (the reference's "normalised to
    X" convention before its /4pi).
    """
    wavel = jnp.asarray(wavel)
    theta_half, thetax, nphas = _theta_fold(theta)
    nth = theta_half.size
    cos_half = jnp.cos(jnp.deg2rad(jnp.asarray(theta_half)))
    calpha_x = jnp.cos(jnp.deg2rad(jnp.asarray(thetax)))
    nwave = wavel.shape[0]

    if iscat in (1, 2, 3, 4):
        pars = jnp.asarray(pars)
        dsize = jnp.concatenate(
            [pars, jnp.zeros(max(0, 3 - pars.shape[0]), pars.dtype)]
        )[:3]
        if iscat == 4:
            # single size: one-point "grid" (Scatter_0.py:1327-1329)
            radii = jnp.asarray([dsize[0]])
            weights = jnp.asarray([1.0])
            open_ended = False
        else:
            radii, weights, open_ended = radius_grid(rs, cap=rs_cap)
        if n_start is None or nmax is None:
            # static series caps over the whole (r, lambda, m) grid, with
            # the reference's 1.1*|m|x margin and 150 floor
            # (Scatter_0.py:1458); requires concrete radii — pass explicit
            # nmax/n_start when the particle size is traced (model 444)
            xmax = float(
                2.0 * np.pi * np.max(np.asarray(radii))
                / np.min(np.asarray(wavel))
            )
        if n_start is None:
            mmax = float(np.max(np.abs(np.asarray(refindx)[:, 0]
                                       + 1j * np.asarray(refindx)[:, 1])))
            n_start = max(150, int(1.2 * mmax * xmax) + 20)
        if nmax is None:
            nmax = min(n_start, max(60, int(xmax + 4.05 * xmax ** (1.0 / 3.0)) + 20))

        def per_wave(lam, mr, mi):
            xs, xe, i_avg = miescat_grid(
                lam, iscat, dsize, radii, weights, mr, mi, cos_half,
                nmax, n_start, open_ended,
            )
            return xs, xe, i_avg

        xscat, xext, i_all = jax.vmap(per_wave)(
            wavel, jnp.asarray(refindx)[:, 0], jnp.asarray(refindx)[:, 1]
        )
        # i_all columns: fwd theta_half then bwd (180-theta_half reversed
        # relative to thetax tail) -> reorder to thetax
        i_fwd = i_all[:, :nth]
        i_bwd = i_all[:, nth:]
        # thetax tail is 180-theta_half[nphas-i-1]: bwd angle j corresponds
        # to 180-theta_half[j]; build the tail by reversing and dropping the
        # duplicated 90-degree point when present
        tail = i_bwd[:, ::-1]
        if nphas == 2 * nth - 1:
            tail = tail[:, 1:]
        phas = jnp.concatenate([i_fwd, tail], axis=1)
        return xscat, xext, thetax, phas

    if iscat == 5:  # isotropic
        return (
            jnp.zeros(nwave),
            jnp.zeros(nwave),
            thetax,
            jnp.ones((nwave, nphas)),
        )

    if iscat == 6:  # double Henyey-Greenstein
        f, g1, g2 = pars[0], pars[1], pars[2]
        phase_row = _henyey2(calpha_x, f, g1, g2)
        return (
            jnp.zeros(nwave),
            jnp.zeros(nwave),
            thetax,
            jnp.broadcast_to(phase_row, (nwave, nphas)),
        )

    if iscat == 7:  # dipole (Scatter_0.py:1919-1937)
        rr = pars[0]
        nc = jnp.asarray(refindx)[:, 0] - 1j * jnp.asarray(refindx)[:, 1]
        x = 2.0 * jnp.pi * rr / wavel
        ratio = (nc**2 - 1.0) / (nc**2 + 2.0)
        qsca = (8.0 / 3.0) * x**4 * jnp.abs(ratio)
        qabs = -4.0 * x * jnp.imag(ratio)
        qext = qsca + qabs
        gsec = jnp.pi * (rr * 1e-4) ** 2
        xext = qext * gsec
        xscat = xext * (qsca / qext)
        phas = jnp.broadcast_to(
            0.75 * (1.0 + calpha_x**2), (nwave, nphas)
        )
        return xscat, xext, thetax, phas

    raise ValueError(f"iscat={iscat} not supported")


def kk_new_sub(vi, k_im, vm, nm):
    """Kramers-Kronig: real refractive index from the imaginary spectrum
    and an anchor n(vm)=nm (reference kk_new_sub Scatter_0.py:2169),
    vectorized as one (N, N) kernel + trapezoid instead of the O(N^2)
    Python loop. Differentiable (model 444 retrieves k_im)."""
    vi = jnp.asarray(vi)
    k_im = jnp.asarray(k_im)
    rev = vi[0] > vi[-1]
    va = jnp.where(rev, vi[::-1], vi)
    ka = jnp.where(rev, k_im[::-1], k_im)

    km = jnp.interp(vm, va, ka)
    v2 = va**2
    alpha = v2[None, :] - v2[:, None]  # (i, j)
    beta = v2[None, :] - vm**2
    d1 = (ka * va)[None, :] - (ka * va)[:, None]
    d2 = (ka * va)[None, :] - km * vm
    y = jnp.where(
        (alpha != 0.0) & (beta != 0.0),
        d1 / jnp.where(alpha == 0.0, 1.0, alpha)
        - d2 / jnp.where(beta == 0.0, 1.0, beta),
        0.0,
    )
    dv = va[1:] - va[:-1]
    integral = jnp.sum(0.5 * (y[:, 1:] + y[:, :-1]) * dv[None, :], axis=1)
    na = nm - (2.0 / jnp.pi) * integral
    return jnp.where(rev, na[::-1], na)


def subfithgm(theta, phase, tol: float = 1e-8, nc_max: int = 5,
              nover: int = 1000):
    """Fit a double Henyey-Greenstein to phase functions in log space with
    a bounded Levenberg-Marquardt loop (reference subfithgm
    Scatter_0.py:1948, mrqminl:2017). Host-side numpy: this is an offline
    property-fitting utility (IMIE=0 deck preparation), not a jit path.

    theta (NPHAS,) degrees; phase (NWAVE, NPHAS) normalised to 4pi.
    Returns (f, g1, g2, rms) each (NWAVE,).
    """
    theta = np.asarray(theta, float)
    phase = np.atleast_2d(np.asarray(phase, float))
    calpha = np.cos(np.deg2rad(theta))
    nwave = phase.shape[0]

    def hg(x):
        return _henyey2_np(calpha, x[0], x[1], x[2])

    def jac_fd(x, base):
        kk = np.zeros((theta.size, 3))
        for j in range(3):
            xt = x.copy()
            dx = 0.01
            xt[j] = x[j] + dx
            if j == 0 and xt[j] > 0.99:
                xt[j] = x[j] - dx
            if j == 1 and xt[j] > 0.98:
                xt[j] = x[j] - dx
            kk[:, j] = (hg(xt) - base) / (xt[j] - x[j])
        return kk

    bounds_lo = np.array([1e-6, 0.0, -0.98])
    bounds_hi = np.array([0.999999, 0.98, -0.1])

    f = np.zeros(nwave)
    g1 = np.zeros(nwave)
    g2 = np.zeros(nwave)
    rms = np.zeros(nwave)
    for iw in range(nwave):
        lph = np.log(phase[iw])
        x = np.array([0.5, 0.5, -0.5])

        def cof(xv):
            base = hg(xv)
            kk = jac_fd(xv, base) / base[:, None]
            resid = lph - np.log(base)
            alpha = kk.T @ kk
            beta = kk.T @ resid
            chisq = float(resid @ resid)
            return alpha, beta, chisq

        alpha, beta, chisq = cof(x)
        ochisq = chisq
        alamda = 1000.0
        nc = 0
        for _ in range(nover):
            prev = chisq
            covar = alpha + np.diag(np.diag(alpha) * alamda)
            try:
                da = np.linalg.solve(covar, beta)
            except np.linalg.LinAlgError:
                break
            xt = np.clip(x + da, bounds_lo, bounds_hi)
            alpha_t, beta_t, chisq_t = cof(xt)
            if chisq_t <= ochisq:
                alamda *= 0.9
                x, alpha, beta = xt, alpha_t, beta_t
                chisq = ochisq = chisq_t
                rel = abs(chisq - prev) / (chisq + prev + 1e-30)
                if rel < tol:
                    nc += 1
                    if nc > nc_max:
                        break
                else:
                    nc = 0
            else:
                alamda = min(alamda * 1.5, 1e36)
        f[iw], g1[iw], g2[iw] = x
        rms[iw] = np.sqrt(chisq)
    return f, g1, g2, rms


def _henyey2_np(calpha, f, g1, g2):
    x1 = (1.0 - g1 * g1) / (1.0 + g1 * g1 - 2.0 * g1 * calpha) ** 1.5
    x2 = (1.0 - g2 * g2) / (1.0 + g2 * g2 - 2.0 * g2 * calpha) ** 1.5
    return f * x1 + (1.0 - f) * x2

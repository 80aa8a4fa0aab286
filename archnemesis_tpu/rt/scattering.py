"""Plane-parallel multiple scattering: adding-doubling / matrix-operator
method, TPU-first.

Re-expression of the reference ``Multiple_Scattering_Core.py`` (all-numba
scloud11wave_core:652 and its helpers): instead of Python loops over
(g, wave, fourier, layer) around 5x5 matrix ops, every stage here is batched
over the (wave, g) axes and the layer combination is a ``lax.scan``, so XLA
sees large batched matmul/inverse ops. Two data-dependent constructs are
re-formulated to be jittable:

- the tau-dependent doubling count of ``double1`` (Multiple_Scattering_
  Core.py:322, ``nn = int(log2(taut)+12)``) becomes a fixed ``NN_MAX``-step
  doubling ladder with per-element masking (identical result: doubling a
  layer with itself is skipped exactly where the reference would not have
  run that step);
- the per-wavelength Fourier convergence break (:949-958) becomes a full
  fixed-NF evaluation (the skipped terms are below the reference's own
  1e-5 convergence threshold by construction).

Branch thresholds (Frobenius-norm series-vs-inverse switches in ``add``:277
and ``addp``:482) and the Hansen (1971) normalisation sweep (:201) follow
the reference exactly so parity holds at float64 round-off.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Doubling ladder depth: supports taut up to 2^(NN_MAX-12) ~ 8.4e6 before
# the initial thin layer stops getting thinner (reference ipow0 = 12).
NN_MAX = 35

# float32 always routes to the struct-of-arrays (rows) core: it wins on
# BOTH speed and reliability across the reference's real-deck quadrature
# range (NMU=10-21, .set Files.py:1269). Measured on the v5e at 2048
# waves (tools/bench_scattering_nmu.py, BASELINE.md):
#   nmu=10: rows 1235 gp/s / 315 s compile vs AoS 36 gp/s / 114 s
#   nmu=15: rows  280 gp/s / 26 min compile; AoS f32 CRASHES the TPU
#           worker (tiles 128 and 32) — rows is the only working core.
# The rows core unrolls the nmu x nmu algebra at trace time (~nmu^3
# scalar HLOs per primitive), so compile cost grows steeply with order;
# one Jacobian pass repays it, and the compiled program is cached.
# Lower this threshold to force the f32 AoS body instead (diagnostics /
# A/B tooling only — see tools/bench_scattering_nmu.py). float64 always
# keeps AoS: its LAPACK-ordering oracle-parity contract.
ROWS_NMU_MAX = 10**9


@dataclass(frozen=True)
class ScatterQuadrature:
    """Static zenith quadrature + azimuth expansion config (.set file;
    reference Scatter_0 NMU/MU/WTMU/NF/NPHI)."""

    mu: tuple  # (NMU,) ascending as in the .set file
    wtmu: tuple
    nf: int
    nphi: int

    @property
    def nmu(self) -> int:
        return len(self.mu)

    # Descending ordering used inside the core (reference :724 mu = mu1[::-1])
    @property
    def mu_desc(self) -> np.ndarray:
        return np.asarray(self.mu)[::-1].copy()

    @property
    def wtmu_desc(self) -> np.ndarray:
        return np.asarray(self.wtmu)[::-1].copy()


# ---------------------------------------------------------------------------
# Phase functions and their azimuth Fourier integration
# ---------------------------------------------------------------------------


def henyey_greenstein2(calpha, f, g1, g2):
    """Two-term Henyey-Greenstein phase function /4pi (reference phasint2
    iscat==2 branch, Multiple_Scattering_Core.py:163-174)."""
    hg11 = 1.0 - g1 * g1
    hg12 = 2.0 - hg11
    hg21 = 1.0 - g2 * g2
    hg22 = 2.0 - hg21
    p = (
        f * hg11 / jnp.sqrt(hg12 - 2.0 * g1 * calpha) ** 3
        + (1.0 - f) * hg21 / jnp.sqrt(hg22 - 2.0 * g2 * calpha) ** 3
    )
    return p / (4.0 * np.pi)


def _angle_grids(mu_desc: np.ndarray, nphi: int):
    """Static (nmu, nmu, nphi+1) cos(scattering angle) grids for the + and -
    hemispheres (reference phasint2:146-158)."""
    mu = np.asarray(mu_desc)
    phi = np.arange(nphi + 1) * (2.0 * np.pi / nphi)
    sth = np.sqrt(1.0 - mu**2)
    sth_sth = sth[:, None] * sth[None, :]
    mu_mu = mu[:, None] * mu[None, :]
    cpl = sth_sth[:, :, None] * np.cos(phi)[None, None, :] + mu_mu[:, :, None]
    cmi = sth_sth[:, :, None] * np.cos(phi)[None, None, :] - mu_mu[:, :, None]
    return np.clip(cpl, -1.0, 1.0), np.clip(cmi, -1.0, 1.0), phi


def _phi_weights(ic: int, nphi: int, phi: np.ndarray) -> np.ndarray:
    """Trapezoid azimuth weights x cos(ic phi) (reference phasint2:179-191)."""
    dphi = 2.0 * np.pi / nphi
    wphi = np.full(phi.shape, dphi)
    wphi[0] = 0.5 * dphi
    wphi[-1] = 0.5 * dphi
    wphi = wphi / (2.0 * np.pi) if ic == 0 else wphi / np.pi
    return wphi * np.cos(ic * phi)


def phase_matrices(phase_fn, mu_desc, nphi: int, ic: int):
    """Azimuth-integrated phase matrices (pplpl, pplmi), each (..., nmu, nmu),
    for a broadcastable elementwise ``phase_fn(calpha)`` (reference phasint2).
    """
    cpl, cmi, phi = _angle_grids(mu_desc, nphi)
    w = jnp.asarray(_phi_weights(ic, nphi, phi))
    ppl = phase_fn(jnp.asarray(cpl))
    pmi = phase_fn(jnp.asarray(cmi))
    pplpl = jnp.einsum("...k,k->...", ppl, w)
    pplmi = jnp.einsum("...k,k->...", pmi, w)
    return pplpl, pplmi


def rayleigh_phase_matrices(mu_desc, nphi: int, ic: int):
    return phase_matrices(
        lambda c: 0.75 * (1.0 + c * c) / (4.0 * np.pi), mu_desc, nphi, ic
    )


def hansen_normalise(pplpl, pplmi, wtmu):
    """Hansen (1971) renormalisation factor fc for the ic=0 phase matrices
    (reference hansen, Multiple_Scattering_Core.py:201-234).

    pplpl/pplmi: (..., nmu, nmu) batched. Returns (pplpl * fc, fc).
    The reference's triangular in-place sweep preserves fc symmetry, so one
    sweep is fc <- fc * 0.5*(x_i + x_j) with x_j = (1-rsum_j)/tsum_j.
    """
    x1 = 2.0 * np.pi
    wt = jnp.asarray(wtmu)
    rsum = jnp.einsum("...ij,i->...j", pplmi, wt) * x1  # (..., nmu)

    def cond(carry):
        fc, test, it = carry
        return (test >= 1e-14) & (it < 10000)

    def body(carry):
        fc, _, it = carry
        tsum = jnp.einsum("...ij,i,...ij->...j", pplpl, wt, fc) * x1
        test = jnp.max(jnp.abs(rsum + tsum - 1.0))
        x = (1.0 - rsum) / tsum  # (..., nmu)
        fc_new = fc * 0.5 * (x[..., :, None] + x[..., None, :])
        fc_new = jnp.where(test < 1e-14, fc, fc_new)
        return fc_new, test, it + 1

    fc0 = jnp.ones_like(pplpl)
    # prime the loop with one tsum evaluation for the convergence test
    tsum0 = jnp.einsum("...ij,i,...ij->...j", pplpl, wt, fc0) * x1
    test0 = jnp.max(jnp.abs(rsum + tsum0 - 1.0))
    fc, _, _ = jax.lax.while_loop(cond, body, (fc0, test0, jnp.asarray(0)))
    # final sweep result already folded in; apply to pplpl
    return pplpl * fc, fc


# ---------------------------------------------------------------------------
# R/T/J algebra (all (..., nmu, nmu) batched)
# ---------------------------------------------------------------------------


def _frob(r):
    return jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))


def _inv_small(a):
    """Batched inverse of small (..., n, n) matrices by unrolled
    Gauss-Jordan elimination (no pivoting).

    XLA's generic LU path costs ~30x a batched matmul on TPU for tiny
    matrices (measured: 145 ms vs 5 ms for 100k 5x5 f32 inverses on v5e);
    this unrolled form is pure fused VPU elementwise work. No pivoting is
    safe here: every inverse in the doubling/adding algebra is of
    ``E - Rsub@R1`` with spectral radius < 1 (passive layers), which is
    strictly diagonally dominant in practice.
    """
    n = a.shape[-1]
    m = a
    inv = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    rows = jnp.arange(n)
    for k in range(n):
        pivot = m[..., k : k + 1, k : k + 1]
        mk = m[..., k : k + 1, :] / pivot
        ik = inv[..., k : k + 1, :] / pivot
        factor = m[..., :, k : k + 1]
        keep = (rows != k)[:, None]
        m = jnp.where(keep, m - factor * mk, mk)
        inv = jnp.where(keep, inv - factor * ik, ik)
    return inv


def _inv_combine(m):
    """Inverse used by the R/T/J algebra: the fast unrolled path in f32
    (the TPU production precision), LAPACK-ordered ``jnp.linalg.inv`` in
    f64 where the reference-parity tests assert at rtol 1e-10."""
    if m.dtype == jnp.float32:
        return _inv_small(m)
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# Struct-of-arrays (batch-minor) R/T/J algebra — the f32/TPU fast path.
#
# An array-of-structures (..., 5, 5) stack pads its trailing dims to the
# TPU's (8, 128) register tile: 41x physical bytes per logical byte.
# Measured on chip (tools/profile_scattering.py): even a pure elementwise
# mul-add over (300k, 5, 5) f32 streams at ~9 GB/s LOGICAL (~370 GB/s
# physical — HBM speed on padded data), and one batched 5x5 matmul costs
# 19 ms.  The doubling ladder runs ~20 such iterations and was therefore
# HBM-bound at 41x inflated traffic.
#
# Row form stores a matrix stack as a python list-of-lists of FLAT (B,)
# arrays (B = the whole batch, minor axis -> lanes, zero padding waste)
# and unrolls the 5x5 algebra into fused VPU elementwise ops; physical
# bytes == logical bytes, a ~40x traffic reduction on the ladder.  Used
# for float32 only: the f64 oracle-parity path keeps the original AoS
# algebra (LAPACK-ordered inverses, dot_general sums) bit-for-bit.
# ---------------------------------------------------------------------------


def _rows_mm(a, b):
    """Row-form matmul: a (n x k), b (k x m) lists of (B,) arrays."""
    kk = len(b)
    return [
        [
            sum(a[i][q] * b[q][j] for q in range(kk))
            for j in range(len(b[0]))
        ]
        for i in range(len(a))
    ]


def _rows_mv(a, v):
    return [sum(a[i][q] * v[q] for q in range(len(v))) for i in range(len(a))]


def _rows_add(a, b):
    return [
        [a[i][j] + b[i][j] for j in range(len(a[0]))] for i in range(len(a))
    ]


def _rows_frob(a):
    return jnp.sqrt(sum(a[i][j] ** 2 for i in range(len(a))
                        for j in range(len(a[0]))))


def _rows_where(mask, a, b):
    return [
        [jnp.where(mask, a[i][j], b[i][j]) for j in range(len(a[0]))]
        for i in range(len(a))
    ]


def _rows_vwhere(mask, a, b):
    return [jnp.where(mask, a[i], b[i]) for i in range(len(a))]


def _rows_inv(a):
    """Unrolled no-pivot Gauss-Jordan in row form (see _inv_small for why
    no pivoting is safe on E - Rsub@R1)."""
    n = len(a)
    m = [row[:] for row in a]
    inv = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    for k in range(n):
        piv = 1.0 / m[k][k]
        mk = [m[k][j] * piv for j in range(n)]
        ik = [inv[k][j] * piv for j in range(n)]
        for i in range(n):
            if i == k:
                continue
            f = m[i][k]
            m[i] = [m[i][j] - f * mk[j] for j in range(n)]
            inv[i] = [inv[i][j] - f * ik[j] for j in range(n)]
        m[k] = mk
        inv[k] = ik
    return inv


def _rows_stack(rows):
    """list-of-lists of (B,) -> (B, n, m) AoS array."""
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )


def _combine_rows(r1, t1, j1, rsub, tsub, jsub, j_on, thresh: float,
                  frob_of_rsq: bool):
    """Row-form of :func:`_combine` (reference add:277 / addp:482).

    r1/t1/rsub/tsub: (nmu x nmu) lists of (B,) arrays; j1/jsub: nmu-lists;
    j_on: (B,)-broadcastable mask/factor. Same series-vs-inverse branch
    thresholds as the AoS path.
    """
    nmu = len(r1)
    rsq = _rows_mm(rsub, r1)
    norm = _rows_frob(rsq) if frob_of_rsq else _rows_frob(r1)
    emr = [
        [(1.0 if i == j else 0.0) - rsq[i][j] for j in range(nmu)]
        for i in range(nmu)
    ]
    inv = _rows_inv(emr)
    series = [
        [(1.0 if i == j else 0.0) + rsq[i][j] for j in range(nmu)]
        for i in range(nmu)
    ]
    big = norm > thresh
    acom = _rows_where(big, inv, series)
    ccom = _rows_mm(t1, acom)
    rans = _rows_add(r1, _rows_mm(_rows_mm(ccom, rsub), t1))
    tans = _rows_mm(ccom, tsub)
    jt = _rows_mv(rsub, j1)
    jt = [jt[i] + jsub[i] for i in range(nmu)]
    jcc = _rows_mv(ccom, jt)
    jans = _rows_vwhere(j_on, [jcc[i] + j1[i] for i in range(nmu)], j1)
    return rans, tans, jans


def _rtj_rows(taut, tauscat, tauray, bc, frac_modes, phase_el,
              cc_diag, mminv_diag, j_on_f, con_fac, nn_max: int,
              static_trip_count: bool = False):
    """Row-form layer_rtj over a FLAT (B,) batch (the f32/TPU path).

    taut/tauscat/tauray/bc/j_on_f/con_fac: (B,) arrays (j_on_f is the
    float ic==0 indicator); frac_modes: list of (B,) per-mode scattering
    fractions; phase_el(kind, m, i, j) -> (B,) fetches one matrix element
    of the aerosol ('pl'/'mi', mode m) or Rayleigh ('rl'/'rm') phase
    stacks.  Returns (r_rows, t_rows, j_vec) in row form.
    """
    nmu = np.asarray(cc_diag).shape[0]
    cc_np = np.asarray(cc_diag)
    mminv_np = np.asarray(mminv_diag)
    cc = [float(cc_np[j]) for j in range(nmu)]
    mminv = [float(mminv_np[i]) for i in range(nmu)]
    nmodes = len(frac_modes)

    tscat = jnp.maximum(tauscat, 0.0)
    total_scat = tscat + tauray
    safe_taut = jnp.where(taut > 0.0, taut, 1.0)
    omega = jnp.where(taut > 0.0, total_scat / safe_taut, 0.0)
    safe_ts = jnp.where(total_scat > 0.0, total_scat, 1.0)
    wray = tauray / safe_ts
    wsca = [tscat / safe_ts * frac_modes[m] for m in range(nmodes)]

    def mixed(kind_aero, kind_ray, i, j):
        out = wray * phase_el(kind_ray, 0, i, j)
        for m in range(nmodes):
            out = out + wsca[m] * phase_el(kind_aero, m, i, j)
        return out

    pplpl = [[mixed("pl", "rl", i, j) for j in range(nmu)]
             for i in range(nmu)]
    pplmi = [[mixed("mi", "rm", i, j) for j in range(nmu)]
             for i in range(nmu)]

    # --- scattering branch: doubling ladder ------------------------------
    taut_s = jnp.maximum(taut, 1e-30)
    con = omega * np.pi * con_fac
    gplpl = [
        [mminv[i] * ((1.0 if i == j else 0.0) - con * pplpl[i][j] * cc[j])
         for j in range(nmu)]
        for i in range(nmu)
    ]
    gplmi = [
        [mminv[i] * (con * pplmi[i][j] * cc[j]) for j in range(nmu)]
        for i in range(nmu)
    ]
    nn = jnp.trunc(jnp.log2(taut_s) + 12.0).astype(jnp.int32)
    nn = jnp.minimum(nn, nn_max)
    xfac = jnp.where(nn >= 1, 2.0 ** (-nn.astype(taut.dtype)), 1.0)
    tau0 = taut_s * xfac
    t1 = [[(1.0 if i == j else 0.0) - tau0 * gplpl[i][j]
           for j in range(nmu)] for i in range(nmu)]
    r1 = [[tau0 * gplmi[i][j] for j in range(nmu)] for i in range(nmu)]
    j1 = [(1.0 - omega) * bc * j_on_f * tau0 * mminv[i]
          for i in range(nmu)]

    true_mask = jnp.ones_like(taut, dtype=bool)

    def body(k, carry):
        r, t, j = carry
        rn, tn, jn = _combine_rows(r, t, j, r, t, j, true_mask,
                                   thresh=0.1, frob_of_rsq=False)
        do = k < nn
        return (_rows_where(do, rn, r), _rows_where(do, tn, t),
                _rows_vwhere(do, jn, j))

    upper = nn_max if static_trip_count else jnp.minimum(jnp.max(nn), nn_max)
    rs, ts, js = jax.lax.fori_loop(0, upper, body, (r1, t1, j1))

    # --- non-scattering / zero-opacity branches + select -----------------
    tdiag = [jnp.where(-mminv[i] * taut > -200.0,
                       jnp.exp(-mminv[i] * taut), 0.0) for i in range(nmu)]
    scat = (omega > 0.0) & (taut > 0.0)
    zero = ~(taut > 0.0)
    zeros = jnp.zeros_like(taut)
    rl, tl, jl = [], [], []
    for i in range(nmu):
        rl.append([])
        tl.append([])
        for j in range(nmu):
            tn_ij = tdiag[i] if i == j else zeros
            tz_ij = 1.0 + zeros if i == j else zeros
            rl[i].append(jnp.where(zero, zeros,
                                   jnp.where(scat, rs[i][j], zeros)))
            tl[i].append(jnp.where(zero, tz_ij,
                                   jnp.where(scat, ts[i][j], tn_ij)))
        jn_i = bc * j_on_f * (1.0 - tdiag[i])
        jl.append(jnp.where(zero, zeros,
                            jnp.where(scat, js[i], jn_i)))
    return rl, tl, jl


def _combine_path_rows(rl, tl, jl, j_on_mask, r0=None, t0=None, j0=None):
    """Row-form combine_path: rl/tl are (nmu x nmu) lists of (nlay, F)
    arrays, jl an nmu-list; the scan runs over the leading layer axis."""
    if r0 is None:
        init = (
            [[rl[i][j][0] for j in range(len(rl[0]))] for i in range(len(rl))],
            [[tl[i][j][0] for j in range(len(tl[0]))] for i in range(len(tl))],
            [jl[i][0] for i in range(len(jl))],
        )
        rest = (
            [[rl[i][j][1:] for j in range(len(rl[0]))] for i in range(len(rl))],
            [[tl[i][j][1:] for j in range(len(tl[0]))] for i in range(len(tl))],
            [jl[i][1:] for i in range(len(jl))],
        )
    else:
        init = (r0, t0, j0)
        rest = (rl, tl, jl)

    def step(carry, x):
        rsub, tsub, jsub = carry
        r1, t1, j1 = x
        out = _combine_rows(r1, t1, j1, rsub, tsub, jsub, j_on_mask,
                            thresh=0.01, frob_of_rsq=True)
        return out, None

    (rc, tc, jc), _ = jax.lax.scan(step, init, rest)
    return rc, tc, jc


def _combine(r1, t1, j1, rsub, tsub, jsub, j_on, thresh: float,
             frob_of_rsq: bool):
    """Combine layer (r1,t1,j1) on top of (rsub,tsub,jsub) (reference add:277
    for homogeneous doubling [thresh=0.1 on frob(r1)] and addp:482 for the
    heterogeneous path sum [thresh=0.01 on frob(rsub@r1)]).

    ``j_on``: 1.0 where the batch element is the ic=0 Fourier component
    (the only one carrying a thermal/ground source; reference keeps J
    untouched for ic>0), broadcastable against the (..., nmu, 1) J shape —
    a scalar when the caller runs a single component, an axis-aligned mask
    when all Fourier components are batched through one call.

    The series branch acom = e + rsq (error < 1e-4 at the thresholds) is kept
    for parity with the reference numerics.
    """
    nmu = r1.shape[-1]
    e = jnp.eye(nmu, dtype=r1.dtype)
    rsq = rsub @ r1
    norm = _frob(rsq) if frob_of_rsq else _frob(r1)
    inv = _inv_combine(e - rsq)
    series = e + rsq
    acom = jnp.where(norm[..., None, None] > thresh, inv, series)
    ccom = t1 @ acom
    rans = r1 + (ccom @ rsub) @ t1
    tans = ccom @ tsub
    if isinstance(j_on, (bool, int, float)):
        jans = (ccom @ (rsub @ j1 + jsub) + j1) if j_on else j1
    else:
        jans = jnp.where(j_on, ccom @ (rsub @ j1 + jsub) + j1, j1)
    return rans, tans, jans


def _double_layer(pplpl, pplmi, omega, taut, bc, cc_diag, mminv_diag,
                  j_on, con_fac, nn_max: int = NN_MAX,
                  static_trip_count: bool = False):
    """Core of double1 with precomputed cc (quadrature weights) and 1/mu
    diagonals. All leading dims batched (including, optionally, the
    Fourier-component axis: ``con_fac`` = 1+del(0,ic) and ``j_on`` = [ic==0]
    broadcast against omega)."""
    nmu = cc_diag.shape[0]
    e = jnp.eye(nmu, dtype=pplpl.dtype)
    con = (omega * np.pi * con_fac)[..., None, None]

    # GPLPL = MMINV (E - CON PPLPL CC); GPLMI = MMINV CON PPLMI CC
    gplpl = mminv_diag[:, None] * (e - con * (pplpl * cc_diag[None, :]))
    gplmi = mminv_diag[:, None] * (con * (pplmi * cc_diag[None, :]))

    # doubling count (reference: nn = int(log2(taut)+12), xfac = 2^-nn)
    nn = jnp.trunc(jnp.log2(taut) + 12.0).astype(jnp.int32)
    nn = jnp.minimum(nn, nn_max)
    xfac = jnp.where(nn >= 1, 2.0 ** (-nn.astype(taut.dtype)), 1.0)
    tau0 = (taut * xfac)[..., None, None]

    t1 = e - tau0 * gplpl
    r1 = tau0 * gplmi
    j1 = ((1.0 - omega) * bc * j_on)[..., None] * (
        tau0[..., 0] * mminv_diag
    )  # (..., nmu)
    j1 = j1[..., None]  # (..., nmu, 1)

    def body(k, carry):
        r, t, j = carry
        rn, tn, jn = _combine(r, t, j, r, t, j, True, thresh=0.1,
                              frob_of_rsq=False)
        do = (k < nn)[..., None, None]
        return (
            jnp.where(do, rn, r),
            jnp.where(do, tn, t),
            jnp.where(do, jn, j),
        )

    # dynamic trip count: the ladder only needs the LARGEST per-element
    # doubling count (log2(max taut)+12), not the static worst case — on a
    # typical deck that halves the iterations; elements with smaller nn
    # are frozen by the mask exactly as the reference would have stopped.
    # NOTE: the traced bound lowers fori_loop to while_loop, which is
    # forward-mode-only (jacfwd/JVP — what the retrieval engine uses);
    # grad/jacrev callers must pass static_trip_count=True.
    if static_trip_count:
        upper = nn_max
    else:
        upper = jnp.minimum(jnp.max(nn), nn_max)
    r1, t1, j1 = jax.lax.fori_loop(0, upper, body, (r1, t1, j1))
    return r1, t1, j1


def layer_rtj(taut, tauscat, tauray, bc, frac, ppln, pmin, pplr, pmir,
              cc_diag, mminv_diag, j_on, con_fac, nn_max: int = NN_MAX,
              static_trip_count: bool = False):
    """R/T/J matrices for every layer at once (reference calc_rtj_matrix,
    Multiple_Scattering_Core.py:567-650), batched over leading dims.

    taut/tauscat/tauray/bc: (...,); frac: (..., ncont);
    ppln/pmin: (..., ncont, nmu, nmu); pplr/pmir: (..., nmu, nmu).

    ``static_trip_count=True`` runs the doubling ladder for the static
    worst-case ``nn_max`` trips so reverse-mode AD (grad/jacrev) works;
    the default traced bound is forward-mode-only (jacfwd/JVP).
    """
    nmu = cc_diag.shape[0]
    e = jnp.eye(nmu, dtype=pplr.dtype)
    tscat = jnp.maximum(tauscat, 0.0)
    total_scat = tscat + tauray
    safe_taut = jnp.where(taut > 0.0, taut, 1.0)
    omega = jnp.where(taut > 0.0, total_scat / safe_taut, 0.0)

    safe_ts = jnp.where(total_scat > 0.0, total_scat, 1.0)
    wray = (tauray / safe_ts)[..., None, None]
    wsca = (tscat / safe_ts)[..., None, None, None] * frac[..., None, None]
    pplpl = wray * pplr + jnp.sum(wsca * ppln, axis=-3)
    pplmi = wray * pmir + jnp.sum(wsca * pmin, axis=-3)

    # scattering branch
    rs, ts, js = _double_layer(
        pplpl, pplmi, omega, jnp.maximum(taut, 1e-300), bc, cc_diag,
        mminv_diag, j_on, con_fac, nn_max, static_trip_count
    )

    # non-scattering branch: diagonal transmission exp(-taut/mu)
    tex = -mminv_diag * taut[..., None]  # (..., nmu)
    tdiag = jnp.where(tex > -200.0, jnp.exp(tex), 0.0)
    tn = tdiag[..., None, :] * e  # diag embed
    rn = jnp.zeros_like(tn)
    jn = ((bc * j_on)[..., None] * (1.0 - tdiag))[..., None]

    # zero-opacity branch: identity transmission
    tz = jnp.broadcast_to(e, tn.shape)
    rz = jnp.zeros_like(tn)
    jz = jnp.zeros_like(jn)

    scat = (omega > 0.0) & (taut > 0.0)
    zero = ~(taut > 0.0)
    sel = lambda a, b, c: jnp.where(
        zero[..., None, None], c,
        jnp.where(scat[..., None, None], a, b),
    )
    rl = sel(rs, rn, rz)
    tl = sel(ts, tn, tz)
    jl = sel(js, jn, jz)
    return rl, tl, jl


def combine_path(rl, tl, jl, j_on, r0=None, t0=None, j0=None):
    """Scan-combine per-layer R/T/J top-down along the path (reference
    scloud11wave_core layer loop :839-875 with addp).

    rl/tl: (nlay, ..., nmu, nmu) ordered so index 0 is combined FIRST — the
    layer FURTHEST from the observer (lookdown: the bottom layer / surface
    side; each subsequent layer is stacked on top of the accumulate).
    r0/t0/j0: optional initial (surface) matrices combined before layer 0.
    """
    if r0 is None:
        init = (rl[0], tl[0], jl[0])
        rest = (rl[1:], tl[1:], jl[1:])
    else:
        init = (r0, t0, j0)
        rest = (rl, tl, jl)

    def step(carry, x):
        rsub, tsub, jsub = carry
        r1, t1, j1 = x
        out = _combine(r1, t1, j1, rsub, tsub, jsub, j_on, thresh=0.01,
                       frob_of_rsq=True)
        return out, None

    (rc, tc, jc), _ = jax.lax.scan(step, init, rest)
    return rc, tc, jc


def brdf_fourier_matrix(brdf_fn, quad: ScatterQuadrature, nwave: int):
    """Azimuth-Fourier decomposition of the surface BRDF into the
    (NWAVE, NMU, NMU, NF+1) matrix the doubling method consumes (reference
    calc_brdf_matrix ForwardModel_0.py:5168).

    brdf_fn(sol_ang, emiss_ang, azi_ang) -> (NWAVE, NTHETA) for 1D degree
    arrays (e.g. a partial of rt.surface.hapke_brdf).
    """
    mu = quad.mu_desc
    nmu, nphi, nf = quad.nmu, quad.nphi, quad.nf
    dphi = 2.0 * np.pi / nphi

    j, i, k = np.meshgrid(
        np.arange(nmu), np.arange(nmu), np.arange(nphi + 1), indexing="ij"
    )
    emiss = np.rad2deg(np.arccos(mu[i])).ravel()
    sol = np.rad2deg(np.arccos(mu[j])).ravel()
    azi = np.rad2deg(k * dphi).ravel()

    brdf = brdf_fn(sol, emiss, azi)  # (NWAVE, NMU*NMU*(NPHI+1))
    brdf = brdf.reshape(nwave, nmu, nmu, nphi + 1)  # [w, j=sol, i=emiss, k]

    phi = np.arange(nphi + 1) * dphi
    wphi = np.full(nphi + 1, dphi)
    wphi[0] = wphi[-1] = 0.5 * dphi
    wphi = wphi / (2.0 * np.pi)
    cosmat = wphi[None, :] * np.cos(
        np.arange(nf + 1)[:, None] * phi[None, :]
    )  # (NF+1, NPHI+1)

    # output[w, i, j, ic] (emission row, solar column, as in the reference)
    out = jnp.einsum("wjik,ck->wijc", brdf, jnp.asarray(cosmat))
    return out


# ---------------------------------------------------------------------------
# Geometry interpolation + top-level driver
# ---------------------------------------------------------------------------


def _angle_bracket(zmu, mu_desc):
    """Index i such that mu[i] >= z > mu[i+1] on the descending quadrature +
    linear weight (reference angle_quadrature:536-560)."""
    mu = jnp.asarray(np.asarray(mu_desc))
    nmu = mu.shape[0]
    i = jnp.clip(jnp.searchsorted(-mu, -zmu, side="right") - 1, 0, nmu - 2)
    # reference picks the LAST bracket j with mu[j] >= z > mu[j+1]; for
    # z above mu[0] it keeps j=0, below mu[-1] it uses nmu-2
    i = jnp.where(zmu <= mu[nmu - 1], nmu - 2, i)
    i = jnp.where(zmu > mu[0], 0, i)
    w = (mu[i] - zmu) / (mu[i] - mu[i + 1])
    return i, w


def _phase_stacks(quad: ScatterQuadrature, phase_fns, iray: bool,
                  nwave: int, dtype):
    """Hansen-normalised phase-matrix stacks for every Fourier component.

    Returns ``(ppln, pmin, pplr_b, pmir_b)`` with shapes
    (nc, nwave, ncont, nmu, nmu) / (nc, nwave, nmu, nmu).  These are the
    only wave-dependent quantities produced from the ``phase_fns``
    callables, and they are SMALL (nc*nwave*ncont*nmu^2), so they are
    hoisted out of the doubling core — that is what lets the core be
    wave-tiled (`scloud11wave_tiled`) without re-evaluating phase
    functions per tile.

    Hansen renormalisation factors are the ic=0 fixed point and scale the
    phase matrices of EVERY Fourier component (reference hansen:201 runs
    only for ic==0 but its fc persists across the ic loop, :771-800).
    """
    mu_d = quad.mu_desc
    wt_d = quad.wtmu_desc
    nmu = quad.nmu
    nc = quad.nf + 1

    fc_modes = []
    for pf in phase_fns:
        p0, m0 = phase_matrices(pf, mu_d, quad.nphi, 0)
        if p0.ndim == 2:
            p0 = jnp.broadcast_to(p0, (nwave, nmu, nmu))
            m0 = jnp.broadcast_to(m0, (nwave, nmu, nmu))
        _, fc = hansen_normalise(p0, m0, wt_d)
        fc_modes.append(fc)
    if iray:
        p0, m0 = rayleigh_phase_matrices(mu_d, quad.nphi, 0)
        p0 = jnp.broadcast_to(p0, (nwave, nmu, nmu))
        m0 = jnp.broadcast_to(m0, (nwave, nmu, nmu))
        _, fc_ray = hansen_normalise(p0, m0, wt_d)

    ppln_list = []
    pmin_list = []
    for j, pf in enumerate(phase_fns):
        def build_pl(ic, pf=pf, j=j):
            pplpl, pplmi = phase_matrices(pf, mu_d, quad.nphi, ic)
            if pplpl.ndim == 2:
                pplpl = jnp.broadcast_to(pplpl, (nwave, nmu, nmu))
                pplmi = jnp.broadcast_to(pplmi, (nwave, nmu, nmu))
            return pplpl * fc_modes[j], pplmi
        pl = [build_pl(ic) for ic in range(nc)]
        ppln_list.append(jnp.stack([x[0] for x in pl], axis=0))
        pmin_list.append(jnp.stack([x[1] for x in pl], axis=0))
    if ppln_list:
        ppln = jnp.stack(ppln_list, axis=2)  # (nc, nwave, ncont, nmu, nmu)
        pmin = jnp.stack(pmin_list, axis=2)
    else:
        ppln = jnp.zeros((nc, nwave, 0, nmu, nmu), dtype)
        pmin = jnp.zeros((nc, nwave, 0, nmu, nmu), dtype)

    if iray:
        def build_ray(ic):
            pplr, pmir = rayleigh_phase_matrices(mu_d, quad.nphi, ic)
            return (jnp.broadcast_to(pplr, (nwave, nmu, nmu)) * fc_ray,
                    jnp.broadcast_to(pmir, (nwave, nmu, nmu)))
        rl_ = [build_ray(ic) for ic in range(nc)]
        pplr_b = jnp.stack([x[0] for x in rl_], axis=0)
        pmir_b = jnp.stack([x[1] for x in rl_], axis=0)
    else:
        pplr_b = jnp.zeros((nc, nwave, nmu, nmu), dtype)
        pmir_b = jnp.zeros((nc, nwave, nmu, nmu), dtype)
    return ppln, pmin, pplr_b, pmir_b


def _scloud11wave_core_rows(
    quad: ScatterQuadrature,
    ppln, pmin, pplr_b, pmir_b,
    radg, sol_ang, emiss_ang, azi_ang, solar, bnu,
    taus, tauray, tauscat, lfrac,
    brdf_matrix=None,
    nn_max: int = NN_MAX,
):
    """Struct-of-arrays doubling/adding core (f32/TPU production path).

    Same math and branch thresholds as the AoS body below, but every
    matrix stack lives as 25 flat (B,) arrays (B = nlay*nc*nwave*ng for
    the ladder, nc*nwave*ng for the layer-adding scan), so all algebra is
    fused VPU elementwise work with zero register-tile padding — measured
    ~40x less HBM traffic than the AoS (…,5,5) layout
    (tools/profile_scattering.py; BASELINE.md scattering roofline).
    """
    mu_d = quad.mu_desc
    wt_d = quad.wtmu_desc
    nmu = quad.nmu
    cc_diag = jnp.asarray(wt_d)
    mminv_diag = 1.0 / jnp.asarray(mu_d)
    xfac = 0.5 / np.sum(mu_d * wt_d)

    nwave, ng, nlay = taus.shape
    npath = emiss_ang.shape[0]
    nc = quad.nf + 1
    ncont = lfrac.shape[1]
    dtype = taus.dtype
    radg_d = radg[:, ::-1]

    # angle bracketing (identical to the AoS body)
    zmu0 = jnp.where(
        sol_ang > 90.0,
        jnp.cos(jnp.deg2rad(180.0 - sol_ang)),
        jnp.cos(jnp.deg2rad(sol_ang)),
    )
    sol_on = (sol_ang <= 90.0).astype(dtype)
    zmu = jnp.cos(jnp.deg2rad(emiss_ang))
    isol, u = _angle_bracket(zmu0, mu_d)
    iemm, t = _angle_bracket(zmu, mu_d)
    u = u.astype(dtype)  # numpy-f64 quadrature nodes otherwise promote
    t = t.astype(dtype)

    # scattering od per (wave, g, lay) (reference core :852-860)
    safe_taus = jnp.where(taus > 0.0, taus, 1.0)
    omega_in = jnp.clip(
        (tauscat + tauray)[:, None, :] / safe_taus, 0.0, 1.0
    )
    tscat_g = jnp.maximum(taus * omega_in - tauray[:, None, :], 0.0)

    # --- flatten to (B,) in (nlay, nc, nwave, ng) order ------------------
    full = (nc, nwave, ng, nlay)

    def flat(x):
        x = jnp.broadcast_to(x, full)
        return jnp.transpose(x, (3, 0, 1, 2)).reshape(-1)

    ic_axis = jnp.arange(nc, dtype=dtype)
    j_on_col = (ic_axis == 0).astype(dtype)[:, None, None, None]
    taut_f = flat(taus[None])
    tscat_f = flat(tscat_g[None])
    tray_f = flat(tauray[:, None, :][None])
    bnu_f = flat(bnu[:, None, :][None])
    frac_modes = [flat(lfrac[:, m, :][:, None, :][None])
                  for m in range(ncont)]
    j_on_f = flat(j_on_col)
    con_fac_f = flat(1.0 + j_on_col)

    def phase_el(kind, m, i, j):
        if kind == "pl":
            src = ppln[:, :, m, i, j]
        elif kind == "mi":
            src = pmin[:, :, m, i, j]
        elif kind == "rl":
            src = pplr_b[:, :, i, j]
        else:
            src = pmir_b[:, :, i, j]
        # the azimuth quadrature weights inside _phase_stacks are f64
        # numpy; pin the rows algebra to the forward dtype
        return flat(src[:, :, None, None]).astype(dtype)

    # quadrature diagonals go in as HOST numpy so the row algebra can bake
    # them into python-float constants (jnp versions are staged tracers
    # inside the wave-tiled lax.map body)
    rl, tl, jl = _rtj_rows(
        taut_f, tscat_f, tray_f, bnu_f, frac_modes, phase_el,
        np.asarray(wt_d), 1.0 / np.asarray(mu_d), j_on_f, con_fac_f,
        nn_max,
    )

    # --- layer-adding scan over nlay (same order as the AoS body) --------
    F = nc * nwave * ng
    rl = [[rl[i][j].reshape(nlay, F) for j in range(nmu)]
          for i in range(nmu)]
    tl = [[tl[i][j].reshape(nlay, F) for j in range(nmu)]
          for i in range(nmu)]
    jl = [jl[i].reshape(nlay, F) for i in range(nmu)]

    j_on_scan = jnp.broadcast_to(
        j_on_col[:, :, :, 0], (nc, nwave, ng)
    ).reshape(F)
    j_on_mask = j_on_scan > 0.5

    if brdf_matrix is not None:
        zero_f = jnp.zeros((F,), dtype)

        def brdf_el(i, j):
            src = jnp.transpose(brdf_matrix[:, i, j, :], (1, 0))  # (nc, nwave)
            fac = 2.0 * np.pi * float(mu_d[j]) * float(wt_d[j]) * float(xfac)
            return fac * jnp.broadcast_to(
                src[:, :, None], (nc, nwave, ng)
            ).reshape(F)

        r0 = [[brdf_el(i, j) for j in range(nmu)] for i in range(nmu)]
        t0 = [[zero_f for _ in range(nmu)] for _ in range(nmu)]
        j0 = [
            jnp.broadcast_to(
                radg_d[None, :, None, i], (nc, nwave, ng)
            ).reshape(F) * j_on_scan
            for i in range(nmu)
        ]
        rc, tc, jc = _combine_path_rows(rl, tl, jl, j_on_mask,
                                        r0=r0, t0=t0, j0=j0)
    else:
        rc, tc, jc = _combine_path_rows(rl, tl, jl, j_on_mask)

    jc = [jc[i] * j_on_scan for i in range(nmu)]

    # --- path extraction: convert the (small) combined operators to AoS
    # once and reuse the shared geometry code --------------------------
    shape3 = (nc, nwave, ng)
    rcomb = _rows_stack(
        [[rc[i][j].reshape(shape3) for j in range(nmu)] for i in range(nmu)]
    )  # (nc, nwave, ng, nmu, nmu)
    tcomb = _rows_stack(
        [[tc[i][j].reshape(shape3) for j in range(nmu)] for i in range(nmu)]
    )
    jcomb = jnp.stack([jc[i].reshape(shape3) for i in range(nmu)], axis=-1)

    utmi = radg_d[None] * j_on_col[..., 0]  # (nc, nwave, nmu)
    base = (
        jnp.einsum("cwgij,cwj->cwgi", tcomb, utmi) + jcomb
    )  # (nc, nwave, ng, nmu)

    cosfac = jnp.cos(
        ic_axis[:, None] * jnp.deg2rad(azi_ang)[None, :]
    ) * jnp.where(ic_axis[:, None] > 0, 2.0, 1.0)  # (nc, npath)

    def path_rad(ip):
        s = sol_on[ip] * solar / (2.0 * np.pi)  # (nwave,)
        i0 = isol[ip]
        ie = iemm[ip]
        yx = []
        for d0 in (0, 1):
            col = jnp.take(rcomb, i0 + d0, axis=4)  # (nc, nwave, ng, nmu)
            umi = base + col * (s / jnp.asarray(wt_d, dtype)[i0 + d0])[:, None, None]
            for de in (0, 1):
                yx.append(jnp.take(umi, ie + de, axis=3))
        tt, uu = t[ip], u[ip]
        drad = (
            (1 - tt) * (1 - uu) * yx[0]
            + tt * (1 - uu) * yx[1]
            + (1 - tt) * uu * yx[2]
            + tt * uu * yx[3]
        )  # (nc, nwave, ng)
        return jnp.einsum("cwg,c->wg", drad, cosfac[:, ip])

    return jnp.stack([path_rad(ip) for ip in range(npath)], axis=-1)


def _scloud11wave_core(
    quad: ScatterQuadrature,
    ppln, pmin, pplr_b, pmir_b,  # from _phase_stacks (wave axis = axis 1)
    radg,               # (nwave, nmu) ground/bottom radiance (ascending mu)
    sol_ang, emiss_ang, azi_ang,  # (npath,)
    solar,              # (nwave,)
    bnu,                # (nwave, nlay) layer Planck
    taus,               # (nwave, ng, nlay) total optical depth
    tauray,             # (nwave, nlay) Rayleigh od
    tauscat,            # (nwave, nlay) aerosol scattering od
    lfrac,              # (nwave, ncont, nlay) per-mode scattering fraction
    brdf_matrix=None,   # (nwave, nmu, nmu, nf+1) surface BRDF Fourier terms
    nn_max: int = NN_MAX,
):
    """Doubling/adding core over an arbitrary wave slab (all phase
    matrices precomputed).  Everything here scales with nwave — this is
    the function the wave-tiled driver maps over tiles.

    float32 dispatches to the struct-of-arrays fast path (see the row
    algebra section above); float64 keeps this AoS body, whose inverse
    ordering and dot sums are the oracle-parity contract (rtol 1e-10).

    The rows path unrolls the nmu x nmu algebra into ~nmu^3 scalar-HLO
    ops per primitive at trace time, so its compile cost grows steeply
    with quadrature order (measured: seconds at NMU=5, ~5 min at NMU=10,
    ~26 min at NMU=15) — but it is both much faster steady-state AND the
    only f32 core that runs at high order on the v5e (the AoS f32 body
    crashes the TPU worker at NMU=15; BASELINE.md A/B), so f32 always
    takes it. ROWS_NMU_MAX exists as a diagnostics escape hatch.
    """
    if taus.dtype == jnp.float32 and quad.nmu <= ROWS_NMU_MAX:
        return _scloud11wave_core_rows(
            quad, ppln, pmin, pplr_b, pmir_b, radg,
            sol_ang, emiss_ang, azi_ang, solar, bnu,
            taus, tauray, tauscat, lfrac, brdf_matrix, nn_max,
        )
    mu_d = quad.mu_desc
    wt_d = quad.wtmu_desc
    nmu = quad.nmu
    cc_diag = jnp.asarray(wt_d)
    mminv_diag = 1.0 / jnp.asarray(mu_d)
    xfac = 0.5 / np.sum(mu_d * wt_d)

    nwave, ng, nlay = taus.shape
    npath = emiss_ang.shape[0]
    radg_d = radg[:, ::-1]  # descending mu order

    # aerosol scattering od per (wave, g, lay): reference clamps omega to
    # [0,1] then tauscat = taut*omega - tauray >= 0  (core :852-860)
    safe_taus = jnp.where(taus > 0.0, taus, 1.0)
    omega_in = jnp.clip(
        (tauscat + tauray)[:, None, :] / safe_taus, 0.0, 1.0
    )
    tscat_g = jnp.maximum(
        taus * omega_in - tauray[:, None, :], 0.0
    )  # (nwave, ng, nlay)
    tray_g = jnp.broadcast_to(tauray[:, None, :], taus.shape)
    bnu_g = jnp.broadcast_to(bnu[:, None, :], taus.shape)
    frac_g = jnp.broadcast_to(
        jnp.transpose(lfrac, (0, 2, 1))[:, None, :, :],
        (nwave, ng, nlay, lfrac.shape[1]),
    )

    # solar/emission bracketing per path (static quadrature, traced angles)
    zmu0 = jnp.where(
        sol_ang > 90.0,
        jnp.cos(jnp.deg2rad(180.0 - sol_ang)),
        jnp.cos(jnp.deg2rad(sol_ang)),
    )
    sol_on = (sol_ang <= 90.0).astype(taus.dtype)
    zmu = jnp.cos(jnp.deg2rad(emiss_ang))
    isol, u = _angle_bracket(zmu0, mu_d)
    iemm, t = _angle_bracket(zmu, mu_d)

    rad = jnp.zeros((nwave, ng, npath), dtype=taus.dtype)

    # --- ALL Fourier components in ONE batched R/T/J evaluation ---------
    # The reference loops ic = 0..NF re-running the full doubling ladder
    # per component (Multiple_Scattering_Core.py:790); here the component
    # axis is just another leading batch dim (nc, nwave, ng, nlay, ...) so
    # the NN_MAX doubling iterations and the layer scan run once.
    nc = quad.nf + 1

    # component masks: the thermal/ground source J lives only in ic=0, and
    # the phase normalisation factor is (1 + del(0,ic))
    ic_axis = jnp.arange(nc, dtype=taus.dtype)
    j_on = (ic_axis == 0).astype(taus.dtype)[:, None, None, None]
    con_fac = (1.0 + j_on)  # (nc, 1, 1, 1) against (nc, nwave, ng, nlay)

    bshape = (nc, nwave, ng, nlay)
    ppln_b = jnp.broadcast_to(
        ppln[:, :, None, None], bshape + ppln.shape[2:]
    )
    pmin_b = jnp.broadcast_to(
        pmin[:, :, None, None], bshape + pmin.shape[2:]
    )
    pplr_bb = jnp.broadcast_to(
        pplr_b[:, :, None, None], bshape + (nmu, nmu)
    )
    pmir_bb = jnp.broadcast_to(
        pmir_b[:, :, None, None], bshape + (nmu, nmu)
    )
    rl, tl, jl = layer_rtj(
        jnp.broadcast_to(taus, bshape),
        jnp.broadcast_to(tscat_g, bshape),
        jnp.broadcast_to(tray_g, bshape),
        jnp.broadcast_to(bnu_g, bshape),
        jnp.broadcast_to(frac_g[None], bshape + frac_g.shape[-1:]),
        ppln_b, pmin_b, pplr_bb, pmir_bb,
        cc_diag, mminv_diag, j_on, con_fac, nn_max,
    )  # (nc, nwave, ng, nlay, nmu, nmu)

    # combine top-down (lookdown): layer index 0 = top is combined LAST
    # in the reference (it iterates l=0..nlay-1 with k=l and the
    # accumulated rsub below); the scan wants first-combined first.
    rl_s = jnp.moveaxis(rl, 3, 0)  # (nlay, nc, nwave, ng, nmu, nmu)
    tl_s = jnp.moveaxis(tl, 3, 0)
    jl_s = jnp.moveaxis(jl, 3, 0)

    j_on_p = j_on[:, :, :, :, None]  # (nc,1,1,1,1) against (...,nmu,1)
    if brdf_matrix is not None:
        rs = (
            2.0 * np.pi * jnp.moveaxis(brdf_matrix, 3, 0)
            * jnp.asarray(mu_d)[None, None, None, :]
            * jnp.asarray(wt_d)[None, None, None, :]
        ) * xfac  # (nc, nwave, nmu, nmu)
        rs = jnp.broadcast_to(rs[:, :, None], (nc, nwave, ng, nmu, nmu))
        js = jnp.broadcast_to(
            radg_d[None, :, None, :, None], (nc, nwave, ng, nmu, 1)
        ) * j_on_p
        ts = jnp.zeros_like(rs)
        rcomb, tcomb, jcomb = combine_path(
            rl_s, tl_s, jl_s, j_on_p, r0=rs, t0=ts, j0=js
        )
    else:
        rcomb, tcomb, jcomb = combine_path(rl_s, tl_s, jl_s, j_on_p)

    jcomb = jcomb * j_on_p

    # path extraction (reference :886-958), lookdown
    utmi = radg_d[None] * j_on[..., 0]  # (nc, nwave, nmu)
    base = (
        jnp.einsum("cwgij,cwj->cwgi", tcomb, utmi) + jcomb[..., 0]
    )  # (nc, nwave, ng, nmu)

    cosfac = jnp.cos(
        ic_axis[:, None] * jnp.deg2rad(azi_ang)[None, :]
    ) * jnp.where(ic_axis[:, None] > 0, 2.0, 1.0)  # (nc, npath)

    def path_rad(ip):
        s = sol_on[ip] * solar / (2.0 * np.pi)  # (nwave,)
        i0 = isol[ip]
        ie = iemm[ip]
        yx = []
        for d0 in (0, 1):
            col = jnp.take(rcomb, i0 + d0, axis=4)  # (nc, nwave, ng, nmu)
            umi = base + col * (s / jnp.asarray(wt_d)[i0 + d0])[:, None, None]
            for de in (0, 1):
                yx.append(jnp.take(umi, ie + de, axis=3))
        tt, uu = t[ip], u[ip]
        drad = (
            (1 - tt) * (1 - uu) * yx[0]
            + tt * (1 - uu) * yx[1]
            + (1 - tt) * uu * yx[2]
            + tt * uu * yx[3]
        )  # (nc, nwave, ng)
        return jnp.einsum("cwg,c->wg", drad, cosfac[:, ip])

    rad = rad + jnp.stack(
        [path_rad(ip) for ip in range(npath)], axis=-1
    )

    return rad


def scloud11wave(
    quad: ScatterQuadrature,
    phase_fns,          # list of callables calpha -> p (one per aerosol mode)
    radg,               # (nwave, nmu) ground/bottom radiance (desc order applied internally)
    sol_ang, emiss_ang, azi_ang,  # (npath,)
    solar,              # (nwave,)
    bnu,                # (nwave, nlay) layer Planck
    taus,               # (nwave, ng, nlay) total optical depth
    tauray,             # (nwave, nlay) Rayleigh od
    tauscat,            # (nwave, nlay) aerosol scattering od
    lfrac,              # (nwave, ncont, nlay) per-mode scattering fraction
    iray: bool,
    brdf_matrix=None,   # (nwave, nmu, nmu, nf+1) surface BRDF Fourier terms
    nn_max: int = NN_MAX,
):
    """Upward radiance (nwave, ng, npath) by adding-doubling (reference
    scloud11wave_core, Multiple_Scattering_Core.py:652-960), lookdown
    geometry (emission angle < 90).

    All Fourier components 0..nf are evaluated (no data-dependent break).
    ``tauscat`` here is the aerosol-only scattering od; the total single
    scattering albedo is (tauscat+tauray)/taus per g (reference wrapper
    ForwardModel_0.py:5121-5128 and core :852-860).
    """
    nwave = taus.shape[0]
    ppln, pmin, pplr_b, pmir_b = _phase_stacks(
        quad, phase_fns, iray, nwave, taus.dtype
    )
    return _scloud11wave_core(
        quad, ppln, pmin, pplr_b, pmir_b, radg,
        sol_ang, emiss_ang, azi_ang, solar, bnu,
        taus, tauray, tauscat, lfrac, brdf_matrix, nn_max,
    )


def scloud11wave_tiled(
    quad: ScatterQuadrature,
    phase_fns,
    radg, sol_ang, emiss_ang, azi_ang, solar, bnu,
    taus, tauray, tauscat, lfrac,
    iray: bool,
    brdf_matrix=None,
    nn_max: int = NN_MAX,
    wave_tile: int = 256,
):
    """Wave-tiled adding-doubling driver for production spectral grids.

    The doubling/adding core keeps (nc, nwave, ng, nlay, nmu, nmu) R/T/J
    stacks live: at LBL-resolution grids (10^4-10^5 waves) that exceeds a
    16 GB v5e's HBM (2048 waves ~ 32 GB at the Jupiter shape).  The
    reference never materialises this because it loops wave-by-wave in
    Python (Multiple_Scattering_Core.py:790); the TPU-native equivalent
    is ``lax.map`` over wave tiles — ONE compiled tile program run
    ntiles times sequentially, live memory bounded by the tile, full MXU
    batching within the tile.

    Phase-matrix stacks (small: nc*nwave*ncont*nmu^2) are computed once
    on the full grid and sliced per tile.  Padding lanes (taus=0) are
    numerically inert (no cross-wave mixing anywhere in the core) and
    discarded on exit.  Numerics are identical to `scloud11wave` per
    wave modulo XLA fusion-order rounding.
    """
    nwave = taus.shape[0]
    if nwave <= wave_tile:
        return scloud11wave(
            quad, phase_fns, radg, sol_ang, emiss_ang, azi_ang, solar,
            bnu, taus, tauray, tauscat, lfrac, iray, brdf_matrix, nn_max,
        )
    ppln, pmin, pplr_b, pmir_b = _phase_stacks(
        quad, phase_fns, iray, nwave, taus.dtype
    )

    ntiles = -(-nwave // wave_tile)
    pad = ntiles * wave_tile - nwave

    def tile_axis0(x):
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return x.reshape((ntiles, wave_tile) + x.shape[1:])

    def tile_axis1(x):  # (nc, nwave, ...) -> (ntiles, nc, wave_tile, ...)
        x = jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))
        x = x.reshape(
            (x.shape[0], ntiles, wave_tile) + x.shape[2:]
        )
        return jnp.moveaxis(x, 1, 0)

    xs = {
        "ppln": tile_axis1(ppln), "pmin": tile_axis1(pmin),
        "pplr": tile_axis1(pplr_b), "pmir": tile_axis1(pmir_b),
        "radg": tile_axis0(radg), "solar": tile_axis0(solar),
        "bnu": tile_axis0(bnu), "taus": tile_axis0(taus),
        "tauray": tile_axis0(tauray), "tauscat": tile_axis0(tauscat),
        "lfrac": tile_axis0(lfrac),
    }
    if brdf_matrix is not None:
        xs["brdf"] = tile_axis0(brdf_matrix)

    def body(x):
        return _scloud11wave_core(
            quad, x["ppln"], x["pmin"], x["pplr"], x["pmir"], x["radg"],
            sol_ang, emiss_ang, azi_ang, x["solar"], x["bnu"],
            x["taus"], x["tauray"], x["tauscat"], x["lfrac"],
            x.get("brdf"), nn_max,
        )

    rad = jax.lax.map(body, xs)  # (ntiles, wave_tile, ng, npath)
    return rad.reshape((ntiles * wave_tile,) + rad.shape[2:])[:nwave]

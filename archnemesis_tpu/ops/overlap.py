"""Random-overlap mixing of correlated-k distributions.

TPU-first rewrite of the reference's sequential resort-rebin
(``ForwardModel_0.py:5843`` k_overlapg / ``:5960`` rankg / ``:6030``
k_overlap): the per-(wave,layer) Python double loop becomes a batched
XLA sort + interval-overlap rebin.

Algorithm (identical numerics to rankg):
for each gas pair, form the NG x NG random-overlap products
``tau_ij = tau_a[i] + tau_b[j]`` with weights ``w_ij = del_g[i]*del_g[j]``,
sort by tau, lay the sorted elements end-to-end on [0,1] (cumulative weight),
and average tau over each output g-bin, splitting elements that straddle a
bin edge proportionally. The straddle is bounded: an element's width is at
most max(del_g)^2, so it can cross at most ``nstraddle`` bins — computed
statically from del_g at setup, making the rebin a fixed-size scatter-add
instead of a data-dependent loop.
"""

import jax
import jax.numpy as jnp
import numpy as np


def overlap_nstraddle(del_g: np.ndarray) -> int:
    """Max number of output bins a sorted element can intersect (static)."""
    del_g = np.asarray(del_g)
    max_elem = float(del_g.max()) ** 2
    min_bin = float(del_g.min())
    return int(np.floor(max_elem / min_bin)) + 2


def g_bin_edges(del_g: np.ndarray) -> np.ndarray:
    """Output g-bin edges: cumsum of del_g with the top edge forced to 1
    (mirrors rankg's g_ord construction)."""
    del_g = np.asarray(del_g)
    edges = np.zeros(del_g.shape[0] + 1)
    edges[1:] = np.cumsum(del_g)
    edges[-1] = 1.0
    return edges


def _combine_pair(w2, g_edges, tau_a, tau_b, nstraddle=None):
    """Random-overlap combine of two k-distributions.

    tau_a, tau_b: (..., NG) optical-depth distributions.
    w2: (NG*NG,) static pair weights del_g[i]*del_g[j].
    Returns (..., NG).

    TPU mapping: one multi-operand ``lax.sort`` co-sorts the pair weights
    with the tau keys (no argsort + gathers — gathers/scatters serialize on
    TPU), and the rebin is an elementwise interval-overlap contraction over
    the NG output bins (no scatter-add). ``nstraddle`` is accepted for
    API compatibility but unused: the contraction covers every bin an
    element can intersect by construction.
    """
    ng = tau_a.shape[-1]
    batch = tau_a.shape[:-1]

    tau = (tau_a[..., :, None] + tau_b[..., None, :]).reshape(*batch, ng * ng)
    w_full = jnp.broadcast_to(w2, tau.shape)
    tau_s, w_s = jax.lax.sort((tau, w_full), dimension=-1, num_keys=1)
    ghi = jnp.cumsum(w_s, axis=-1)
    glo = ghi - w_s

    # interval-overlap of each sorted element [glo, ghi) with each output
    # g-bin [e_j, e_{j+1}): a (..., NG*NG, NG) clip contracted over elements.
    lo_e = g_edges[:-1]
    hi_e = g_edges[1:]
    inter = jnp.clip(
        jnp.minimum(ghi[..., None], hi_e) - jnp.maximum(glo[..., None], lo_e),
        0.0,
        None,
    )
    num = jnp.einsum("...n,...nj->...j", tau_s, inter)
    den = jnp.sum(inter, axis=-2)
    return num / jnp.maximum(den, jnp.finfo(tau.dtype).tiny)


def _pallas_default() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mix_gas_k(del_g, k_gas, amounts, nstraddle=None, g_edges=None,
              use_pallas=None):
    """Sequentially mix per-gas k-distributions into layer optical depths.

    Parameters
    ----------
    del_g : (NG,) g-bin widths (static numpy or traced; edges/straddle are
        derived from a numpy copy at trace time if not provided)
    k_gas : (NWAVE, NG, NLAY, NGAS) per-gas k at layer (P,T) [cm^2]
    amounts : (NGAS, NLAY) per-gas column densities [cm^-2]

    Returns
    -------
    tau : (NWAVE, NG, NLAY) mixed gas optical depth.

    Skip semantics match the reference (k_overlapg cutoff=0): a gas whose
    largest-g optical depth is <= 0 in a layer contributes nothing there,
    and mixing with an empty accumulated distribution is a copy.
    """
    ngas = k_gas.shape[-1]
    if isinstance(del_g, jax.core.Tracer):
        raise TypeError(
            "mix_gas_k needs static (numpy) del_g to derive bin edges and the"
            " straddle bound; pass the host-side copy kept in the run config"
        )
    if use_pallas is None:
        use_pallas = _pallas_default() and k_gas.dtype == jnp.float32
    if use_pallas and ngas > 1:
        from archnemesis_tpu.ops.overlap_pallas import mix_gas_k_pallas

        return mix_gas_k_pallas(del_g, k_gas, amounts)
    del_g_np = np.asarray(del_g)
    if g_edges is None:
        g_edges = jnp.asarray(g_bin_edges(del_g_np))
    if nstraddle is None:
        nstraddle = overlap_nstraddle(del_g_np)
    w2 = (jnp.asarray(del_g_np)[:, None] * jnp.asarray(del_g_np)[None, :]).reshape(-1)

    # (NWAVE, NG, NLAY, NGAS) -> (NWAVE, NLAY, NG, NGAS): g fast axis
    k_wlg = jnp.transpose(k_gas, (0, 2, 1, 3))

    tau = k_wlg[..., 0] * amounts[0][None, :, None]
    for i in range(1, ngas):
        tau_b = k_wlg[..., i] * amounts[i][None, :, None]
        mixed = _combine_pair(w2, g_edges, tau, tau_b, nstraddle)
        skip_b = (tau_b[..., -1] <= 0.0)[..., None]
        skip_a = (tau[..., -1] <= 0.0)[..., None]
        tau = jnp.where(skip_b, tau, jnp.where(skip_a, tau_b, mixed))
    return jnp.transpose(tau, (0, 2, 1))

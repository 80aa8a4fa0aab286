"""Pseudo-continuum (pre-binned weak lines) vs the reference kernels.

Oracle: LineData_0.add_pseudo_continuum_monochromatic_absorption (:486) run
through the numba stub on synthetic bin data — exercises the strength
re-scaling to layer (T, P), the ±3-bin lineshape spread, the bin-width
normalisation and the tent interpolation (including the reference's
exclusive-j_max endpoint behaviour, LineData_0.py:478).
"""

import numpy as np
import pytest

from archnemesis_tpu.ops.pseudo_continuum import (
    PseudoContinuum,
    pseudo_continuum_k,
)


def _make_pc(nb=40, w0=1200.0, width=2.5):
    rng = np.random.default_rng(11)
    centers = w0 + width * np.arange(nb)
    return PseudoContinuum(
        t_ref=296.0,
        p_ref=1.0,
        mass=16.04,
        abundance=0.98,
        wn_bin_center=centers,
        wn_bin_width=np.full(nb, width),
        strength_sum=10 ** rng.uniform(-23, -21, nb),
        lsw_e_lower=rng.uniform(50.0, 1500.0, nb),
        lsw_gamma_self=rng.uniform(0.05, 0.09, nb),
        lsw_n_self=rng.uniform(0.5, 0.8, nb),
        lsw_gamma_amb=rng.uniform(0.03, 0.07, nb),
        lsw_n_amb=rng.uniform(0.4, 0.7, nb),
        pf_temp=np.linspace(50.0, 500.0, 46),
        pf_q=100.0 * (np.linspace(50.0, 500.0, 46) / 296.0) ** 1.2,
    )


def _oracle(pc, wave, t, p, amb):
    import sys

    sys.path.insert(0, "tools/numba_stub")
    sys.path.insert(0, "/root/reference")
    from archnemesis.LineData_0 import (
        add_pseudo_continuum_monochromatic_absorption,
    )
    from archnemesis import lineshape as rl

    q_t = np.interp(t, pc.pf_temp, pc.pf_q)
    q_ref = np.interp(pc.t_ref, pc.pf_temp, pc.pf_q)
    out = np.zeros_like(wave)
    broad = np.stack(
        [pc.lsw_gamma_self, pc.lsw_n_self, np.zeros_like(pc.lsw_n_self),
         pc.lsw_gamma_amb, pc.lsw_n_amb, np.zeros_like(pc.lsw_n_amb)]
    )
    add_pseudo_continuum_monochromatic_absorption(
        wave,
        rl.voigt,
        t, pc.t_ref, p, pc.p_ref,
        q_ref / q_t,
        pc.abundance,
        pc.mass,
        np.array([1.0 - amb, amb]),
        broad,
        pc.wn_bin_center,
        pc.wn_bin_width,
        pc.strength_sum,
        pc.lsw_e_lower,
        out=out,
    )
    return out


def test_ans_pc_file_roundtrip(tmp_path):
    """Reader handles the ans pseudo-continuum HDF5 layout, including
    (s_max, t_cont) leaf ordering and broadener fallback."""
    import h5py

    from archnemesis_tpu.io.linedata import read_ans_pseudo_continuum

    pc = _make_pc()
    p = str(tmp_path / "pc_ch4.h5")
    with h5py.File(p, "w") as f:
        for i, (tc, gshift) in enumerate([(200.0, 0.0), (300.0, 1e-3)]):
            g = f.create_group(f"pseudo_continuum/CH4/1/pc_data_{i:04d}")
            g.attrs["t_cont"] = tc
            g.attrs["s_max"] = 1e-25
            g.attrs["p_ref"] = 1.0
            g["wn_bin_center"] = pc.wn_bin_center
            g["wn_bin_width"] = pc.wn_bin_width
            g["line_strength_sum"] = pc.strength_sum
            g["line_strength_weighted_mean_lower_energy_state"] = (
                pc.lsw_e_lower
            )
            g["line_strength_weighted_gamma_self"] = (
                pc.lsw_gamma_self + gshift
            )
            g["line_strength_weighted_n_self"] = pc.lsw_n_self
            b = g.create_group("broadeners/AIR")
            b["line_strength_weighted_gamma_amb"] = pc.lsw_gamma_amb
            b["line_strength_weighted_n_amb"] = pc.lsw_n_amb

    got = read_ans_pseudo_continuum(
        p, 6, 1, temperature=180.0, pf_temp=pc.pf_temp, pf_q=pc.pf_q
    )
    assert got.t_ref == 200.0  # lowest t_cont >= 180
    np.testing.assert_allclose(got.lsw_gamma_self, pc.lsw_gamma_self)
    np.testing.assert_allclose(got.lsw_gamma_amb, pc.lsw_gamma_amb)
    got2 = read_ans_pseudo_continuum(p, 6, 1, temperature=250.0)
    assert got2.t_ref == 300.0
    # broadener fallback: a file without the AIR group uses self params
    with h5py.File(p, "r+") as f:
        del f["pseudo_continuum/CH4/1/pc_data_0000/broadeners"]
    got3 = read_ans_pseudo_continuum(p, 6, 1, temperature=180.0)
    np.testing.assert_allclose(got3.lsw_gamma_amb, got3.lsw_gamma_self)


@pytest.mark.parametrize(
    "grid", ["inside", "straddle_high"]
)
def test_pseudo_continuum_matches_reference(grid):
    pc = _make_pc()
    if grid == "inside":
        wave = np.linspace(1210.0, 1280.0, 1401)
    else:
        # grid extends beyond the top bin: exercises the last_idx cutoff
        wave = np.linspace(1250.0, 1320.0, 1401)
    t = np.array([150.0, 230.0, 310.0])
    p = np.array([1e-4, 1e-2, 0.5])
    amb = np.array([0.85, 0.9, 0.95])

    got = np.asarray(pseudo_continuum_k(pc, wave, t, p, amb))
    for il in range(t.size):
        want = _oracle(pc, wave, float(t[il]), float(p[il]), float(amb[il]))
        scale = max(want.max(), 1e-300)
        np.testing.assert_allclose(
            got[:, il], want, rtol=1e-7, atol=1e-9 * scale,
            err_msg=f"layer {il} grid {grid}",
        )
    assert got.max() > 0

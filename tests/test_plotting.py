"""Plotting diagnostics render without error and write non-trivial PNGs
(counterparts of the reference per-class plot methods: plot_Atm
Atmosphere_0.py:1703, plot_bestfit OptimalEstimation_0.py:1119, plot_ils
Measurement_0.py:2880, corner plots NestedSampling_0.py:107)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from archnemesis_tpu import plotting


class _Res:
    pass


@pytest.fixture(scope="module")
def atm():
    from archnemesis_tpu.io.legacy import load_deck

    return load_deck("tests/fixtures/jupiter_nadir", "cirstest")


def _save(fig, tmp_path, name):
    p = tmp_path / name
    fig.savefig(p, dpi=60)
    assert p.stat().st_size > 2000
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_plot_atmosphere(atm, tmp_path):
    _save(plotting.plot_atmosphere(atm.atmosphere), tmp_path, "atm.png")


def test_plot_spectrum(atm, tmp_path):
    _save(plotting.plot_spectrum(atm.geometry), tmp_path, "spec.png")


def test_plot_bestfit_and_kernels(tmp_path):
    rng = np.random.default_rng(0)
    ny, nx = 40, 5

    class Setup:
        y = rng.uniform(1, 2, ny)
        se = np.diag(np.full(ny, 0.01))
        vconv_list = [np.linspace(600, 700, ny)]

    res = _Res()
    res.yn = Setup.y + rng.normal(0, 0.05, ny)
    res.aa = rng.uniform(0, 1, (nx, nx))
    res.phi_history = [100.0, 10.0, 5.0]
    _save(plotting.plot_bestfit(Setup, res), tmp_path, "fit.png")
    _save(plotting.plot_averaging_kernel(res), tmp_path, "aa.png")
    _save(plotting.plot_phi_history(res), tmp_path, "phi.png")


def test_plot_ils(tmp_path):
    from archnemesis_tpu.enums import InstrumentLineshape
    from archnemesis_tpu.ops.convolution import ils_weights_lbl

    wave = np.linspace(990.0, 1010.0, 800)
    vconv = np.linspace(995.0, 1005.0, 11)
    w = ils_weights_lbl(wave, vconv, 0.8, InstrumentLineshape.Gaussian)
    _save(plotting.plot_ils(wave, w, vconv), tmp_path, "ils.png")


def test_plot_corner(tmp_path):
    rng = np.random.default_rng(1)
    s = rng.multivariate_normal([0, 1, -1], np.eye(3) * 0.1, size=400)
    _save(plotting.plot_corner(s, names=["a", "b", "c"]), tmp_path,
          "corner.png")

"""Round-trips of the legacy retrieval output formats: write_mre/read_mre
and write_cov/read_cov (reference writers OptimalEstimation_0.py:722,873 and
readers Files.read_mre:594, read_cov:760)."""

import numpy as np
import pytest

from archnemesis_tpu.enums import SpectraUnit, WaveUnit
from archnemesis_tpu.models.base import ModelEntry, ProfileTarget
from archnemesis_tpu.retrieval.output import (
    read_cov,
    read_mre,
    write_cov,
    write_mre,
)


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(3)
    ny, nx, nconv = 12, 5, 12
    entries = (
        ModelEntry(varident=(0, 0, 0), model_id=0, ix=0, nx=3,
                   target=ProfileTarget.TEMPERATURE, extra=(1.5,)),
        ModelEntry(varident=(-1, 0, 32), model_id=32, ix=3, nx=2,
                   target=ProfileTarget.AEROSOL, extra=()),
    )
    sv = _NS(entries=entries, nx=nx,
             xa=rng.uniform(0.5, 2.0, nx), sa=np.eye(nx) * 0.04,
             lx=np.array([0, 0, 0, 1, 1]))
    geom = _NS(ngeom=1, nconv=np.array([nconv]),
               vconv=np.linspace(600.0, 700.0, nconv)[:, None],
               latitude=12.5, longitude=-30.0)
    st = _NS(ispace=WaveUnit.Wavenumber_cm, iform=SpectraUnit.Radiance)
    setup = _NS(sv=sv, deck=_NS(geometry=geom, settings=st),
                y=rng.uniform(1.0, 2.0, ny),
                se=np.diag(rng.uniform(0.01, 0.02, ny) ** 2))
    res = _NS(xn=sv.xa + rng.normal(0, 0.05, nx),
              yn=setup.y * (1 + rng.normal(0, 0.01, ny)),
              st=np.eye(nx) * 0.01, sm=np.eye(nx) * 0.005,
              sn=np.eye(nx) * 0.005,
              aa=rng.uniform(0, 1, (nx, nx)),
              dd=rng.uniform(-1, 1, (nx, ny)),
              kk=rng.uniform(-1, 1, (ny, nx)))
    return setup, res


def test_mre_roundtrip(synth, tmp_path):
    setup, res = synth
    p = str(tmp_path / "t.mre")
    write_mre(p, setup, res)
    out = read_mre(p)
    sv = setup.sv
    assert out["nx"] == sv.nx and out["ny"] == setup.y.size
    assert out["nvar"] == len(sv.entries)
    # .mre radiances carry the 1e9 nW unit factor
    np.testing.assert_allclose(out["y"], setup.y * 1e9, rtol=1e-6)
    np.testing.assert_allclose(out["yn"], res.yn * 1e9, rtol=1e-6)
    np.testing.assert_allclose(
        out["vconv"], setup.deck.geometry.vconv[:, 0], rtol=1e-6)
    # parameters come back unlogged
    want_xn = np.where(sv.lx == 1, np.exp(res.xn), res.xn)
    np.testing.assert_allclose(out["xn"], want_xn, rtol=2e-5)
    np.testing.assert_array_equal(
        out["varident"], [e.varident for e in sv.entries])


def test_cov_roundtrip(synth, tmp_path):
    setup, res = synth
    p = str(tmp_path / "t.cov")
    write_cov(p, setup, res)
    out = read_cov(p)
    np.testing.assert_allclose(out["sa"], setup.sv.sa, rtol=1e-7)
    for k in ("sm", "sn", "st", "aa", "dd", "kk"):
        np.testing.assert_allclose(out[k], getattr(res, k), rtol=1e-7,
                                   err_msg=k)
    np.testing.assert_allclose(out["se"], np.diag(setup.se), rtol=1e-7)

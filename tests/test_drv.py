"""Fortran-NEMESIS .drv path-driver file I/O (reference Files.py:873
read_drv). write_drv exports this framework's layering + paths; read_drv
round-trips them."""

import numpy as np

from archnemesis_tpu.core import Atmosphere, LayerConfig
from archnemesis_tpu.enums import PathCalc
from archnemesis_tpu.io.legacy import read_drv, write_drv
from archnemesis_tpu.rt import build_layers
from archnemesis_tpu.rt.path import nadir_path


def test_drv_roundtrip(tmp_path):
    d = np.load("tests/goldens/jupiter_layering.npz")
    atm = Atmosphere(
        h=d["H"], p=d["P"], t=d["T"], vmr=d["VMR"], dust=d["DUST"],
        parah2=d["PARAH2"], molwt=d["MOLWT"], radius=d["RADIUS"],
        latitude=d["LATITUDE"],
        dust_units_flag=tuple(int(x) for x in d["DUST_UNITS_FLAG"]) or None,
    )
    cfg = LayerConfig(
        nlay=int(d["NLAY"]), laytyp=int(d["LAYTYP"]),
        layint=int(d["LAYINT"]),
        layht=max(float(d["LAYHT"]), float(d["H"][0])),
    )
    layers = build_layers(atm, cfg)
    paths = nadir_path(layers, atm.radius, atm.h[-1], 30.0,
                       imod=PathCalc.THERMAL_EMISSION)

    ngas = np.asarray(atm.vmr).shape[1]
    gas_id = list(range(1, ngas + 1))
    iso_id = [0] * ngas
    p = str(tmp_path / "run.drv")
    write_drv(p, "run", layers, paths, gas_id, iso_id)

    out = read_drv(p)
    assert out["nlayer"] == layers.nlay
    assert out["npath"] == 1
    assert out["ngas"] == ngas
    np.testing.assert_allclose(
        out["baseh"], np.asarray(layers.baseh) / 1e3, rtol=1e-5)
    np.testing.assert_allclose(
        out["basep"], np.asarray(layers.basep) / 101325.0, rtol=1e-5)
    np.testing.assert_allclose(
        out["totam"], np.asarray(layers.totam) * 1e-4, rtol=1e-5)
    np.testing.assert_allclose(
        out["par_coldens"], np.asarray(layers.amount) * 1e-4, rtol=1e-5)
    nin = int(np.asarray(paths.mask)[:, 0].sum())
    np.testing.assert_array_equal(
        out["layinc"][0, :nin], np.asarray(paths.layinc)[:nin, 0])
    np.testing.assert_allclose(
        out["scale"][0, :nin], np.asarray(paths.scale)[:nin, 0], rtol=1e-5)

"""Reference physics data: gas/isotope masses, planetary parameters.

JSON assets are extracted from the reference's data tables
(``archnemesis/Data/gas_data.py``, ``planet_data.py``) by
``tools/gen_data_assets.py`` — pure physical data (HITRAN isotope masses,
IAU planetary constants), loaded once at import.
"""

import json
import os
from functools import lru_cache

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


@lru_cache(maxsize=None)
def _load(name):
    with open(os.path.join(_ASSET_DIR, name + ".json")) as f:
        return json.load(f)


def gas_info():
    """Dict keyed by str(gas_id) with name / isotope masses / mean mol weight."""
    return _load("gas_info")


def planet_info():
    """Dict keyed by str(planet_id) with mass, radius, flattening, J coeffs."""
    return _load("planet_info")


def gas_name(gas_id: int, iso_id: int = 0) -> str:
    gi = gas_info()[str(gas_id)]
    if iso_id == 0:
        return gi["name"]
    return gi["isotope"][str(iso_id)]["name"]


def molecular_weight(gas_id: int, iso_id: int = 0) -> float:
    """Molar mass (g/mol) of a gas (iso_id=0: abundance-weighted mean).
    Unknown isotopologue ids fall back to the gas mean (some legacy decks
    reference isotopes absent from the catalogue)."""
    gi = gas_info()[str(gas_id)]
    if iso_id == 0 or str(iso_id) not in gi["isotope"]:
        return gi["mmw"]
    return gi["isotope"][str(iso_id)]["mass"]


def calc_mmw(vmr, ids, isos=None) -> float:
    """Mean molecular weight (g/mol) for volume mixing ratios ``vmr`` of gases
    ``ids``.

    Mirrors reference ``Data/gas_data.py:38`` (Calc_mmw): iso_id 0 uses the
    terrestrial-abundance mean molar mass of each gas.
    """
    total = 0.0
    for i, gid in enumerate(ids):
        total += vmr[i] * molecular_weight(int(gid), 0)
    return total


def svp_coefficients():
    """Antoine-style saturation-vapour-pressure coefficients (a, b, c, d)
    per gas id: svp[atm] = vp * exp(a + b/T + c T + d T^2) (reference
    Data/gas_data.py:3454)."""
    return _load("svp_coefficients")

"""Dump physics data tables from the reference into JSON assets.

Extracts gas/isotope masses and planetary parameters (physical data, not code)
from the reference package into ``archnemesis_tpu/data/*.json`` so the
framework never imports the reference at runtime.

Run once: ``python tools/gen_data_assets.py``
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.refutils import import_reference  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "archnemesis_tpu",
    "data",
    "assets",
)


def main():
    import_reference()
    from archnemesis.Data.gas_data import (
        gas_info, gas_id, atom_mass, svp_coefficients,
    )
    from archnemesis.Data.planet_data import planet_info

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "gas_info.json"), "w") as f:
        json.dump(gas_info, f)
    with open(os.path.join(OUT_DIR, "gas_id.json"), "w") as f:
        json.dump(gas_id, f)
    with open(os.path.join(OUT_DIR, "atom_mass.json"), "w") as f:
        json.dump(atom_mass, f)
    with open(os.path.join(OUT_DIR, "planet_info.json"), "w") as f:
        json.dump(planet_info, f)
    with open(os.path.join(OUT_DIR, "svp_coefficients.json"), "w") as f:
        json.dump({str(k): list(v) for k, v in svp_coefficients.items()}, f)
    print("wrote assets to", OUT_DIR)


if __name__ == "__main__":
    main()

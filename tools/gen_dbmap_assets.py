"""Extract gas-identity mappings between the NEMESIS (RADTRAN) catalogue and
external line databases into a JSON asset, and vendor the TIPS-2025
partition-function tables.

These are physical catalogue data (isotopologue identity correspondences and
partition sums), not code — same policy as tools/gen_data_assets.py.

Run once: ``python tools/gen_dbmap_assets.py``
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.refutils import import_reference  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "archnemesis_tpu", "data", "assets")


def main():
    import_reference()
    from archnemesis.database.mappings.geisa import radtran_to_geisa
    from archnemesis.database.mappings.hitran import radtran_to_hitran

    out = {
        "radtran_to_hitran": [
            [list(k), list(v)] for k, v in radtran_to_hitran.items()
        ],
        "radtran_to_geisa": [
            [list(k), [v] if not isinstance(v, (tuple, list)) else list(v)]
            for k, v in radtran_to_geisa.items()
        ],
    }
    os.makedirs(ASSETS, exist_ok=True)
    with open(os.path.join(ASSETS, "db_mappings.json"), "w") as f:
        json.dump(out, f)
    print("wrote db_mappings.json",
          len(out["radtran_to_hitran"]), "hitran entries,",
          len(out["radtran_to_geisa"]), "geisa entries")

    src = "/root/reference/archnemesis/Data/partition_functions/tips2025.h5"
    dst = os.path.join(ASSETS, "tips2025.h5")
    shutil.copyfile(src, dst)
    print("vendored tips2025.h5")


if __name__ == "__main__":
    main()

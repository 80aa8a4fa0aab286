"""Sample the reference's analytic NIR CIA band curves into a data asset.

The reference hard-codes three measured absorption-coefficient tables inside
functions (CIA_0.py: co2cia:631 Tran+2025 CO2-CO2 2.3um window, n2n2cia:710
McKellar N2-N2 overtone, n2h2cia:775 McKellar N2-H2). The tables are
physical data, not code; evaluating the reference functions exactly at their
native knot grids recovers the tables (the functions linearly interpolate
between knots, so interpolation on the same knots is numerically identical).

Run once: ``python tools/gen_cia_bands.py`` -> data/assets/cia_bands.npz
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.refutils import import_reference  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "archnemesis_tpu", "data", "assets", "cia_bands.npz",
)


def main():
    import_reference()
    from archnemesis.CIA_0 import co2cia, n2h2cia, n2n2cia

    # native knot grids (CIA_0.py:649, :728, :795)
    co2_knots = np.arange(3950.0, 4500.0 + 1, 1.0)
    n2n2_knots = np.arange(4500.0, 4825.0 + 1, 5.0)
    n2h2_knots = np.arange(3995.0, 4995.0 + 1, 5.0)

    np.savez(
        OUT,
        co2_knots=co2_knots,
        co2_k=co2cia(co2_knots),
        n2n2_knots=n2n2_knots,
        n2n2_k=n2n2cia(n2n2_knots),
        n2h2_knots=n2h2_knots,
        n2h2_k=n2h2cia(n2h2_knots),
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

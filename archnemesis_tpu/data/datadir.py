"""Location of the framework's bundled reference data (CIA tables, stellar
spectra, Earth reference profiles).

The reference package resolves bare table names against its own
``archnemesis/Data`` tree (CIA_0.read_cia:323, Stellar_0.read_sol:305,
Telluric_0.extract_atmosphere_circ:378).  This framework is standalone: the
same assets the bundled decks need are vendored under
``archnemesis_tpu/data/reference_data/{cia,stellar,reference_profiles}``,
and the root is overridable with the ``ARCHNEMESIS_TPU_DATA`` environment
variable (pointing at a directory with the same layout) for users with
larger local data collections.
"""

from __future__ import annotations

import os

_VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "reference_data")


def data_root() -> str:
    """Directory holding ``cia/``, ``stellar/`` and ``reference_profiles/``;
    ``$ARCHNEMESIS_TPU_DATA`` if set, else the vendored assets."""
    return os.environ.get("ARCHNEMESIS_TPU_DATA", _VENDORED)


def data_path(*parts: str) -> str:
    return os.path.join(data_root(), *parts)


def find_table(name: str, kind: str, base_dir: str = ".") -> str:
    """Resolve a table name from a deck file: absolute paths win, then a
    path relative to the deck directory, then the bundled data tree
    (``data_root()/<kind>/<name>``)."""
    if os.path.isabs(name):
        return name
    local = os.path.join(base_dir, name)
    if os.path.exists(local):
        return local
    return data_path(kind, name)

"""Helpers for running the reference implementation as a pure-Python oracle.

Usage::

    from tools.refutils import import_reference
    ans = import_reference()

Installs the numba stub (tools/numba_stub) on sys.path so the reference's
``@njit`` kernels run as plain Python, then imports ``archnemesis`` from
/root/reference. Slow, but numerically identical to the reference — used only
by golden-data generation scripts and oracle-comparison tests, never by the
framework itself.
"""

import os
import sys

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
_STUB_DIR = os.path.join(_TOOLS_DIR, "numba_stub")
_REFERENCE_DIR = "/root/reference"


def import_reference():
    if not os.path.isdir(_REFERENCE_DIR):
        # the framework itself is self-contained; only live-oracle
        # comparisons and golden generators need the reference mount
        try:
            import pytest  # noqa: PLC0415

            pytest.skip("reference mount not present (live-oracle test)")
        except ImportError:
            pass
        raise FileNotFoundError(
            f"reference mount {_REFERENCE_DIR} not present; live-oracle "
            "comparison/golden generation requires it"
        )
    if _STUB_DIR not in sys.path:
        sys.path.insert(0, _STUB_DIR)
    if _REFERENCE_DIR not in sys.path:
        sys.path.insert(0, _REFERENCE_DIR)
    import archnemesis  # noqa: PLC0415

    return archnemesis

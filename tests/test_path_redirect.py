"""Relocatable table locations (reference helpers/path_redirect.py):
prefix rewrites applied by the io loaders and the PathRedirectList API."""

import os
import shutil

import numpy as np
import pytest

from archnemesis_tpu.utils.path_redirect import (
    PathRedirectList,
    resolve_path,
    set_path_redirects,
)

DECK = "tests/fixtures/jupiter_nadir"


def test_pathredirectlist_rewrites_on_access():
    lst = PathRedirectList(
        ["/old/root/tab1.kta", "rel/tab2.kta"],
        redirects=(("/old/root", "/new/root"),),
    )
    assert lst[0] == "/new/root/tab1.kta"
    assert lst[1] == "rel/tab2.kta"
    lst.append("/old/root/tab3.kta")
    assert list(lst)[2] == "/new/root/tab3.kta"
    assert len(lst) == 3


def test_resolve_path_redirect_and_base(tmp_path):
    set_path_redirects([("/moved/decks", str(tmp_path))])
    try:
        assert resolve_path("/moved/decks/a.kta", "/unused") == str(
            tmp_path / "a.kta"
        )
        assert resolve_path("b.kta", "/deck/dir") == "/deck/dir/b.kta"
    finally:
        set_path_redirects(())


def test_kls_loader_honours_redirects(tmp_path):
    """Point a .kls at a bogus absolute prefix, redirect it to the real
    fixture tables, and load through the normal reader."""
    from archnemesis_tpu.io.ktables import read_kls

    kls_src = os.path.join(DECK, "cirstest.kls")
    names = [ln.strip() for ln in open(kls_src) if ln.strip()]
    kls = tmp_path / "moved.kls"
    with open(kls, "w") as f:
        for n in names:
            f.write(f"/nonexistent/prefix/{os.path.basename(n)}\n")

    set_path_redirects(
        [("/nonexistent/prefix",
          os.path.abspath("tests/fixtures/ktables"))]
    )
    try:
        tables = read_kls(str(kls))
    finally:
        set_path_redirects(())
    assert len(tables) == len(names)
    assert all(np.asarray(t.k).size > 0 for t in tables)

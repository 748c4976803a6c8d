"""Import smoke test: every package module loads.

The round-3 snapshot shipped with a module-load ValueError in ops/msm.py
that took out every entry point (bench, dryrun, most tests died at
collection).  This zero-compile test makes that class of breakage fail
the quick tier in seconds.
"""

import importlib
import pathlib

import pytest

pytestmark = pytest.mark.quick

PKG_ROOT = pathlib.Path(__file__).resolve().parent.parent / "octopuszk_tpu"

MODULES = sorted(
    "octopuszk_tpu." + str(p.relative_to(PKG_ROOT.parent))[len("octopuszk_tpu/"):-len(".py")].replace("/", ".")
    for p in PKG_ROOT.rglob("*.py")
    if p.name not in ("__init__.py", "__main__.py"))


@pytest.mark.parametrize("mod", MODULES)
def test_module_imports(mod):
    importlib.import_module(mod)


def test_graft_entry_imports():
    import __graft_entry__  # noqa: F401

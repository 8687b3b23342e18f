"""Smoke-run every examples/*.py main(spark) — mirrors the reference's
examples/ surface (a reference user's scripts have a working analog)."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

EXAMPLES = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(spark, path, capsys):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(spark)
    out = capsys.readouterr().out
    assert out.strip()  # every example narrates its result

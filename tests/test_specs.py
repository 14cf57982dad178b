"""Spec system tests: committed JSONs in sync with the generator, and the
spec-driven runner passing every definition (reference python/test_operator.py
analogue)."""

import json
import pathlib

import pytest

from quant_gemm_tpu.specs import build_specs, spec_runner

HERE = pathlib.Path(spec_runner.HERE)


def test_committed_specs_match_generator():
    gen = build_specs.build()
    for rel, want in gen.items():
        path = HERE / "definitions" / f"{rel}.json"
        assert path.exists(), f"missing {path}; run python -m quant_gemm_tpu.specs.build_specs"
        assert json.loads(path.read_text()) == want, rel
    on_disk = {p.relative_to(HERE / "definitions").with_suffix("").as_posix()
               for p in spec_runner.definitions()}
    assert on_disk == set(gen), on_disk ^ set(gen)


def test_solutions_resolve():
    """Every solution's entry_point must import and be callable."""
    for p in sorted((HERE / "solutions").glob("*.json")):
        s = json.loads(p.read_text())
        mod_name, expr = s["entry_point"].split("::")
        import importlib

        mod = importlib.import_module(mod_name)
        fn = eval(expr.split(".")[-1] if False else expr, vars(mod))  # noqa: S307
        assert callable(fn), s["name"]


@pytest.mark.parametrize("path", spec_runner.definitions(), ids=lambda p: p.stem)
def test_spec_passes(path):
    r = spec_runner.run_spec(path)
    assert r.passed, r.row()

"""Packaging contract (reference: setup.py:1, requirements.txt:1): the
framework is pip-installable with a console entrypoint and a pinned
dependency set."""

import pathlib
import sys
import tomllib

import ncf_tpu
from ncf_tpu.cli import main

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _pyproject():
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def test_pyproject_parses_and_pins():
    meta = _pyproject()["project"]
    assert meta["name"] == "ncf-tpu"
    deps = {d.split(">=")[0].split("==")[0].lower() for d in meta["dependencies"]}
    for need in ("jax", "flax", "optax", "orbax-checkpoint", "numpy", "pyyaml"):
        assert need in deps, f"{need} missing from dependencies"


def test_version_matches_package():
    assert _pyproject()["project"]["version"] == ncf_tpu.__version__


def test_console_entrypoint_maps_to_cli_main():
    scripts = _pyproject()["project"]["scripts"]
    mod, fn = scripts["ncf-tpu"].split(":")
    assert mod == "ncf_tpu.cli" and fn == "main"
    assert callable(main)


def test_requirements_pins_cover_runtime_deps():
    reqs = (ROOT / "requirements.txt").read_text()
    pins = {line.split("==")[0].lower() for line in reqs.splitlines()
            if line and not line.startswith("#")}
    for need in ("jax", "flax", "optax", "orbax-checkpoint", "numpy"):
        assert need in pins


def test_cli_help_exits_zero(capsys):
    try:
        main(["train", "--help"])
    except SystemExit as e:
        assert e.code == 0
    out = capsys.readouterr().out
    assert "overrides" in out

"""CLI coverage (yart_tpu/cli.py): flag parsing, --config JSON merge,
sampler-spec validation, and end-to-end tiny renders writing real files.
The reference has no CLI at all (knobs are main.cpp edits, README.md:19-20);
this is the framework's user surface, so it gets the same treatment as a
library API."""

import json
import os

import numpy as np
import pytest

from yart_tpu.cli import main, parse_args


def test_parse_defaults():
    a = parse_args(["cornell"])
    assert a.scene == "cornell"
    assert a.sampler == "zsobol" and a.integrator == "mis"
    assert a.size == "512x512"


@pytest.mark.parametrize("spec", [
    "zsobol", "hash", "stratified", "zsobol:null", "zsobol:binary",
    "zsobol:fastowen", "zsobol:owen",
])
def test_sampler_specs_accepted(spec):
    assert parse_args(["cornell", "--sampler", spec]).sampler == spec


@pytest.mark.parametrize("spec", ["sobol", "zsobol:", "zsobol:bogus", "x"])
def test_sampler_specs_rejected(spec):
    with pytest.raises(SystemExit):
        parse_args(["cornell", "--sampler", spec])


def test_config_merge(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"spp": 3, "max-depth": 2, "tonemap": "none"}))
    a = parse_args(["cornell", "--config", str(cfg)])
    # parse_args alone doesn't merge; main() does. Exercise the merge path
    # through main's parsing by calling it on an unknown-key config.
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"not-a-flag": 1}))
    with pytest.raises(SystemExit, match="unknown config key"):
        main(["cornell", "--config", str(bad), "-o", "/dev/null"])
    assert a.config == str(cfg)


def _render(tmp_path, *argv):
    out = str(tmp_path / "out.png")
    rc = main(list(argv) + ["-o", out, "--quiet"])
    assert rc in (0, None)
    assert os.path.exists(out)
    assert open(out, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    return out


def test_cli_render_cornell(tmp_path):
    out = _render(
        tmp_path, "cornell", "--spp", "2", "--size", "16x16",
        "--max-depth", "3", "--first-wave", "2", "--estimator", "mean",
    )
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_render_config_merge_and_override(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "spp": 2, "size": "12x12", "max-depth": 2, "first-wave": 2,
        "estimator": "mean", "tonemap": "none",
    }))
    out = _render(tmp_path, "cornell", "--config", str(cfg))
    # explicit flag beats the config file
    out2 = str(tmp_path / "o2.ppm")
    rc = main(["cornell", "--config", str(cfg), "--size", "8x8",
               "-o", out2, "--quiet"])
    assert rc in (0, None)
    head = open(out2, "rb").read(20).split()
    assert head[0] == b"P6" and head[1] == b"8" and head[2] == b"8"


def test_cli_render_gltf_scene(tmp_path):
    from test_gltf import _build_glb

    path = _build_glb(tmp_path)
    _render(tmp_path, path, "--spp", "2", "--size", "8x8",
            "--max-depth", "2", "--first-wave", "2", "--estimator", "mean")


def test_cli_sampler_variants_render(tmp_path):
    for spec in ("stratified", "zsobol:owen"):
        _render(tmp_path, "furnace", "--spp", "2", "--size", "8x8",
                "--max-depth", "2", "--first-wave", "2",
                "--estimator", "mean", "--sampler", spec)


def test_cli_preview_and_checkpoint(tmp_path):
    prev = str(tmp_path / "prev.png")
    ckpt = str(tmp_path / "ck.npz")
    _render(tmp_path, "cornell", "--spp", "4", "--size", "8x8",
            "--max-depth", "2", "--first-wave", "2", "--max-wave", "2",
            "--estimator", "mean", "--preview", prev,
            "--checkpoint", ckpt)
    assert os.path.exists(prev)
    with np.load(ckpt) as z:
        assert int(z["samples_taken"]) == 4

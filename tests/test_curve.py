"""Compression->speed curve artifact (sweep/curve.py): every rung measures,
agreement/size/rtfx fields present, recovery variant attaches, plot writes."""

import json
import os

import numpy as np
import pytest

import jax

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.sweep import curve


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    return arch, P.init_params(arch, jax.random.PRNGKey(0))


def test_ladder_structure():
    names = [n for n, _, _, _ in curve.ladder("int8")]
    assert names[0] == "dense"
    assert any("heads50" in n for n in names)
    assert any("declayers" in n for n in names)
    assert any("pool2" in n for n in names)
    assert any("tome" in n for n in names)


def test_run_curve_subset_with_recovery(setup, tmp_path):
    arch, params = setup
    points = curve.run_curve(params, arch, batch=2, tokens=6, iters=1,
                             agreement_samples=2, recover_steps=1,
                             rungs=["dense", "heads50+int8"],
                             progress=lambda *_: None)
    names = [p["name"] for p in points]
    assert names == ["dense", "heads50+int8"]
    for p in points:
        assert p["rtfx"] > 0 and p["size_mb"] > 0 and p["hbm_mb"] > 0
        assert 0.0 <= p["token_agreement"] <= 1.0
    assert points[0]["token_agreement"] == 1.0
    # physical surgery shrinks the stored model
    assert points[1]["size_mb"] < points[0]["size_mb"]
    assert "recovered" in points[1]
    assert points[1]["recovered"]["name"] == "heads50+int8+recover"
    # recovery reduces the KL to the dense teacher
    assert (points[1]["recovered"]["mean_kl"] <= points[1]["mean_kl"] + 1e-6)

    curve.plot_curve(points, str(tmp_path / "c.png"))
    assert os.path.getsize(tmp_path / "c.png") > 1000


def test_curve_cli(setup, tmp_path, monkeypatch, capsys):
    from openai_whisper_compression_tpu import cli

    real_ladder = curve.ladder
    monkeypatch.setattr(
        curve, "ladder",
        lambda quant: real_ladder(quant)[:2])  # dense + int8 only
    cli.main(["curve", "--model", "test2l", "--batch-size", "2",
              "--max-new-tokens", "6", "--iters", "1",
              "--save-path", str(tmp_path)])
    out = json.loads(open(tmp_path / "curve.json").read())
    assert [p["name"] for p in out["points"]] == ["dense", "int8"]
    assert os.path.exists(tmp_path / "curve.png")


def test_run_curve_merge_rungs(setup):
    """Token-merge rungs measure, shrink analytic cross-KV HBM, and do
    not grow a recovery variant (decode-time knobs are not
    weight-recoverable)."""
    arch, params = setup
    points = curve.run_curve(params, arch, batch=2, tokens=6, iters=1,
                             agreement_samples=2, recover_steps=1,
                             rungs=["dense", "pool2+int8", "tome25%+int8"],
                             progress=lambda *_: None)
    by_name = {p["name"]: p for p in points}
    # substring rung filter also picks up the combined structural+pool rung
    assert {"dense", "pool2+int8", "tome25%+int8",
            "heads50+ffn50+pool2+int8"} == set(by_name)
    assert by_name["pool2+int8"]["hbm_mb"] < by_name["dense"]["hbm_mb"]
    for n in ("pool2+int8", "tome25%+int8"):
        assert "recovered" not in by_name[n]
        assert 0.0 <= by_name[n]["token_agreement"] <= 1.0

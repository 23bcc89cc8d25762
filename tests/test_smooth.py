"""SmoothQuant / AWQ activation-aware smoothing (quant/smooth.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P, whisper
from openai_whisper_compression_tpu.quant import smooth
from openai_whisper_compression_tpu.quant.api import quantize_params


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)) * 0.3,
        jnp.float32)
    tokens = jnp.asarray(g.integers(0, 900, (2, 5)), jnp.int32)

    def run_calib(p):
        whisper.forward(p, arch, mel, tokens)

    return arch, params, mel, tokens, run_calib


def test_collect_ln_stats_sites_and_shapes(setup):
    arch, params, mel, tokens, run_calib = setup
    stats = smooth.collect_ln_stats(params, arch, run_calib)
    n_enc = len(params["encoder"]["layers"])
    n_dec = len(params["decoder"]["layers"])
    assert len(stats) == 2 * n_enc + 3 * n_dec
    for v in stats.values():
        assert v["amax"].shape == (arch.d_model,)
        assert (v["amax"] >= 0).all()
        assert v["rows"].ndim == 2 and v["rows"].shape[1] == arch.d_model


def test_smoothquant_is_exact_rewrite(setup):
    """Pre-quantization, the smoothed float model computes the same
    function (algebraic identity modulo rounding)."""
    arch, params, mel, tokens, run_calib = setup
    smoothed = smooth.smoothquant_params(params, arch, run_calib)
    y0 = np.asarray(whisper.forward(params, arch, mel, tokens))
    y1 = np.asarray(whisper.forward(smoothed, arch, mel, tokens))
    np.testing.assert_allclose(y0, y1, atol=2e-3, rtol=1e-3)
    # and it actually rescaled something
    g0 = np.asarray(params["encoder"]["layers"][0]["attn_ln"]["g"])
    g1 = np.asarray(smoothed["encoder"]["layers"][0]["attn_ln"]["g"])
    assert not np.allclose(g0, g1)


def test_smoothquant_composes_with_registry_quant(setup):
    arch, params, mel, tokens, run_calib = setup
    smoothed = smooth.smoothquant_params(params, arch, run_calib)
    qp = quantize_params(smoothed, "int8", act="dynamic_int8")
    out = whisper.forward(qp, arch, mel, tokens)
    assert np.isfinite(np.asarray(out)).all()


def _inject_outliers(params, scale=40.0, n_ch=3):
    """Blow up a few channels of every LN gain: the resulting activation
    outliers are the regime SmoothQuant/AWQ exist for."""
    p = smooth._copy_tree(params)
    for _, ln, _ in smooth._sites(p):
        g = np.asarray(ln["g"], np.float32).copy()
        g[:n_ch] *= scale
        ln["g"] = jnp.asarray(g)
    return p


def test_awq_reduces_quant_error_on_outlier_model(setup):
    arch, params, mel, tokens, run_calib = setup
    outlier = _inject_outliers(params)

    def run_calib_o(p):
        whisper.forward(p, arch, mel, tokens)

    stats = smooth.collect_ln_stats(outlier, arch, run_calib_o)
    smoothed, alphas = smooth.awq_search(outlier, arch, stats=stats,
                                         method="int4", grid=6)
    assert any(a > 0 for a in alphas.values())
    # exact rewrite pre-quantization
    y_ref = np.asarray(whisper.forward(outlier, arch, mel, tokens))
    y_sm = np.asarray(whisper.forward(smoothed, arch, mel, tokens))
    np.testing.assert_allclose(y_ref, y_sm, atol=5e-3, rtol=1e-2)
    # int4 on the smoothed model is closer to the float model than int4 on
    # the raw outlier model
    q_plain = quantize_params(smooth._copy_tree(outlier), "int4")
    q_awq = quantize_params(smoothed, "int4")
    e_plain = np.mean((np.asarray(
        whisper.forward(q_plain, arch, mel, tokens)) - y_ref) ** 2)
    e_awq = np.mean((np.asarray(
        whisper.forward(q_awq, arch, mel, tokens)) - y_ref) ** 2)
    assert e_awq < e_plain


def test_awq_quantize_params_end_to_end(setup):
    arch, params, mel, tokens, run_calib = setup
    from openai_whisper_compression_tpu.ops.qtensor import QTensor
    from openai_whisper_compression_tpu.quant.api import named_leaves

    qp = smooth.awq_quantize_params(params, arch, run_calib, method="int4",
                                    grid=3)
    assert any(isinstance(leaf, QTensor) for _, leaf in named_leaves(qp))
    out = whisper.forward(qp, arch, mel, tokens)
    assert np.isfinite(np.asarray(out)).all()


def test_smooth_rejects_quantized_input(setup):
    arch, params, mel, tokens, run_calib = setup
    stats = smooth.collect_ln_stats(params, arch, run_calib)
    qp = quantize_params(smooth._copy_tree(params), "int8")
    with pytest.raises(ValueError, match="smooth before quantizing"):
        smooth.smoothquant_params(qp, arch, stats=stats)


def test_collect_rejects_partial_stream(setup):
    arch, params, *_ = setup
    with pytest.raises(ValueError, match="multiple"):
        smooth.collect_ln_stats(params, arch, lambda p: None)  # no records


def test_resolve_quantizer_accepts_registry_names(setup):
    """REGISTRY config names (the CLI --quant namespace) resolve to their
    base quantizer BEFORE calibration; unknown names fail fast listing
    both namespaces."""
    from openai_whisper_compression_tpu.ops.qtensor import QTensor
    from openai_whisper_compression_tpu.quant.smooth import (
        _resolve_quantizer)

    arch, params, _, _, run_cal = setup
    w = np.asarray(np.random.default_rng(0).standard_normal((8, 8)),
                   np.float32)
    q = _resolve_quantizer("quanto_int4")(w)
    assert isinstance(q, QTensor) and q.bits == 4
    with pytest.raises(KeyError, match="named configs"):
        _resolve_quantizer("nope")
    # full search runs with a REGISTRY name
    from openai_whisper_compression_tpu.quant.smooth import awq_search

    smoothed, alphas = awq_search(params, arch, run_cal,
                                  method="quanto_int4", grid=3)
    assert len(alphas) == 2 * arch.encoder_layers + 3 * arch.decoder_layers


def test_capture_rows_strided_not_first_n():
    """AWQ's captured rows subsample the whole utterance (strided), not
    just the first 64 frames (often near-silence)."""
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.utils import capture

    v = jnp.zeros((1, 400, 4)).at[0, 200:, :].set(1.0)  # speech later only
    with capture.capturing() as store:
        capture.record("attn_ln_out", v)
    rows = np.asarray(store[0]["rows"])
    assert rows.shape[0] <= 64
    assert float(np.abs(rows).max()) > 0     # late frames represented

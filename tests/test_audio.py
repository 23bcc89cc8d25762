"""Audio frontend golden tests vs HF WhisperFeatureExtractor (pure numpy,
the exact code path the reference uses via `WhisperProcessor`,
`data_utils.py:56-58`)."""

import numpy as np
import pytest

from openai_whisper_compression_tpu.audio import features
from openai_whisper_compression_tpu.config import N_SAMPLES


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor(feature_size=80)


@pytest.fixture(scope="module")
def wav(rng=None):
    g = np.random.default_rng(42)
    # ~5 s of structured audio: chirp + noise, padded by the frontend itself
    t = np.arange(5 * 16000) / 16000.0
    w = 0.5 * np.sin(2 * np.pi * (200 + 300 * t) * t) + 0.01 * g.standard_normal(t.size)
    return w.astype(np.float32)


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = features.mel_filter_bank(201, 80)
    theirs = hf_fb(num_frequency_bins=201, num_mel_filters=80,
                   min_frequency=0.0, max_frequency=8000.0,
                   sampling_rate=16000, norm="slaney", mel_scale="slaney")
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_log_mel_matches_hf(hf_extractor, wav):
    import jax.numpy as jnp

    theirs = hf_extractor(wav, sampling_rate=16000,
                          return_tensors="np").input_features[0]
    ours = np.asarray(features.preprocess(jnp.asarray(wav))[0])
    assert ours.shape == theirs.shape == (80, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_pallas_matches_xla(wav):
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.audio.mel_pallas import log_mel_pallas

    batch = jnp.stack([jnp.asarray(wav[:N_SAMPLES // 2]),
                       jnp.asarray(wav[:N_SAMPLES // 2]) * 0.3])
    batch = features.pad_or_trim(batch)
    xla = np.asarray(features.log_mel(batch))
    pallas = np.asarray(log_mel_pallas(batch))
    np.testing.assert_allclose(pallas, xla, atol=1e-4)


def test_pad_or_trim():
    import jax.numpy as jnp

    short = jnp.ones((1, 100))
    assert features.pad_or_trim(short).shape == (1, N_SAMPLES)
    long = jnp.ones((1, N_SAMPLES + 5))
    assert features.pad_or_trim(long).shape == (1, N_SAMPLES)
    exact = jnp.ones((2, N_SAMPLES))
    assert features.pad_or_trim(exact) is exact


def test_log_mel_128_bins(wav):
    """large-v3 uses 128 mel bins."""
    import jax.numpy as jnp

    out = features.preprocess(jnp.asarray(wav), n_mels=128)
    assert out.shape == (1, 128, 3000)

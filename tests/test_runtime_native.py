"""Native C++ runtime tests: builds the shared lib (g++ in image), checks the
threaded batch loader and sparse codec against numpy, and bf16 storage."""

import numpy as np
import pytest

from openai_whisper_compression_tpu import runtime_native as rt


def test_lib_builds_and_loads():
    assert rt.available(), "native runtime failed to build/load"


def test_batch_loader_matches_numpy(rng):
    n_samples = 1000
    loader = rt.BatchLoader(3, n_samples, n_threads=2)
    w0 = rng.standard_normal(500).astype(np.float32)    # short -> pad
    w1 = rng.standard_normal(1500).astype(np.float32)   # long -> trim
    loader.submit(0, w0)
    loader.submit(1, w1)
    loader.clear(2)
    out = loader.flush()
    assert out.shape == (3, n_samples)
    np.testing.assert_array_equal(out[0, :500], w0)
    np.testing.assert_array_equal(out[0, 500:], 0)
    np.testing.assert_array_equal(out[1], w1[:n_samples])
    np.testing.assert_array_equal(out[2], 0)

    # double buffering: next flush reflects new submissions only
    loader.submit(0, w1)
    loader.submit(1, w0)
    loader.clear(2)
    out2 = loader.flush()
    np.testing.assert_array_equal(out2[0], w1[:n_samples])


def test_batch_loader_resample(rng):
    # 8 kHz ramp resampled to 16 kHz: length doubles, values interpolate
    sr_in = 8000
    wav = np.arange(100, dtype=np.float32)
    loader = rt.BatchLoader(1, 300, n_threads=1)
    loader.submit(0, wav, sample_rate=sr_in)
    out = loader.flush()[0]
    assert abs(out[2] - 1.0) < 1e-5   # sample 2 @16k == sample 1 @8k
    assert abs(out[3] - 1.5) < 1e-5   # halfway interpolation
    assert np.all(out[205:] == 0)


def test_sparse_codec_matches_numpy(rng):
    data = rng.standard_normal((333, 77)).astype(np.float32)
    data[rng.random(data.shape) < 0.8] = 0
    idx, val = rt.sparse_encode(data, n_threads=3)
    nz_ref = np.nonzero(data.reshape(-1))[0]
    np.testing.assert_array_equal(idx, nz_ref)
    np.testing.assert_array_equal(val, data.reshape(-1)[nz_ref])
    back = rt.sparse_decode(idx, val, data.shape, n_threads=3)
    np.testing.assert_array_equal(back, data)
    # empty case
    idx, val = rt.sparse_encode(np.zeros(10, np.float32))
    assert idx.size == 0
    np.testing.assert_array_equal(rt.sparse_decode(idx, val, (10,)), 0)


def test_bf16_storage_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.storage import formats

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    res = formats.verify_roundtrip(params, str(tmp_path / "bf16.zip"),
                                   "sparse_zip")
    assert res["ok"], res["mismatches"][:5]
    loaded = formats.load_sparse_zip(str(tmp_path / "bf16.zip"))
    assert P.get_leaf(loaded, "encoder.conv1.w").dtype == jnp.bfloat16

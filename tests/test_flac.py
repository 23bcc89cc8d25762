"""FLAC decoder tests — golden streams from a minimal spec-correct encoder.

No FLAC tooling exists in this image (no ffmpeg/flac/soundfile), so the test
builds its own RFC 9639-conformant streams (real CRC-8/CRC-16, every
subframe type, Rice + escape partitions, wasted bits, all stereo modes) and
asserts the decoder reproduces the input PCM exactly — FLAC is lossless, so
equality is exact, not approximate.
"""

import numpy as np
import pytest

from openai_whisper_compression_tpu.audio.flac import decode_flac


# ---------------------------------------------------------------------------
# the encoder now lives in the package (audio/flac_encode.py — it is the
# serving wire's client side); tests keep their original surface
# ---------------------------------------------------------------------------

from openai_whisper_compression_tpu.audio.flac_encode import (  # noqa: E402,F401
    _BitWriter, _crc8, _crc16, _utf8_number, _zigzag, _write_residual,
    _write_subframe, _BS_CODES, _SR_CODES, encode_flac)


def _pcm(n: int, ch: int = 1, seed: int = 0, lo=-30000, hi=30000):
    rng = np.random.default_rng(seed)
    a = rng.integers(lo, hi, size=(n, ch), dtype=np.int64)
    return a if ch > 1 else a[:, 0]


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1", "fixed2",
                                  "fixed3", "fixed4", "lpc2"])
def test_roundtrip_subframe_types(kind):
    pcm = _pcm(2048, seed=hash(kind) % 1000)
    out, info = decode_flac(encode_flac(pcm, kind=kind))
    assert (info.sample_rate, info.channels, info.bits_per_sample) == \
        (16000, 1, 16)
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_constant_and_streaminfo_bps():
    pcm = np.full(1024, -1234, np.int64)
    out, _ = decode_flac(encode_flac(pcm, kind="constant",
                                     ss_from_streaminfo=True))
    np.testing.assert_array_equal(out[:, 0], pcm)


@pytest.mark.parametrize("porder", [0, 1, 3])
def test_rice_partition_orders(porder):
    pcm = _pcm(2048, seed=porder)
    out, _ = decode_flac(encode_flac(pcm, porder=porder))
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_escape_partitions():
    pcm = _pcm(1024, seed=7)
    out, _ = decode_flac(encode_flac(pcm, escape=True, porder=2))
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_wasted_bits():
    pcm = (_pcm(1024, seed=3, lo=-7000, hi=7000) << 2)  # 2 low zero bits
    out, _ = decode_flac(encode_flac(pcm, kind="verbatim", wasted=2))
    np.testing.assert_array_equal(out[:, 0], pcm)


@pytest.mark.parametrize("stereo", [None, "left_side", "right_side",
                                    "mid_side"])
def test_stereo_modes(stereo):
    pcm = _pcm(1024, ch=2, seed=11)
    out, info = decode_flac(encode_flac(pcm, stereo=stereo))
    assert info.channels == 2
    np.testing.assert_array_equal(out, pcm)


def test_multibyte_frame_numbers_and_many_frames():
    # >128 frames forces 2-byte UTF-8 frame numbers
    pcm = _pcm(130 * 64, seed=5)
    out, _ = decode_flac(encode_flac(pcm, blocksize=64))
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_corrupt_streams_raise():
    pcm = _pcm(1024, seed=1)
    good = encode_flac(pcm)
    with pytest.raises(ValueError):
        decode_flac(b"RIFF" + good[4:])            # bad marker
    with pytest.raises((ValueError, EOFError)):
        decode_flac(good[:len(good) // 2])         # truncated mid-frame


# ---------------------------------------------------------------------------
# integration: data layer + native parity
# ---------------------------------------------------------------------------

def test_read_audio_file_flac(tmp_path):
    pcm = _pcm(2048, seed=21)
    p = tmp_path / "utt.flac"
    p.write_bytes(encode_flac(pcm))
    from openai_whisper_compression_tpu.evaluation.data import read_audio_file
    wav = read_audio_file(str(p))
    assert wav.dtype == np.float32 and wav.shape == (2048,)
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0)


def test_read_audio_file_flac_stereo_resample(tmp_path):
    pcm = _pcm(2048, ch=2, seed=22)
    p = tmp_path / "s.flac"
    p.write_bytes(encode_flac(pcm, sample_rate=8000, stereo="mid_side"))
    from openai_whisper_compression_tpu.evaluation.data import read_audio_file
    wav = read_audio_file(str(p))                  # resampled 8k -> 16k
    assert wav.shape == (4096,)
    mono = pcm.astype(np.float32).mean(axis=1) / 32768.0
    # linear-interp resample: every even output sample hits a source sample
    np.testing.assert_allclose(wav[0:20:2], mono[:10], atol=1e-6)


def test_load_audio_dir_flac_librispeech_layout(tmp_path):
    # unpacked-LibriSpeech shape: spk/chap/spk-chap-utt.flac + *.trans.txt
    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    for i, text in enumerate(["HELLO WORLD", "SECOND UTTERANCE"]):
        pcm = _pcm(1024, seed=30 + i)
        (d / f"19-198-{i:04d}.flac").write_bytes(encode_flac(pcm))
    (d / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 SECOND UTTERANCE\n")
    from openai_whisper_compression_tpu.evaluation.data import load_audio_dir
    utts = load_audio_dir(str(tmp_path))
    assert [u.text for u in utts] == ["HELLO WORLD", "SECOND UTTERANCE"]
    assert all(u.audio.shape == (1024,) for u in utts)


def test_native_decoder_parity():
    from openai_whisper_compression_tpu import runtime_native as rn
    if not rn.available() or not rn.flac_native_available():
        pytest.skip("native runtime not built")
    for kwargs in [dict(kind="lpc2", porder=2), dict(kind="fixed3"),
                   dict(stereo="mid_side"), dict(escape=True),
                   dict(kind="verbatim", wasted=3)]:
        ch = 2 if kwargs.get("stereo") else 1
        pcm = _pcm(2048, ch=ch, seed=42)
        if kwargs.get("wasted"):
            pcm = (pcm >> kwargs["wasted"]) << kwargs["wasted"]
        data = encode_flac(pcm.reshape(2048, ch) if ch > 1 else pcm, **kwargs)
        ref, info = decode_flac(data)
        out, sr, bits = rn.flac_decode(data)
        assert (sr, bits) == (info.sample_rate, info.bits_per_sample)
        np.testing.assert_array_equal(out, ref)


def test_batchloader_submit_flac_parity():
    """submit_flac (decode in the worker pool) must assemble the identical
    batch as submit() of the pre-decoded waveform, incl. resampling."""
    from openai_whisper_compression_tpu.runtime_native import BatchLoader

    n_out = 3000
    pcm16k = _pcm(2048, seed=50)
    pcm8k = _pcm(1024, ch=2, seed=51)
    wav16 = pcm16k.astype(np.float32) / 32768.0
    wav8 = pcm8k.astype(np.float32).mean(axis=1) / 32768.0

    ref = BatchLoader(2, n_out)
    ref.submit(0, wav16, sample_rate=16000)
    ref.submit(1, wav8, sample_rate=8000)
    expect = ref.flush()

    ld = BatchLoader(2, n_out)
    ld.submit_flac(0, encode_flac(pcm16k))
    ld.submit_flac(1, encode_flac(pcm8k, sample_rate=8000,
                                  stereo="mid_side"))
    got = ld.flush()
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_batchloader_submit_flac_error_surfaces():
    from openai_whisper_compression_tpu import runtime_native as rn
    if not rn.flac_native_available():
        pytest.skip("native runtime not built")
    ld = rn.BatchLoader(1, 1000)
    ld.submit_flac(0, b"not a flac stream at all")
    with pytest.raises(RuntimeError, match="FLAC decode failure"):
        ld.flush()
    ld.submit_flac(0, encode_flac(_pcm(1024, seed=52)))  # loader still usable
    assert ld.flush().shape == (1, 1000)


def test_parse_stream_info_header_only():
    from openai_whisper_compression_tpu.audio.flac import parse_stream_info
    pcm = _pcm(2048, seed=53)
    data = encode_flac(pcm, sample_rate=22050)
    info, pos = parse_stream_info(data)
    assert (info.sample_rate, info.channels, info.bits_per_sample,
            info.total_samples) == (22050, 1, 16, 2048)
    assert data[pos] == 0xFF  # first frame sync byte
    with pytest.raises(ValueError):
        parse_stream_info(b"OggS" + data[4:])


@pytest.mark.parametrize("blocksize,sr", [(4096, 16000), (1024, 22050),
                                          (192, 8000), (4608, 44100)])
def test_table_blocksize_and_rate_codes(blocksize, sr):
    """Real libFLAC frames carry table codes (e.g. 4096 -> code 12,
    16 kHz -> code 5) instead of the explicit 8/16-bit forms; both
    decoders must take the table path too."""
    n = blocksize * 2
    pcm = _pcm(n, seed=blocksize + sr)
    data = encode_flac(pcm, sample_rate=sr, blocksize=blocksize,
                       table_codes=True)
    out, info = decode_flac(data)
    assert info.sample_rate == sr
    np.testing.assert_array_equal(out[:, 0], pcm)
    from openai_whisper_compression_tpu import runtime_native as rn
    if rn.flac_native_available():
        nout, nsr, _ = rn.flac_decode(data)
        assert nsr == sr
        np.testing.assert_array_equal(nout[:, 0], pcm)


def test_encode_waveform_float_roundtrip():
    """encode_waveform (the serving wire's client side): float32 waveform
    -> FLAC -> decode == int16 quantization of the input, tail padded to a
    whole block with silence."""
    from openai_whisper_compression_tpu.audio.flac_encode import (
        encode_waveform)

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(1500) * 0.1).astype(np.float32)  # ragged len
    data = encode_waveform(wav, sample_rate=16000)
    out, info = decode_flac(data)
    assert info.sample_rate == 16000
    want = np.clip(np.round(wav * 32767.0), -32768, 32767).astype(np.int64)
    np.testing.assert_array_equal(out[: len(wav), 0], want)
    assert np.all(out[len(wav):, 0] == 0)           # padded tail is silence
    assert len(out) % 1024 == 0

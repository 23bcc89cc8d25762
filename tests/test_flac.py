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
# minimal encoder (test-only)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        assert 0 <= v < (1 << n) or n == 0
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int):
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for count, bits in ((1, 11), (2, 16), (3, 21), (4, 26), (5, 31), (6, 36)):
        if n < (1 << bits):
            lead = ((0xFF00 >> (count + 1)) & 0xFF) | (n >> (6 * count))
            tail = [0x80 | ((n >> (6 * k)) & 0x3F)
                    for k in range(count - 1, -1, -1)]
            return bytes([lead] + tail)
    raise ValueError(n)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(bw: _BitWriter, res: list[int], blocksize: int,
                    order: int, porder: int, escape: bool):
    bw.write(0, 2)                       # method 0: 4-bit Rice
    bw.write(porder, 4)
    n_part = 1 << porder
    w = 0
    for p in range(n_part):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        part = res[w:w + count]
        w += count
        if escape:
            bw.write(15, 4)              # escape code
            bw.write(20, 5)              # 20 raw bits/sample
            for r in part:
                bw.write_signed(r, 20)
        else:
            zmax = max((_zigzag(r) for r in part), default=0)
            param = min(14, max(0, zmax.bit_length() - 3))
            bw.write(param, 4)
            for r in part:
                z = _zigzag(r)
                bw.write_unary(z >> param)
                bw.write(z & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, s: np.ndarray, bps: int, kind: str,
                    porder: int = 0, escape: bool = False, wasted: int = 0):
    s = [int(v) for v in s]
    bw.write(0, 1)                       # padding
    blocksize = len(s)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in s)
    ebps = bps - wasted
    sw = [v >> wasted for v in s]

    def _wasted_bits():
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if kind == "constant":
        assert len(set(sw)) == 1
        bw.write(0, 6)
        _wasted_bits()
        bw.write_signed(sw[0], ebps)
    elif kind == "verbatim":
        bw.write(1, 6)
        _wasted_bits()
        for v in sw:
            bw.write_signed(v, ebps)
    elif kind.startswith("fixed"):
        order = int(kind[5:])
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                 4: [4, -6, 4, -1]}[order]
        bw.write(8 + order, 6)
        _wasted_bits()
        for v in sw[:order]:
            bw.write_signed(v, ebps)
        res = [sw[i] - sum(c * sw[i - 1 - j] for j, c in enumerate(coefs))
               for i in range(order, blocksize)]
        _write_residual(bw, res, blocksize, order, porder, escape)
    elif kind == "lpc2":
        order, precision, shift, coefs = 2, 4, 1, [3, -1]
        bw.write(32 | (order - 1), 6)
        _wasted_bits()
        for v in sw[:order]:
            bw.write_signed(v, ebps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = [sw[i] - ((sum(coefs[j] * sw[i - 1 - j]
                             for j in range(order))) >> shift)
               for i in range(order, blocksize)]
        _write_residual(bw, res, blocksize, order, porder, escape)
    else:
        raise ValueError(kind)


_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
             1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
             24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


def encode_flac(samples: np.ndarray, sample_rate: int = 16000, bps: int = 16,
                blocksize: int = 1024, kind: str = "fixed2",
                stereo: str | None = None, porder: int = 0,
                escape: bool = False, wasted: int = 0,
                ss_from_streaminfo: bool = False,
                table_codes: bool = False) -> bytes:
    """samples: (n,) mono or (n, 2) stereo integers. Returns a FLAC stream."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    assert n % blocksize == 0, "test encoder: whole blocks only"

    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)                   # MD5 (decoder does not verify)
    body = si.bytes()
    stream = bytearray(b"fLaC")
    stream.append(0x80)                  # last-block | STREAMINFO
    stream += len(body).to_bytes(3, "big")
    stream += body

    ss_code = 0 if ss_from_streaminfo else {8: 1, 12: 2, 16: 4,
                                            20: 5, 24: 6}[bps]
    for f in range(n // blocksize):
        blk = samples[f * blocksize:(f + 1) * blocksize]
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1); hdr.write(0, 1)  # reserved, fixed blocksize
        if table_codes:
            # the codes real libFLAC files carry for common sizes/rates
            bs_code = _BS_CODES[blocksize]
            sr_code = _SR_CODES[sample_rate]
        else:
            bs_code = 7                   # blocksize-1 as 16 bits at end
            sr_code = 0                   # sample rate from STREAMINFO
        hdr.write(bs_code, 4)
        hdr.write(sr_code, 4)
        chan_code = {None: ch - 1, "left_side": 8, "right_side": 9,
                     "mid_side": 10}[stereo]
        hdr.write(chan_code, 4)
        hdr.write(ss_code, 3)
        hdr.write(0, 1)
        for b in _utf8_number(f):
            hdr.write(b, 8)
        if bs_code == 7:
            hdr.write(blocksize - 1, 16)
        hbytes = hdr.bytes()
        fw = _BitWriter()
        for b in hbytes:
            fw.write(b, 8)
        fw.write(_crc8(hbytes), 8)

        if stereo is None:
            for c in range(ch):
                _write_subframe(fw, blk[:, c], bps, kind, porder, escape,
                                wasted)
        else:
            L = blk[:, 0].astype(np.int64)
            R = blk[:, 1].astype(np.int64)
            side = L - R
            if stereo == "left_side":
                _write_subframe(fw, L, bps, kind, porder, escape)
                _write_subframe(fw, side, bps + 1, kind, porder, escape)
            elif stereo == "right_side":
                _write_subframe(fw, side, bps + 1, kind, porder, escape)
                _write_subframe(fw, R, bps, kind, porder, escape)
            else:                        # mid/side
                mid = (L + R) >> 1
                _write_subframe(fw, mid, bps, kind, porder, escape)
                _write_subframe(fw, side, bps + 1, kind, porder, escape)
        fw.align()
        frame = fw.bytes()
        stream += frame
        stream += _crc16(frame).to_bytes(2, "big")
    return bytes(stream)


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

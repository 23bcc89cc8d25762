"""Tests for the offline real-weights path (VERDICT r1 missing #1):
load_librispeech against a mocked `datasets` module, the npz checkpoint
cache round-trip, and the analytic-HBM MemoryTracker fallback."""

import dataclasses
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# load_librispeech with a mocked `datasets` module — the code path that
# matters most the day network exists is otherwise untested (VERDICT weak #8)
# ---------------------------------------------------------------------------

class _FakeStream:
    def __init__(self, records):
        self._records = records

    def take(self, n):
        return _FakeStream(self._records[:n])

    def __iter__(self):
        return iter(self._records)


def _fake_records(n, sr=16000):
    rng = np.random.default_rng(0)
    return [
        {"audio": {"array": rng.standard_normal(sr // 2), "sampling_rate": sr},
         "text": f"HELLO WORLD {i}", "id": f"utt-{i}"}
        for i in range(n)
    ]


@pytest.fixture()
def mock_datasets(monkeypatch):
    calls = {}

    def load_dataset(name, split=None, streaming=False, **kw):
        calls.update(name=name, split=split, streaming=streaming, **kw)
        return _FakeStream(_fake_records(5))

    mod = types.ModuleType("datasets")
    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return calls


def test_load_librispeech_mocked(mock_datasets):
    from openai_whisper_compression_tpu.evaluation.data import load_librispeech

    utts = load_librispeech(num_samples=3, split="test.clean")
    assert len(utts) == 3
    # split passed verbatim, as the reference does (data_utils.py:8-41)
    assert mock_datasets["split"] == "test.clean"
    assert mock_datasets["name"] == "librispeech_asr"
    assert mock_datasets["streaming"] is True
    u = utts[0]
    assert u.text == "HELLO WORLD 0"
    assert u.uid == "utt-0"
    assert u.audio.dtype == np.float32
    assert abs(u.duration - 0.5) < 1e-6


def _mock_datasets5(monkeypatch, accept):
    """Mock a datasets>=3 install: script repos raise (trust_remote_code
    removed), only the repo ids in `accept` load; records every call."""
    calls = []

    def load_dataset(name, split=None, streaming=False, **kw):
        if "trust_remote_code" in kw:
            raise ValueError("`trust_remote_code` is not supported anymore.")
        calls.append(dict(name=name, split=split, streaming=streaming, **kw))
        if name not in accept:
            raise RuntimeError(
                f"Dataset scripts are no longer supported ({name})")
        return _FakeStream(_fake_records(5))

    mod = types.ModuleType("datasets")
    mod.__version__ = "5.0.0"
    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return calls


def test_load_librispeech_datasets5_parquet_repo(monkeypatch):
    """On datasets>=3 the Parquet repo is tried FIRST (the script repo can
    never load there), with the caller's split spelling preserved."""
    from openai_whisper_compression_tpu.evaluation.data import load_librispeech

    calls = _mock_datasets5(monkeypatch, accept={"openslr/librispeech_asr"})
    utts = load_librispeech(num_samples=2, split="test.clean")
    assert len(utts) == 2
    assert calls[0]["name"] == "openslr/librispeech_asr"
    assert calls[0]["split"] == "test.clean"
    # trust_remote_code never offered to a datasets that rejects it
    assert all("trust_remote_code" not in c for c in calls)


def test_load_librispeech_datasets5_split_remap(monkeypatch):
    """When the Parquet repo rejects the dotted split spelling, the loader
    falls back to config 'clean' + split 'test' (the Parquet layout)."""
    from openai_whisper_compression_tpu.evaluation.data import load_librispeech

    calls = []

    # real datasets signature: path positional, name= the config kwarg
    def load_dataset(path, split=None, streaming=False, **kw):
        calls.append(dict(path=path, split=split, streaming=streaming,
                          cfg=kw.get("name")))
        if path == "openslr/librispeech_asr" and kw.get("name") == "clean" \
                and split == "test":
            return _FakeStream(_fake_records(4))
        raise ValueError(f"unknown split {split!r}")

    mod = types.ModuleType("datasets")
    mod.__version__ = "3.2.0"
    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    utts = load_librispeech(num_samples=3, split="test.clean")
    assert len(utts) == 3
    assert calls[-1] == {"path": "openslr/librispeech_asr", "split": "test",
                         "streaming": True, "cfg": "clean"}


def test_load_librispeech_unavailable(monkeypatch):
    from openai_whisper_compression_tpu.evaluation.data import load_librispeech

    mod = types.ModuleType("datasets")

    def load_dataset(*a, **k):
        raise ConnectionError("no egress")

    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    with pytest.raises(RuntimeError, match="LibriSpeech unavailable"):
        load_librispeech(num_samples=2)


# ---------------------------------------------------------------------------
# npz checkpoint cache round-trip (tools/fetch_checkpoint.py backing store)
# ---------------------------------------------------------------------------

def test_checkpoint_cache_roundtrip(tmp_path):
    import jax

    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models.convert import (
        load_cached_model, save_cached_model)

    arch = ARCHS["test2l"].replace(alignment_heads=((1, 0), (1, 1)))
    params = P.init_params(arch, jax.random.PRNGKey(0))
    save_cached_model(params, arch, "openai/whisper-test2l",
                      cache_dir=str(tmp_path))
    assert (tmp_path / "openai--whisper-test2l.npz").exists()
    assert (tmp_path / "openai--whisper-test2l.arch.json").exists()

    hit = load_cached_model("openai/whisper-test2l", cache_dir=str(tmp_path))
    assert hit is not None
    params2, arch2 = hit
    assert arch2 == arch  # incl. tuple-ified alignment_heads
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    np.testing.assert_array_equal(np.asarray(flat1[0]), np.asarray(flat2[0]))

    assert load_cached_model("openai/whisper-missing",
                             cache_dir=str(tmp_path)) is None


def test_fetch_checkpoint_status_cli(tmp_path, monkeypatch, capsys):
    """--status path runs with no network and reports both caches."""
    monkeypatch.setenv("WHISPER_TPU_CACHE", str(tmp_path))
    sys.path.insert(0, "/root/repo/tools")
    try:
        import fetch_checkpoint
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(sys, "argv", ["fetch_checkpoint.py", "--status"])
    assert fetch_checkpoint.main() == 0
    out = capsys.readouterr().out
    assert "npz cache dir" in out and "HF hub cache" in out


# ---------------------------------------------------------------------------
# Analytic HBM fallback in MemoryTracker (VERDICT weak #2)
# ---------------------------------------------------------------------------

def test_memory_tracker_analytic_fallback(monkeypatch):
    import jax

    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.evaluation import memory as mem
    from openai_whisper_compression_tpu.models import params as P

    # platform reports nothing (the axon behavior)
    monkeypatch.setattr(mem, "device_memory_stats", lambda: {})
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))

    t = mem.MemoryTracker("m")
    t.set_analytic(params, arch, batch_size=4)
    t.log_memory(split="clean", batch_idx=0, batch_size=4)
    s = t.get_memory_summary()
    assert s["hbm_analytic"] is True
    assert s["hbm_peak_mb"]["mean"] > 0
    # sanity bound: params alone are < the estimate < params + 1 GB
    pmb = P.size_in_mb(params)
    assert pmb < s["hbm_peak_mb"]["mean"] < pmb + 1024


def test_evaluate_model_publishes_analytic_hbm(monkeypatch):
    import jax

    from openai_whisper_compression_tpu.config import (ARCHS, DecodeConfig,
                                                       EvalConfig)
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.evaluation import memory as mem
    from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
    from openai_whisper_compression_tpu.evaluation.memory import MemoryTracker
    from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
    from openai_whisper_compression_tpu.models import params as P

    monkeypatch.setattr(mem, "device_memory_stats", lambda: {})
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    data = synthetic_dataset(2, seed=1, vocab_size=500,
                             min_dur=0.4, max_dur=0.8)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    tracker = MemoryTracker("test2l")
    scores, _ = harness.evaluate_model(
        params, arch, data, tok,
        eval_cfg=EvalConfig(batch_size=2, num_samples=2, warmup_batches=0),
        decode_cfg=DecodeConfig(max_new_tokens=4, language_token_id=None,
                                task_token_id=None, notimestamps=False),
        memory_tracker=tracker)
    memsum = scores["memory"]
    assert memsum["hbm_analytic"] is True
    assert memsum["hbm_peak_mb"]["mean"] > 0


def test_arch_from_hf_config_special_layouts():
    """Vocab size determines the special-token layout; generation_config
    (applied in load_hf_model) can override."""
    from types import SimpleNamespace

    from openai_whisper_compression_tpu.models.convert import (
        arch_from_hf_config)

    def cfg(vocab):
        return SimpleNamespace(
            name_or_path="x", vocab_size=vocab, num_mel_bins=80, d_model=64,
            encoder_layers=2, encoder_attention_heads=4, decoder_layers=2,
            decoder_attention_heads=4, encoder_ffn_dim=128,
            max_source_positions=64, max_target_positions=32,
            eos_token_id=50257, decoder_start_token_id=50258)

    a_en = arch_from_hf_config(cfg(51864))
    assert (a_en.multilingual, a_en.no_timestamps_token_id) == (False, 50362)
    a_v2 = arch_from_hf_config(cfg(51865))
    assert (a_v2.multilingual, a_v2.no_timestamps_token_id) == (True, 50363)
    a_v3 = arch_from_hf_config(cfg(51866))
    assert (a_v3.multilingual, a_v3.no_timestamps_token_id) == (True, 50364)
    # custom/test vocab: specials disabled (id >= vocab), multilingual-true
    a_t = arch_from_hf_config(cfg(1000))
    assert a_t.no_timestamps_token_id >= a_t.vocab_size


# ---------------------------------------------------------------------------
# load_audio_dir: local-directory real-audio path (zero-egress WER)
# ---------------------------------------------------------------------------

def _write_wav(path, wav, sr=16000, channels=1):
    import wave

    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture
def audio_dir(tmp_path):
    from openai_whisper_compression_tpu.config import SAMPLE_RATE

    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sub = tmp_path / "spk1" / "ch1"
    sub.mkdir(parents=True)
    _write_wav(sub / "utt1.wav", tone)
    _write_wav(sub / "utt2.wav", tone, channels=2)          # stereo downmix
    _write_wav(sub / "utt3.wav", tone[::2], sr=8000)        # resampled
    np.save(sub / "utt4.npy", tone)                          # float npy
    (sub / "any.trans.txt").write_text(
        "utt1 HELLO WORLD\nutt2 SECOND LINE\n")
    (sub / "utt4.txt").write_text("sidecar text\n")
    return tmp_path


def test_load_audio_dir(audio_dir):
    from openai_whisper_compression_tpu.evaluation import data

    utts = data.load_audio_dir(str(audio_dir))
    assert [u.uid for u in utts] == ["utt1", "utt2", "utt3", "utt4"]
    assert utts[0].text == "HELLO WORLD"          # trans.txt
    assert utts[1].text == "SECOND LINE"
    assert utts[2].text == ""                     # no transcript anywhere
    assert utts[3].text == "sidecar text"         # sidecar .txt
    for u in utts:
        assert u.audio.dtype == np.float32
        assert abs(u.duration - 1.0) < 0.01       # all ~1 s @ 16 kHz
    # stereo downmix and 8 kHz resample land at the same length
    assert len(utts[1].audio) == len(utts[0].audio)
    assert len(utts[2].audio) == len(utts[0].audio)
    # explicit TSV table wins over trans.txt
    tsv = audio_dir / "table.tsv"
    tsv.write_text("utt1\toverride text\n")
    utts = data.load_audio_dir(str(audio_dir), transcripts=str(tsv))
    assert utts[0].text == "override text"
    assert utts[1].text == "SECOND LINE"
    # bounded + errors
    assert len(data.load_audio_dir(str(audio_dir), num_samples=2)) == 2
    with pytest.raises(FileNotFoundError):
        data.load_audio_dir(str(audio_dir / "nope"))
    empty = audio_dir / "empty"
    empty.mkdir()
    with pytest.raises(RuntimeError, match="no .flac"):
        data.load_audio_dir(str(empty))


def test_prepare_datasets_audio_dir(audio_dir):
    from openai_whisper_compression_tpu.evaluation import data

    ds = data.prepare_datasets(num_cal=1, num_test=3,
                               audio_dir=str(audio_dir))
    assert [u.uid for u in ds["calibration_clean"]] == ["utt1"]
    assert [u.uid for u in ds["test_clean"]] == ["utt2", "utt3", "utt4"]
    assert ds["test_other"] == [] and ds["calibration_other"] == []


def test_cli_evaluate_audio_dir(audio_dir, capsys):
    """Full WER evaluation over a local audio directory — the zero-egress
    real-audio recipe (`--audio-dir`), whisper-normalized scoring."""
    from openai_whisper_compression_tpu import cli

    cli.main(["evaluate", "--model", "test2l", "--samples", "3",
              "--batch-size", "2", "--max-new-tokens", "4",
              "--calibration-samples", "1",
              "--audio-dir", str(audio_dir)])
    assert "WER" in capsys.readouterr().out


def test_read_audio_file_guards(tmp_path):
    """Non-16-bit PCM rejects; arbitrary target rates resample correctly
    (BatchLoader only targets 16 kHz)."""
    import wave

    from openai_whisper_compression_tpu.evaluation import data

    t = np.arange(16000) / 16000.0
    tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / "w24.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)                      # 24-bit PCM
        w.setframerate(16000)
        w.writeframes(b"\x00\x00\x00" * 100)
    with pytest.raises(ValueError, match="16-bit"):
        data.read_audio_file(str(p))

    p16 = tmp_path / "w16.wav"
    _write_wav(p16, tone)
    out = data.read_audio_file(str(p16), sample_rate=8000)
    assert len(out) == 8000                    # halved, not truncated
    assert float(np.abs(out).max()) > 0.1      # real signal, not garbage


def test_prepare_datasets_audio_dir_too_few(audio_dir):
    from openai_whisper_compression_tpu.evaluation import data

    with pytest.raises(RuntimeError, match="test split would be empty"):
        data.prepare_datasets(num_cal=8, num_test=16,
                              audio_dir=str(audio_dir))


# ---------------------------------------------------------------------------
# fetch_librispeech: mocked OpenSLR tarball -> unpack -> load_audio_dir
# (with native FLAC decode, the unpacked split feeds --audio-dir verbatim)
# ---------------------------------------------------------------------------

def _import_fetch_librispeech():
    sys.path.insert(0, "/root/repo/tools")
    try:
        import fetch_librispeech
    finally:
        sys.path.pop(0)
    return fetch_librispeech


def test_fetch_librispeech_mocked(tmp_path, monkeypatch, capsys):
    import tarfile

    sys.path.insert(0, "/root/repo/tests")
    try:
        from test_flac import encode_flac
    finally:
        sys.path.pop(0)
    fl = _import_fetch_librispeech()

    # build a fake OpenSLR test-clean tarball: LibriSpeech/<split>/spk/ch/
    src = tmp_path / "src" / "LibriSpeech" / "test-clean" / "1" / "2"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    pcm = rng.integers(-3000, 3000, 1024, dtype=np.int64)
    (src / "1-2-0000.flac").write_bytes(encode_flac(pcm))
    (src / "1-2.trans.txt").write_text("1-2-0000 HELLO FLAC\n")
    tar = tmp_path / "test-clean.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(tmp_path / "src" / "LibriSpeech", arcname="LibriSpeech")

    def fake_retrieve(url, dst):
        assert url == "https://www.openslr.org/resources/12/test-clean.tar.gz"
        import shutil
        shutil.copy(tar, dst)

    monkeypatch.setattr(fl.urllib.request, "urlretrieve", fake_retrieve)
    root = str(tmp_path / "cache")
    d = fl.fetch_split("test-clean", root)
    assert fl.split_status("test-clean", root) == (1, 1)
    # second call: cache hit, no download
    monkeypatch.setattr(fl.urllib.request, "urlretrieve",
                        lambda *a: (_ for _ in ()).throw(AssertionError))
    assert fl.fetch_split("test-clean", root) == d

    from openai_whisper_compression_tpu.evaluation.data import load_audio_dir
    utts = load_audio_dir(d)
    assert [u.text for u in utts] == ["HELLO FLAC"]
    np.testing.assert_allclose(utts[0].audio,
                               pcm.astype(np.float32) / 32768.0)

    monkeypatch.setattr(sys, "argv", ["fetch_librispeech.py", "--status",
                                      "--cache-dir", root])
    assert fl.main() == 0
    out = capsys.readouterr().out
    assert "test-clean: 1 flac" in out


def test_fetch_librispeech_unknown_split(tmp_path, monkeypatch):
    fl = _import_fetch_librispeech()
    monkeypatch.setattr(sys, "argv", ["fetch_librispeech.py", "nope",
                                      "--cache-dir", str(tmp_path)])
    assert fl.main() == 1

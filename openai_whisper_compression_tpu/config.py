"""Model architecture and run configuration.

Single unified config schema replacing the reference's three config styles
(hardcoded dict registries, argparse CLIs, generated JSON pruning configs —
see reference `quantization.py:42-90`, `pruning_and_storing_as_sparse.py:590-604`,
`gradient_sensitivity_test.py:1010-1118`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class WhisperArch:
    """Static Whisper architecture hyperparameters.

    Matches HF `WhisperConfig` semantics (reference loads
    `WhisperForConditionalGeneration` at `model_utils.py:116-123`); here it is
    a frozen dataclass so it can be closed over by jitted functions.
    """

    name: str = "tiny"
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_heads: int = 6
    decoder_layers: int = 4
    decoder_heads: int = 6
    ffn_dim: int = 1536
    max_source_positions: int = 1500  # encoder frames after conv stride-2
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5

    # Special token ids (multilingual Whisper vocab).
    bos_token_id: int = 50257  # <|endoftext|> used as pad in HF
    eos_token_id: int = 50257
    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    no_timestamps_token_id: int = 50363
    # False for the `.en` checkpoints: their vocab (51864) has no language/
    # task tokens, so the forced prefix is just [<|sot|>(, <|notimestamps|>)]
    # and `detect_language` is unavailable.
    multilingual: bool = True
    # published word-alignment heads ((layer, head) pairs from the HF
    # checkpoint's generation_config); () -> top-half-of-decoder fallback
    alignment_heads: tuple = ()

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_heads

    # Specials sit at fixed offsets below <|notimestamps|> in every OpenAI
    # vocab (v2-style: ... <|translate|>=nts-5 <|transcribe|>=nts-4 ...
    # <|nospeech|>=nts-1 <|notimestamps|>; v3 shifts the whole block +1,
    # .en vocabs keep the layout minus the language/task ids) — derive them
    # instead of hardcoding v2 ids.
    @property
    def task_transcribe_token_id(self) -> int:
        return self.no_timestamps_token_id - 4

    @property
    def task_translate_token_id(self) -> int:
        return self.no_timestamps_token_id - 5

    @property
    def no_speech_token_id(self) -> int:
        return self.no_timestamps_token_id - 1

    @property
    def language_en_token_id(self) -> int:
        return self.decoder_start_token_id + 1  # <|en|> is always first

    def replace(self, **kw: Any) -> "WhisperArch":
        return dataclasses.replace(self, **kw)


def _arch(name: str, mels: int, d: int, el: int, eh: int, dl: int, dh: int,
          vocab: int = 51865) -> WhisperArch:
    return WhisperArch(
        name=name, vocab_size=vocab, num_mel_bins=mels, d_model=d,
        encoder_layers=el, encoder_heads=eh, decoder_layers=dl,
        decoder_heads=dh, ffn_dim=4 * d,
    )


def _en(arch: WhisperArch) -> WhisperArch:
    """English-only (`.en`) variant: GPT-2 vocab (51864) with
    <|endoftext|>=50256, <|startoftranscript|>=50257, no language/task
    tokens, <|notimestamps|>=50362."""
    return arch.replace(
        name=arch.name + ".en", vocab_size=51864, multilingual=False,
        bos_token_id=50256, eos_token_id=50256,
        decoder_start_token_id=50257, no_timestamps_token_id=50362,
    )


# Official OpenAI Whisper family dimensions.
ARCHS: dict[str, WhisperArch] = {
    "tiny": _arch("tiny", 80, 384, 4, 6, 4, 6),
    "base": _arch("base", 80, 512, 6, 8, 6, 8),
    "small": _arch("small", 80, 768, 12, 12, 12, 12),
    "medium": _arch("medium", 80, 1024, 24, 16, 24, 16),
    "large": _arch("large", 80, 1280, 32, 20, 32, 20),  # large-v1
    "large-v2": _arch("large-v2", 80, 1280, 32, 20, 32, 20),
    # v3 adds <|yue|> (vocab 51866), shifting every later special by +1:
    # <|notimestamps|> = 50364 (HF generation_config), timestamps from 50365.
    "large-v3": _arch("large-v3", 128, 1280, 32, 20, 32, 20,
                      vocab=51866).replace(no_timestamps_token_id=50364),
    # large-v3 encoder + distilled 4-layer decoder (openai/whisper-large-v3-
    # turbo); decode cost drops 8x while the encoder/mel stack is v3's.
    "large-v3-turbo": _arch("large-v3-turbo", 128, 1280, 32, 20, 4, 20,
                            vocab=51866).replace(no_timestamps_token_id=50364),
    # Tiny test-only config (random weights, fast tests).
    "test2l": WhisperArch(
        name="test2l", vocab_size=1000, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_heads=4, decoder_layers=2, decoder_heads=4,
        ffn_dim=128, max_source_positions=64, max_target_positions=32,
        bos_token_id=997, eos_token_id=997, decoder_start_token_id=998,
        no_timestamps_token_id=999,
    ),
}
# timestamp-capable twin of test2l (OpenAI token layout: text < eot < sot <
# notimestamps < 100 timestamp ids) so CLI-level seek/stream paths are
# testable without a real vocab.
ARCHS["test2l-ts"] = ARCHS["test2l"].replace(
    name="test2l-ts", bos_token_id=897, eos_token_id=897,
    decoder_start_token_id=898, no_timestamps_token_id=899)
ARCHS.update({a.name + ".en": _en(a) for a in
              [ARCHS[n] for n in ("tiny", "base", "small", "medium")]})
# distil-whisper (HF distil-whisper/*): full encoder + a distilled shallow
# decoder (model cards: large-v2/v3 and medium.en keep 2 decoder layers,
# small.en keeps 4). Load with load_model(name, hf="distil-whisper/<name>").
ARCHS.update({
    "distil-large-v2": ARCHS["large-v2"].replace(
        name="distil-large-v2", decoder_layers=2),
    "distil-large-v3": ARCHS["large-v3"].replace(
        name="distil-large-v3", decoder_layers=2),
    "distil-medium.en": ARCHS["medium.en"].replace(
        name="distil-medium.en", decoder_layers=2),
    "distil-small.en": ARCHS["small.en"].replace(
        name="distil-small.en", decoder_layers=4),
})


# OpenAI language codes IN TOKEN ORDER: language token = <|sot|> + 1 + index
# (whisper tokenizer LANGUAGES dict order; v3 vocabs append "yue").
LANGUAGES = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
)


def language_code(arch: "WhisperArch", token_id: int) -> str:
    """Inverse of `language_token_id`: <|xx|> token id -> code (for
    `models.decode.detect_language` output)."""
    idx = int(token_id) - (arch.decoder_start_token_id + 1)
    if not 0 <= idx < len(LANGUAGES):
        raise ValueError(f"token {token_id} is not a language token")
    return LANGUAGES[idx]


def language_token_id(arch: "WhisperArch", code: str | int) -> int:
    """<|xx|> token id for a language code (or pass an int id through).

    Token layout: languages sit at [sot+1, translate) in declaration order;
    v2-style vocabs hold 99 of them, v3 adds "yue" (100)."""
    if isinstance(code, int):
        return code
    c = code.lower()
    if c not in LANGUAGES:
        raise ValueError(f"unknown language code {code!r}")
    tok = arch.decoder_start_token_id + 1 + LANGUAGES.index(c)
    if not arch.multilingual:
        raise ValueError(f"{arch.name} is English-only")
    if tok >= arch.task_translate_token_id:  # past the language block
        raise ValueError(
            f"language {code!r} not in {arch.name}'s vocab "
            f"(v2-style vocabs lack 'yue')")
    return tok


# ---------------------------------------------------------------------------
# Audio frontend constants (Whisper's fixed STFT/log-mel recipe; the reference
# delegates these to `WhisperProcessor` at `data_utils.py:56-58`).
# ---------------------------------------------------------------------------
SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS      # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH           # 3000 mel frames


@dataclass(frozen=True)
class DecodeConfig:
    """Generation settings (reference relies on HF `generate` defaults at
    `data_utils.py:152`).

    Frozen (hashable) so decode entry points can be jitted with the cfg
    as a STATIC argument — eager encode/greedy dispatch through a
    tunnelled backend is ~100x slower than one compiled program (the
    r4 curve-recovery path measured exactly that). Derive variants with
    `dataclasses.replace`."""

    max_new_tokens: int = 445
    beam_size: int = 1  # 1 = greedy
    # "auto" resolves per-arch at prefix build: <|en|> / <|transcribe|> for
    # multilingual vocabs (v3 shifts the task ids +1 — hardcoded v2 ids
    # would inject <|translate|> there), omitted for `.en` vocabs.
    # None = omit; an int = use that id verbatim.
    language_token_id: int | str | None = "auto"
    task_token_id: int | str | None = "auto"
    suppress_tokens: tuple[int, ...] = ()
    begin_suppress_tokens: tuple[int, ...] = ()
    notimestamps: bool = True
    length_penalty: float = 1.0
    kv_int8: bool = False        # int8 self-attn KV cache (BASELINE config 4)
    cross_kv_int8: bool = False  # int8 cross-attn K/V (read every step)
    cross_kv_int4: bool = False  # int4 cross-KV (halves the stream again;
    #                              takes precedence over cross_kv_int8)
    # fused Pallas decode cross-attention over transposed K/V (greedy path;
    # ops.cross_attention). With cross_kv_int8 the int8 dequant fuses into
    # the kernel — 2.2x faster per step than the XLA path on v5e.
    cross_pallas: bool = True
    # Encoder token merging (models/merge.py) — LOSSY decode levers that
    # shrink the attended encoder sequence before cross-KV precompute.
    # Every decode step streams the full cross-KV (the measured decode
    # bottleneck, DESIGN.md §8), so S 1500 -> 750 halves both that stream
    # and cross-KV HBM capacity. cross_kv_pool: stride-k mean pooling
    # (k=2/3). cross_kv_merge: ToMe-style bipartite merging of the r most
    # similar frame pairs (content-adaptive; takes precedence over pool
    # when both set). Both one-shot per utterance, static shapes.
    cross_kv_pool: int = 1
    cross_kv_merge: int = 0
    # fused Pallas decode self-attention over the KV cache (replaces ~20
    # small XLA ops per layer per step; ops.self_attention_step). Both fp
    # and int8 KV caches use fused Pallas kernels on TPU (the int8 path via
    # decode_self_attention_update_int8).
    self_pallas: bool = True
    # OpenAI timestamp decoding rules (active when notimestamps=False and the
    # vocab has timestamp tokens): timestamps open every segment, appear in
    # non-decreasing pairs, and win over text when their total probability
    # dominates. max_initial_timestamp_index bounds the first timestamp
    # (50 ≈ 1.0 s at 0.02 s/token, OpenAI's default).
    timestamp_rules: bool = True
    max_initial_timestamp_index: int = 50


@dataclass
class EvalConfig:
    """Evaluation harness settings (≈ reference `evaluation.py:12-134` args)."""

    split: str = "test.clean"
    num_samples: int = 100
    batch_size: int = 8
    warmup_batches: int = 1
    compute_cer: bool = True
    save_path: str | None = None
    # text normalization before WER/CER: "basic" (lowercase/strip-punct —
    # safe for synthetic token ids), "whisper" (full OpenAI normalizer, the
    # scoring the reference's recorded WERs use — data_utils.py:60,170), or
    # "none". The CLI real-data path (--hf/--librispeech) selects "whisper".
    normalizer: str = "basic"
    # Sort utterances by duration before batching so each lockstep decode
    # batch holds similar-length audio: a batch pays for its SLOWEST member
    # (to-EOT decode runs until all rows finish), so mixing a 30 s utterance
    # into a batch of 3 s ones wastes ~90% of the other rows' steps. Scores
    # and record order are unaffected (records are restored to input order).
    length_bucketing: bool = True


@dataclass
class RunConfig:
    """One experiment = model + compression + eval. Serialisable to JSON."""

    model: str = "tiny"
    dtype: str = "float32"
    quantization: dict[str, Any] | None = None
    pruning: dict[str, Any] | None = None
    # compression-recovery fine-tuning (distill.py / quant/qat.py):
    # {"qat": bool, "steps": int, "lr": float}. With `quantization`, the
    # named method trains via STE QAT (qat=true) or the PTQ->recover->
    # requant ladder; with pruning only, plain recovery distillation.
    recovery: dict[str, Any] | None = None
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "RunConfig":
        d = json.loads(s)
        d["decode"] = DecodeConfig(**d.get("decode", {}))
        d["eval"] = EvalConfig(**d.get("eval", {}))
        return RunConfig(**d)

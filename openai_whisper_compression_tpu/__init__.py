"""openai_whisper_compression_tpu — TPU-native Whisper inference and
compression framework (JAX / XLA / Pallas).

Capability-parity rebuild of the reference research codebase
`juligoat/openai-whisper-compression` (PyTorch/HF, see SURVEY.md): Whisper
ASR evaluation with WER/CER/RTF/HBM metrics, a quantization lab, a pruning
lab, sensitivity analyses, compressed storage formats, and sweep drivers —
re-architected as one functional library + one CLI, designed for TPU
(MXU-shaped matmuls, Pallas kernels, static-shape jit decode, pjit/GSPMD
scale-out).

Quick start::

    from openai_whisper_compression_tpu import load_model, transcribe
    params, arch = load_model("tiny")          # random init offline,
                                               # HF checkpoint when available
    result = transcribe(params, arch, waveform)
"""

from __future__ import annotations

from typing import Any

__version__ = "0.1.0"

from .config import ARCHS, DecodeConfig, EvalConfig, RunConfig, WhisperArch  # noqa: F401


def load_model(name_or_arch: str = "tiny", dtype: Any = None, seed: int = 0,
               hf: str | None = None):
    """(params, arch). `hf` loads a real HF checkpoint (needs hub/cache);
    otherwise random-initialized weights of the named architecture."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if hf:
        from .models.convert import load_hf_model

        return load_hf_model(hf, dtype=dtype)
    from .models.params import init_params_jit

    arch = ARCHS[name_or_arch]
    return init_params_jit(arch, jax.random.PRNGKey(seed), dtype=dtype), arch


def transcribe(params, arch, audio, tokenizer=None, decode_cfg=None,
               batch_size: int = 8, timestamps: bool = False,
               word_timestamps: bool = False,
               temperatures=None, best_of: int = 1,
               initial_prompt: str | None = None,
               condition_on_previous: bool = False,
               task: str = "transcribe", language: str | int | None = None,
               clip_timestamps=None,
               hallucination_silence_threshold: float | None = None
               ) -> dict:
    """OpenAI-`whisper.transcribe()`-style convenience: accepts a waveform of
    any length (16 kHz float32), long-form chunks at 30 s, returns
    {"text", "chunks", ...}.

    timestamps=True switches to seek-based decoding with the OpenAI
    timestamp rules, returning {"text", "segments", ...}; word_timestamps
    additionally aligns words via cross-attention DTW ("words" key).
    temperatures (e.g. ``(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)``) enables the
    OpenAI temperature-fallback ladder with compression-ratio/logprob
    quality gates (models.fallback); best_of > 1 samples that many
    candidates per sequence at each t > 0 rung and keeps the highest
    mean-logprob one (OpenAI DecodingOptions.best_of).
    task="translate" and language
    ("de" / a raw token id) set the decoder prefix tokens per-arch.
    condition_on_previous (OpenAI condition_on_previous_text) and
    initial_prompt work on both the chunked and the timestamps/seek
    paths (seek: a rolling `<|startofprev|>` prompt window; incompatible
    with temperatures/word_timestamps there)."""
    import dataclasses as _dc

    from .config import language_token_id
    from .evaluation.longform import transcribe_long, transcribe_seek
    from .evaluation.tokenizer import default_tokenizer

    if task not in ("transcribe", "translate"):
        raise ValueError(f"task must be transcribe|translate, got {task!r}")
    if best_of > 1:
        # mirror OpenAI: best_of is incompatible with deterministic
        # decoding — failing loudly beats silently returning single-
        # candidate greedy output the caller believes was sampled
        if not temperatures or not any(t > 0 for t in temperatures):
            raise ValueError("best_of needs a temperatures ladder with "
                             "t>0 rungs (greedy t=0 is deterministic)")
    if task == "translate" or language is not None:
        cfg0 = decode_cfg or DecodeConfig()
        repl = {}
        if task == "translate":
            repl["task_token_id"] = arch.task_translate_token_id
        if language is not None:
            repl["language_token_id"] = language_token_id(arch, language)
        decode_cfg = _dc.replace(cfg0, **repl)

    if tokenizer is None:
        tokenizer = default_tokenizer(arch)
    if timestamps or word_timestamps:
        import dataclasses

        cfg = decode_cfg or DecodeConfig()
        cfg = dataclasses.replace(cfg, notimestamps=False)
        return transcribe_seek(
            params, arch, audio, tokenizer, cfg,
            word_timestamps=word_timestamps,
            clip_timestamps=clip_timestamps,
            hallucination_silence_threshold=hallucination_silence_threshold,
            temperatures=temperatures,
            fallback_kw=({"best_of": best_of} if best_of > 1 else None),
            condition_on_previous=condition_on_previous,
            initial_prompt_ids=(list(tokenizer.encode(initial_prompt))
                                if initial_prompt else None))
    return transcribe_long(params, arch, audio, tokenizer,
                           cfg=decode_cfg, batch_size=batch_size,
                           condition_on_previous=condition_on_previous,
                           temperatures=temperatures,
                           fallback_kw=({"best_of": best_of}
                                        if best_of > 1 else None),
                           initial_prompt=initial_prompt)


def quantize(params, method: str = "int8", **kw):
    """Pure quantization transform (see quant.api.quantize_params)."""
    from .quant.api import quantize_params

    return quantize_params(params, method, **kw)


# Pre-import the `prune` subpackage BEFORE defining the same-named
# convenience function: a submodule's first import sets the package
# attribute, so without this any later `import ...prune.magnitude` elsewhere
# would silently rebind `openai_whisper_compression_tpu.prune` from the
# function back to the subpackage (order-dependent API breakage).
from . import prune as _prune_pkg  # noqa: E402,F401


def prune(params, arch=None, amount: float | None = None,
          recipe: dict | None = None, **kw):
    """Magnitude pruning: global L1 at `amount`, or the per-component
    `recipe` (see prune.recipe)."""
    if recipe is not None:
        from .prune.recipe import apply_recipe

        return apply_recipe(params, arch, recipe)
    from .prune.magnitude import prune_global_l1

    return prune_global_l1(params, amount or 0.0, **kw)

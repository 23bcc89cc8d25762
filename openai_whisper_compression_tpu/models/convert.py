"""HF Whisper checkpoint -> parameter pytree converter.

The reference obtains models via `WhisperForConditionalGeneration.from_pretrained`
(`model_utils.py:116-123`). Here any HF Whisper state dict (torch tensors or
numpy arrays keyed by HF parameter names) converts into this framework's
pytree. Linear weights are transposed (torch stores (out,in); we store
(in,out) for MXU-friendly `x @ w`).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import ARCHS, WhisperArch


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd: Mapping[str, Any], name: str) -> dict:
    p = {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return p


def _ln(sd: Mapping[str, Any], name: str) -> dict:
    return {"g": jnp.asarray(_np(sd[f"{name}.weight"])),
            "b": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _attn(sd: Mapping[str, Any], name: str) -> dict:
    return {
        "q": _lin(sd, f"{name}.q_proj"),
        "k": _lin(sd, f"{name}.k_proj"),
        "v": _lin(sd, f"{name}.v_proj"),
        "o": _lin(sd, f"{name}.out_proj"),
    }


def from_hf_state_dict(sd: Mapping[str, Any]) -> dict:
    """Convert an HF WhisperForConditionalGeneration state dict to a pytree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    n_enc = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers."))
    n_dec = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("decoder.layers."))

    def enc_layer(i: int) -> dict:
        base = f"encoder.layers.{i}"
        return {
            "attn": _attn(sd, f"{base}.self_attn"),
            "attn_ln": _ln(sd, f"{base}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{base}.fc1"),
            "fc2": _lin(sd, f"{base}.fc2"),
            "mlp_ln": _ln(sd, f"{base}.final_layer_norm"),
        }

    def dec_layer(i: int) -> dict:
        base = f"decoder.layers.{i}"
        p = {
            "attn": _attn(sd, f"{base}.self_attn"),
            "attn_ln": _ln(sd, f"{base}.self_attn_layer_norm"),
            "cross": _attn(sd, f"{base}.encoder_attn"),
            "cross_ln": _ln(sd, f"{base}.encoder_attn_layer_norm"),
            "fc1": _lin(sd, f"{base}.fc1"),
            "fc2": _lin(sd, f"{base}.fc2"),
            "mlp_ln": _ln(sd, f"{base}.final_layer_norm"),
        }
        return p

    encoder = {
        "conv1": {"w": jnp.asarray(_np(sd["encoder.conv1.weight"])),
                  "b": jnp.asarray(_np(sd["encoder.conv1.bias"]))},
        "conv2": {"w": jnp.asarray(_np(sd["encoder.conv2.weight"])),
                  "b": jnp.asarray(_np(sd["encoder.conv2.bias"]))},
        "pos": jnp.asarray(_np(sd["encoder.embed_positions.weight"])),
        "layers": [enc_layer(i) for i in range(n_enc)],
        "ln": _ln(sd, "encoder.layer_norm"),
    }
    decoder = {
        "embed": jnp.asarray(_np(sd["decoder.embed_tokens.weight"])),
        "pos": jnp.asarray(_np(sd["decoder.embed_positions.weight"])),
        "layers": [dec_layer(i) for i in range(n_dec)],
        "ln": _ln(sd, "decoder.layer_norm"),
    }
    return {"encoder": encoder, "decoder": decoder}


def arch_from_hf_config(cfg) -> WhisperArch:
    """Derive a WhisperArch from an HF WhisperConfig object."""
    base = ARCHS["tiny"]
    return base.replace(
        name=getattr(cfg, "name_or_path", "") or "hf",
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        encoder_heads=cfg.encoder_attention_heads,
        decoder_layers=cfg.decoder_layers,
        decoder_heads=cfg.decoder_attention_heads,
        ffn_dim=cfg.encoder_ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
    )


def load_hf_model(model_name: str, dtype=jnp.float32):
    """Load a pretrained HF Whisper into (params, arch). Requires network or
    a local HF cache; tests instead build random-weight HF models in-process."""
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(model_name)
    params = from_hf_state_dict(model.state_dict())
    arch = arch_from_hf_config(model.config)
    from .params import tree_cast

    return tree_cast(params, dtype), arch

"""Analytic GFLOPs estimator for (pruned) Whisper inference.

Mirrors the reference's estimator semantics
(`unstructured_L1_baseline.py:100-177`): multiply-accumulate counts from
*non-zero* linear weights; encoder runs its full 1500-frame context, decoder
weighted by an assumed 25-token generation; conv stem and attention
score/value matmuls included.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import WhisperArch
from ..models.params import named_leaves
from ..ops.qtensor import QTensor

DECODER_TOKENS_ASSUMED = 25  # reference assumption (:114)


def _nnz(leaf) -> int:
    if isinstance(leaf, QTensor):
        k, n = leaf.shape
        return k * n  # quantized weights are dense
    return int(jnp.sum(leaf != 0))


def model_gflops(params: Any, arch: WhisperArch,
                 decoder_tokens: int = DECODER_TOKENS_ASSUMED) -> dict[str, float]:
    enc_t = arch.max_source_positions          # 1500
    mel_t = 2 * enc_t                          # 3000
    flops_enc = 0.0
    flops_dec = 0.0

    for n, l in named_leaves(params):
        if n.endswith(".b") or n.endswith(".g"):
            continue
        nnz = _nnz(l)
        if n.startswith("encoder.conv1"):
            flops_enc += 2.0 * nnz * mel_t
        elif n.startswith("encoder.conv2"):
            flops_enc += 2.0 * nnz * enc_t
        elif n == "decoder.embed":
            # tied proj_out matmul per generated token
            flops_dec += 2.0 * nnz * decoder_tokens
        elif n.endswith(".pos"):
            continue
        elif n.startswith("encoder.") and l is not None and hasattr(l, "ndim") and l.ndim == 2:
            flops_enc += 2.0 * nnz * enc_t
        elif n.startswith("decoder.") and hasattr(l, "ndim") and (
                isinstance(l, QTensor) or l.ndim == 2):
            flops_dec += 2.0 * nnz * decoder_tokens

    # attention score/value matmuls (dense, from shapes)
    d = arch.d_model
    for layer in params["encoder"]["layers"]:
        h_dim = layer["attn"]["q"]["w"]
        width = h_dim.shape[1] if isinstance(h_dim, QTensor) else h_dim.shape[1]
        flops_enc += 2.0 * 2 * enc_t * enc_t * width
    for layer in params["decoder"]["layers"]:
        sw = layer["attn"]["q"]["w"]
        s_width = sw.shape[1] if isinstance(sw, QTensor) else sw.shape[1]
        cw = layer["cross"]["q"]["w"]
        c_width = cw.shape[1] if isinstance(cw, QTensor) else cw.shape[1]
        flops_dec += 2.0 * 2 * decoder_tokens * decoder_tokens * s_width
        flops_dec += 2.0 * 2 * decoder_tokens * enc_t * c_width

    total = flops_enc + flops_dec
    return {"encoder_gflops": flops_enc / 1e9,
            "decoder_gflops": flops_dec / 1e9,
            "total_gflops": total / 1e9}

"""Encoder token merging: shrink the attended sequence before cross-KV.

Whisper's decoder cross-attends to 1500 encoder frames (50 Hz) every
decode step; the per-step cross-KV stream is the measured decode
bottleneck on v5e (DESIGN.md §8: 70.5 of ~105 ms per 25-step batch-96
decode), and cross-KV dominates large-batch HBM capacity. Those frames
are highly redundant — speech content changes far slower than 50 Hz —
so merging similar adjacent frames trades a measured bit of agreement
for a proportional cut in BOTH the stream and the capacity. This is the
"token merging" lever DESIGN.md §8 names as the remaining (lossy)
decode knob; the reference has no equivalent (its compression axes are
weights-only: pruning + quantization, SURVEY.md §2).

Two strategies, both one-shot per utterance (cost amortizes over all
decode steps), both static-shaped for XLA:

- `pool`: stride-k mean pooling over frames. Data-independent, zero
  gather traffic, the TPU-cheapest form (one reshape-mean).
- ToMe-style bipartite soft matching (`merge_r`): split frames into
  even/odd sets A/B, merge the r A-frames most similar to their best B
  partner into that partner (size-weighted mean), keep the rest.
  Content-adaptive: silence/steady segments collapse first. Based on
  the public Token Merging recipe (Bolya et al., ICLR 2023 — see
  PAPERS.md); implemented as pure gather/segment-sum so shapes stay
  static (merged output is (B, S - r, D) for a fixed r).

Cross-attention KV has no positional encoding — keys/values derive
from `enc_out` alone, and softmax attention is permutation-invariant
over the attended axis — so the merged sequence needs no particular
order and the bipartite output is simply concat(B-partners, unmerged
A-frames).

Relation to `models/whisper.py::encode(merge_at=)`: that knob pools
INSIDE the encoder (shrinking the remaining encoder layers' compute as
well, at a larger accuracy cost); these knobs act on the final encoder
output only, so encoder fidelity is untouched and the loss is confined
to the cross-attention summary the decoder reads. They compose.

Applied in `models/decode.py::greedy_decode/beam_decode` when
`DecodeConfig.cross_kv_pool > 1` or `.cross_kv_merge > 0`; downstream
(cross-KV precompute, fused Pallas decode kernels, XLA fallback) is
S-agnostic — the kernels pad S to the 128-lane width and mask
(`ops/cross_attention.py::pad_cross_len`/`s_valid`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pool_tokens(enc_out: jax.Array, stride: int) -> jax.Array:
    """Stride-`stride` mean pooling over the frame axis.

    (B, S, D) -> (B, ceil(S/stride), D); a ragged tail pools over the
    remaining frames. S=1500 with stride 2 -> 750 exactly.
    """
    if stride <= 1:
        return enc_out
    b, s, d = enc_out.shape
    s_full = (s // stride) * stride
    x = enc_out[:, :s_full].reshape(b, s_full // stride, stride, d).mean(2)
    if s != s_full:
        tail = enc_out[:, s_full:].mean(1, keepdims=True)
        x = jnp.concatenate([x, tail], axis=1)
    return x.astype(enc_out.dtype)


def tome_merge(enc_out: jax.Array, r: int) -> jax.Array:
    """ToMe-style bipartite merge of the `r` most similar frame pairs.

    (B, S, D) -> (B, S - r, D). Even frames form set A, odd frames set
    B; each A-frame's best-cosine B partner is found, the r highest-
    similarity A-frames are absorbed into their partners (size-weighted
    mean — a partner absorbing k frames averages all k+1), and the
    output is the B set followed by the surviving A-frames. Requires
    0 <= r <= S // 2 (at most every A-frame merges).
    """
    if r <= 0:
        return enc_out
    b, s, d = enc_out.shape
    na, nb = (s + 1) // 2, s // 2
    if r > s // 2:
        raise ValueError(f"merge_r={r} exceeds the bipartite half "
                         f"{s // 2} of S={s}")

    def one(x):  # (S, D) -> (S - r, D)
        a, bset = x[0::2], x[1::2]                     # (na, D), (nb, D)
        an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
        bn = bset / (jnp.linalg.norm(bset, axis=-1, keepdims=True) + 1e-6)
        sim = an @ bn.T                                # (na, nb)
        best = sim.max(axis=-1)
        partner = sim.argmax(axis=-1).astype(jnp.int32)
        order = jnp.argsort(-best)                     # merge-first ranking
        merged_idx = order[:r]                         # A rows to absorb
        kept_idx = order[r:]                           # A rows that survive
        # size-weighted absorb as a one-hot contraction (MXU-friendly;
        # an XLA scatter-add here compiled/ran pathologically on TPU):
        # sel (r, nb) routes each absorbed A row to its partner column
        sel = jax.nn.one_hot(partner[merged_idx], nb, dtype=jnp.float32)
        add = sel.T @ a[merged_idx].astype(jnp.float32)   # (nb, D)
        cnt = sel.sum(axis=0)                             # (nb,)
        merged_b = (bset.astype(jnp.float32) + add) / (1.0 + cnt)[:, None]
        return jnp.concatenate([merged_b.astype(x.dtype), a[kept_idx]], 0)

    return jax.vmap(one)(enc_out)


def merge_encoder_tokens(enc_out: jax.Array, pool: int = 1,
                         merge_r: int = 0) -> jax.Array:
    """Apply the configured token-merging strategy (merge_r wins)."""
    if merge_r > 0:
        return tome_merge(enc_out, merge_r)
    return pool_tokens(enc_out, pool)

"""Token merging for the UNet's self-attention (ToMe-SD, Bolya & Hoffman
2023, arXiv:2303.17604).

Self-attention over H*W spatial tokens is quadratic in token count — at
512x512 the level-0 transformers attend over 4096 tokens, at 768x768 over
9216 (the dominant cost there). Neighbouring latent tokens are highly
redundant; ToMe merges the `ratio` most-redundant tokens into their most
similar neighbours BEFORE attn1 and unmerges after, cutting the
quadratic term by (1-ratio)^2 with a bounded, well-studied quality cost.
Capability extension over the reference (fixed dense attention graph,
reference: context.cpp:214-218); the same knob A1111/ComfyUI ship.

TPU-first shape discipline: everything here is static — the dst/src
partition is a compile-time index table (one dst per sx x sy region), the
merge count r = min(int(N*ratio), N_src) is static, and the per-batch
"which tokens merge" selection is a fixed-size argsort prefix, so the
whole thing jits into one program with no dynamic shapes. Selection uses
cosine similarity of the block INPUT tokens (the metric in the paper);
aggregation is a scatter-mean in f32; unmerge is a gather. The dst choice
is the deterministic top-left of each region (the paper's `rand=False`
variant) so outputs are bit-reproducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def plan(hh: int, ww: int, sx: int = 2, sy: int = 2):
    """Static dst/src token partition for an hh x ww grid: dst = the
    top-left token of each sy x sx region, src = everything else.
    Returns (dst_idx [Nd], src_idx [Ns]) as numpy int32 (compile-time
    constants)."""
    ii, jj = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    is_dst = ((ii % sy) == 0) & ((jj % sx) == 0)
    flat = (ii * ww + jj).ravel()
    dst = flat[is_dst.ravel()].astype(np.int32)
    src = flat[~is_dst.ravel()].astype(np.int32)
    return dst, src


def build(metric, hh: int, ww: int, ratio: float, sx: int = 2, sy: int = 2):
    """Compute the merge for one transformer block.

    metric: [B, N, C] block-input tokens (N = hh*ww). Returns
    (merge, unmerge, n_merged) where merge maps [B, N, C] -> [B, N', C]
    and unmerge maps [B, N', C] -> [B, N, C], N' = N - r static.
    """
    b, n, c = metric.shape
    if n != hh * ww:
        raise ValueError(f"metric has {n} tokens, grid is {hh}x{ww}")
    dst_idx, src_idx = plan(hh, ww, sx, sy)
    nd, ns = dst_idx.size, src_idx.size
    r = min(int(n * ratio), ns)
    if r <= 0:
        return (lambda t: t), (lambda t: t), 0

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bsc,bdc->bsd", m[:, src_idx], m[:, dst_idx])
    node_max = scores.max(axis=-1)                      # [B, Ns]
    node_idx = scores.argmax(axis=-1).astype(jnp.int32)  # [B, Ns] dst bin
    order = jnp.argsort(-node_max, axis=-1)             # most similar first
    merged, kept = order[:, :r], order[:, r:]           # [B, r], [B, Ns-r]
    tgt = jnp.take_along_axis(node_idx, merged, axis=1)  # [B, r]

    src_const = jnp.asarray(src_idx)

    def merge(tokens):
        src = tokens[:, src_idx]
        dst = tokens[:, dst_idx].astype(jnp.float32)
        kept_rows = jnp.take_along_axis(src, kept[..., None], axis=1)
        mrows = jnp.take_along_axis(src, merged[..., None], axis=1)
        mrows = mrows.astype(jnp.float32)
        add = jax.vmap(
            lambda t, v: jnp.zeros((nd, tokens.shape[-1]), jnp.float32)
            .at[t].add(v))(tgt, mrows)
        cnt = jax.vmap(
            lambda t: jnp.zeros((nd,), jnp.float32).at[t].add(1.0))(tgt)
        dst = ((dst + add) / (1.0 + cnt)[..., None]).astype(tokens.dtype)
        return jnp.concatenate([kept_rows, dst], axis=1)  # [B, Ns-r+Nd, C]

    def unmerge(y):
        kept_y, dst_y = y[:, : ns - r], y[:, ns - r:]
        out = jnp.zeros((y.shape[0], n, y.shape[-1]), y.dtype)
        out = out.at[:, dst_idx].set(dst_y)
        kpos = src_const[kept]                          # [B, Ns-r]
        mpos = src_const[merged]                        # [B, r]
        mvals = jnp.take_along_axis(dst_y, tgt[..., None], axis=1)
        out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, kpos, kept_y)
        out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, mpos, mvals)
        return out

    return merge, unmerge, r

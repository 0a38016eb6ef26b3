"""Fused flash attention for the UNet's spatial self-attention (Pallas/TPU).

The reference's attention is opaque — baked into the converted QNN graph,
visible only as matmul/softmax layer names in its profiler output
(SURVEY.md §5.7; reference: analyze_results.py:69-79). Here it is a
first-class fused kernel: online-softmax tiling so the (seq, seq) scores
matrix never touches HBM. At SD v1.x 64x64 latents the self-attention is a
4096-token problem (9216 tokens at 768x768); unfused, the fp32 scores tensor
alone is 64 MB per (batch, head) of HBM write+read traffic per layer per
step — this kernel removes all of it.

Dispatch: `flash_attention` handles self-attention (seq_q == seq_kv,
divisible block tiling, no mask). Cross-attention (77 text tokens) stays on
the XLA path — its scores tile is small and pads poorly to the 128-lane
layout.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run kernels in the Pallas interpreter on CPU
INTERPRET = False

# padded-kv flash for cross-attention: correct but slower in-program on v5e
CROSS_FLASH = False

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, kv_blocks: int, kv_len: int = 0):
    """Grid: (batch*heads, q_blocks, kv_blocks). Online softmax over the kv
    axis; m/l/acc persist in VMEM scratch across kv steps. `kv_len` > 0
    masks key columns past it (cross-attention padded to the 128-lane tile)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # [block_q, d]
    k = k_ref[0]                       # [block_k, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                   # [block_q, block_k]
    s = s * scale
    if kv_len:
        block_k = k.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + kv_idx * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[...]                # [block_q, 1]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)            # [block_q, block_k]
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0]                       # [block_k, d]
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
    )
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        l = l_ref[...]
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)


def _pick_block(seq: int, preferred: int) -> int:
    """Largest divisor of `seq` that is <= preferred and a multiple of 128
    (or seq itself when seq < 128)."""
    if seq <= preferred:
        return seq
    b = preferred
    while b >= 128:
        if seq % b == 0:
            return b
        b -= 128
    return seq  # fall back: single block


@functools.partial(jax.jit,
                   static_argnames=("heads", "block_q", "block_k", "kv_pad"))
def _flash_mha(q, k, v, heads: int, block_q: int, block_k: int,
               kv_pad: int = 0):
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    scale = 1.0 / math.sqrt(d)

    # [B, S, H, D] -> [B*H, S, D]
    def split(x, s):
        return (
            x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, s, d)
        )

    qh, kh, vh = split(q, sq), split(k, sk), split(v, sk)
    if kv_pad:
        kh = jnp.pad(kh, ((0, 0), (0, kv_pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, kv_pad), (0, 0)))
    sk_p = sk + kv_pad
    kv_blocks = sk_p // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_blocks=kv_blocks,
                          kv_len=sk if kv_pad else 0),
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
        grid=(b * heads, sq // block_q, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda h, i, j: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # m
            pltpu.VMEM((block_q, 1), jnp.float32),   # l
            pltpu.VMEM((block_q, d), jnp.float32),   # acc
        ],
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh)

    return (
        out.reshape(b, heads, sq, d).transpose(0, 2, 1, 3).reshape(b, sq, c)
    )


def _chunked_attn_bwd(q, k, v, do, heads: int, chunk: int = 512):
    """Exact attention gradients without materializing the [S, S] scores:
    lax.scan over q chunks recomputes each chunk's softmax row block and
    accumulates dk/dv (Rabe & Staats, "Self-attention Does Not Need O(n^2)
    Memory" — the backward-pass analogue of the flash forward). Peak
    temporary is [B*H, chunk, S] instead of [B*H, S, S]. All math in f32;
    einsums land on the MXU."""
    b, s, c = q.shape
    d = c // heads
    scale = 1.0 / math.sqrt(d)

    def split(x):
        return (x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
                .reshape(b * heads, s, d).astype(jnp.float32))

    qh, kh, vh, doh = split(q), split(k), split(v), split(do)
    nc = s // chunk if (s % chunk == 0 and s > chunk) else 1
    cq = s // nc
    qc = qh.reshape(b * heads, nc, cq, d).transpose(1, 0, 2, 3)
    doc = doh.reshape(b * heads, nc, cq, d).transpose(1, 0, 2, 3)

    def body(carry, xs):
        dk, dv = carry
        qi, doi = xs                                   # [BH, cq, d]
        sblk = jnp.einsum("bqd,bkd->bqk", qi, kh) * scale
        p = jax.nn.softmax(sblk, axis=-1)              # [BH, cq, S]
        dv = dv + jnp.einsum("bqk,bqd->bkd", p, doi)
        dp = jnp.einsum("bqd,bkd->bqk", doi, vh)
        tmp = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - tmp)                            # [BH, cq, S]
        dqi = jnp.einsum("bqk,bkd->bqd", ds, kh) * scale
        dk = dk + jnp.einsum("bqk,bqd->bkd", ds, qi) * scale
        return (dk, dv), dqi

    (dk, dv), dq = jax.lax.scan(
        body, (jnp.zeros_like(kh), jnp.zeros_like(vh)), (qc, doc))
    dq = dq.transpose(1, 0, 2, 3).reshape(b * heads, s, d)

    def merge(x, ref):
        return (x.reshape(b, heads, s, d).transpose(0, 2, 1, 3)
                .reshape(b, s, c).astype(ref.dtype))

    return merge(dq, q), merge(dk, k), merge(dv, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_self(q, k, v, heads: int, block_q: int, block_k: int):
    """Differentiable wrapper over the Pallas self-attention forward: jax
    cannot autodiff through `pallas_call`, so training gets an exact
    chunked backward (`_chunked_attn_bwd`) via custom_vjp. Inference-only
    callers pay nothing (the vjp rules only engage under jax.grad)."""
    return _flash_mha(q, k, v, heads, block_q, block_k)


def _flash_self_fwd(q, k, v, heads, block_q, block_k):
    return _flash_mha(q, k, v, heads, block_q, block_k), (q, k, v)


def _flash_self_bwd(heads, block_q, block_k, res, do):
    q, k, v = res
    return _chunked_attn_bwd(q, k, v, do, heads)


_flash_self.defvjp(_flash_self_fwd, _flash_self_bwd)


def flash_attention(q, k, v, heads: int):
    """Drop-in for layers.sdpa(..., kernel='xla') on [B, T, C] tensors.

    Routes small/unaligned problems (cross-attention over 77 text tokens,
    tiny spatial grids) to the XLA path; fused Pallas kernel otherwise.
    Differentiable: the self-attention kernel carries a custom_vjp with an
    exact chunked backward, so `kernels='pallas'` works under jax.grad
    (sdtpu/train) as well as in inference.
    """
    from sdtpu.models.layers import sdpa

    sq, sk = q.shape[1], k.shape[1]
    if sq < 512 or sq % 128 != 0:
        return sdpa(q, k, v, heads, kernel="xla")
    # 1024x1024 swept best on v5e at SD head dims (scores tile 4 MB fp32):
    # 1.7x over 512x512; 2048-wide tiles exceed the VMEM budget
    block_q = _pick_block(sq, 1024)
    if sq == sk:                       # spatial self-attention
        return _flash_self(q, k, v, heads, block_q, _pick_block(sk, 1024))
    if CROSS_FLASH and sk <= 1024:     # cross-attention: pad kv to one tile
        sk_p = -(-sk // 128) * 128
        return _flash_mha(q, k, v, heads, block_q, sk_p, kv_pad=sk_p - sk)
    # 77-token cross-attention stays on XLA: measured 6% slower end-to-end
    # through the padded flash path on v5e (0.595 vs 0.561 s/image) — the
    # small scores tensor fuses well in XLA and the pallas barrier costs more
    return sdpa(q, k, v, heads, kernel="xla")

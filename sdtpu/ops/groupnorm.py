"""Fused GroupNorm(+SiLU) Pallas kernel.

The TPU-native rebuild of the reference's custom GroupNorm op (reference:
sdod/efficient_gn.py + csrc/sdod_ops/config/group_norm.xml — their NPU
converter needed a custom op because GroupNorm wasn't native; our XLA
fallback is already correct, this kernel removes the extra HBM passes:
one read of x, one write of silu(gn(x))).

Layout strategy: x stays channels-last [HW, C] (the conv layout — no
transposes). Group statistics never reshape the big tensor; instead:

    per-channel sums  = sum over rows, accumulated chunk-wise in fp32
    per-group sums    = channel-sums @ onehot[C, G]       (tiny MXU matmul)
    per-channel mu/inv= group stats @ onehot.T            (broadcast back)

so the only full-size operations are elementwise (VPU) and the HW-chunked
row reductions. Affine scale/bias are folded into a single multiply-add, and
SiLU is applied before the single store.

Used for the UNet's GroupNorms (HW <= 4096 fits VMEM); the VAE decoder's
huge spatial planes (up to 512x512x512) fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# set True (tests) to run kernels in the Pallas interpreter on CPU
INTERPRET = False

def _gn_kernel(x_ref, onehot_ref, scale_ref, bias_ref, o_ref, *,
               groups: int, eps: float, fuse_silu: bool, chunk: int):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    n_chunks = hw // chunk
    cg = c // groups

    # pass 1: per-channel sum / sumsq in fp32, chunked over rows
    csum = jnp.zeros((1, c), jnp.float32)
    csumsq = jnp.zeros((1, c), jnp.float32)
    for i in range(n_chunks):
        xc = x_ref[0, i * chunk:(i + 1) * chunk, :].astype(jnp.float32)
        csum = csum + jnp.sum(xc, axis=0, keepdims=True)
        csumsq = csumsq + jnp.sum(xc * xc, axis=0, keepdims=True)

    onehot = onehot_ref[...]                       # [C, G] fp32
    n = jnp.float32(hw * cg)
    gsum = jnp.dot(csum, onehot, preferred_element_type=jnp.float32)     # [1, G]
    gsumsq = jnp.dot(csumsq, onehot, preferred_element_type=jnp.float32)
    gmu = gsum / n
    gvar = gsumsq / n - gmu * gmu
    ginv = jax.lax.rsqrt(gvar + eps)

    # broadcast back to channels and fold the affine transform:
    # y = (x - mu) * inv * scale + bias = x * (inv*scale) + (bias - mu*inv*scale)
    mu_c = jnp.dot(gmu, onehot.T, preferred_element_type=jnp.float32)    # [1, C]
    inv_c = jnp.dot(ginv, onehot.T, preferred_element_type=jnp.float32)
    a = inv_c * scale_ref[...]                     # [1, C]
    b = bias_ref[...] - mu_c * a

    # pass 2: normalize (+ SiLU) chunk-wise, single store
    for i in range(n_chunks):
        xc = x_ref[0, i * chunk:(i + 1) * chunk, :].astype(jnp.float32)
        y = xc * a + b
        if fuse_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, i * chunk:(i + 1) * chunk, :] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "fuse_silu", "orig_shape")
)
def _gn_call(x, onehot, scale, bias, groups, eps, fuse_silu, orig_shape):
    b, hw, c = x.shape
    chunk = hw if hw <= 1024 else max(
        s for s in (1024, 512, 256, 128) if hw % s == 0
    )
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, groups=groups, eps=eps, fuse_silu=fuse_silu,
            chunk=chunk,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, onehot, scale, bias)
    return out.reshape(orig_shape)


@functools.lru_cache(maxsize=32)
def _group_onehot(c: int, groups: int):
    # numpy on purpose: a jnp constant created during a jit trace would be a
    # tracer, and lru_cache would leak it into later traces
    oh = np.zeros((c, groups), np.float32)
    oh[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    return oh


def fused_group_norm(p, x, groups: int, eps: float = 1e-5,
                     fuse_silu: bool = False):
    """Pallas GroupNorm(+SiLU) over channels-last x [..., C].

    Falls back to the XLA path when the per-sample plane exceeds the VMEM
    budget or shapes don't tile.
    """
    from sdtpu.models.layers import group_norm, silu

    c = x.shape[-1]
    n = x.shape[0]
    hw = int(np.prod(x.shape[1:-1]))
    # VMEM budget: in + out in x.dtype + fp32 chunk transients; stay < ~8MB
    bytes_plane = hw * c * x.dtype.itemsize
    if bytes_plane > 4 * 1024 * 1024 or c % groups or hw % 128:
        y = group_norm(p, x, groups, eps)
        return silu(y) if fuse_silu else y
    x3 = x.reshape(n, hw, c)
    scale = p["scale"].astype(jnp.float32).reshape(1, c)
    bias = p["bias"].astype(jnp.float32).reshape(1, c)
    return _gn_call(
        x3, _group_onehot(c, groups), scale, bias, groups, float(eps),
        bool(fuse_silu), x.shape,
    )

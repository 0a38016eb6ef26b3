"""Weight-only int8 GEMM (Pallas/TPU): bf16 MXU compute, int8 weight stream.

The UNet re-reads ~1.7 GB of weights from HBM every eval — the measured
dominant traffic (docs/PERF_NOTES.md) — and roughly half of it is dense
matmul weights (attention q/k/v/out, GEGLU ff1/ff2, 1x1 projections). This
kernel streams those weights as int8 (per-output-channel scales) and
dequantizes INSIDE VMEM, so HBM sees half the bytes while the MXU still
runs its native bf16 path. This is the TPU-paying form of the reference's
deployed int8 (reference: todlc.py:104-110): W8A8 compute measured a wash
and XLA's int8 convs measured 2x slower (PERF_NOTES "Dead ends"); the win
on this hardware is in the *bytes*, not the ALU.

Plain tiled GEMM, grid (M/TM, N/TN, K/TK) with a float32 VMEM accumulator;
no halos or odd shapes anywhere, so it composes with any activation layout
(dense sites flatten [..., K] -> [M, K]; 1x1 convs flatten NHWC -> [NHW, C]).
Used automatically by models.layers.dense / conv2d when a site carries
weight-only-int8 leaves (``w8``/``w8_scale``) and shapes tile cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run in the Pallas interpreter on CPU
INTERPRET = False
# escape hatch: route w8 dense sites through the XLA dequant fallback
DISABLE = False
# Opt-in for routing calibrated int8 dense sites through matmul_w8a8.
# Default OFF — measured keep/reject (round 3): the kernel wins its sites
# in isolation (PERF_NOTES "W8A8 Pallas GEMM", up to 1.90x) but LOSES
# ~78 ms/image e2e; per-op attribution (tools/attr_w8a8.py) shows the
# sink is not the kernel's compute but +21 ms of shaping (slice-starts)
# and +15 ms of copies per step that XLA's layout/alternate-memory
# scheduler inserts around the opaque custom-calls. The XLA int8 dot
# keeps full fusion and measured slightly FASTER than bf16.
KERNEL_W8A8 = False


def _tile(v: int, prefs: tuple[int, ...]) -> int:
    for t in prefs:
        if v % t == 0:
            return t
    return v


def _tiles(m: int, k: int, n: int):
    tm = _tile(m, (512, 256, 128))
    tk = k if k <= 1536 else _tile(k, (1280, 1024, 768, 640, 512, 384, 256,
                                       128))
    tn = _tile(n, (256, 128))
    return tm, tk, tn


def eligible(m: int, k: int, n: int) -> bool:
    """Tiles must be lane/sublane legal: TN a multiple of 128 (or full-N with
    N itself small enough to be one lane-padded tile), TM a multiple of 8."""
    if jax.default_backend() != "tpu" and not INTERPRET:
        return False
    tm, tk, tn = _tiles(m, k, n)
    # TM must be a sublane (8) multiple unconditionally: a full-M tile with
    # m % 8 != 0 (e.g. the [B*77, ctx] cross-attention k/v flatten) is the
    # same non-tile-aligned shape the conv module documents as a Mosaic
    # compiler crash on this toolchain.
    if m < 8 or tm % 8:
        return False
    if tn % 128 and tn != n:
        return False
    if tk % 8 and tk != k:
        return False
    # weight block double-buffers; keep it comfortably under VMEM
    if 2 * tk * tn * 2 + tm * tk * 2 + tm * tn * 6 > 10 * 1024 * 1024:
        return False
    return True


def _mm_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
               n_k: int, x_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...].astype(x_dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _store():
        y = acc_ref[...] * s_ref[0, 0].astype(jnp.float32)
        y = y + b_ref[0, 0].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm(x, w8, scale, bias, *, interpret):
    m, k = x.shape
    n = w8.shape[1]
    tm, tk, tn = _tiles(m, k, n)
    n_k = k // tk
    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k, x_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k_: (i, k_)),
            pl.BlockSpec((tk, tn), lambda i, j, k_: (k_, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, k_: (j, 0, 0)),
            pl.BlockSpec((1, 1, tn), lambda i, j, k_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k_: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, w8,
      scale.reshape(n // tn, 1, tn), bias.reshape(n // tn, 1, tn))
    return out


def matmul_int8w(x, w8, scale, bias=None, interpret=None):
    """y = x @ dequant(w8) * 1 + bias over the trailing axis of x.

    x: [..., K] activation dtype; w8: int8 [K, N]; scale: f32 [N] per-output
    -channel; bias: f32 [N] or None."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w8.shape[1]
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    y = _mm(
        x.reshape(-1, k), w8, scale.astype(jnp.float32),
        bias.astype(jnp.float32),
        interpret=INTERPRET if interpret is None else interpret,
    )
    return y.reshape(*lead, n)


# ---------------------------------------------------------------------------
# W8A8: int8 x int8 -> int32 on the MXU's native int8 path (2x bf16 peak)
# ---------------------------------------------------------------------------

def _mm_w8a8_kernel(xs_ref, x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                    n_k: int):
    """Quantize the activation tile IN VMEM with the static per-tensor scale
    (one VPU pass over a tile that is already resident), then feed the MXU's
    int8 path with an int32 accumulator. This removes both costs that made
    XLA-level W8A8 a wash (PERF_NOTES "Dead ends"): the quantized activation
    never round-trips through HBM, and there is no per-call dynamic
    range-reduction — the scale is a calibration constant (one scalar for
    the whole call, quant/ptq.calibrate), not a per-row reduction."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    inv = 1.0 / xs_ref[0]
    xq = jnp.clip(
        jnp.round(x_ref[...].astype(jnp.float32) * inv),
        -127, 127).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot(
        xq, w_ref[...], preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _store():
        y = acc_ref[...].astype(jnp.float32)
        y = y * (xs_ref[0] * s_ref[0, 0].astype(jnp.float32))
        y = y + b_ref[0, 0].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _mm_w8a8(x, w8, w_scale, bias, x_scale, *, out_dtype, interpret):
    m, k = x.shape
    n = w8.shape[1]
    tm, tk, tn = _tiles(m, k, n)
    n_k = k // tk
    return pl.pallas_call(
        functools.partial(_mm_w8a8_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # x_scale [1]
            pl.BlockSpec((tm, tk), lambda i, j, k_: (i, k_)),
            pl.BlockSpec((tk, tn), lambda i, j, k_: (k_, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, k_: (j, 0, 0)),
            pl.BlockSpec((1, 1, tn), lambda i, j, k_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k_: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x_scale.reshape(1).astype(jnp.float32), x, w8,
      w_scale.reshape(n // tn, 1, tn), bias.reshape(n // tn, 1, tn))


def matmul_w8a8(x, w8, w_scale, x_scale, bias=None, interpret=None):
    """Static-scale W8A8 GEMM: ``y = (q(x) @ w8) * x_scale * w_scale + b``.

    x: [..., K] activations; w8: int8 [K, N] (per-output-channel
    ``w_scale`` f32 [N]); ``x_scale``: per-tensor activation scale (f32
    scalar from quant/ptq.calibrate); bias: f32 [N] or None. Output in
    x.dtype. The quantized activations exist only in VMEM; the MXU runs
    int8 x int8 -> int32 (2x bf16 peak on v5e)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w8.shape[1]
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    y = _mm_w8a8(
        x.reshape(-1, k), w8, w_scale.astype(jnp.float32),
        bias.astype(jnp.float32), jnp.asarray(x_scale, jnp.float32),
        out_dtype=x.dtype,
        interpret=INTERPRET if interpret is None else interpret,
    )
    return y.reshape(*lead, n)

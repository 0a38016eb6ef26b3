"""Round-2 measurement session (run on the real TPU chip, one process).

Questions, in expected-value order (docs/ROADMAP.md, VERDICT r1):
1. What is inside the ~53 ms VAE decode? (per-op xprof)
2. Does XLA fuse int8->bf16 weight dequant into convs/matmuls, or
   materialize? (weight-only int8 feasibility without a custom kernel)
3. How far below the MXU roofline are the SD conv shapes, and is the gap
   conv-specific (vs an equivalent-FLOPs matmul)?

Timing discipline (docs/PERF_NOTES.md): distinct inputs per iteration via a
chained lax.scan inside ONE jitted program; fetch the result; weights cycled
through an 8-deep stack so they cannot be parked in VMEM across iterations.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 32  # scan iterations per timed program


def timed(fn, *args, reps=3):
    """Compile, then best-of-reps wall time of one fetched execution."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best


def conv_chain(w_stack, scale_stack=None):
    """x -> conv3x3(x, w[i%8]) chained K times (square conv: chainable)."""

    def run(x):
        def body(x, i):
            w = w_stack[i % w_stack.shape[0]]
            if scale_stack is not None:
                w = w.astype(jnp.bfloat16) * scale_stack[i % w_stack.shape[0]]
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return (y * 1e-2).astype(jnp.bfloat16), None

        x, _ = jax.lax.scan(body, x, jnp.arange(K))
        return x

    return jax.jit(run)


def matmul_chain(w_stack, scale_stack=None):
    def run(x):
        def body(x, i):
            w = w_stack[i % w_stack.shape[0]]
            if scale_stack is not None:
                w = w.astype(jnp.bfloat16) * scale_stack[i % w_stack.shape[0]]
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (y[:, : x.shape[1]] * 1e-2).astype(jnp.bfloat16), None

        x, _ = jax.lax.scan(body, x, jnp.arange(K))
        return x

    return jax.jit(run)


def bench_conv(tag, b, s, c, n_w=8):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, s, c), jnp.bfloat16)
    wf = jax.random.normal(key, (n_w, 3, 3, c, c), jnp.float32) * 0.02
    w_bf = wf.astype(jnp.bfloat16)
    w_i8 = jnp.clip(jnp.round(wf / 0.001), -127, 127).astype(jnp.int8)
    sc = jnp.full((n_w, 1, 1, 1, c), 1e-3, jnp.bfloat16)

    t_bf = timed(conv_chain(w_bf), x) / K
    t_i8 = timed(conv_chain(w_i8, sc), x) / K
    flops = 2 * b * s * s * 9 * c * c
    wbytes = 9 * c * c * 2
    print(f"conv {tag:24s} bf16 {t_bf*1e6:8.1f}us ({flops/t_bf/1e12:5.1f} "
          f"TF/s, w={wbytes/1e6:5.1f}MB) | int8-w {t_i8*1e6:8.1f}us "
          f"({t_bf/t_i8:4.2f}x)")


def bench_matmul(tag, m, kdim, n, n_w=8):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (m, kdim), jnp.bfloat16)
    wf = jax.random.normal(key, (n_w, kdim, n), jnp.float32) * 0.02
    w_bf = wf.astype(jnp.bfloat16)
    w_i8 = jnp.clip(jnp.round(wf / 0.001), -127, 127).astype(jnp.int8)
    sc = jnp.full((n_w, 1, n), 1e-3, jnp.bfloat16)

    t_bf = timed(matmul_chain(w_bf), x) / K
    t_i8 = timed(matmul_chain(w_i8, sc), x) / K
    flops = 2 * m * kdim * n
    wbytes = kdim * n * 2
    print(f"mm   {tag:24s} bf16 {t_bf*1e6:8.1f}us ({flops/t_bf/1e12:5.1f} "
          f"TF/s, w={wbytes/1e6:5.1f}MB) | int8-w {t_i8*1e6:8.1f}us "
          f"({t_bf/t_i8:4.2f}x)")


def vae_profile():
    from sdtpu.bench.xprof import profile_ops, summarize
    from sdtpu.config import SD15
    from sdtpu.engine.pipeline import decode_latents
    from sdtpu.models import vae

    params = {"vae": jax.jit(lambda k: vae.init(k, SD15.vae))(
        jax.random.PRNGKey(0))}
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a,
                          params)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4), jnp.float32)
    fn = jax.jit(lambda p, z: decode_latents(p, z, SD15, "pallas"))
    t = timed(fn, params, z)
    print(f"\nVAE decode (SD15, bf16, pallas): {t*1e3:.1f} ms end-to-end")
    ops = profile_ops(fn, (params, z))
    print(summarize(ops, top=14))


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    print("\n--- conv shapes (SD15 UNet, batch-2 CFG eval) ---")
    bench_conv("64x64x320 (L0)", 2, 64, 320)
    bench_conv("32x32x640 (L1)", 2, 32, 640)
    bench_conv("16x16x1280 (L2)", 2, 16, 1280)
    bench_conv("8x8x1280 (L3/mid)", 2, 8, 1280)
    print("\n--- equal-FLOPs matmul (conv-specific gap probe) ---")
    # im2col-equivalent of the 16x16x1280 conv: [2*256, 9*1280] @ [9*1280, 1280]
    bench_matmul("im2col(16x16x1280)", 512, 11520, 1280)
    bench_matmul("geglu L2 512x1280x10240", 512, 1280, 10240)
    bench_matmul("geglu L0 8192x320x2560", 8192, 320, 2560)
    vae_profile()


if __name__ == "__main__":
    main()

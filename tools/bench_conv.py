"""Per-shape micro-benchmark: XLA conv chain vs Pallas fused conv chain.

Measures each UNet ResBlock conv shape as a CHAIN of dependent
GN+SiLU+conv(+bias) applications inside ONE jitted program — standalone
kernel timings over the axon tunnel are meaningless (~1.5 ms dispatch,
result memoization; docs/PERF_NOTES.md "Measurement discipline").

Usage: python tools/bench_conv.py [--iters 8] [--reps 3] [--int8]
Prints one line per shape: xla_ms, pallas_ms (per conv), speedup.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.layers import conv2d, group_norm, silu
from sdtpu.ops import conv as C

# (N, H, W, Cin, Cout) — the SD15 UNet resblock conv shapes (CFG batch 2)
SHAPES = [
    (2, 64, 64, 320, 320),    # level 0 res convs
    (2, 64, 64, 640, 320),    # level 0 up-path conv1 (skip concat)
    (2, 32, 32, 640, 640),    # level 1
    (2, 32, 32, 960, 640),    # level 1 up conv1
    (2, 16, 16, 1280, 1280),  # level 2
    (2, 16, 16, 2560, 1280),  # level 2 up conv1
    (2, 8, 8, 1280, 1280),    # level 3 / mid
    (2, 8, 8, 2560, 1280),    # level 3 up conv1
]
G = 32


def chain_xla(x, w, b, gp, iters):
    def body(i, h):
        hn = silu(group_norm(gp, h, G))
        y = jax.lax.conv_general_dilated(
            hn.astype(h.dtype), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = (y + b).astype(h.dtype)
        # keep channel count stable for chaining
        return y[..., :x.shape[-1]] if y.shape[-1] != x.shape[-1] else y

    # only a scalar leaves the device: fetching the full plane over the
    # tunnel (~5 MB) would dominate the chain (PERF_NOTES "Measurement
    # discipline")
    return jnp.sum(jax.lax.fori_loop(0, iters, body, x)
                   .astype(jnp.float32))


def chain_pallas(x, w, b, gp, iters, w_scale=None):
    def body(i, h):
        a, d = C.gn_affine(gp, h, G)
        y = C.fused_conv(h, w, b, a=a, d=d, silu=True, w_scale=w_scale)
        return y[..., :x.shape[-1]] if y.shape[-1] != x.shape[-1] else y

    return jnp.sum(jax.lax.fori_loop(0, iters, body, x)
                   .astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--int8", action="store_true")
    # kernel v2 lever A/B (VERDICT r2 #1): both default ON in the module
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the double-buffered stage DMA")
    ap.add_argument("--no-merge", action="store_true",
                    help="disable merged tap contractions at deep levels")
    args = ap.parse_args()
    if args.no_overlap:
        C.STAGE_OVERLAP = False
    if args.no_merge:
        C.MERGE_TAPS = False

    key = jax.random.PRNGKey(0)
    print(f"# backend={jax.default_backend()} iters={args.iters} "
          f"int8={args.int8} overlap={C.STAGE_OVERLAP} "
          f"merge={C.MERGE_TAPS}")
    for (n, h, wdim, cin, cout) in SHAPES:
        if cin != cout and cout != cin:  # chain needs cin==body-out slice
            pass
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (n, h, wdim, cin), jnp.bfloat16)
        w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.02
        gp = {"scale": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
        b = jnp.zeros((cout,), jnp.float32)
        if cout < cin:
            # chain by slicing output back to cin channels: replicate
            # weight columns so out >= cin (ceil — 960->640 needs 2x),
            # then truncate to exactly cin for a shape-stable carry
            rep = -(-cin // cout)
            w = jnp.concatenate([w] * rep, axis=-1)[..., :cin]
            b = jnp.concatenate([b] * rep)[:cin]
            cout = cin
        wq = sq = None
        if args.int8:
            sq = jnp.abs(w).max(axis=(0, 1, 2)) / 127.0
            wq = jnp.clip(jnp.round(w / sq), -127, 127).astype(jnp.int8)
        wbf = w.astype(jnp.bfloat16)
        if not C.eligible(x, wbf, 1, 1):
            print(f"{n}x{h}x{wdim}x{cin}->{cout}: NOT ELIGIBLE")
            continue

        fx = jax.jit(lambda x: chain_xla(x, wbf, b, gp, args.iters))
        if args.int8:
            fp = jax.jit(lambda x: chain_pallas(x, wq, b, gp, args.iters,
                                                w_scale=sq))
        else:
            fp = jax.jit(lambda x: chain_pallas(x, wbf, b, gp, args.iters))

        def run(f, tag):
            outs = []
            xs = [(x + i * 1e-3).astype(x.dtype)
                  for i in range(args.reps + 1)]
            np.asarray(f(xs[0]))          # warm (compile)
            ts = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(f(xs[i + 1]))  # unique input + forced fetch
                ts.append(time.perf_counter() - t0)
            return min(ts)

        txla = run(fx, "xla")
        tpal = run(fp, "pallas")
        per_x = txla / args.iters * 1e3
        per_p = tpal / args.iters * 1e3
        print(f"{n}x{h}x{wdim}x{cin}->{cout}: xla {per_x:7.3f} ms  "
              f"pallas {per_p:7.3f} ms  speedup {per_x / per_p:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

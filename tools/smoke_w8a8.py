"""On-chip validation + chained timing for the W8A8 Pallas GEMM.

Runs the SD15 UNet transformer dense shapes (the quantize='int8' targets)
through `sdtpu.ops.matmul.matmul_w8a8` on the real chip: Mosaic
compile-accept, numerics vs the XLA int8 reference formula, and a chained
relative timing against the bf16 GEMM the site would otherwise run
(comparisons INSIDE one jitted scan — standalone dispatches over the
tunnel are noise, docs/PERF_NOTES.md "Measurement discipline").

Usage: python tools/smoke_w8a8.py    (needs the real TPU chip)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import matmul as mm

# (m, k, n): batch-2 CFG; self-attn q/k/v/out at each level width; GEGLU
# ff1 (c -> 8c, split in 2) and ff2 (4c -> c)
SHAPES = [
    ("L0 qkv 8192x320x320", 8192, 320, 320),
    ("L0 ff1 8192x320x2560", 8192, 320, 2560),
    ("L0 ff2 8192x1280x320", 8192, 1280, 320),
    ("L1 qkv 2048x640x640", 2048, 640, 640),
    ("L1 ff1 2048x640x5120", 2048, 640, 5120),
    ("L1 ff2 2048x2560x640", 2048, 2560, 640),
    ("L2 qkv 512x1280x1280", 512, 1280, 1280),
    ("L2 ff1 512x1280x10240", 512, 1280, 10240),
    ("L2 ff2 512x5120x1280", 512, 5120, 1280),
]

# chain lengths sized so the HI chain's device time (>= 100 ms on the
# slowest shapes) dwarfs the ~29 ms dispatch jitter the slope must cancel
REPS_LO = 1000
REPS_HI = 3000


def _chain(fn, shape1, reps):
    @jax.jit
    def chain(x):
        def body(c, _):
            y = fn(c)
            # feed a scalar digest of the FULL output back into the carry:
            # every output column is live (a shape-restoring slice would let
            # XLA narrow the bf16 dot to the used columns while the opaque
            # pallas_call computes everything — a leg-asymmetric DCE bias),
            # and the data dependence defeats memoization. The reduction
            # cost is identical in both legs, so per-leg times are
            # "GEMM + shared digest" and the LEG DELTA is the GEMM delta.
            c2 = c + jnp.mean(y.astype(jnp.float32)).astype(c.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(c.astype(jnp.float32))
    return chain


def chain_time(fn, x0):
    """Per-application time of fn from the SLOPE between a 1000-rep and a
    3000-rep jitted chain (only a scalar leaves the device). The slope
    cancels the fixed ~29 ms dispatch+fetch tunnel overhead that a single
    chain's mean would fold in (docs/PERF_NOTES.md "Measurement
    discipline")."""
    meds = []
    for reps in (REPS_LO, REPS_HI):
        chain = _chain(fn, x0.shape[1], reps)
        chain(x0).block_until_ready()  # compile
        ts = []
        for i in range(7):
            xi = x0 + jnp.float32(i).astype(x0.dtype)
            t0 = time.perf_counter()
            np.asarray(chain(xi))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[len(ts) // 2])
    return (meds[1] - meds[0]) / (REPS_HI - REPS_LO)


def main() -> int:
    ok = True
    rows = []
    for name, m, k, n in SHAPES:
        if not mm.eligible(m, k, n):
            print(f"{name}: SKIP (ineligible)", flush=True)
            continue
        key = jax.random.PRNGKey(hash(name) % 2**31)
        ks = jax.random.split(key, 3)
        x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
        w = jax.random.normal(ks[1], (k, n), jnp.float32) * 0.02
        absmax = jnp.abs(w).max(axis=0)
        w_scale = absmax / 127.0
        w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
        b = jax.random.normal(ks[2], (n,), jnp.float32)
        xs = jnp.float32(float(jnp.abs(x).max()) / 127.0)
        try:
            t0 = time.time()
            y = mm.matmul_w8a8(x, w_q, w_scale, xs, b)
            np.asarray(y)
            # XLA int8 reference (the _dense_int8 static formula)
            inv = 1.0 / xs
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                          -127, 127).astype(jnp.int8)
            ref = (jax.lax.dot(xq, w_q, preferred_element_type=jnp.int32)
                   .astype(jnp.float32) * xs * w_scale + b)
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / max(float(jnp.max(jnp.abs(ref))), 1e-6)
            # chained timing: w8a8 kernel vs bf16 GEMM
            wb = w.astype(jnp.bfloat16)
            t_w8 = chain_time(
                lambda c: mm.matmul_w8a8(c, w_q, w_scale, xs, b), x)
            t_bf = chain_time(
                lambda c: (jnp.dot(c, wb, preferred_element_type=jnp.float32)
                           + b).astype(c.dtype), x)
            rows.append((name, t_bf * 1e3, t_w8 * 1e3, t_bf / t_w8))
            print(f"{name}: OK {time.time()-t0:.0f}s relerr={rel:.3g} "
                  f"bf16={t_bf*1e3:.3f}ms w8a8={t_w8*1e3:.3f}ms "
                  f"delta={(t_bf-t_w8)*1e6:+.1f}us "
                  f"speedup={t_bf/t_w8:.2f}x", flush=True)
            if rel > 0.05:
                ok = False
                print(f"  !! numerics off ({rel:.3g})", flush=True)
        except Exception as e:  # noqa: BLE001 — report, continue matrix
            ok = False
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)
    if rows:
        gm = float(np.exp(np.mean([np.log(r[3]) for r in rows])))
        print(f"# geomean speedup vs bf16: {gm:.2f}x over {len(rows)} shapes")
        # projected e2e saving per image: SD15 has 5 transformer blocks per
        # attention level (down 2 + up 3); per block 6 qkv-class sites
        # (self q/k/v/out + cross q/out — cross k/v flatten to m=154,
        # ineligible), 1 ff1, 1 ff2; 20 denoise steps per image.
        mult = {"qkv": 6, "ff1": 1, "ff2": 1}
        per_step = sum((r[1] - r[2]) * mult[r[0].split()[1]] * 5
                       for r in rows)
        print(f"# projected e2e delta if all sites routed w8a8: "
              f"{20 * per_step:+.1f} ms/image (positive = w8a8 wins)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

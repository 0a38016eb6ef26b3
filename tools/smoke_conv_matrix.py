"""On-chip validation matrix for the fused Pallas conv (sdtpu.ops.conv).

Runs every distinct SD15 UNet ResBlock conv shape (CFG batch 2) through
`fused_conv` with the GN+SiLU prologue — bf16 and weight-only int8 — and
compares against the XLA GN+SiLU+conv reference. This is the on-hardware
counterpart of tests/test_ops.py's interpreter-mode parity tests: the
Mosaic compiler accepts/rejects tile plans the interpreter cannot see
(see `_plan`'s VMEM model, bisected with this script), so run it after
any change to the kernel or its planner.

Usage: python tools/smoke_conv_matrix.py   (needs the real TPU chip)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.layers import group_norm, silu
from sdtpu.ops import conv as C


def case(name, n, h, w_, cin, cout, int8=False):
    t0 = time.time()
    if C._plan(h, w_, cin, cout, 3, 2, n) is None:
        print(f"{name}: SKIP (ineligible -> XLA fallback)", flush=True)
        return True
    try:
        key = jax.random.PRNGKey(hash(name) % 2**31)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (n, h, w_, cin), jnp.bfloat16)
        wf = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.02
        gp = {"scale": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
        a, d = C.gn_affine(gp, x, 32)
        sq = None
        if int8:
            sq = jnp.abs(wf).max(axis=(0, 1, 2)) / 127.0
            wq = jnp.clip(jnp.round(wf / sq), -127, 127).astype(jnp.int8)
            wname = wq
            wref = (wq.astype(jnp.float32) * sq).astype(jnp.bfloat16)
        else:
            wname = wf.astype(jnp.bfloat16)
            wref = wname
        y = C.fused_conv(x, wname, jnp.zeros((cout,)), a=a, d=d, silu=True,
                         w_scale=sq)
        np.asarray(y)
        ref = jax.jit(lambda x: jax.lax.conv_general_dilated(
            silu(group_norm(gp, x, 32)).astype(jnp.bfloat16), wref,
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))(x)
        err = np.abs(np.asarray(y, np.float32)
                     - np.asarray(ref, np.float32)).max()
        print(f"{name}: OK {time.time()-t0:.0f}s err={err:.4g} "
              f"plan={C._plan(h, w_, cin, cout, 3, 2, n)}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue the matrix
        print(f"{name}: FAIL plan={C._plan(h, w_, cin, cout, 3, 2, n)} "
              f"{str(e)[:150]}", flush=True)
        return False


def main():
    ok = True
    # every distinct SD15 UNet resblock conv shape (CFG batch 2)
    ok &= case("L0 320->320", 2, 64, 64, 320, 320)
    ok &= case("L0up 640->320", 2, 64, 64, 640, 320)
    ok &= case("L1 640->640", 2, 32, 32, 640, 640)
    ok &= case("L1up 960->640", 2, 32, 32, 960, 640)
    ok &= case("L2 1280", 2, 16, 16, 1280, 1280)
    ok &= case("L2up 2560->1280", 2, 16, 16, 2560, 1280)
    ok &= case("L2up 1920->1280", 2, 16, 16, 1920, 1280)
    ok &= case("L3 1280", 2, 8, 8, 1280, 1280)
    ok &= case("L0 int8", 2, 64, 64, 320, 320, int8=True)
    ok &= case("L0up int8", 2, 64, 64, 640, 320, int8=True)
    # VAE decoder/encoder 64x64 planes (batch 1; the 512-ch plane was the
    # scoped-vmem breaker the slab-normalize rewrite fixed)
    ok &= case("VAE 512->512 b1", 1, 64, 64, 512, 512)
    ok &= case("VAE 512->512 b2", 2, 64, 64, 512, 512)
    # SD21-base / 768px level-0 planes (96x96)
    ok &= case("768-L0 320->320", 2, 96, 96, 320, 320)
    ok &= case("768-L0up 640->320", 2, 96, 96, 640, 320)
    # big serving batch (CFG batch 16) exercises the A fallback at L1/L2
    ok &= case("L1 b16", 16, 32, 32, 640, 640)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Per-op attribution of the W8A8-kernel e2e loss (run on the real chip).

`tools/measure_r3.py` measured: int8 with the Pallas W8A8 router loses
~78 ms/image e2e vs bf16 even though every routed site WINS its chained
microbench (PERF_NOTES "W8A8 Pallas GEMM"). This tool names the cycle
sink: profile ONE CFG UNet step per-op (sdtpu.bench.xprof) under

  bf16        — control
  int8_xla    — static-scale int8, XLA dot everywhere (router off)
  int8_routed — static-scale int8, winners routed to the Pallas kernel

so the delta between the two int8 variants isolates what the opaque
pallas_call boundary costs (layout copies, lost epilogue fusion) beyond
the kernel's own time.

Synthetic x_scale values are injected instead of running the 90 s
calibration — timing is scale-value-agnostic (identical graph).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from sdtpu.bench.xprof import profile_ops, summarize
from sdtpu.config import SD15
from sdtpu.models import temb as temb_mod
from sdtpu.models import unet as unet_mod
from sdtpu.quant import ptq


def _inject_x_scale(tree):
    """Give every quantized dense site a static activation scale, marking
    it calibrated (the condition models/layers._dense_int8 routes on)."""
    if isinstance(tree, dict):
        if "w_q" in tree and "w_scale" in tree:
            tree = dict(tree)
            tree["x_scale"] = jnp.float32(0.05)
            return tree
        return {k: _inject_x_scale(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_inject_x_scale(v) for v in tree]
    return tree


def main() -> int:
    cfg = SD15
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    uparams = unet_mod.init(keys[0], cfg.unet)
    tparams = temb_mod.init(keys[1], cfg.unet)
    dt = cfg.compute_dtype
    uparams = jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, uparams)

    b = 2  # CFG pair
    x = jax.random.normal(keys[2], (b, 64, 64, 4), dt)
    t_emb = temb_mod.apply(tparams, jnp.full((b,), 500.0), cfg.unet,
                           dtype=dt)
    ctxt = jax.random.normal(keys[3], (b, 77, cfg.unet.context_dim), dt)

    q = ptq.quantize_unet({"unet": uparams})["unet"]
    qs = _inject_x_scale(q)

    import sdtpu.models.layers as L

    import sdtpu.ops.matmul as mm

    orig_ok = L._w8a8_kernel_ok
    for name, p, route in [("bf16", uparams, True),
                           ("int8_xla", qs, False),
                           ("int8_routed", qs, True)]:
        # KERNEL_W8A8 defaults False (the verdict this tool produced);
        # force it on for the routed variant so the A/B stays runnable
        mm.KERNEL_W8A8 = route
        L._w8a8_kernel_ok = orig_ok if route else (lambda *a, **k: False)

        # a FRESH function object per variant: jax's pjit trace cache is
        # keyed on the callable, so reusing one `step` across variants
        # with identical arg trees would replay the first int8 trace and
        # silently ignore the router monkeypatch (observed on-chip:
        # identical program fingerprints for both int8 variants)
        def step(pp, _name=name):
            return unet_mod.apply(pp, x, t_emb, ctxt, cfg.unet,
                                  kernels="pallas")

        ops = profile_ops(jax.jit(step), (p,))
        tot = sum(v["total_us"] for v in ops.values())
        print(f"\n===== {name}: device total {tot / 1e3:.3f} ms =====",
              flush=True)
        print(summarize(ops, top=12), flush=True)
    L._w8a8_kernel_ok = orig_ok
    mm.KERNEL_W8A8 = False
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

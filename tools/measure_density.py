"""Measure what weight-only int8 buys in HBM residency (VERDICT r2 task 9).

`quantize=int8w` halves the UNet's weight bytes; its serving-density claim
("0.86 GB saved => more co-resident models/batch") was asserted from
arithmetic in round 2. This tool turns it into data on the real chip:

  1. device memory before/after materializing one SD15 pipeline, bf16 vs
     int8w (the per-model HBM footprint, measured not computed);
  2. how many ADDITIONAL full pipelines fit beside the first before the
     allocator refuses (multi-model serving density — e.g. N style
     checkpoints hot-resident behind one endpoint), measured by repeated
     device_put until RESOURCE_EXHAUSTED.

No compiles involved (pure allocation), so the whole measurement is
minutes, not hours. Prints one JSON line per mode; paste into
docs/BENCH_RESULTS.md.

    python tools/measure_density.py [--config sd15] [--max-models 24]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def device_bytes(dev) -> int | None:
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return int(stats.get("bytes_in_use", 0))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd15",
                    choices=["sd15", "sd21", "sd21base", "tiny"])
    ap.add_argument("--max-models", type=int, default=24,
                    help="stop probing after this many co-resident models")
    ap.add_argument("--dense", action="store_true",
                    help="use int8w_dense (convs + matmuls) for the int8 leg")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from sdtpu.config import SD15, SD21, SD21_BASE, TINY
    from sdtpu.io.params import cast_params, init_pipeline_params
    from sdtpu.quant.ptq import quantize_weights_only

    cfg = {"sd15": SD15, "sd21": SD21, "sd21base": SD21_BASE,
           "tiny": TINY}[args.config]
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    # build ONE host copy of the params (numpy) on the CPU backend, reused
    # for every device_put (avoids initializing 1.7 GB on-chip and fetching
    # it back over the tunnel)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host = jax.tree.map(
            np.asarray,
            jax.jit(lambda k: init_pipeline_params(k, cfg))(
                jax.random.PRNGKey(0)))

    modes = ["none", "int8w_dense" if args.dense else "int8w"]
    results = {}
    for mode in modes:
        params = host
        if mode.startswith("int8w"):
            params = dict(host)
            params["unet"] = jax.tree.map(
                np.asarray,
                quantize_weights_only(
                    host["unet"], include_dense=mode == "int8w_dense"))
        params = cast_params(params, cfg.compute_dtype)

        before = device_bytes(dev)
        resident = [jax.device_put(params, dev)]
        jax.block_until_ready(resident[0])
        after_one = device_bytes(dev)

        while len(resident) < args.max_models:
            try:
                p = jax.device_put(params, dev)
                jax.block_until_ready(p)
                resident.append(p)
            except Exception as e:  # noqa: BLE001 — allocator refusal
                msg = str(e)
                if "RESOURCE_EXHAUSTED" not in msg and "memory" not in msg.lower():
                    raise
                break
        count = len(resident)
        peak = device_bytes(dev)
        del resident
        # drop references and force a sync so the allocator reclaims
        jax.clear_caches()

        row = {
            "metric": f"resident_models_{args.config}_{mode}",
            "value": count,
            "unit": "models",
            "model_bytes": (None if before is None or after_one is None
                            else after_one - before),
            "peak_bytes_in_use": peak,
        }
        results[mode] = row
        print(json.dumps(row))

    if all(m in results for m in modes) and len(modes) == 2:
        a, b = results[modes[0]], results[modes[1]]
        if a["model_bytes"] and b["model_bytes"]:
            print(f"# int8w model footprint {b['model_bytes']/2**30:.2f} GiB"
                  f" vs bf16 {a['model_bytes']/2**30:.2f} GiB "
                  f"({a['model_bytes']/b['model_bytes']:.2f}x density)",
                  file=sys.stderr)
        print(f"# co-resident models: bf16 {a['value']} vs int8w "
              f"{b['value']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

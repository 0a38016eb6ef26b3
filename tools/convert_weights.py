"""Offline checkpoint converter: SD v1.x checkpoint -> sdtpu model dir.

The analogue of the reference's conversion pipeline (reference: todlc.py —
ONNX -> quantized QNN context binaries; idempotent re-runs skip existing
targets unless --force, todlc.py:85-101). Here:

    input:  LDM single-file checkpoint (*.safetensors, or *.ckpt via torch)
    output: <out_dir>/model.sdtpu.safetensors  (flattened pytree, target
            dtype, mmap-fast startup load)
            [+ ctokenizer.txt copied alongside if --tokenizer given]

Usage:
    python tools/convert_weights.py v1-5-pruned-emaonly.safetensors out_dir \
        [--dtype bfloat16] [--tokenizer ctokenizer.txt] [--int8]
        [--int8w conv|dense] [--force]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_state_dict(path: Path) -> dict:
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        out = {}
        with safe_open(str(path), framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    if path.suffix in (".ckpt", ".pt", ".pth"):
        import torch

        sd = torch.load(str(path), map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: v.float().numpy() for k, v in sd.items()
                if hasattr(v, "numpy")}
    raise ValueError(f"unsupported checkpoint format: {path.suffix}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--config", default="sd15",
                    choices=["sd15", "sd21", "sd21base", "tiny"])
    ap.add_argument("--tokenizer", type=Path, default=None,
                    help="ctokenizer.txt to copy into the model dir")
    ap.add_argument("--int8", action="store_true",
                    help="also apply int8 PTQ to the transformer matmuls")
    ap.add_argument("--int8w", choices=("conv", "dense"), default=None,
                    help="bake weight-only int8 into the UNet (conv: conv "
                         "sites; dense: convs+matmuls) — the deployed "
                         "format that halves per-step HBM weight traffic "
                         "(reference: todlc.py two-phase int8 export)")
    ap.add_argument("--format", default="safetensors",
                    choices=["safetensors", "orbax"],
                    help="orbax = sharded checkpoint dir (direct-to-mesh load)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sdtpu.config import SD15, SD21, SD21_BASE, TINY
    from sdtpu.io.params import cast_params
    from sdtpu.io.weights import NATIVE_SUFFIX, load_ldm_state_dict, save_native

    cfg = {"sd15": SD15, "sd21": SD21, "sd21base": SD21_BASE,
           "tiny": TINY}[args.config]
    out = args.out_dir / ("ckpt" if args.format == "orbax"
                          else f"model{NATIVE_SUFFIX}")
    args.out_dir.mkdir(parents=True, exist_ok=True)
    if out.exists() and not args.force:
        print(f"{out} exists (use --force to overwrite)")
        return 0

    print(f"loading {args.checkpoint} ...")
    sd = load_state_dict(args.checkpoint)
    print(f"  {len(sd)} tensors; mapping to sdtpu pytree ...")
    params = load_ldm_state_dict(sd, cfg)
    params = cast_params(params, args.dtype)
    if args.int8:
        from sdtpu.quant.ptq import count_quantized, quantize_unet

        params = quantize_unet(params)
        print(f"  int8 PTQ: {count_quantized(params)} sites")
    if args.int8w:
        from sdtpu.quant.ptq import quantize_weights_only

        params = dict(params)
        params["unet"] = quantize_weights_only(
            params["unet"], include_dense=args.int8w == "dense")
        print(f"  weight-only int8 baked ({args.int8w})")
    if args.format == "orbax":
        from sdtpu.io.orbax_ckpt import save_checkpoint

        save_checkpoint(params, out)
    else:
        save_native(params, out)
    print(f"wrote {out}")
    if args.tokenizer:
        shutil.copy(args.tokenizer, args.out_dir / "ctokenizer.txt")
        print(f"copied tokenizer -> {args.out_dir / 'ctokenizer.txt'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-command real-checkpoint validation packet (VERDICT r2 task 8).

The reference validated end-to-end on real converted models (reference:
test/simple_app.cpp:6-38, README.md:126-132); this environment ships no
checkpoints, so this command packages the whole validation flow — ready to
run the day weights exist, and e2e-tested today against the synthetic LDM
fixture (tests/test_tools.py):

    python tools/validate_real.py v1-5-pruned-emaonly.safetensors \
        [--config sd15] [--work-dir ./validate_out] \
        [--ref-image diffusers_astronaut_seed0.png] \
        [--clip-vit clip-vit-large-patch14.safetensors] \
        [--min-psnr 25] [--min-clip 22]

Pipeline: convert (tools/convert_weights) -> load Context -> fixed-seed
astronaut image (written as PNG + raw .bin) -> determinism check (second
run must be bit-identical) -> PSNR vs a reference image if given (e.g. the
same prompt/seed from diffusers' torch pipeline) -> CLIP score if a CLIP
ViT image tower is given -> one-line JSON verdict with pass/fail per gate.

Exit code 0 = every RUN gate passed (gates without inputs report
"skipped"); 1 = some gate failed; 2 = usage error.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

PROMPT = "a photograph of an astronaut riding a horse"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", type=Path,
                    help="LDM checkpoint (.safetensors/.ckpt) or an "
                         "already-converted sdtpu model dir")
    ap.add_argument("--config", default="sd15",
                    choices=["sd15", "sd21", "sd21base", "tiny"])
    ap.add_argument("--work-dir", type=Path, default=Path("validate_out"))
    ap.add_argument("--prompt", default=PROMPT)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--tokenizer", type=Path, default=None,
                    help="ctokenizer.txt (needed for real text conditioning; "
                         "falls back to the demo tokenizer)")
    ap.add_argument("--ref-image", type=Path, default=None,
                    help="reference PNG from a trusted pipeline (e.g. "
                         "diffusers torch, same prompt/seed protocol) for "
                         "the PSNR gate")
    ap.add_argument("--clip-vit", type=Path, default=None,
                    help="openai/clip-vit-large-patch14 state dict "
                         "(.safetensors) for the CLIP-score gate")
    ap.add_argument("--min-psnr", type=float, default=25.0,
                    help="PSNR gate threshold vs --ref-image (dB)")
    ap.add_argument("--min-clip", type=float, default=22.0,
                    help="CLIP-score gate threshold (CLIPScore units)")
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    ap.add_argument("--json-out", type=Path, default=None,
                    help="also write the verdict JSON here")
    args = ap.parse_args(argv)

    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    verdict: dict = {"checkpoint": str(args.checkpoint),
                     "config": args.config, "prompt": args.prompt,
                     "seed": args.seed, "steps": args.steps,
                     "gates": {}}
    args.work_dir.mkdir(parents=True, exist_ok=True)

    # ---- 1. convert (skipped if already a model dir) ----------------------
    if args.checkpoint.is_dir():
        model_dir = args.checkpoint
        verdict["converted"] = "already a model dir"
    else:
        import convert_weights

        model_dir = args.work_dir / "model"
        conv_args = [str(args.checkpoint), str(model_dir),
                     "--config", args.config, "--dtype", "bfloat16"]
        if args.tokenizer:
            conv_args += ["--tokenizer", str(args.tokenizer)]
        rc = convert_weights.main(conv_args)
        if rc != 0:
            print(json.dumps({"error": f"conversion failed rc={rc}"}))
            return 2
        verdict["converted"] = str(model_dir)

    # ---- 2. fixed-seed generation + determinism gate ----------------------
    import sdtpu
    from sdtpu.engine.logging import LogLevel
    from sdtpu.quant.validate import image_metrics

    ctx = sdtpu.Context(model_dir=str(model_dir), config=args.config,
                        steps=args.steps, log_level=LogLevel.INFO)
    img = ctx.generate(args.prompt, guidance=args.guidance, seed=args.seed)
    img2 = ctx.generate(args.prompt, guidance=args.guidance, seed=args.seed)
    deterministic = bool(np.array_equal(img, img2))
    verdict["gates"]["deterministic"] = {
        "pass": deterministic,
        "detail": "same seed twice -> bit-identical images"}

    out_png = args.work_dir / f"astronaut_seed{args.seed}.png"
    img.tofile(args.work_dir / f"astronaut_seed{args.seed}.bin")
    try:
        from PIL import Image

        Image.fromarray(img).save(out_png)
        verdict["image"] = str(out_png)
    except Exception:  # noqa: BLE001 — raw .bin already written
        verdict["image"] = str(out_png.with_suffix(".bin"))

    # ---- 3. PSNR vs trusted reference -------------------------------------
    if args.ref_image is not None:
        from PIL import Image

        ref = np.asarray(Image.open(args.ref_image).convert("RGB"))
        if ref.shape != img.shape:
            verdict["gates"]["psnr"] = {
                "pass": False,
                "detail": f"shape mismatch {ref.shape} vs {img.shape}"}
        else:
            m = image_metrics(img, ref)
            m["pass"] = m["psnr_db"] >= args.min_psnr
            m["threshold_db"] = args.min_psnr
            verdict["gates"]["psnr"] = m
    else:
        verdict["gates"]["psnr"] = {"pass": None, "detail": "skipped "
                                    "(no --ref-image)"}

    # ---- 4. CLIP score -----------------------------------------------------
    if args.clip_vit is not None:
        from safetensors import safe_open

        from sdtpu.models.clip import VIT_L14
        from sdtpu.quant.clip_score import clip_scores, vision_params_from_hf

        with safe_open(str(args.clip_vit), framework="np") as f:
            hf = {k: f.get_tensor(k) for k in f.keys()}
        vcfg = VIT_L14
        vparams, text_proj = vision_params_from_hf(hf, vcfg)
        score = float(clip_scores(
            img[None], [args.prompt], ctx.tokenizer,
            ctx.params["clip"], text_proj, vparams,
            ctx.cfg.clip, vcfg)[0])
        verdict["gates"]["clip_score"] = {
            "value": score, "threshold": args.min_clip,
            "pass": score >= args.min_clip}
    else:
        verdict["gates"]["clip_score"] = {"pass": None, "detail": "skipped "
                                          "(no --clip-vit)"}

    ran = [g for g in verdict["gates"].values() if g["pass"] is not None]
    verdict["pass"] = all(g["pass"] for g in ran)
    verdict["gates_run"] = len(ran)
    line = json.dumps(verdict)
    print(line)
    if args.json_out:
        args.json_out.write_text(line + "\n")
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())

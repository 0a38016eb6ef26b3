"""One-command real-checkpoint validation packet (VERDICT r2 task 8).

The reference validated end-to-end on real converted models (reference:
test/simple_app.cpp:6-38, README.md:126-132); this environment ships no
checkpoints, so this command packages the whole validation flow — ready to
run the day weights exist, and e2e-tested today against the synthetic LDM
fixture (tests/test_tools.py):

    python tools/validate_real.py v1-5-pruned-emaonly.safetensors \
        [--family txt2img] [--config sd15] [--work-dir ./validate_out] \
        [--ref-image diffusers_astronaut_seed0.png] \
        [--clip-vit clip-vit-large-patch14.safetensors] \
        [--min-psnr 25] [--min-clip 22]

Pipeline: convert (tools/convert_weights) -> load Context -> fixed-seed
image through the FAMILY's serving path (written as PNG + raw .bin) ->
determinism check (second run must be bit-identical) -> PSNR vs a
reference image if given (e.g. the same prompt/seed from diffusers' torch
pipeline) -> CLIP score if a CLIP ViT image tower is given -> one-line
JSON verdict with pass/fail per gate.

``--family`` selects the serving path so every shipped family validates
through this same packet on day one (VERDICT r4 #7):

    txt2img      Context.generate (default; any txt2img config)
    lcm          guidance-embedded few-step serving (default sd15_lcm,
                 lcm sampler, 4 steps, w=8)
    sdxl_2stage  base generate(denoising_end=0.8, output="latent") ->
                 refiner refine(denoising_start=0.8); needs --refiner
    controlnet   generate(control=..., control_image=...); --controlnet
                 weights ("random" demo default), --control-image or a
                 synthetic gradient hint
    x4           Context.upscale on a low-res input (--input-image or a
                 synthetic fixture at the latent grid size)

LDM-checkpoint CONVERSION is wired for the sd15/sd21 families; for other
configs pass an already-converted sdtpu model dir (or omit weights with
``--demo`` for a random-init path check). Exit code 0 = every RUN gate
passed (gates without inputs report "skipped"); 1 = some gate failed;
2 = usage error.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

PROMPT = "a photograph of an astronaut riding a horse"


#: per-family defaults applied when the flag was not given explicitly
FAMILY_DEFAULTS = {
    "txt2img": {"config": "sd15", "steps": 20, "guidance": 7.5,
                "sampler": "dpm"},
    "lcm": {"config": "sd15_lcm", "steps": 4, "guidance": 8.0,
            "sampler": "lcm"},
    "sdxl_2stage": {"config": "sdxl", "steps": 20, "guidance": 7.5,
                    "sampler": "dpm"},
    "controlnet": {"config": "sd15", "steps": 20, "guidance": 7.5,
                   "sampler": "dpm"},
    "x4": {"config": "sd_x4", "steps": 20, "guidance": 9.0,
           "sampler": "dpm"},
}

#: configs tools/convert_weights.py can convert from an LDM checkpoint;
#: everything else must arrive as an already-converted model dir
CONVERTIBLE = ("sd15", "sd21", "sd21base", "tiny")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", type=Path,
                    help="LDM checkpoint (.safetensors/.ckpt), an "
                         "already-converted sdtpu model dir, or the string "
                         "'demo' (random-init weights — path check only)")
    ap.add_argument("--family", default="txt2img",
                    choices=sorted(FAMILY_DEFAULTS))
    ap.add_argument("--config", default=None,
                    help="model config (default: the family's)")
    ap.add_argument("--sampler", default=None)
    ap.add_argument("--work-dir", type=Path, default=Path("validate_out"))
    ap.add_argument("--prompt", default=PROMPT)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=None)
    ap.add_argument("--refiner", type=Path, default=None,
                    help="sdxl_2stage: refiner model dir (or 'demo')")
    ap.add_argument("--refiner-config", default="sdxl_refiner",
                    help="sdxl_2stage: refiner config (tiny_xl_ref for the "
                         "synthetic-fixture e2e test)")
    ap.add_argument("--denoising-frac", type=float, default=0.8,
                    help="sdxl_2stage: base/refiner handoff point")
    ap.add_argument("--controlnet", default="random",
                    help="controlnet: weights path or 'random' demo nets")
    ap.add_argument("--control-image", type=Path, default=None,
                    help="controlnet: hint PNG (default: synthetic "
                         "gradient)")
    ap.add_argument("--input-image", type=Path, default=None,
                    help="x4: low-res input PNG at the latent grid size "
                         "(default: synthetic fixture)")
    ap.add_argument("--noise-level", type=int, default=None,
                    help="x4: conditioning noise augmentation level "
                         "(default min(20, config max - 1))")
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

    fam = FAMILY_DEFAULTS[args.family]
    config = args.config or fam["config"]
    steps = args.steps if args.steps is not None else fam["steps"]
    guidance = (args.guidance if args.guidance is not None
                else fam["guidance"])
    sampler = args.sampler or fam["sampler"]

    verdict: dict = {"checkpoint": str(args.checkpoint),
                     "family": args.family, "config": config,
                     "sampler": sampler, "prompt": args.prompt,
                     "seed": args.seed, "steps": steps, "gates": {}}
    args.work_dir.mkdir(parents=True, exist_ok=True)

    # ---- 1. convert (skipped if already a model dir / demo) ---------------
    if str(args.checkpoint) == "demo":
        model_dir = None
        verdict["converted"] = "demo (random-init weights — path check only)"
    elif args.checkpoint.is_dir():
        model_dir = args.checkpoint
        verdict["converted"] = "already a model dir"
    elif config not in CONVERTIBLE:
        print(json.dumps({"error": f"LDM conversion is wired for "
                          f"{CONVERTIBLE}; for config {config!r} pass an "
                          f"already-converted model dir (tools/"
                          f"convert_weights.py output) or 'demo'"}))
        return 2
    else:
        import convert_weights

        model_dir = args.work_dir / "model"
        conv_args = [str(args.checkpoint), str(model_dir),
                     "--config", config, "--dtype", "bfloat16"]
        if args.tokenizer:
            conv_args += ["--tokenizer", str(args.tokenizer)]
        rc = convert_weights.main(conv_args)
        if rc != 0:
            print(json.dumps({"error": f"conversion failed rc={rc}"}))
            return 2
        verdict["converted"] = str(model_dir)

    # ---- 2. fixed-seed generation through the family's serving path -------
    import sdtpu
    from sdtpu.engine.logging import LogLevel
    from sdtpu.quant.validate import image_metrics

    ctx = sdtpu.Context(
        model_dir=str(model_dir) if model_dir else None, config=config,
        steps=steps, sampler=sampler, log_level=LogLevel.INFO)

    if args.family == "sdxl_2stage":
        rdir = (None if args.refiner in (None, Path("demo"))
                else str(args.refiner))
        refiner = sdtpu.Context(model_dir=rdir, config=args.refiner_config,
                                steps=steps, sampler=sampler,
                                log_level=LogLevel.INFO)
        if rdir is None:
            verdict["refiner"] = "demo (random-init)"

        def run():
            lat = ctx.generate(args.prompt, guidance=guidance,
                               seed=args.seed,
                               denoising_end=args.denoising_frac,
                               output="latent")
            return refiner.refine(lat, args.prompt, guidance=guidance,
                                  seed=args.seed,
                                  denoising_start=args.denoising_frac)
    elif args.family == "controlnet":
        ctx.load_controlnet("cn0", args.controlnet)
        size = ctx.cfg.image_size
        if args.control_image is not None:
            from PIL import Image

            hint = np.asarray(
                Image.open(args.control_image).convert("RGB")
                .resize((size, size)))
        else:  # synthetic gradient hint — deterministic, structure-bearing
            g = np.linspace(0, 255, size, dtype=np.float32)
            hint = np.stack(np.broadcast_arrays(
                g[None, :], g[:, None], g[None, ::-1]),
                axis=-1).astype(np.uint8)
        verdict["control_image"] = (str(args.control_image)
                                    if args.control_image else "synthetic")

        def run():
            return ctx.generate(args.prompt, guidance=guidance,
                                seed=args.seed, control="cn0",
                                control_image=hint)
    elif args.family == "x4":
        low_size = ctx.cfg.latent_size
        if args.input_image is not None:
            from PIL import Image

            low = np.asarray(Image.open(args.input_image).convert("RGB")
                             .resize((low_size, low_size)))
        else:
            g = np.linspace(0, 255, low_size, dtype=np.float32)
            low = np.stack(np.broadcast_arrays(
                g[None, :], g[:, None], g[None, ::-1]),
                axis=-1).astype(np.uint8)
        verdict["input_image"] = (str(args.input_image)
                                  if args.input_image else "synthetic")
        noise_level = (args.noise_level if args.noise_level is not None
                       else min(20, ctx.cfg.max_noise_level - 1))

        def run():
            return ctx.upscale(args.prompt, low, noise_level=noise_level,
                               guidance=guidance, seed=args.seed)
    else:  # txt2img and lcm share Context.generate

        def run():
            return ctx.generate(args.prompt, guidance=guidance,
                                seed=args.seed)

    img = run()
    img2 = run()
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

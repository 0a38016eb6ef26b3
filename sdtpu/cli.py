"""Command-line interface.

The analogue of the reference's test apps + viewer: ``generate`` mirrors
test/simple_app.cpp:6-38 (setup -> generate -> write output) and ``show``
mirrors show_output.py:1-10 (render a raw output.bin). Default prompt/CFG
match the reference's (simple_app.cpp:23; api/libsdod.h:88).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

DEFAULT_PROMPT = "a photograph of an astronaut riding a horse"

# literal copy of sorted(sdtpu.samplers.SAMPLERS): argparse must not force
# the jax import at --help time (tests pin the two lists equal)
SAMPLER_CHOICES = ["ddim", "dpm", "dpm++", "dpm2", "dpm2_karras",
                   "dpm_karras", "dpm_sde", "dpm_sde_karras", "euler",
                   "euler_a", "euler_a_karras", "euler_karras", "heun",
                   "heun_karras", "lcm", "lms", "lms_karras", "plms",
                   "plms_exact", "unipc", "unipc_karras"]


def _select_platform(name: str) -> None:
    if name == "auto":
        return
    import jax

    jax.config.update("jax_platforms", name)


def _cmd_generate(args) -> int:
    _select_platform(args.platform)
    import sdtpu
    from sdtpu.engine.logging import LogLevel

    interval = None
    if args.cfg_interval:
        lo, _, hi = args.cfg_interval.partition(",")
        interval = (float(lo), float(hi))
    ctx = sdtpu.Context(
        model_dir=args.model_dir,
        steps=args.steps,
        sampler=args.sampler,
        config=args.config,
        log_level=LogLevel(args.log_level),
        kernels=args.kernels,
        quantize=args.quantize,
        seed=args.seed,
        size=args.size,
        lora=args.lora,
        cfg_interval=interval,
        clip_skip=args.clip_skip,
        guidance_rescale=args.guidance_rescale,
        freeu=(tuple(float(v) for v in args.freeu.split(","))
               if args.freeu else None),
        tome_ratio=args.tome_ratio,
        deepcache=args.deepcache,
    )
    if args.controlnet:
        # --controlnet [name=]path (or "random" for demo weights)
        for spec in args.controlnet:
            name, _, src = spec.rpartition("=")
            ctx.load_controlnet(name or "default", src or spec)
    if args.embedding:
        for spec in args.embedding:
            word, sep, src = spec.partition("=")
            if not sep:
                print(f"error: --embedding expects WORD=PATH, got {spec!r}",
                      file=sys.stderr)
                return 2
            ctx.load_embedding(word, src)
    t0 = time.perf_counter()
    if args.init_image:
        from PIL import Image

        init = np.asarray(Image.open(args.init_image).convert("RGB"))
        if args.mask_image:
            mask = np.asarray(Image.open(args.mask_image).convert("L"))
            img = ctx.inpaint(args.prompt, init, mask,
                              strength=args.strength or 1.0,
                              guidance=args.guidance, seed=args.seed,
                              negative_prompt=args.negative_prompt)
        elif ctx.cfg.unet.num_class_embeds and \
                ctx.cfg.unet.in_channels == ctx.cfg.latent_channels + 3:
            # 7-ch x4-upscaler config: --init-image is the LOW-RES input
            img = ctx.upscale(
                args.prompt, init, noise_level=args.noise_level,
                guidance=args.guidance, seed=args.seed,
                negative_prompt=args.negative_prompt)
        elif ctx.cfg.unet.in_channels == 2 * ctx.cfg.latent_channels:
            # 8-ch InstructPix2Pix config: the prompt is an edit instruction
            img = ctx.instruct_pix2pix(
                args.prompt, init, guidance=args.guidance,
                image_guidance=args.image_guidance, seed=args.seed,
                negative_prompt=args.negative_prompt)
        elif args.depth_image:
            # any monotone depth map: 8/16-bit grayscale png (e.g. a MiDaS
            # dump); normalization happens per sample inside the program
            depth = np.asarray(Image.open(args.depth_image)).astype(np.float32)
            if depth.ndim == 3:
                depth = depth.mean(axis=-1)
            img = ctx.depth2img(args.prompt, init, depth,
                                strength=args.strength or 0.8,
                                guidance=args.guidance, seed=args.seed,
                                negative_prompt=args.negative_prompt)
        else:
            img = ctx.img2img(args.prompt, init,
                              strength=args.strength or 0.6,
                              guidance=args.guidance, seed=args.seed,
                              negative_prompt=args.negative_prompt)
    elif args.control_image:
        from PIL import Image

        hint = np.asarray(Image.open(args.control_image).convert("RGB"))
        img = ctx.generate(args.prompt, guidance=args.guidance, seed=args.seed,
                           negative_prompt=args.negative_prompt,
                           control_image=hint,
                           control=args.control or None,
                           control_scale=args.control_scale)
    elif args.hires_scale:
        img = ctx.hires_fix(args.prompt, scale=args.hires_scale,
                            strength=args.hires_strength,
                            guidance=args.guidance, seed=args.seed,
                            negative_prompt=args.negative_prompt)
    else:
        img = ctx.generate(args.prompt, guidance=args.guidance, seed=args.seed,
                           negative_prompt=args.negative_prompt,
                           pag_scale=args.pag_scale)
    dt = time.perf_counter() - t0
    print(f"generated {img.shape[0]}x{img.shape[1]} image in {dt:.3f}s "
          f"(steps={args.steps}, sampler={args.sampler}, seed={args.seed})")
    if args.out.endswith(".bin"):
        img.tofile(args.out)  # raw uint8, reference output.bin format
    else:
        from PIL import Image

        Image.fromarray(img).save(args.out)
    print(f"wrote {args.out}")
    return 0


def _cmd_show(args) -> int:
    data = np.fromfile(args.path, np.uint8)
    side = int(round((data.size / 3) ** 0.5))
    img = data.reshape(side, side, 3)
    from PIL import Image

    out = args.path.rsplit(".", 1)[0] + ".png"
    Image.fromarray(img).save(out)
    print(f"wrote {out} ({side}x{side})")
    return 0


def _cmd_bench(args) -> int:
    _select_platform(args.platform)
    from sdtpu.bench.analyze import analyze
    from sdtpu.bench.runner import benchmark_parts
    from sdtpu.config import CONFIGS

    cfg = CONFIGS[args.config]
    parts = args.parts.split(",") if args.parts else None
    summary = benchmark_parts(
        cfg, warmup=args.warmup, iters=args.iters, parts=parts,
        out_dir=args.results, kernels=args.kernels,
    )
    ok = [n for n, r in summary.items() if not r.get("error")]
    bad = [n for n, r in summary.items() if r.get("error")]
    print(f"benchmarked: {ok}" + (f", FAILED: {bad}" if bad else ""))
    if args.phases:
        from sdtpu.bench.profile import phase_timings

        pt = phase_timings(cfg, steps=args.steps, kernels=args.kernels)
        for k, v in pt.items():
            print(f"  {k:22s} {v:10.3f} ms")
    print(analyze(args.results))
    return 1 if bad else 0


def _cmd_profile(args) -> int:
    _select_platform(args.platform)
    import jax

    from sdtpu.bench.runner import _part_specs
    from sdtpu.bench.xprof import profile_ops, summarize
    from sdtpu.config import CONFIGS
    from sdtpu.io.params import cast_params, init_pipeline_params

    cfg = CONFIGS[args.config]
    kernels = args.kernels
    if kernels == "auto":
        kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
    params = jax.jit(lambda k: init_pipeline_params(k, cfg))(
        jax.random.PRNGKey(0))
    params = cast_params(params, cfg.compute_dtype)
    specs = _part_specs(cfg, params, kernels)
    fn, fargs = specs[args.part]
    ops = profile_ops(jax.jit(fn), fargs, out_dir=args.trace_dir)
    print(f"== {args.part} ({jax.default_backend()}, kernels={kernels})")
    print(summarize(ops, top=args.top))
    return 0


def _cmd_sweep(args) -> int:
    _select_platform(args.platform)
    from sdtpu.bench.sweep import run_sweep

    run_sweep(
        config=args.config,
        iters=args.iters,
        out_dir=args.out,
        dump_images=args.images,
        quick=args.quick,
        sizes=tuple(int(s) for s in args.sizes.split(",")),
        steps_list=tuple(int(s) for s in args.steps_list.split(",")),
    )
    return 0


def _cmd_analyze(args) -> int:
    from sdtpu.bench.analyze import analyze

    print(analyze(args.results))
    return 0


def _cmd_serve(args) -> int:
    _select_platform(args.platform)
    import sdtpu
    from sdtpu.engine.logging import LogLevel
    from sdtpu.engine.server import serve

    mesh = tuple(int(x) for x in args.mesh.split(",")) if args.mesh else None
    lora = None
    if args.lora:
        lora = {}
        for spec in args.lora:
            if "=" not in spec:
                print(f"error: --lora expects name=path, got {spec!r}",
                      file=sys.stderr)
                return 2
            name, path = spec.split("=", 1)
            lora[name] = path
    interval = None
    if args.cfg_interval:
        lo, _, hi = args.cfg_interval.partition(",")
        interval = (float(lo), float(hi))
    ctx = sdtpu.Context(
        model_dir=args.model_dir, steps=args.steps, sampler=args.sampler,
        config=args.config, log_level=LogLevel(args.log_level),
        kernels=args.kernels, mesh=mesh, lora=lora,
        cfg_interval=interval, deepcache=args.deepcache,
        tome_ratio=args.tome_ratio,
    )
    stream_steps = (tuple(int(s) for s in args.stream_steps.split(","))
                    if args.stream_steps else ())
    serve(ctx, host=args.host, port=args.port,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
          stream_slots=args.stream_slots, max_queue=args.max_queue,
          stream_steps=stream_steps)
    return 0


def _cmd_warmup(args) -> int:
    """Prebuild the persistent XLA compile cache and optionally pack it as
    a deployable artifact (VERDICT r3 #8) — the true analogue of the
    reference's serialized HTP context blobs (qnn_context.cpp:894-956):
    compile once at build time, ship the executables, warm-start in
    seconds. The artifact is valid for the same jax/backend version pair
    it was built with (the cache key includes the compiler fingerprint);
    the emitted JSON records both."""
    import gc
    import json
    import tarfile
    from pathlib import Path

    cache_dir = Path(args.cache_dir).expanduser()
    if args.unpack:
        cache_dir.mkdir(parents=True, exist_ok=True)
        root = cache_dir.resolve()
        with tarfile.open(args.unpack, "r:gz") as tf:
            for m in tf.getmembers():
                # --pack writes flat arcnames, so a legitimate member must
                # resolve to a DIRECT child of the cache dir; a str-prefix
                # check would admit '../xla2/f' next to '.../xla'
                p = (cache_dir / m.name).resolve()
                if not m.isfile() or p.parent != root:
                    raise SystemExit(f"unsafe archive member {m.name!r}")
            tf.extractall(cache_dir, filter="data")
        n = sum(1 for _ in cache_dir.iterdir())
        print(json.dumps({"unpacked_to": str(cache_dir), "entries": n}))
        return 0

    _select_platform(args.platform)
    import jax

    import sdtpu
    from sdtpu.engine.logging import LogLevel

    cache_dir.mkdir(parents=True, exist_ok=True)
    # force-point the persistent cache at the artifact dir (Context only
    # sets it when unset, and warmup's whole job is building THIS dir)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # cache EVERYTHING (no min-compile-time floor): the artifact must be a
    # superset of whatever a deploy process would write, or sub-threshold
    # programs re-cache at first serve and the "no new entries" warm-start
    # guarantee breaks on compile-time jitter around the threshold
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # and keep keys relocatable (same rationale as Context): jax's default
    # GPU sub-cache injects the cache dir's ABSOLUTE PATH into every key,
    # which would pin the packed artifact to its build path
    jax.config.update("jax_persistent_cache_enable_xla_caches", "")

    batches = [int(x) for x in args.batch_sizes.split(",")]
    report = []
    for name in args.configs.split(","):
        t0 = time.perf_counter()
        try:
            ctx = sdtpu.Context(
                model_dir=args.model_dir, steps=args.steps,
                sampler=args.sampler, config=name,
                log_level=LogLevel(args.log_level),
                compile_cache=str(cache_dir))
            init_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for b in batches:
                if b == 1:
                    ctx.generate("warmup", seed=0)
                else:
                    ctx.generate_batch(
                        [{"prompt": "warmup", "seed": i} for i in range(b)])
            r = {"config": name, "init_s": init_s,
                 "compile_and_generate_s":
                     round(time.perf_counter() - t0, 1)}
            del ctx
        except Exception as e:  # noqa: BLE001 — fleet continues per config
            r = {"config": name, "error": f"{type(e).__name__}: {e}"}
        report.append(r)
        print(json.dumps(r), flush=True)
        gc.collect()
    entries = sorted(p for p in cache_dir.iterdir() if p.is_file())
    out = {"cache_dir": str(cache_dir), "entries": len(entries),
           "bytes": sum(p.stat().st_size for p in entries),
           "jax": jax.__version__, "backend": jax.default_backend()}
    if args.pack:
        with tarfile.open(args.pack, "w:gz") as tf:
            for p in entries:
                tf.add(p, arcname=p.name)
        out["artifact"] = args.pack
    print(json.dumps(out))
    return 0 if not any("error" in r for r in report) else 1


def _cmd_info(args) -> int:
    import jax

    import sdtpu

    print(f"sdtpu {sdtpu.__version__}")
    print(f"backend: {jax.default_backend()}, devices: {jax.device_count()}")
    from sdtpu.config import CONFIGS

    for name, cfg in CONFIGS.items():
        print(f"config {name}: {cfg.image_size}x{cfg.image_size}, "
              f"latent {cfg.latent_size}, unet ch {cfg.unet.model_channels}, "
              f"dtype {cfg.dtype}")
    return 0


def _cmd_train(args) -> int:
    """LDM fine-tune loop over precomputed latents+tokens (sdtpu.train).

    The reference has no training story; this completes the lifecycle at
    the CLI surface: data in, checkpoints (params + AdamW moments + EMA)
    out, resumable bit-identically."""
    _select_platform(args.platform)
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from sdtpu.io.params import cast_params, init_pipeline_params
    from sdtpu.train import (
        init_train_state,
        jit_train_step,
        load_train_state,
        make_optimizer,
        save_train_state,
    )

    from sdtpu.config import CONFIGS

    cfg = CONFIGS[args.config]
    if args.objective != "auto" and args.objective != cfg.prediction:
        # a checkpoint trained against the "wrong" objective silently
        # disagrees with cfg.prediction at inference — the samplers would
        # decode it with the wrong transfer rule (ADVICE r3)
        print(f"WARNING: --objective {args.objective} differs from the "
              f"{args.config} config's prediction={cfg.prediction!r}; the "
              f"resulting checkpoint will NOT sample correctly under "
              f"config={args.config} unless you know what you are doing",
              file=sys.stderr)

    t0 = time.time()
    if args.model_dir is None:
        print("no --model-dir: random-init demo weights")
        pipeline = jax.jit(lambda k: init_pipeline_params(k, cfg))(
            jax.random.PRNGKey(args.seed))
    else:
        from sdtpu.io.orbax_ckpt import is_orbax_checkpoint, load_checkpoint
        from sdtpu.io.weights import load_pipeline_params

        pipeline = (load_checkpoint(args.model_dir, cfg)
                    if is_orbax_checkpoint(args.model_dir)
                    else load_pipeline_params(args.model_dir, cfg))
    # frozen models run in the compute dtype; the trainable UNet keeps
    # float32 MASTER params (ldm_loss casts to compute_dtype for the
    # forward/backward) so lr-scale updates and the EMA don't round away
    # in bf16
    frozen = cast_params(
        {"clip": pipeline["clip"], "temb": pipeline["temb"]},
        cfg.compute_dtype)
    unet_params = cast_params(pipeline["unet"], jnp.float32)
    print(f"params ready in {time.time() - t0:.1f}s")

    opt = make_optimizer(lr=args.lr)
    state = init_train_state(unet_params, opt, ema=args.ema)
    if args.resume:
        state = load_train_state(args.resume, state)
        print(f"resumed at step {int(state.step)} from {args.resume}")

    if args.data:
        # streaming input pipeline: sharded .npz / image-folder source,
        # epoch shuffle, background device prefetch (sdtpu.train.data) —
        # datasets larger than host memory stream shard by shard
        from sdtpu.tokenizer import Tokenizer
        from sdtpu.train.data import make_dataset, stream

        flat = (Path(args.model_dir) / "ctokenizer.txt"
                if args.model_dir else None)
        if flat is not None and flat.exists():
            tok = Tokenizer.from_flat_file(flat)
        else:
            from sdtpu.engine.context import DEMO_MERGES

            tok = Tokenizer.from_merges(DEMO_MERGES)
        ds = make_dataset(args.data, tokenizer=tok,
                          context_len=cfg.clip.context_len,
                          image_size=cfg.image_size)
        if len(ds) < args.batch:
            print(f"error: {len(ds)} examples < batch {args.batch}",
                  file=sys.stderr)
            return 2
        steps_per_epoch = len(ds) // args.batch
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        print(f"dataset: {len(ds)} examples ({ds.kind}), "
              f"{steps_per_epoch} steps/epoch, resuming epoch {start_epoch}")
        if ds.kind == "images":
            frozen = dict(frozen)
            frozen["vae_enc"] = cast_params(pipeline["vae_enc"],
                                            cfg.compute_dtype)
        batches = stream(ds, args.batch, seed=args.seed,
                         prefetch=args.prefetch, start_epoch=start_epoch)
    else:
        n = max(args.batch * 4, 8)
        s = cfg.latent_size
        latents = jax.random.normal(
            jax.random.PRNGKey(1), (n, s, s, cfg.latent_channels))
        tokens = jnp.tile(
            jnp.arange(cfg.clip.context_len, dtype=jnp.int32)[None], (n, 1))
        print(f"no --data: {n} synthetic demo examples")

        def _demo_batches():
            key = jax.random.PRNGKey(args.seed + 23)
            while True:
                key, kb = jax.random.split(key)
                idx = jax.random.choice(kb, n, (args.batch,), replace=False)
                yield {"latents": latents[idx], "tokens": tokens[idx]}

        batches = _demo_batches()

    kernels = args.kernels
    if kernels == "auto":
        kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
    step = jit_train_step(cfg, opt, kernels=kernels, remat=args.remat,
                          objective=args.objective,
                          snr_gamma=args.snr_gamma,
                          noise_offset=args.noise_offset)

    key = jax.random.PRNGKey(args.seed + 17)
    t0 = time.time()
    for i in range(args.steps):
        batch = next(batches)
        key, ks = jax.random.split(key)
        state, metrics = step(state, frozen, batch, ks)
        if i % args.log_every == 0 or i == args.steps - 1:
            print(f"step {int(state.step):6d}  "
                  f"loss {float(metrics['loss']):.4f}  "
                  f"gnorm {float(metrics['grad_norm']):.3f}  "
                  f"({(time.time() - t0):.1f}s)", flush=True)
    save_train_state(state, args.out)
    print(f"saved train state (step {int(state.step)}"
          + (", ema" if args.ema else "") + f") to {args.out}")
    return 0


def main(argv=None) -> int:
    from sdtpu.config import CONFIGS

    p = argparse.ArgumentParser(prog="sdtpu",
                                description="TPU-native SD txt2img engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="prompt -> image")
    g.add_argument("--prompt", default=DEFAULT_PROMPT)
    g.add_argument("--guidance", type=float, default=7.5)
    g.add_argument("--negative-prompt", default=None)
    g.add_argument("--init-image", default=None,
                   help="img2img: starting image (png/jpg at the output size)")
    g.add_argument("--strength", type=float, default=None,
                   help="img2img/inpaint strength in (0, 1] "
                        "(default 0.6 img2img, 1.0 inpaint)")
    g.add_argument("--mask-image", default=None,
                   help="inpainting: grayscale mask (white = repaint); "
                        "requires --init-image")
    g.add_argument("--noise-level", type=int, default=20,
                   help="x4 upscaler (config sd_x4): conditioning noise "
                        "augmentation level in [0, max_noise_level); "
                        "--init-image is the low-res input")
    g.add_argument("--depth-image", default=None,
                   help="depth2img (config sd2_depth): grayscale depth map "
                        "(any monotone scale, e.g. a MiDaS dump); requires "
                        "--init-image")
    g.add_argument("--deepcache", type=int, default=None, metavar="N",
                   help="DeepCache (Ma 2023): run the full UNet every N "
                        "steps and splice the cached deep feature on the "
                        "others (latency knob; try N=3)")
    g.add_argument("--tome-ratio", type=float, default=0.0,
                   help="ToMe-SD token merging (Bolya 2023): merge this "
                        "fraction of spatial tokens before the large "
                        "self-attentions (latency knob, biggest at "
                        "768x768+; 0 = off)")
    g.add_argument("--guidance-rescale", type=float, default=0.0,
                   help="CFG rescale in [0,1] (Lin et al. 2023) — fixes "
                        "v-prediction overexposure at high guidance")
    g.add_argument("--clip-skip", type=int, default=1,
                   help="A1111 CLIP skip: tap the text tower N-1 blocks "
                        "early (1 = default tap)")
    g.add_argument("--freeu", default=None, metavar="B1,B2,S1,S2",
                   help="FreeU decoder rebalancing, e.g. 1.5,1.6,0.9,0.2 "
                        "(the SD1.x recipe); training-free quality knob")
    g.add_argument("--hires-scale", type=int, default=None,
                   help="A1111-style hires fix: second denoise pass at "
                        "N x the base resolution (latent upscale)")
    g.add_argument("--hires-strength", type=float, default=0.6,
                   help="denoising strength of the hires second pass")
    g.add_argument("--pag-scale", type=float, default=None,
                   help="perturbed-attention guidance strength (Ahn 2024): "
                        "one extra identity-self-attention UNet eval per "
                        "step steers away from the structure-blind "
                        "prediction (plain txt2img path)")
    g.add_argument("--cfg-interval", default=None, metavar="LO,HI",
                   help="guidance-interval optimization: apply CFG only on "
                        "the middle LO..HI fraction of the trajectory — "
                        "skips the uncond UNet eval outside it (faster; a "
                        "quality win at high guidance, Kynkaanniemi 2024)")
    g.add_argument("--image-guidance", type=float, default=1.5,
                   help="InstructPix2Pix (config sd15_ip2p) image-side CFG "
                        "scale; the prompt becomes the edit instruction "
                        "(requires --init-image)")
    g.add_argument("--steps", type=int, default=20)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--sampler", default="dpm", choices=SAMPLER_CHOICES)
    g.add_argument("--config", default="sd15", choices=sorted(CONFIGS))
    g.add_argument("--model-dir", default=None,
                   help="weights dir (omit for random-init demo)")
    g.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_gn",
                            "pallas_conv"])
    g.add_argument("--quantize", default="none",
                   choices=["none", "int8", "int8w", "int8w_dense"])
    g.add_argument("--size", type=int, default=None,
                   help="output resolution override (e.g. 768)")
    g.add_argument("--lora", default=None,
                   help="LoRA adapter .npz (sdtpu.train.lora) applied to "
                        "the UNet")
    g.add_argument("--controlnet", action="append", default=None,
                   metavar="[NAME=]PATH",
                   help="register a ControlNet (LDM control_model.* "
                        "safetensors, or 'random' for demo weights); "
                        "repeatable")
    g.add_argument("--embedding", action="append", default=None,
                   metavar="WORD=PATH",
                   help="textual-inversion embedding: trigger word = "
                        ".npz/.safetensors vector file; repeatable")
    g.add_argument("--control-image", default=None,
                   help="ControlNet conditioning image (png/jpg at the "
                        "output size); requires --controlnet")
    g.add_argument("--control", default=None,
                   help="ControlNet name to use (default: the only one "
                        "loaded)")
    g.add_argument("--control-scale", type=float, default=1.0)
    g.add_argument("--log-level", type=int, default=2,
                   help="0=nothing .. 4=abusive")
    g.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="force a JAX platform (auto = ambient default)")
    g.add_argument("--out", default="output.png")
    g.set_defaults(fn=_cmd_generate)

    b = sub.add_parser("bench", help="per-part steady-state benchmark")
    b.add_argument("--config", default="sd15", choices=sorted(CONFIGS))
    b.add_argument("--warmup", type=int, default=20)
    b.add_argument("--iters", type=int, default=100)
    b.add_argument("--steps", type=int, default=20)
    b.add_argument("--parts", default=None,
                   help="comma list: temb,text_encoder,unet,vae_decoder")
    b.add_argument("--results", default="results")
    b.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas", "pallas_gn"])
    b.add_argument("--phases", action="store_true",
                   help="also time pipeline phases (conditioning/denoise/decode)")
    b.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    b.set_defaults(fn=_cmd_bench)

    pr = sub.add_parser("profile", help="per-op device profile of one part")
    pr.add_argument("--part", default="unet",
                    choices=["temb", "text_encoder", "unet", "vae_decoder"])
    pr.add_argument("--config", default="sd15", choices=sorted(CONFIGS))
    pr.add_argument("--kernels", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_gn"])
    pr.add_argument("--top", type=int, default=15)
    pr.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (open with XProf)")
    pr.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    pr.set_defaults(fn=_cmd_profile)

    w = sub.add_parser("sweep", help="sampler/steps/CFG/size config sweep")
    w.add_argument("--config", default="sd15", choices=sorted(CONFIGS))
    w.add_argument("--iters", type=int, default=3)
    w.add_argument("--sizes", default="512,768")
    w.add_argument("--steps-list", default="10,20,50")
    w.add_argument("--out", default=None)
    w.add_argument("--images", action="store_true")
    w.add_argument("--quick", action="store_true",
                   help="one config only (smoke test)")
    w.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    w.set_defaults(fn=_cmd_sweep)

    a = sub.add_parser("analyze", help="analyze benchmark results")
    a.add_argument("--results", default="results")
    a.set_defaults(fn=_cmd_analyze)

    s = sub.add_parser("show", help="render a raw output.bin to png")
    s.add_argument("path")
    s.set_defaults(fn=_cmd_show)

    sv = sub.add_parser("serve", help="HTTP txt2img service")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--config", default="sd15", choices=sorted(CONFIGS))
    sv.add_argument("--steps", type=int, default=20)
    sv.add_argument("--sampler", default="dpm", choices=SAMPLER_CHOICES)
    sv.add_argument("--model-dir", default=None)
    sv.add_argument("--mesh", default=None,
                    help="multi-chip serving mesh as 'data,model' (e.g. 2,4)")
    sv.add_argument("--lora", action="append", default=None,
                    metavar="NAME=PATH",
                    help="register a LoRA adapter for per-request selection "
                         "(repeatable; requests pick one via the 'lora' "
                         "field)")
    sv.add_argument("--cfg-interval", default=None, metavar="LO,HI",
                    help="guidance-interval optimization for every request "
                         "(see generate --cfg-interval)")
    sv.add_argument("--deepcache", type=int, default=None, metavar="N",
                    help="DeepCache full-eval cadence for every request")
    sv.add_argument("--tome-ratio", type=float, default=0.0,
                    help="ToMe token-merge ratio (pays at 768+; see "
                         "generate --tome-ratio)")
    sv.add_argument("--kernels", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_gn"])
    sv.add_argument("--log-level", type=int, default=2)
    sv.add_argument("--max-batch", type=int, default=4,
                    help="micro-batching: max concurrent /generate requests "
                         "fused into one compiled call")
    sv.add_argument("--max-wait-ms", type=float, default=25.0,
                    help="micro-batching: max added latency while waiting "
                         "for batch-mates")
    sv.add_argument("--stream-slots", type=int, default=0,
                    help="continuous batching: serve plain /generate "
                         "requests through an N-slot iteration-level pool "
                         "(no batch barriers; live /preview support); 0 "
                         "keeps the barrier micro-batcher")
    sv.add_argument("--stream-steps", default=None, metavar="K1,K2,...",
                    help="stream mode: extra per-request step counts the "
                         "pool schedules (clients pass \"steps\"); mixed "
                         "step counts share one pooled eval")
    sv.add_argument("--max-queue", type=int, default=64,
                    help="backpressure: max waiting requests per worker; "
                         "excess requests get 503 + Retry-After")
    sv.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    sv.set_defaults(fn=_cmd_serve)

    t = sub.add_parser("train", help="LDM fine-tune the UNet (sdtpu.train)")
    t.add_argument("--data", default=None,
                   help="training data: a .npz (latents [N,h,w,4] + tokens "
                        "[N,T]), a directory of such .npz shards, or an "
                        "image folder with captions.txt — shards stream "
                        "with epoch shuffle + device prefetch; image "
                        "folders VAE-encode on device inside the step "
                        "(omit for a synthetic demo batch)")
    t.add_argument("--prefetch", type=int, default=2,
                   help="device-staging prefetch depth (0 disables the "
                        "background loader)")
    t.add_argument("--config", default="sd15",
                   choices=sorted(CONFIGS))
    t.add_argument("--model-dir", default=None,
                   help="frozen CLIP/temb + UNet init weights "
                        "(omit for random-init demo)")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch", type=int, default=2)
    t.add_argument("--lr", type=float, default=1e-5)
    t.add_argument("--ema", action="store_true",
                   help="track EMA weights (decay 0.9999)")
    t.add_argument("--objective", default="auto",
                   choices=["auto", "eps", "v"],
                   help="regression target: eps (SD1.x) or v-prediction "
                        "(SD2.x-768); auto follows the config")
    t.add_argument("--snr-gamma", type=float, default=0.0,
                   help="min-SNR loss weighting gamma (arXiv:2303.09556; "
                        "5.0 is the paper default, 0 disables)")
    t.add_argument("--noise-offset", type=float, default=0.0,
                   help="offset-noise strength: per-channel constant "
                        "shift added to eps (community full-range recipe)")
    t.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the UNet (memory for FLOPs)")
    t.add_argument("--kernels", default="auto",
                   choices=["auto", "xla", "pallas"])
    t.add_argument("--resume", default=None,
                   help="orbax train-state checkpoint dir to resume from")
    t.add_argument("--out", default="train_ckpt",
                   help="orbax checkpoint dir to save the final state")
    t.add_argument("--log-every", type=int, default=10)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"])
    t.set_defaults(fn=_cmd_train)

    wu = sub.add_parser(
        "warmup",
        help="prebuild the persistent compile cache; optionally pack it "
             "into a deployable artifact (or --unpack one)")
    wu.add_argument("--configs", default="sd15",
                    help="comma list of configs to prebuild (txt2img "
                         "program per config; other programs cache on "
                         "first use into the same dir)")
    wu.add_argument("--steps", type=int, default=20)
    wu.add_argument("--sampler", default="dpm", choices=SAMPLER_CHOICES)
    wu.add_argument("--batch-sizes", default="1",
                    help="comma list of serving batch sizes to prebuild "
                         "(the micro-batcher pads to powers of two: 1,2,4)")
    wu.add_argument("--model-dir", default=None)
    wu.add_argument("--cache-dir", default="~/.cache/sdtpu/xla")
    wu.add_argument("--pack", default=None, metavar="TAR_GZ",
                    help="write the cache dir as a gzip tar artifact")
    wu.add_argument("--unpack", default=None, metavar="TAR_GZ",
                    help="deploy: extract a packed artifact into "
                         "--cache-dir and exit")
    wu.add_argument("--log-level", type=int, default=2)
    wu.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    wu.set_defaults(fn=_cmd_warmup)

    i = sub.add_parser("info", help="print version/backend/config info")
    i.set_defaults(fn=_cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""The jit-compiled prompt->image pipeline.

TPU-first redesign of the reference's generate loop (reference:
context.cpp:292-403). The reference round-trips to the host every step —
2 UNet launches + 4 quantized host<->NPU copies + host DPM math per step
(SURVEY.md §3.2). Here the ENTIRE pipeline after tokenization is ONE compiled
XLA program, device-resident end to end:

    tokens ──CLIP──> cond embedding ─┐
    precomputed uncond embedding ────┤           (reference: context.cpp:233-239)
    timesteps ──temb MLP──> t_embs ──┤           (reference: context.cpp:256-279)
                                     ▼
    x ~ N(0,1) ──lax.scan over steps: UNet(batched CFG) -> sampler.step ──>
    latent ──VAE──> RGB float ──scale/clamp──> uint8   (reference: :384-395)

Classifier-free guidance runs cond+uncond as ONE UNet batch of 2B instead of
two sequential launches (reference: context.cpp:352-373) — on TPU the bigger
batch feeds the MXU better and halves launch overhead; the mix
``g*e_cond + (1-g)*e_uncond`` is fused into the scan body (the reference
fuses it into its dequant pass, qnn_context.cpp:588-608).

The noise protocol is defined as ``jax.random.normal(PRNGKey(seed))`` in
float32 — the device-resident analogue of the reference's host-side
std::mt19937 latent sampling (context.cpp:333-334).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sdtpu.config import PipelineConfig
from sdtpu.models import clip, temb, unet, vae
from sdtpu.samplers import get_sampler


def encode_text(params, tokens, cfg: PipelineConfig, weights=None):
    """tokens [B, T] -> prompt embeddings.

    Chunked long-prompt form (sdtpu.text): tokens [B, k, T] encodes each
    window separately and concatenates the hidden states -> [B, k*T, D]
    (cross-attention is length-generic). `weights` [B, k, T] applies
    per-token attention weighting: embeddings scale by their weight, then
    the per-sample mean is restored to its pre-weighting value (the
    standard A1111 normalization). All-ones weights are bit-exact no-ops.
    Works on both single-tower and dual-tower (XL) configs; for XL the
    pooled row packs AFTER weighting so weights only shape the
    cross-attention context.

    SD1.x/2.x: [B, T, context_dim] final(-ish)-layer hidden states.

    SDXL (cfg.clip2 set): the two towers' penultimate hidden states
    concatenate to [B, T, 2048], and tower 2's pooled+projected embedding
    is PACKED as one extra trailing row (zero-padded to the context
    width) -> [B, T+1, 2048]. One array therefore carries the complete
    text conditioning through every serving path (batch stacking,
    per-sample negative prompts, data-axis sharding) unchanged;
    `_unpack_context` splits it again at the UNet boundary. The eot id
    for pooling is vocab_size-1 (the CLIP BPE endoftext convention)."""
    if tokens.ndim == 3:
        b, k, t = tokens.shape
        flat = tokens.reshape(b * k, t)
        if cfg.clip2 is not None:
            # dual-tower chunked encode: each window through both towers,
            # hidden states concatenate along tokens; the pooled embedding
            # (bigG eot tap) comes from chunk 0 only — the A1111/diffusers
            # long-prompt convention for SDXL
            dt = cfg.compute_dtype
            h2, pooled = clip.apply_xl(params["clip2"], flat, cfg.clip2,
                                       cfg.clip2.vocab_size - 1, dtype=dt)
            pooled = pooled.reshape(b, k, -1)[:, 0]
            if cfg.refiner:
                emb = h2.reshape(b, k * t, h2.shape[-1])
            else:
                h1, _ = clip.apply_xl(params["clip"], flat, cfg.clip,
                                      cfg.clip.vocab_size - 1, dtype=dt)
                emb = jnp.concatenate(
                    [h1.reshape(b, k * t, h1.shape[-1]),
                     h2.reshape(b, k * t, h2.shape[-1])], axis=-1)
        else:
            pooled = None
            emb = clip.apply(params["clip"], flat, cfg.clip,
                             dtype=cfg.compute_dtype)
            emb = emb.reshape(b, k * t, emb.shape[-1])
        if weights is not None:
            w = weights.reshape(b, k * t, 1).astype(emb.dtype)
            old_mean = emb.astype(jnp.float32).mean(axis=(1, 2),
                                                    keepdims=True)
            emb = emb * w
            g = emb.astype(jnp.float32)
            new_mean = g.mean(axis=(1, 2), keepdims=True)
            # A1111 restores the signed mean. Guard the ratio when the mean
            # is degenerate (|mean| << rms — e.g. a final LayerNorm with a
            # near-zero bias): a near-zero denominator turns old/new into
            # accumulation-order noise, so a TP-sharded encode and a
            # single-device encode would rescale by visibly different
            # factors. All-ones weights stay a bit-exact no-op (old == new
            # -> scale exactly 1.0).
            rms = jnp.sqrt((g * g).mean(axis=(1, 2), keepdims=True))
            ok = jnp.abs(new_mean) > 1e-4 * rms
            scale = jnp.where(ok, old_mean / jnp.where(ok, new_mean, 1.0),
                              1.0)
            emb = emb * scale.astype(emb.dtype)
        if pooled is None:
            return emb
        # weighting never touches the pooled row (packed after normalize)
        row = jnp.zeros((b, 1, emb.shape[-1]), emb.dtype)
        row = row.at[:, 0, : pooled.shape[-1]].set(pooled.astype(emb.dtype))
        return jnp.concatenate([emb, row], axis=1)
    if cfg.clip2 is None:
        return clip.apply(params["clip"], tokens, cfg.clip,
                          dtype=cfg.compute_dtype)
    dt = cfg.compute_dtype
    h2, pooled = clip.apply_xl(params["clip2"], tokens, cfg.clip2,
                               cfg.clip2.vocab_size - 1, dtype=dt)
    if cfg.refiner:
        # SDXL refiner: tower 2 alone IS the cross-attention context
        ctx = h2
    else:
        h1, _ = clip.apply_xl(params["clip"], tokens, cfg.clip,
                              cfg.clip.vocab_size - 1, dtype=dt)
        ctx = jnp.concatenate([h1, h2], axis=-1)
    row = jnp.zeros((ctx.shape[0], 1, ctx.shape[-1]), dt)
    row = row.at[:, 0, : pooled.shape[-1]].set(pooled.astype(dt))
    return jnp.concatenate([ctx, row], axis=1)


def _unpack_context(context, cfg: PipelineConfig):
    """Packed text conditioning -> (cross-attn context, pooled or None)."""
    if cfg.clip2 is None:
        return context, None
    return (context[:, :-1, :],
            context[:, -1, : cfg.clip2.projection])


def _add_embedding(params, pooled, cfg: PipelineConfig):
    """SDXL additive conditioning: pooled [CB, P] + static microcond fourier
    block -> [CB, time_embed_dim] (added to every step's time embedding).
    txt2img packs 6 microconds (orig/crop/target size); the refiner packs 5
    (orig size, crop, aesthetic score)."""
    n = 5 if cfg.refiner else 6
    fdim = (cfg.unet.adm_in_channels - cfg.clip2.projection) // n
    micro = temb.micro_features(cfg, fdim).astype(pooled.dtype)
    y = jnp.concatenate(
        [pooled, jnp.broadcast_to(micro[None], (pooled.shape[0],
                                                micro.shape[0]))], axis=-1)
    return temb.apply_vec(params["add_mlp"], y, dtype=cfg.compute_dtype)


def decode_latents(params, x, cfg: PipelineConfig, kernels: str = "xla"):
    """Scaled latents [B,h,w,4] -> uint8 RGB [B,H,W,3] (clamp(255*(img+1)/2),
    reference: context.cpp:392-395 does clamp(255*f) on its 0..1 output).

    The latents arrive f32 from the sampler; cast to the compute dtype here —
    conv2d follows its input dtype, and an f32-input VAE runs multi-pass on
    the MXU."""
    z = (x / cfg.vae.scale_factor).astype(cfg.compute_dtype)
    img = vae.apply(params["vae"], z, cfg.vae, kernels)
    img = (img.astype(jnp.float32) + 1.0) * 127.5
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


def denoise(
    params,
    context,
    key,
    guidance,
    cfg: PipelineConfig,
    sampler: str,
    steps: int,
    use_cfg: bool,
    kernels: str = "xla",
    init_latents=None,
    start_step: int = 0,
    mask=None,
    hint=None,
    control_scale=None,
    end_step=None,
    x_start=None,
    x_extra=None,
    image_guidance=None,
    cfg_interval=None,
    cond_schedule=None,
    pag_scale=None,
    pag_layers=None,
    class_emb=None,
):
    """Run the full denoising scan. context: [B or 2B, T, D] prompt
    embeddings — when `use_cfg`, rows [0:B] are cond and [B:2B] uncond.

    Perturbed-attention guidance (Ahn et al. 2024): when `pag_layers`
    (STATIC tuple of UNet sections, subset of ("down", "mid", "up")) is
    given, every step runs one extra cond-slot UNet eval whose
    self-attention in those sections is replaced by the identity map, and
    the final eps gains `pag_scale * (e_cond - e_perturbed)` — steering
    away from the structure-blind prediction. `pag_scale` is traced
    (scalar or per-sample [B]); `pag_layers=None` (default) keeps the
    program untouched. Applies in cfg_interval's unguided segments too
    (PAG is independent of CFG); incompatible with ip2p's dual CFG.

    `cfg_interval` (static (lo, hi) fractions of the trajectory): apply
    CFG only on steps round(steps*lo) <= i < round(steps*hi); outside the
    interval the uncond UNet eval is skipped entirely (cond slot only), so
    each excluded step costs HALF a CFG step. Guidance restricted to a
    middle interval is a measured quality WIN at high scales
    (Kynkäänniemi et al. 2024) — here it is also a latency win. None (the
    default) keeps the single-scan program bit-identical to previous
    releases. Ignored when guidance == 1 or for ip2p's dual CFG.

    InstructPix2Pix dual CFG: pass `image_guidance` (traced scalar) with a
    3B-row context [cond, uncond, uncond] and `x_extra` holding the edit
    image's latents — the extra planes tile [img, img, ZERO] across the
    three CFG thirds and the combine is
    e_un + guidance*(e_txt - e_img) + image_guidance*(e_img - e_un).

    Prompt scheduling (A1111 prompt editing): `cond_schedule` =
    (table [V, B, L, D], idx [steps]) — step i's cond rows gather from
    variant idx[i]; the uncond rows stay the ones in `context`.

    Two-stage (base+refiner) handoff: `end_step` truncates the scan (the
    returned latents carry the marginal at t_{end_step}); `x_start` supplies
    ALREADY-NOISY latents at `start_step`'s marginal (no forward diffusion —
    unlike `init_latents`, which is clean and gets noised here).

    ControlNet: pass `hint` [B, H, W, C] (control image, [0, 1] floats) with
    `params["controlnet"]` present; the hint embedding runs once outside the
    scan, the encoder copy once per step, and its residuals (scaled by
    `control_scale`) are added to the UNet skips/mid
    (sdtpu.models.controlnet).

    img2img: pass `init_latents` (clean, scale-factored latents) and
    `start_step` > 0 — they are noised to the start step's marginal and the
    scan covers steps [start_step, steps).

    inpaint: additionally pass `mask` [B, h, w, 1] float in [0, 1]
    (1 = generate, 0 = keep `init_latents`). At the start of every step the
    kept region is re-pinned to the init latents forward-diffused to that
    step's marginal, so only the masked region evolves freely; after the
    scan the kept region is replaced with the clean latents exactly."""
    from sdtpu.samplers import NoiseSchedule

    if pag_layers and image_guidance is not None:
        raise ValueError("PAG is incompatible with ip2p's dual CFG")
    dc_n = cfg.deepcache_interval
    if dc_n is not None:
        # DeepCache (Ma et al. 2023): full eval every dc_n steps, shallow
        # splice of the cached branch-0 junction feature in between. The
        # cache rides the scan carry, so anything that changes the eval
        # batch or the deep skips mid-trajectory is incompatible.
        dc_n = int(dc_n)
        if dc_n < 2:
            raise ValueError(f"deepcache_interval must be >= 2, got {dc_n}")
        incompat = [
            ("ip2p dual CFG", image_guidance is not None),
            ("ControlNet hints", hint is not None),
            ("prompt scheduling", cond_schedule is not None),
            ("PAG", bool(pag_layers)),
            ("plms_exact", sampler == "plms_exact"),
            ("two-eval samplers (heun/dpm2)",
             getattr(get_sampler(sampler), "NEEDS_SECOND_EVAL", False)),
        ]
        for name, bad in incompat:
            if bad:
                raise ValueError(f"DeepCache is incompatible with {name}")
    context, pooled = _unpack_context(context, cfg)
    add_emb = (None if pooled is None
               else _add_embedding(params, pooled, cfg))
    mod = get_sampler(sampler)
    # start_step > 0 truncates the trajectory: multistep solver history
    # restarts at the first executed step (plan() zeroes the higher-order
    # mix-in there; the zero-initialised State buffers never enter a blend)
    plan = mod.plan(NoiseSchedule.sd_v1(), steps, start_step=start_step)
    reps = 3 if image_guidance is not None else (2 if use_cfg else 1)
    b = context.shape[0] // reps
    shape = (b, cfg.latent_size, cfg.latent_size, cfg.latent_channels)

    if x_start is not None:
        # two-stage handoff: latents already AT start_step's marginal
        x = x_start.astype(jnp.float32)
    else:
        if key.ndim == 2:
            # batched serving: one PRNG key per sample, so each request's
            # noise is independent of its batch-mates (batch(1) reproduces
            # the single path bit-for-bit: threefry bits depend on flat
            # count, not shape)
            noise = jax.vmap(
                lambda k: jax.random.normal(k, shape[1:], jnp.float32))(key)
        else:
            noise = jax.random.normal(key, shape, jnp.float32)
        if init_latents is None:
            x = noise
        else:
            # forward-diffuse the clean latents to the start step's marginal
            x = (plan.alpha_s[start_step] * init_latents.astype(jnp.float32)
                 + plan.sigma_s[start_step] * noise)
    # all step time-embeddings in one tiny batched MLP call, outside the scan
    # (the reference precomputes these through its temb graph at init,
    # context.cpp:256-279)
    w_feats = None
    if cfg.unet.time_cond_proj_dim:
        # LCM guidance embedding: the distilled model consumes the CFG
        # scale through its time MLP (w = guidance - 1, the LCM
        # distillation parametrization) — no uncond eval, no CFG mix
        if use_cfg:
            raise ValueError(
                "guidance-embedded configs (time_cond_proj_dim > 0) bake "
                "CFG into the model; run with use_cfg off")
        w_feats = temb.guidance_scale_features(
            jnp.asarray(guidance, jnp.float32) - 1.0,
            cfg.unet.time_cond_proj_dim)
    t_embs = temb.apply(
        params["temb"], plan.model_t, cfg.unet, dtype=cfg.compute_dtype,
        cond=w_feats,
    )  # [steps, time_embed_dim] ([steps, B, D] with per-sample guidance)
    # two-eval samplers (heun/dpm2): the probe eval's time embeddings, from
    # the plan's second-eval timetable (samplers/heun.py NEEDS_SECOND_EVAL)
    needs_second = getattr(mod, "NEEDS_SECOND_EVAL", False)
    t_embs2 = (temb.apply(params["temb"], plan.model_t2, cfg.unet,
                          dtype=cfg.compute_dtype, cond=w_feats)
               if needs_second else None)

    dtype = cfg.compute_dtype

    cn_list = hint_feats = t_embs_cn = t_embs_cn2 = None
    if hint is not None:
        from sdtpu.models import controlnet as cn_mod

        cns = params.get("controlnet")
        if cns is None:
            raise ValueError("hint given but params has no 'controlnet' tree")
        if isinstance(cns, dict):
            # single-adapter form: one tree + hint [B, H, W, C]
            cns = (cns,)
            hint = hint[None]
        cn_list = tuple(cns)
        factor = hint.shape[2] // cfg.latent_size
        hint_feats, t_embs_cn, t_embs_cn2 = [], [], []
        for j, cn in enumerate(cn_list):
            h_in = hint[j].astype(dtype)
            if use_cfg:
                h_in = jnp.concatenate([h_in, h_in], axis=0)
            # timestep-independent: embed each control image once, outside
            # the scan; every adapter trains its own time MLP
            hint_feats.append(cn_mod.embed_hint(cn, h_in, factor))
            t_embs_cn.append(temb.apply(cn["temb"], plan.model_t, cfg.unet,
                                        dtype=dtype))
            if needs_second:
                t_embs_cn2.append(temb.apply(cn["temb"], plan.model_t2,
                                             cfg.unet, dtype=dtype))

    def predict_eps(x, i, guided=True, dcache=None, dc_anchor=0,
                    second=False):
        """One UNet eval at step index `i` (traced or static). `guided`
        (static) False runs the cond slot only — no uncond eval, no CFG mix
        (the guidance-interval optimization; see `cfg_interval`).

        `second` (static): evaluate at the step's PROBE point instead of its
        start — time embeddings from plan.model_t2 and v-prediction
        conversion at (alpha_m, sigma_m) (two-eval samplers, heun/dpm2).

        `dcache` (DeepCache carry, only when cfg.deepcache_interval): the
        cached junction feature; returns ``(eps, new_cache)`` instead of
        eps — a full capture eval on anchor steps, a shallow splice eval
        otherwise (lax.cond: exactly one branch executes per step).
        `dc_anchor` (static): first step of the enclosing scan segment —
        always a full eval, so a freshly-zeroed per-segment cache never
        reaches a splice (this is what lets DeepCache compose with
        cfg_interval's segments, whose eval batches differ)."""
        r = reps if guided else 1
        if cond_schedule is not None:
            table, sidx = cond_schedule
            cond_i = table[sidx[i]]
            rows = (jnp.concatenate([cond_i, context[b:]], axis=0)
                    if (use_cfg and guided) else cond_i)
        else:
            rows = context if guided else context[:b]
        t_tab = t_embs2 if second else t_embs
        te = jnp.broadcast_to(t_tab[i], (rows.shape[0], t_tab.shape[-1]))
        if add_emb is not None:  # SDXL pooled/microcond conditioning
            te = te + add_emb.astype(te.dtype)[: rows.shape[0]]
        if class_emb is not None:
            # x4-upscaler noise-level conditioning: the class-table row is
            # per sample and timestep-independent (LDM emb + label_emb(y))
            ce = class_emb.astype(te.dtype)
            te = te + (jnp.concatenate([ce] * r, axis=0) if r > 1 else ce)
        x_in = (jnp.concatenate([x] * r, axis=0) if r > 1
                else x).astype(dtype)
        if x_extra is not None:
            # concat-conditioned checkpoints (9-ch inpaint / 5-ch depth /
            # 8-ch ip2p): the per-sample conditioning planes ride the
            # channel axis into conv_in at every step. CFG halves duplicate
            # them; ip2p's third (fully-unconditional) slot gets zeros.
            if image_guidance is not None:
                xe = jnp.concatenate(
                    [x_extra, x_extra, jnp.zeros_like(x_extra)], axis=0)
            elif r == 2:
                xe = jnp.concatenate([x_extra, x_extra], axis=0)
            else:
                xe = x_extra
            x_in = jnp.concatenate([x_in, xe.astype(dtype)], axis=-1)
        ctrl = None
        if hint_feats is not None:
            from sdtpu.models import controlnet as cn_mod

            scales = jnp.atleast_1d(jnp.asarray(
                1.0 if control_scale is None else control_scale,
                jnp.float32))
            acc_d = acc_m = None
            # multi-adapter composition: residuals SUM (the diffusers
            # MultiControlNet convention), each weighted by its scale
            for j, cn in enumerate(cn_list):
                cn_tab = t_embs_cn2[j] if second else t_embs_cn[j]
                te_cn = jnp.broadcast_to(
                    cn_tab[i], (rows.shape[0], cn_tab.shape[-1]))
                if add_emb is not None:
                    te_cn = te_cn + add_emb.astype(
                        te_cn.dtype)[: rows.shape[0]]
                dres, mres = cn_mod.apply(
                    cn, x_in, hint_feats[j][: x_in.shape[0]],
                    te_cn, rows, cfg.unet, kernels)
                s = scales[j % scales.shape[0]]
                dres = [r_ * s.astype(r_.dtype) for r_ in dres]
                mres = mres * s.astype(mres.dtype)
                if acc_d is None:
                    acc_d, acc_m = list(dres), mres
                else:
                    acc_d = [a + r_ for a, r_ in zip(acc_d, dres)]
                    acc_m = acc_m + mres
            ctrl = (tuple(acc_d), acc_m)
        if dcache is not None:
            is_full = ((i - dc_anchor) % dc_n) == 0

            def _full(c):
                del c
                e, cc = unet.apply(params["unet"], x_in, te, rows,
                                   cfg.unet, kernels, deep="capture")
                return e.astype(jnp.float32), cc

            def _shallow(c):
                e = unet.apply(params["unet"], x_in, te, rows, cfg.unet,
                               kernels, deep=c)
                return e.astype(jnp.float32), c

            eps, dcache = jax.lax.cond(is_full, _full, _shallow, dcache)
        else:
            eps = unet.apply(
                params["unet"], x_in, te, rows, cfg.unet, kernels,
                control=ctrl,
            ).astype(jnp.float32)
        if cfg.prediction == "v":
            # v-objective models (SD2.x 768-v): v = alpha*eps - sigma*x0
            # => eps = alpha*v + sigma*x_t (per CFG slot); at the probe
            # point the marginals are the plan's second-eval ones
            a_i = plan.alpha_m[i] if second else plan.alpha_s[i]
            s_i = plan.sigma_m[i] if second else plan.sigma_s[i]
            x_rep = jnp.concatenate([x] * r, 0) if r > 1 else x
            eps = a_i * eps + s_i * x_rep
        e_ptb = None
        if pag_layers:
            # perturbed-attention guidance: one extra cond-slot eval with
            # identity self-attention in the selected sections
            ctrl_b = (None if ctrl is None else
                      (tuple(d[:b] for d in ctrl[0]), ctrl[1][:b]))
            e_ptb = unet.apply(
                params["unet"], x_in[:b], te[:b], rows[:b], cfg.unet,
                kernels, control=ctrl_b, perturb=pag_layers,
            ).astype(jnp.float32)
            if cfg.prediction == "v":
                e_ptb = a_i * e_ptb + s_i * x
            e_cond_raw = eps[:b]  # cond rows lead in every slot layout
        if image_guidance is not None:
            g = jnp.asarray(guidance, jnp.float32)
            gi = jnp.asarray(image_guidance, jnp.float32)
            e_txt, e_img, e_un = eps[:b], eps[b:2 * b], eps[2 * b:]
            eps = (e_un + g * (e_txt - e_img) + gi * (e_img - e_un))
        elif use_cfg and guided:
            g = jnp.asarray(guidance, jnp.float32)
            if g.ndim:  # per-sample guidance scale [B] (batched serving)
                g = g.reshape((-1,) + (1,) * (eps.ndim - 1))
            e_cond = eps[:b]
            eps = g * e_cond + (1.0 - g) * eps[b:]
            if cfg.guidance_rescale:
                # CFG rescale (Lin et al. 2023): pull the guided eps's
                # per-sample std back toward the cond prediction's —
                # fixes v-prediction overexposure at high guidance
                axes = tuple(range(1, eps.ndim))
                std_c = jnp.std(e_cond, axis=axes, keepdims=True)
                std_g = jnp.std(eps, axis=axes, keepdims=True)
                rescaled = eps * (std_c / jnp.maximum(std_g, 1e-8))
                r = jnp.float32(cfg.guidance_rescale)
                eps = r * rescaled + (1.0 - r) * eps
        if e_ptb is not None:
            s = jnp.asarray(0.0 if pag_scale is None else pag_scale,
                            jnp.float32)
            if s.ndim:  # per-sample PAG scale [B] (batched serving)
                s = s.reshape((-1,) + (1,) * (e_ptb.ndim - 1))
            eps = eps + s * (e_cond_raw - e_ptb)
        return eps if dcache is None else (eps, dcache)

    state = mod.init_state(shape)

    if sampler == "plms_exact" and start_step == 0:
        # CompVis-exact PLMS first step (pseudo improved Euler): a second
        # UNet eval at the *next* time refines eps before the step-0 update.
        # The plain "plms" sampler spends one eval here instead.
        e_t = predict_eps(x, 0)
        x_mid, _ = mod.step(plan, 0, x, e_t, state)
        e_next = predict_eps(x_mid, 1)
        x, _ = mod.step(plan, 0, x, 0.5 * (e_t + e_next), state)
        # history gets e_t (not the average), as in the reference method
        _, state = mod.step(plan, 0, x_mid, e_t, state)
        start_step = 1

    def _step_noise(i, tag_base):
        """Per-step standard-normal draw from the request key; per-sample in
        batched serving so the stream is independent of batch composition."""
        if key.ndim == 2:
            return jax.vmap(lambda k: jax.random.normal(
                jax.random.fold_in(k, tag_base + i), shape[1:],
                jnp.float32))(key)
        return jax.random.normal(
            jax.random.fold_in(key, tag_base + i), shape, jnp.float32)

    needs_noise = getattr(mod, "NEEDS_NOISE", False)

    def _dc_zeros(guided):
        """Per-segment DeepCache carry init: the junction feature's
        shape/dtype via abstract eval of a capture call (no FLOPs). Each
        segment's first step is always a full eval (dc_anchor), so the
        zeros never reach a splice — and each segment gets its own cache
        because the eval batch differs between guided/unguided segments."""
        r0 = reps if guided else 1
        xi = (jnp.concatenate([x] * r0, axis=0) if r0 > 1 else x)
        xi = xi.astype(dtype)
        if x_extra is not None:
            xe = (jnp.concatenate([x_extra] * r0, axis=0) if r0 > 1
                  else x_extra)
            xi = jnp.concatenate([xi, xe.astype(dtype)], axis=-1)
        rows0 = context if guided else context[:b]
        te0 = jnp.broadcast_to(t_embs[0], (rows0.shape[0],
                                           t_embs.shape[-1]))
        cache_sd = jax.eval_shape(
            lambda xx, tt, rr: unet.apply(params["unet"], xx, tt, rr,
                                          cfg.unet, kernels,
                                          deep="capture")[1],
            xi, te0, rows0)
        return jnp.zeros(cache_sd.shape, cache_sd.dtype)

    def make_body(guided, dc_anchor=0):
        def body(carry, i):
            if dc_n is not None:
                x, st, dc = carry
            else:
                (x, st), dc = carry, None
            if mask is not None:
                # re-pin the kept region to the init latents at this step's
                # marginal (fresh noise per step keeps its statistics honest)
                n_i = _step_noise(i, 1)
                pinned = (plan.alpha_s[i] * init_latents.astype(jnp.float32)
                          + plan.sigma_s[i] * n_i)
                x = mask * x + (1.0 - mask) * pinned
            if needs_second:
                # two-eval samplers (heun/dpm2): probe eval at the plan's
                # second timetable point, then the combined update
                eps1 = predict_eps(x, i, guided)
                x_mid = mod.predictor(plan, i, x, eps1)
                eps2 = predict_eps(x_mid, i, guided, second=True)
                x, st = mod.step(plan, i, x, eps1, st, eps2=eps2)
                return (x, st), None
            if dc_n is not None:
                eps, dc = predict_eps(x, i, guided, dc, dc_anchor)
            else:
                eps = predict_eps(x, i, guided)
            if needs_noise:
                # ancestral samplers: a dedicated fold_in tag range, disjoint
                # from the inpaint pin-noise tags (1..steps) and the VAE
                # posterior tag (_POSTERIOR_FOLD)
                x, st = mod.step(plan, i, x, eps, st,
                                 noise=_step_noise(i, _ANCESTRAL_FOLD))
            else:
                x, st = mod.step(plan, i, x, eps, st)
            return ((x, st, dc) if dc_n is not None else (x, st)), None

        return body

    end = steps if end_step is None else int(end_step)
    if cfg_interval is None or not use_cfg or image_guidance is not None:
        segments = [(start_step, end, True)]
    else:
        # guidance-interval optimization (Kynkäänniemi et al. 2024; the
        # phase-aware idea in SD-Acc): CFG only on the middle fraction of
        # the trajectory — outside it the uncond UNet eval is SKIPPED
        # entirely, so each excluded step costs half a CFG step. The split
        # is static, so each segment compiles its own scan body (no
        # per-step lax.cond) and the default path stays untouched.
        lo, hi = cfg_interval
        a = int(round(steps * lo))
        c = int(round(steps * hi))
        segments = [(start_step, min(a, end), False),
                    (max(a, start_step), min(c, end), True),
                    (max(c, start_step), end, False)]
        segments = [(s0, s1, g) for s0, s1, g in segments if s1 > s0]
    for s0, s1, guided in segments:
        n_run = s1 - s0
        # unroll=2: exposes cross-step overlap to the latency-hiding
        # scheduler (weight prefetch of step i+1 behind the tail of step i)
        carry0 = ((x, state, _dc_zeros(guided)) if dc_n is not None
                  else (x, state))
        carry, _ = jax.lax.scan(
            make_body(guided, dc_anchor=s0), carry0, jnp.arange(s0, s1),
            unroll=2 if n_run % 2 == 0 else 1,
        )
        x, state = carry[0], carry[1]
    if mask is not None:
        x = mask * x + (1.0 - mask) * init_latents.astype(jnp.float32)
    return x


def generate(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    use_cfg: bool = True,
    kernels: str = "xla",
    hint=None,
    control_scale=None,
    end_step=None,
    output: str = "image",
    token_weights=None,
    cfg_interval=None,
    sched_idx=None,
    pag_scale=None,
    pag_layers=None,
):
    """The full prompt->image program (jit this whole function).

    tokens: [B, T] int32; uncond_embedding: [T, D] (precomputed once at
    setup); key: PRNG key; guidance: scalar (traced — changing it does not
    recompile). Optional ControlNet conditioning: `hint` [B, H, W, C] control
    image + `control_scale` (both traced; params must carry a "controlnet"
    tree). Returns uint8 [B, H, W, 3] — or, with output="latent", the f32
    scale-factored latents (noisy at t_{end_step} when `end_step` truncates
    the scan: the base half of a base+refiner pipeline).
    """
    cond_schedule = None
    if sched_idx is not None:
        # prompt scheduling: tokens [V, B, k, T] (+ weights) encode to a
        # variant table; the scan gathers variant sched_idx[i] per step
        v, bsz, k, t = tokens.shape
        w = (None if token_weights is None
             else token_weights.reshape(v * bsz, k, t))
        emb = encode_text(params, tokens.reshape(v * bsz, k, t), cfg, w)
        table = emb.reshape(v, bsz, *emb.shape[1:])
        p_un = uncond_embedding.astype(table.dtype)
        if p_un.ndim == 2:
            p_un = jnp.broadcast_to(p_un[None], (bsz, *p_un.shape))
        context = (jnp.concatenate([table[0], p_un], axis=0)
                   if use_cfg else table[0])
        cond_schedule = (table, sched_idx)
    else:
        context = _build_context(params, tokens, uncond_embedding, cfg,
                                 use_cfg, weights=token_weights)
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, hint=hint, control_scale=control_scale, end_step=end_step,
        cfg_interval=cfg_interval, cond_schedule=cond_schedule,
        pag_scale=pag_scale, pag_layers=pag_layers,
    )
    if output == "latent":
        return x
    return decode_latents(params, x, cfg, kernels)


def refine(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    latents,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    start_step: int = 0,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
    cfg_interval=None,
    pag_scale=None,
    pag_layers=None,
):
    """Second stage of a two-stage (base + refiner) pipeline: continue
    denoising ALREADY-NOISY latents from `start_step` (whose marginal they
    must carry — i.e. the base model ran with end_step == this start_step
    on the same `steps` timeline), then decode. Also exact for
    start_step == 0 with pure-noise latents: identical to `generate` (the
    pinned invariant test). Long/weighted prompts: tokens [B, k, T] (+
    `token_weights`), same contract as `generate`."""
    context = _build_context(params, tokens, uncond_embedding, cfg, use_cfg,
                             weights=token_weights)
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, start_step=start_step, x_start=latents,
        cfg_interval=cfg_interval, pag_scale=pag_scale,
        pag_layers=pag_layers,
    )
    return decode_latents(params, x, cfg, kernels)


def _build_context(params, tokens, uncond_embedding, cfg, use_cfg,
                   weights=None):
    """Cond (+ broadcast uncond) prompt embeddings for the CFG batch.

    uncond_embedding: [T, D] (shared, broadcast over the batch) or [B, T, D]
    (per-sample negative prompts, batched serving)."""
    p_cond = encode_text(params, tokens, cfg, weights)
    if not use_cfg:
        return p_cond
    b = tokens.shape[0]
    p_un = uncond_embedding.astype(p_cond.dtype)
    if p_un.ndim == 2:
        p_un = jnp.broadcast_to(p_un[None], (b, *p_un.shape))
    return jnp.concatenate([p_cond, p_un], axis=0)


# fold_in tag for the VAE-posterior draw: far outside the per-step inpaint
# pin-noise tags (fold_in(key, i+1), i < steps), so the streams never collide
_POSTERIOR_FOLD = 1 << 20

# base tag for ancestral-sampler per-step noise (fold_in(key, base + i)):
# its own bank above the posterior tag, so none of the three streams collide
_ANCESTRAL_FOLD = 1 << 21

# tag for the MASKED-image posterior draw (9-ch inpaint checkpoints encode
# both the full and the masked image from one request key)
_MASKED_FOLD = 1 << 22


def _encode_init_latents(params, image, cfg, kernels, key=None,
                         fold_tag=_POSTERIOR_FOLD, scaled=True):
    """[B,H,W,3] float in [-1,1] -> clean scale-factored latents (f32).

    With `key`, SAMPLES the diagonal-Gaussian posterior (mean +
    exp(0.5*logvar)*noise) as CompVis/diffusers img2img do — deterministic
    per request key via a fold_in. Without `key`, returns the posterior
    mode (mean). `scaled=False` skips the scale-factor multiply (the
    InstructPix2Pix conditioning convention: its conv_in consumed raw
    posterior modes during training)."""
    from sdtpu.models import vae as vae_mod

    mean, logvar = vae_mod.apply_encoder(
        params["vae_enc"], image.astype(cfg.compute_dtype), cfg.vae, kernels)
    z = mean.astype(jnp.float32)
    if key is not None:
        if key.ndim == 2:  # batched serving: one key per sample
            noise = jax.vmap(lambda k: jax.random.normal(
                jax.random.fold_in(k, fold_tag),
                z.shape[1:], jnp.float32))(key)
        else:
            noise = jax.random.normal(
                jax.random.fold_in(key, fold_tag), z.shape, jnp.float32)
        z = z + jnp.exp(0.5 * logvar.astype(jnp.float32)) * noise
    return z * cfg.vae.scale_factor if scaled else z


def img2img(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    image,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    start_step: int = 10,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
    depth=None,
    cfg_interval=None,
    pag_scale=None,
    pag_layers=None,
):
    """image-to-image: encode `image` ([B,H,W,3] float in [-1,1]) to latents,
    noise to `start_step`, denoise the remaining steps, decode. The latents
    are SAMPLED from the VAE posterior with the request key (the upstream
    CompVis/diffusers convention), so results stay deterministic per seed.
    The reference has no encoder (txt2img only); this is a capability
    extension. Long/weighted prompts: tokens [B, k, T] + `token_weights`.

    Depth-conditioned checkpoints (`unet.in_channels == latent_channels + 1`,
    config.SD2_DEPTH): pass `depth` [B, H, W, 1] float (any monotone depth
    scale — a caller-side monocular estimator like MiDaS upstream). It is
    mean-pooled to latent resolution and min/max-normalized per sample to
    [-1, 1] (the diffusers depth2img convention), then concatenated to the
    latents on the channel axis at every step."""
    context = _build_context(params, tokens, uncond_embedding, cfg, use_cfg,
                             weights=token_weights)
    init_latents = _encode_init_latents(params, image, cfg, kernels, key=key)
    x_extra = None
    if depth is not None:
        f = cfg.image_size // cfg.latent_size
        b = depth.shape[0]
        s = cfg.latent_size
        d = (depth.astype(jnp.float32)
             .reshape(b, s, f, s, f, 1).mean(axis=(2, 4)))
        dmin = d.min(axis=(1, 2, 3), keepdims=True)
        dmax = d.max(axis=(1, 2, 3), keepdims=True)
        x_extra = 2.0 * (d - dmin) / jnp.maximum(dmax - dmin, 1e-6) - 1.0
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, init_latents=init_latents, start_step=start_step,
        x_extra=x_extra, cfg_interval=cfg_interval, pag_scale=pag_scale,
        pag_layers=pag_layers,
    )
    return decode_latents(params, x, cfg, kernels)


def inpaint(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    image,
    mask,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    start_step: int = 0,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
    cfg_interval=None,
):
    """Masked image-to-image. `image`: [B,H,W,3] float in [-1,1]; `mask`:
    [B,H,W,1] float in [0,1], 1 = repaint.

    Two regimes, selected statically by the config (`Context.inpaint` routes
    both through this one function):

    * standard checkpoint (`unet.in_channels == latent_channels`): the pixel
      mask is mean-pooled to latent resolution (soft edges blend the two
      regions in latent space); the kept region is re-pinned to the
      forward-diffused init latents every step.
    * dedicated inpaint checkpoint (`unet.in_channels ==
      2*latent_channels + 1`, the RunwayML sd-*-inpainting convention,
      config.SD15_INPAINT): conv_in additionally takes the latent-res mask
      and the VAE-encoded MASKED image (repaint region blanked to 0, i.e.
      mid-gray), concatenated on the channel axis at every step; the model
      itself learned to preserve the kept region, so no pinning. strength<1
      still warm-starts from the noised full-image latents, as diffusers'
      StableDiffusionInpaintPipeline does.

    Like img2img, init latents are sampled from the VAE posterior with the
    request key. Capability extension — the reference is txt2img-only."""
    context = _build_context(params, tokens, uncond_embedding, cfg, use_cfg,
                             weights=token_weights)
    f = cfg.image_size // cfg.latent_size
    b = mask.shape[0]
    s = cfg.latent_size
    m = mask.reshape(b, s, f, s, f, 1).mean(axis=(2, 4)).astype(jnp.float32)
    if cfg.unet.in_channels == 2 * cfg.latent_channels + 1:
        masked_lat = _encode_init_latents(
            params, image * (1.0 - mask), cfg, kernels, key=key,
            fold_tag=_MASKED_FOLD)
        x_extra = jnp.concatenate([m, masked_lat], axis=-1)
        init_latents = None
        if start_step > 0:
            init_latents = _encode_init_latents(params, image, cfg, kernels,
                                                key=key)
        x = denoise(
            params, context, key, guidance, cfg, sampler, steps, use_cfg,
            kernels, init_latents=init_latents, start_step=start_step,
            x_extra=x_extra, cfg_interval=cfg_interval,
        )
        return decode_latents(params, x, cfg, kernels)
    init_latents = _encode_init_latents(params, image, cfg, kernels, key=key)
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, init_latents=init_latents, start_step=start_step, mask=m,
        cfg_interval=cfg_interval,
    )
    return decode_latents(params, x, cfg, kernels)


def hires_refine(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    latents,
    *,
    cfg: PipelineConfig,
    scale: int = 2,
    sampler: str = "dpm",
    steps: int = 20,
    start_step: int = 8,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
    cfg_interval=None,
):
    """Second pass of the A1111 "hires fix": nearest-upscale the base
    pass's CLEAN latents by `scale` in latent space (the "Latent" upscaler
    mode), forward-diffuse to `start_step`'s marginal, denoise the
    remaining steps at the higher resolution, decode. The UNet/VAE are
    fully convolutional, so the SAME param tree serves both passes — only
    the compiled program's latent grid changes. Capability extension (the
    reference is txt2img-only at one resolution)."""
    import dataclasses as _dc

    cfg_hi = _dc.replace(cfg, latent_size=cfg.latent_size * scale)
    context = _build_context(params, tokens, uncond_embedding, cfg_hi,
                             use_cfg, weights=token_weights)
    b, s, _, c = latents.shape
    up = jax.image.resize(latents.astype(jnp.float32),
                          (b, s * scale, s * scale, c), method="nearest")
    x = denoise(
        params, context, key, guidance, cfg_hi, sampler, steps, use_cfg,
        kernels, init_latents=up, start_step=start_step,
        cfg_interval=cfg_interval,
    )
    return decode_latents(params, x, cfg_hi, kernels)


def instruct_pix2pix(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    image,
    image_guidance,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
):
    """Instruction-based image editing (timbrooks/instruct-pix2pix): an
    8-channel UNet takes the latents plus the edit image's UNSCALED
    posterior-mode latents at every step, and a dual CFG steers toward the
    text instruction (`guidance`) and toward the input image
    (`image_guidance`) independently — three UNet slots per step:
    [text+image, image-only, unconditional]. Denoising always starts from
    pure noise (the edit magnitude is controlled by the two scales, not a
    strength). Both scales are traced scalars — no recompile across values.
    Capability extension — the reference is txt2img-only."""
    p_cond = encode_text(params, tokens, cfg, token_weights)
    bsz = tokens.shape[0]
    p_un = uncond_embedding.astype(p_cond.dtype)
    if p_un.ndim == 2:
        p_un = jnp.broadcast_to(p_un[None], (bsz, *p_un.shape))
    context = jnp.concatenate([p_cond, p_un, p_un], axis=0)
    image_latents = _encode_init_latents(params, image, cfg, kernels,
                                         key=None, scaled=False)
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, True,
        kernels, x_extra=image_latents, image_guidance=image_guidance,
    )
    return decode_latents(params, x, cfg, kernels)


#: fold_in tag for the x4-upscaler's low-res noise augmentation draw —
#: its own bank, disjoint from the inpaint/posterior/ancestral streams
_AUG_FOLD = 1 << 23


def upscale(
    params,
    tokens,
    uncond_embedding,
    key,
    guidance,
    image,
    noise_level,
    *,
    cfg: PipelineConfig,
    sampler: str = "dpm",
    steps: int = 20,
    use_cfg: bool = True,
    kernels: str = "xla",
    token_weights=None,
    cfg_interval=None,
):
    """SD x4 latent upscaler (config.SD_X4, x4-upscaling.yaml): 4x
    super-resolution guided by a text prompt.

    `image`: the LOW-RES input [B, h, w, 3] float in [-1, 1] at the
    latent grid size (cfg.latent_size); the output is uint8
    [B, 4h, 4w, 3] through the f=4 VAE. Per the LDM noise-augmentation
    recipe (ImageConcatWithNoiseAugmentation), the conditioning image is
    forward-diffused on an IMAGE-SPACE sqrt-linear schedule
    (1e-4 -> 2e-2) to `noise_level` (traced int scalar or [B],
    < cfg.max_noise_level; higher = more creative freedom), rides the
    UNet's channel axis at every step (in_channels 4 + 3), and the level
    itself conditions the UNet through the learned class-embedding table
    (params["unet"]["label_emb"]). The augmentation draw is deterministic
    per request key (fold_in tag _AUG_FOLD). Capability extension — the
    reference is a fixed-resolution txt2img engine."""
    from sdtpu.samplers import NoiseSchedule

    context = _build_context(params, tokens, uncond_embedding, cfg, use_cfg,
                             weights=token_weights)
    nl = jnp.asarray(noise_level, jnp.int32)
    # image-space augmentation schedule (LDM make_beta_schedule "linear" is
    # sqrt-linear): alpha-bar table gathered at the traced level
    aug = NoiseSchedule.sd_v1(lin_start=1e-4, lin_end=2e-2)
    abar = jnp.asarray(aug.alphas_cumprod, jnp.float32)[nl]
    if key.ndim == 2:  # batched serving: per-sample keys
        noise = jax.vmap(lambda k: jax.random.normal(
            jax.random.fold_in(k, _AUG_FOLD), image.shape[1:],
            jnp.float32))(key)
    else:
        noise = jax.random.normal(jax.random.fold_in(key, _AUG_FOLD),
                                  image.shape, jnp.float32)
    ab = abar.reshape((-1,) + (1,) * (image.ndim - 1)) if abar.ndim \
        else abar
    z_lr = (jnp.sqrt(ab) * image.astype(jnp.float32)
            + jnp.sqrt(1.0 - ab) * noise)
    lab = params["unet"]["label_emb"][nl]          # [D] or [B, D]
    if lab.ndim == 1:
        lab = jnp.broadcast_to(lab[None], (image.shape[0], lab.shape[0]))
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, x_extra=z_lr, cfg_interval=cfg_interval, class_emb=lab,
    )
    return decode_latents(params, x, cfg, kernels)


def jit_generate(cfg: PipelineConfig, sampler: str, steps: int, use_cfg: bool,
                 kernels: str = "xla", donate_params: bool = False,
                 end_step=None, output: str = "image", cfg_interval=None,
                 pag_layers=None):
    """Build the compiled generate function. Static: cfg/sampler/steps/
    use_cfg/end_step/output (shape-affecting); traced: tokens/key/guidance
    (value-changing without recompile — fixes the reference's steps==20 hard
    limit, context.cpp:250-251, by making steps a compile-time axis
    instead)."""
    fn = functools.partial(
        generate, cfg=cfg, sampler=sampler, steps=steps, use_cfg=use_cfg,
        kernels=kernels, end_step=end_step, output=output,
        cfg_interval=cfg_interval, pag_layers=pag_layers,
    )
    return jax.jit(fn)


def jit_refine(cfg: PipelineConfig, sampler: str, steps: int,
               start_step: int, use_cfg: bool, kernels: str = "xla",
               cfg_interval=None, pag_layers=None):
    """Compiled refine program (latents in, image out)."""
    fn = functools.partial(
        refine, cfg=cfg, sampler=sampler, steps=steps,
        start_step=start_step, use_cfg=use_cfg, kernels=kernels,
        cfg_interval=cfg_interval, pag_layers=pag_layers,
    )
    return jax.jit(fn)

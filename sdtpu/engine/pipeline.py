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


def encode_text(params, tokens, cfg: PipelineConfig):
    """tokens [B, T] -> prompt embeddings [B, T, context_dim]."""
    return clip.apply(params["clip"], tokens, cfg.clip, dtype=cfg.compute_dtype)


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
):
    """Run the full denoising scan. context: [B or 2B, T, D] prompt
    embeddings — when `use_cfg`, rows [0:B] are cond and [B:2B] uncond.

    img2img: pass `init_latents` (clean, scale-factored latents) and
    `start_step` > 0 — they are noised to the start step's marginal and the
    scan covers steps [start_step, steps)."""
    from sdtpu.samplers import NoiseSchedule

    mod = get_sampler(sampler)
    plan = mod.plan(NoiseSchedule.sd_v1(), steps)
    b = context.shape[0] // 2 if use_cfg else context.shape[0]
    shape = (b, cfg.latent_size, cfg.latent_size, cfg.latent_channels)

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
    t_embs = temb.apply(
        params["temb"], plan.model_t, cfg.unet, dtype=cfg.compute_dtype
    )  # [steps, time_embed_dim]

    dtype = cfg.compute_dtype
    state = mod.init_state(shape)

    def body(carry, i):
        x, st = carry
        te = jnp.broadcast_to(t_embs[i], (context.shape[0], t_embs.shape[-1]))
        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0).astype(dtype)
        else:
            x_in = x.astype(dtype)
        eps = unet.apply(
            params["unet"], x_in, te, context, cfg.unet, kernels
        ).astype(jnp.float32)
        if cfg.prediction == "v":
            # v-objective models (SD2.x 768-v): v = alpha*eps - sigma*x0
            # => eps = alpha*v + sigma*x_t (per half of the CFG batch)
            x_rep = jnp.concatenate([x, x], 0) if use_cfg else x
            eps = plan.alpha_s[i] * eps + plan.sigma_s[i] * x_rep
        if use_cfg:
            g = jnp.float32(guidance)
            eps = g * eps[:b] + (1.0 - g) * eps[b:]
        x, st = mod.step(plan, i, x, eps, st)
        return (x, st), None

    # unroll=2: exposes cross-step overlap to the latency-hiding scheduler
    # (weight prefetch of step i+1 behind the tail of step i)
    n_run = steps - start_step
    (x, _), _ = jax.lax.scan(
        body, (x, state), jnp.arange(start_step, steps),
        unroll=2 if n_run % 2 == 0 else 1,
    )
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
):
    """The full prompt->image program (jit this whole function).

    tokens: [B, T] int32; uncond_embedding: [T, D] (precomputed once at
    setup); key: PRNG key; guidance: scalar (traced — changing it does not
    recompile). Returns uint8 [B, H, W, 3].
    """
    p_cond = encode_text(params, tokens, cfg)
    if use_cfg:
        b = tokens.shape[0]
        p_un = jnp.broadcast_to(
            uncond_embedding.astype(p_cond.dtype)[None], (b, *uncond_embedding.shape)
        )
        context = jnp.concatenate([p_cond, p_un], axis=0)
    else:
        context = p_cond
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels,
    )
    return decode_latents(params, x, cfg, kernels)


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
):
    """image-to-image: encode `image` ([B,H,W,3] float in [-1,1]) to latents,
    noise to `start_step`, denoise the remaining steps, decode. The reference
    has no encoder (txt2img only); this is a capability extension."""
    from sdtpu.models import vae as vae_mod

    p_cond = encode_text(params, tokens, cfg)
    if use_cfg:
        b = tokens.shape[0]
        p_un = jnp.broadcast_to(
            uncond_embedding.astype(p_cond.dtype)[None],
            (b, *uncond_embedding.shape))
        context = jnp.concatenate([p_cond, p_un], axis=0)
    else:
        context = p_cond
    mean, _ = vae_mod.apply_encoder(
        params["vae_enc"], image.astype(cfg.compute_dtype), cfg.vae, kernels)
    init_latents = mean.astype(jnp.float32) * cfg.vae.scale_factor
    x = denoise(
        params, context, key, guidance, cfg, sampler, steps, use_cfg,
        kernels, init_latents=init_latents, start_step=start_step,
    )
    return decode_latents(params, x, cfg, kernels)


def jit_generate(cfg: PipelineConfig, sampler: str, steps: int, use_cfg: bool,
                 kernels: str = "xla", donate_params: bool = False):
    """Build the compiled generate function. Static: cfg/sampler/steps/
    use_cfg (shape-affecting); traced: tokens/key/guidance (value-changing
    without recompile — fixes the reference's steps==20 hard limit,
    context.cpp:250-251, by making steps a compile-time axis instead)."""
    fn = functools.partial(
        generate, cfg=cfg, sampler=sampler, steps=steps, use_cfg=use_cfg,
        kernels=kernels,
    )
    return jax.jit(fn)

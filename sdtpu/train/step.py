"""LDM fine-tuning: the epsilon-prediction training step for the SD UNet.

The reference runtime is inference-only (SURVEY §2.4 — it consumes
checkpoints produced elsewhere); training support is a TPU-native extension
so the framework covers the full model lifecycle. The objective is the
standard latent-diffusion noise-prediction loss (CompVis
ldm/models/diffusion/ddpm.py): sample a timestep and Gaussian noise per
example, forward-diffuse the clean latents to that marginal, and regress
the UNet's output onto the noise:

    t ~ U{0..999},  eps ~ N(0, I)
    x_t = sqrt(alphabar_t) x0 + sqrt(1 - alphabar_t) eps
    loss = mean || unet(x_t, temb(t), clip(tokens)) - eps ||^2

CLIP and the VAE stay frozen (SD fine-tuning convention); only UNet params
receive gradients. Everything is a pure function of (state, batch, key) —
one `jax.jit` for single-chip, and on a `(data, model)` mesh the same step
shards: batch on the data axis, UNet kernels on the model axis via the
serving TP plan (parallel/sharding.param_pspecs); gradients and AdamW
moments inherit the param shardings (zeros_like / tree-map preserve
committed shardings), so GSPMD inserts the gradient all-reduces.

Timestep convention matches inference: model-facing t is the 0-based
discrete index (pipeline's ``plan.model_t`` = (t - 1/N)*1000 = i), so a
fine-tuned checkpoint drops straight into the samplers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from sdtpu.config import PipelineConfig
from sdtpu.models import clip, temb, unet
from sdtpu.samplers.schedule import NoiseSchedule


class TrainState(NamedTuple):
    """UNet params + optimizer state. CLIP/temb (frozen) ride separately.
    ``ema`` is an exponential moving average of the params (the weights SD
    releases actually ship), or None — the two pytree structures compile
    as distinct jit variants."""

    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray
    ema: dict | None = None


def make_optimizer(
    lr: float = 1e-5,
    weight_decay: float = 1e-2,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping — the SD fine-tuning default."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(unet_params, optimizer,
                     ema: bool = False) -> TrainState:
    """Build a TrainState; if `unet_params` are committed sharded arrays,
    the AdamW moments (and EMA copy) inherit their shardings."""
    return TrainState(
        params=unet_params,
        opt_state=optimizer.init(unet_params),
        step=jnp.zeros((), jnp.int32),
        ema=jax.tree.map(jnp.copy, unet_params) if ema else None,
    )


def ldm_loss(unet_params, frozen, batch, key, cfg: PipelineConfig,
             kernels: str = "xla", remat: bool = False,
             objective: str = "auto", snr_gamma: float = 0.0,
             noise_offset: float = 0.0):
    """batch: ``tokens`` [B,T] int32 plus either ``latents`` [B,h,w,4]
    clean UNSCALED VAE latents (the posterior sample; scale-factor applied
    here) or ``images`` [B,H,W,3] float in [-1,1] — the images path runs
    the frozen VAE encoder ON DEVICE inside this (jitted) loss and samples
    its posterior, so `sdtpu train --data <image folder>` needs no
    preprocessing pass (requires ``vae_enc`` in `frozen`).

    ``unet_params`` should be float32 MASTER weights: the forward/backward
    runs in ``cfg.compute_dtype`` via the cast below (standard mixed
    precision — grads flow back through the cast as float32), while the
    optimizer update and EMA stay in float32. Training bf16 params directly
    silently loses lr-scale updates (below the bf16 ulp of typical weights)
    and freezes the EMA (0.9999 rounds to 1.0 in bf16).

    ``objective``: "eps" (SD1.x noise regression), "v" (Salimans &
    Ho 2022 v-prediction, the SD2.x-768 target: v = a*eps - s*x0), or
    "auto" — follow ``cfg.prediction`` so fine-tuning a v-model keeps
    its released objective and the checkpoint drops into the v-pred
    samplers unchanged.

    ``snr_gamma`` > 0 enables min-SNR loss weighting (Hang et al. 2023,
    arXiv:2303.09556): per-sample weight min(SNR,gamma)/SNR for eps and
    min(SNR,gamma)/(SNR+1) for v — down-weights the near-noiseless
    timesteps that otherwise dominate gradient variance (gamma=5 is the
    paper's default).

    ``noise_offset`` > 0 adds a per-(sample,channel) constant shift to
    eps (Guttenberg 2023 "offset noise", the community recipe for
    full-brightness-range fine-tunes): eps += offset * N(0,1)[b,1,1,c].
    The shifted eps is used both to forward-diffuse x_t and as the
    regression target, matching the diffusers trainer semantics. The
    offset key is derived by fold_in only when enabled, so runs with
    noise_offset=0 reproduce the historical 3-way RNG stream."""
    from sdtpu.io.params import cast_params
    sched = NoiseSchedule.sd_v1()
    abar = jnp.asarray(sched.alphas_cumprod, jnp.float32)
    n_train = sched.num_train_steps

    if objective == "auto":
        objective = cfg.prediction
    assert objective in ("eps", "v"), objective

    b = batch["tokens"].shape[0]
    kt, ke, kp = jax.random.split(key, 3)
    if "latents" in batch:
        latents = batch["latents"].astype(jnp.float32)
    else:
        from sdtpu.models import vae as vae_mod

        mean, logvar = vae_mod.apply_encoder(
            frozen["vae_enc"], batch["images"].astype(cfg.compute_dtype),
            cfg.vae, kernels)
        latents = (mean.astype(jnp.float32)
                   + jnp.exp(0.5 * logvar.astype(jnp.float32))
                   * jax.random.normal(kp, mean.shape, jnp.float32))
    t_idx = jax.random.randint(kt, (b,), 0, n_train)
    eps = jax.random.normal(ke, latents.shape, jnp.float32)
    if noise_offset:
        ko = jax.random.fold_in(key, 1)
        eps = eps + noise_offset * jax.random.normal(
            ko, (b, 1, 1, latents.shape[-1]), jnp.float32)

    x0 = latents * cfg.vae.scale_factor
    a = jnp.sqrt(abar[t_idx])[:, None, None, None]
    s = jnp.sqrt(1.0 - abar[t_idx])[:, None, None, None]
    x_t = a * x0 + s * eps
    target = eps if objective == "eps" else a * eps - s * x0

    if cfg.clip2 is None:
        ctx = clip.apply(frozen["clip"], batch["tokens"], cfg.clip,
                         dtype=cfg.compute_dtype)
        pooled = None
    else:
        # SDXL: dual-tower packed conditioning (engine.pipeline convention)
        from sdtpu.engine import pipeline as pl

        packed = pl.encode_text(frozen, batch["tokens"], cfg)
        ctx, pooled = pl._unpack_context(packed, cfg)
    te = temb.apply(frozen["temb"], t_idx.astype(jnp.float32), cfg.unet,
                    dtype=cfg.compute_dtype)
    if pooled is not None:
        from sdtpu.engine import pipeline as pl

        te = te + pl._add_embedding(frozen, pooled, cfg).astype(te.dtype)

    apply = unet.apply
    if remat:
        # trade FLOPs for memory on long batches: recompute UNet
        # activations in the backward pass
        apply = jax.checkpoint(unet.apply, static_argnums=(4, 5))
    compute_params = cast_params(unet_params, cfg.compute_dtype)
    pred = apply(compute_params, x_t.astype(cfg.compute_dtype), te, ctx,
                 cfg.unet, kernels)
    err = jnp.square(pred.astype(jnp.float32) - target)
    if snr_gamma > 0.0:
        snr = abar[t_idx] / (1.0 - abar[t_idx])
        w = (jnp.minimum(snr, snr_gamma)
             / (snr + (1.0 if objective == "v" else 0.0)))
        return jnp.mean(w * jnp.mean(err, axis=(1, 2, 3)))
    return jnp.mean(err)


def train_step(state: TrainState, frozen, batch, key, cfg: PipelineConfig,
               optimizer, kernels: str = "xla", remat: bool = False,
               ema_decay: float = 0.9999, objective: str = "auto",
               snr_gamma: float = 0.0, noise_offset: float = 0.0):
    """One optimizer step; returns (new_state, metrics)."""
    loss, grads = jax.value_and_grad(ldm_loss)(
        state.params, frozen, batch, key, cfg, kernels, remat,
        objective, snr_gamma, noise_offset)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    ema = state.ema
    if ema is not None:
        ema = jax.tree.map(
            lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
            ema, params)
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    return TrainState(params, opt_state, state.step + 1, ema), metrics


def save_train_state(state: TrainState, path) -> None:
    """Orbax checkpoint of the full training state (params, AdamW moments,
    step, EMA) — the resume artifact (SURVEY §5.4: checkpoint/resume is a
    first-class auxiliary subsystem). Saved as a dict so the restore
    template is structure-stable across TrainState field evolution."""
    import orbax.checkpoint as ocp
    from pathlib import Path

    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    if state.ema is not None:
        tree["ema"] = state.ema
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), tree)
        ckptr.wait_until_finished()


def load_train_state(path, like: TrainState) -> TrainState:
    """Restore a TrainState. ``like`` supplies structure, shapes, dtypes
    AND shardings (pass a freshly built `init_train_state` over params
    placed on the target mesh — each restored leaf lands directly on its
    devices, no host full-copy)."""
    import orbax.checkpoint as ocp
    from pathlib import Path

    def absify(x):
        sh = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    tmpl = {"params": jax.tree.map(absify, like.params),
            "opt_state": jax.tree.map(absify, like.opt_state),
            "step": absify(like.step)}
    if like.ema is not None:
        tmpl["ema"] = jax.tree.map(absify, like.ema)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(Path(path).resolve(), tmpl)
    return TrainState(tree["params"], tree["opt_state"], tree["step"],
                      tree.get("ema"))


def jit_train_step(cfg: PipelineConfig, optimizer, kernels: str = "xla",
                   remat: bool = False, donate: bool = True,
                   objective: str = "auto", snr_gamma: float = 0.0,
                   noise_offset: float = 0.0):
    """Compiled train step. Single-chip or multi-chip is decided by where
    the operands live: pass a state whose params were placed with
    `parallel.sharding.shard_params` and a batch placed with
    ``NamedSharding(mesh, P("data", ...))`` and GSPMD shards the step over
    the mesh (data-parallel batch, Megatron-pair TP on the UNet matmuls,
    psum'd gradients); uncommitted arrays give the plain single-device jit.
    """
    import functools

    fn = functools.partial(train_step, cfg=cfg, optimizer=optimizer,
                           kernels=kernels, remat=remat,
                           objective=objective, snr_gamma=snr_gamma,
                           noise_offset=noise_offset)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())

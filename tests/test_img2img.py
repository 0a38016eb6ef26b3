"""img2img tests (capability extension: VAE encoder + partial denoise)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY
from sdtpu.engine.errors import ErrorCode, SdtpuError
from sdtpu.models import vae


@pytest.fixture(scope="module")
def ctx():
    return sdtpu.Context(config="tiny", steps=6)


@pytest.fixture(scope="module")
def init_image(ctx):
    # a structured image: horizontal gradient
    size = ctx.cfg.image_size
    row = np.linspace(0, 255, size, dtype=np.uint8)
    return np.broadcast_to(row[None, :, None], (size, size, 3)).copy()


def test_encoder_shapes():
    cfg = TINY.vae
    p = vae.init_encoder(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((2, TINY.image_size, TINY.image_size, 3))
    mean, logvar = vae.apply_encoder(p, img, cfg)
    s = TINY.latent_size
    assert mean.shape == (2, s, s, cfg.z_channels)
    assert logvar.shape == (2, s, s, cfg.z_channels)


def test_img2img_deterministic_and_strength(ctx, init_image):
    a1 = ctx.img2img("the horse", init_image, strength=0.5, seed=3)
    a2 = ctx.img2img("the horse", init_image, strength=0.5, seed=3)
    assert np.array_equal(a1, a2)
    size = ctx.cfg.image_size
    assert a1.shape == (size, size, 3) and a1.dtype == np.uint8

    # lower strength stays closer to the input's direct reconstruction
    # (with random demo weights "close to the input image" is meaningless —
    # the encoder/decoder aren't inverses; decode(encode(img)) is the
    # correct anchor)
    from sdtpu.engine.pipeline import decode_latents

    x = jnp.asarray(init_image[None], jnp.float32) / 127.5 - 1.0
    mean, _ = vae.apply_encoder(ctx.params["vae_enc"], x, ctx.cfg.vae)
    recon = np.asarray(decode_latents(
        ctx.params, mean.astype(jnp.float32) * ctx.cfg.vae.scale_factor,
        ctx.cfg))[0]
    lo = ctx.img2img("the horse", init_image, strength=0.2, seed=3)
    hi = ctx.img2img("the horse", init_image, strength=1.0, seed=3)
    d_lo = np.mean(np.abs(lo.astype(int) - recon.astype(int)))
    d_hi = np.mean(np.abs(hi.astype(int) - recon.astype(int)))
    assert d_lo < d_hi, (d_lo, d_hi)


def test_img2img_full_strength_close_to_txt2img(ctx, init_image):
    """strength=1.0 starts from (almost) pure noise: the init image's
    contribution is down-weighted by alpha(t~1) ~ 0.068."""
    img = ctx.img2img("the horse", init_image, strength=1.0, seed=9)
    txt = ctx.generate("the horse", seed=9)
    assert img.shape == txt.shape


def test_inpaint_pins_kept_latents_exactly(ctx, init_image):
    """After the scan, mask=0 latents are replaced with the clean encoding
    EXACTLY (final blend), mask=1 latents are freely denoised — verify at
    the latent level where the guarantee is bitwise."""
    from sdtpu.engine.pipeline import (_build_context, _encode_init_latents,
                                       denoise)

    cfg = ctx.cfg
    s = cfg.latent_size
    x_img = jnp.asarray(init_image[None], jnp.float32) / 127.5 - 1.0
    z0 = _encode_init_latents(ctx.params, x_img, cfg, ctx.kernels)
    m = np.zeros((1, s, s, 1), np.float32)
    m[:, :, s // 2:] = 1.0  # repaint the right half
    tokens = jnp.asarray(
        [ctx.tokenizer.tokenize("the horse", cfg.clip.context_len)], jnp.int32)
    context = _build_context(ctx.params, tokens, ctx._uncond, cfg, True)
    x = np.asarray(denoise(
        ctx.params, context, jax.random.PRNGKey(5), jnp.float32(7.5), cfg,
        ctx.sampler, ctx.steps, True, ctx.kernels,
        init_latents=z0, start_step=0, mask=jnp.asarray(m),
    ))
    z0 = np.asarray(z0)
    np.testing.assert_array_equal(x[:, :, : s // 2], z0[:, :, : s // 2])
    assert np.abs(x[:, :, s // 2:] - z0[:, :, s // 2:]).max() > 1e-3


def test_inpaint_smoke(ctx, init_image):
    size = ctx.cfg.image_size
    mask = np.zeros((size, size), np.uint8)
    mask[:, size // 2:] = 255
    a = ctx.inpaint("the horse", init_image, mask, seed=5)
    b = ctx.inpaint("the horse", init_image, mask, seed=5)
    assert np.array_equal(a, b)
    assert a.shape == (size, size, 3) and a.dtype == np.uint8


def test_inpaint_full_mask_matches_img2img(ctx, init_image):
    """mask=1 everywhere makes every blend a no-op: inpaint must equal
    img2img bit-for-bit at the same strength/seed."""
    size = ctx.cfg.image_size
    mask = np.full((size, size), 255, np.uint8)
    a = ctx.inpaint("the horse", init_image, mask, strength=0.5, seed=7)
    b = ctx.img2img("the horse", init_image, strength=0.5, seed=7)
    assert np.array_equal(a, b)


def test_inpaint_validation(ctx, init_image):
    size = ctx.cfg.image_size
    with pytest.raises(SdtpuError) as ei:
        ctx.inpaint("x", init_image, np.zeros((size // 2, size), np.uint8))
    assert ei.value.code == ErrorCode.INVALID_ARGUMENT


def test_img2img_validation(ctx, init_image):
    with pytest.raises(SdtpuError) as ei:
        ctx.img2img("x", init_image, strength=0.0)
    assert ei.value.code == ErrorCode.INVALID_ARGUMENT
    with pytest.raises(SdtpuError):
        ctx.img2img("x", init_image[:8, :8])  # wrong size
    with pytest.raises(SdtpuError):
        ctx.img2img("x", init_image.astype(np.float32))  # wrong dtype


def test_img2img_first_warm_step_is_first_order(ctx, init_image, monkeypatch):
    """The denoise scan must build the sampler plan with the warm-start
    step, so the first executed update is 1st order (ADVICE r1 high). A spy
    sampler captures the plan actually used and the per-step states; we
    assert the wiring AND that the first executed step's output is invariant
    to the (zero-initialised) history buffer."""
    from sdtpu import samplers
    from sdtpu.samplers import dpm as dpm_mod

    seen = {}

    class Spy:
        @staticmethod
        def plan(sched, steps, start_step=0):
            seen["start_step"] = start_step
            return dpm_mod.plan(sched, steps, start_step=start_step)

        init_state = staticmethod(dpm_mod.init_state)
        step = staticmethod(dpm_mod.step)

    monkeypatch.setitem(samplers.SAMPLERS, "spy", Spy)
    old_sampler = ctx.sampler
    ctx.sampler = "spy"
    try:
        ctx.img2img("the horse", init_image, strength=0.5, seed=3)
    finally:
        ctx.sampler = old_sampler
    ss = int(round(ctx.steps * 0.5))
    assert seen["start_step"] == ss
    # the plan actually used zeroes the 2nd-order mix-in at the first
    # executed step (recompute outside the trace — identical construction)
    from sdtpu.samplers import NoiseSchedule

    i2r = np.asarray(dpm_mod.plan(NoiseSchedule.sd_v1(), ctx.steps,
                                  start_step=ss).i2r)
    assert i2r[ss] == 0.0 and (ss + 1 >= ctx.steps or i2r[ss + 1] > 0.0)


def test_img2img_batch_of_1_bit_identical_to_single(ctx, init_image):
    """Cross-path determinism pin (VERDICT r2 weak #6): a request moved
    between Context.img2img and Context.img2img_batch must keep its exact
    latent stream — the per-sample fold_in streams (VAE posterior draw,
    pipeline._POSTERIOR_FOLD) may only depend on the request key, never on
    the batching path."""
    single = ctx.img2img("the horse", init_image, strength=0.5, seed=7,
                         guidance=7.5)
    batched = ctx.img2img_batch(
        [{"prompt": "the horse", "seed": 7, "guidance": 7.5,
          "image": init_image}], strength=0.5)[0]
    assert np.array_equal(single, batched)


def test_inpaint_batched_key_stream_matches_single(ctx, init_image):
    """Same pin for the inpaint pin-noise stream (pipeline.py denoise body
    fold_in(key, i+1)): the batched per-sample-keys path (keys [B, 2]) at
    B=1 must be bit-identical to the single-key path."""
    from sdtpu.engine import pipeline as pl

    cfg = ctx.cfg
    size = cfg.image_size
    tokens = jnp.asarray(
        [ctx.tokenizer.tokenize("the horse", cfg.clip.context_len)],
        jnp.int32)
    uncond = ctx._uncond
    key = jax.random.PRNGKey(11)
    image = jnp.asarray(init_image[None], jnp.float32) / 127.5 - 1.0
    mask = np.zeros((1, size, size, 1), np.float32)
    mask[:, : size // 2] = 1.0
    mask = jnp.asarray(mask)

    kw = dict(cfg=cfg, sampler="dpm", steps=6, start_step=0, use_cfg=True,
              kernels="xla")
    single = np.asarray(pl.inpaint(
        ctx.params, tokens, uncond, key, jnp.float32(7.5), image, mask, **kw))
    batched = np.asarray(pl.inpaint(
        ctx.params, tokens, uncond, key[None], jnp.asarray([7.5], jnp.float32),
        image, mask, **kw))
    assert np.array_equal(single, batched)


def test_inpaint_batch_api_matches_single(ctx, init_image):
    """Context.inpaint_batch (the HTTP micro-batcher's inpaint path):
    batch-of-1 bit-identical to Context.inpaint, per-sample masks act, and
    the dedicated 9-ch config serves through the same API."""
    import sdtpu

    size = ctx.cfg.image_size
    mask = np.zeros((size, size), np.uint8)
    mask[: size // 2] = 255
    single = ctx.inpaint("the horse", init_image, mask, strength=1.0,
                         seed=9, guidance=7.5)
    batched = ctx.inpaint_batch(
        [{"prompt": "the horse", "image": init_image, "mask": mask,
          "seed": 9, "guidance": 7.5}], strength=1.0)[0]
    assert np.array_equal(single, batched)

    # two different masks in one batch produce different images
    m2 = 255 - mask
    outs = ctx.inpaint_batch(
        [{"prompt": "the horse", "image": init_image, "mask": mask,
          "seed": 9},
         {"prompt": "the horse", "image": init_image, "mask": m2,
          "seed": 9}])
    assert not np.array_equal(outs[0], outs[1])

    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=3)
    s9 = ctx9.inpaint("the horse", init_image, mask, seed=4)
    b9 = ctx9.inpaint_batch(
        [{"prompt": "the horse", "image": init_image, "mask": mask,
          "seed": 4, "guidance": 7.5}])[0]
    assert np.array_equal(s9, b9)

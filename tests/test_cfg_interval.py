"""Guidance-interval optimization (Context(cfg_interval=(lo, hi))): CFG —
and its uncond UNet eval — only on the middle fraction of the trajectory
(Kynkäänniemi et al. 2024; the phase-aware idea in SD-Acc). Outside the
interval the scan body runs the cond slot only, so each excluded step
costs half a CFG step."""

import jax
import numpy as np
import pytest

import sdtpu
from sdtpu.engine.errors import SdtpuError


def test_full_interval_is_bit_identical_to_default():
    a = sdtpu.Context(config="tiny", steps=4).generate("the horse", seed=3)
    b = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.0, 1.0)
                      ).generate("the horse", seed=3)
    np.testing.assert_array_equal(a, b)


def test_interval_acts_and_is_deterministic():
    ctx = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.25, 0.75))
    a = ctx.generate("the horse", seed=3)
    b = ctx.generate("the horse", seed=3)
    np.testing.assert_array_equal(a, b)
    full = sdtpu.Context(config="tiny", steps=4).generate("the horse",
                                                          seed=3)
    assert not np.array_equal(a, full)
    # guidance == 1 never runs CFG, so the interval is a no-op there
    g1 = ctx.generate("the horse", seed=3, guidance=1.0)
    g1_full = sdtpu.Context(config="tiny", steps=4).generate(
        "the horse", seed=3, guidance=1.0)
    np.testing.assert_array_equal(g1, g1_full)


def test_interval_skips_the_uncond_eval():
    """Eager-mode eval-shape census: with interval (0.5, 1.0) at 4 steps,
    two steps must run the UNet at batch B (cond only) and two at 2B."""
    from sdtpu.engine import pipeline as pl
    from sdtpu.models import unet as unet_mod

    ctx = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.5, 1.0))
    toks = __import__("jax").numpy.asarray(
        [ctx.tokenizer.tokenize("the horse", ctx.cfg.clip.context_len)])
    seen = []
    orig = unet_mod.apply

    def spy(params, x, *a, **kw):
        seen.append(int(x.shape[0]))
        return orig(params, x, *a, **kw)

    unet_mod.apply = spy
    try:
        with jax.disable_jit():
            pl.generate(ctx.params, toks, ctx._uncond,
                        jax.random.PRNGKey(0), 7.5, cfg=ctx.cfg,
                        sampler="dpm", steps=4, use_cfg=True, kernels="xla",
                        cfg_interval=(0.5, 1.0))
    finally:
        unet_mod.apply = orig
    assert sorted(seen) == [1, 1, 2, 2], seen


def test_interval_through_batched_and_img2img_paths():
    ctx = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.25, 1.0))
    single = ctx.generate("the horse", seed=7)
    bat = ctx.generate_batch([{"prompt": "the horse", "seed": 7,
                               "guidance": 7.5}])
    np.testing.assert_array_equal(single, bat[0])

    size = ctx.cfg.image_size
    img = np.random.default_rng(0).integers(0, 256, (size, size, 3)
                                            ).astype(np.uint8)
    # strength 0.5 starts at step 2, so the exclusion zone must reach past
    # it ((0.25, 1.0) would exclude only never-executed steps — a no-op)
    ctx_hi = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.75, 1.0))
    a = ctx_hi.img2img("a photograph", img, strength=0.5, seed=1)
    b = ctx_hi.img2img("a photograph", img, strength=0.5, seed=1)
    np.testing.assert_array_equal(a, b)
    full = sdtpu.Context(config="tiny", steps=4).img2img(
        "a photograph", img, strength=0.5, seed=1)
    assert not np.array_equal(a, full)


def test_interval_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.25, 0.75))
    ctx8 = sdtpu.Context(config="tiny", steps=4, cfg_interval=(0.25, 0.75),
                         mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, seed=5)
    b = ctx8.generate(prompts, seed=5)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_interval_validation():
    for bad in ((0.5, 0.5), (-0.1, 0.5), (0.2, 1.2), (0.9, 0.1)):
        with pytest.raises(SdtpuError):
            sdtpu.Context(config="tiny", steps=2, cfg_interval=bad)


def test_interval_with_stochastic_sampler_keeps_noise_protocol():
    """The per-step ancestral noise folds by step INDEX, so splitting the
    scan into segments must not change which draw step i consumes:
    interval (0,1) with euler_a stays bit-identical to the default."""
    a = sdtpu.Context(config="tiny", steps=5, sampler="euler_a",
                      cfg_interval=(0.0, 1.0)).generate("the horse", seed=2)
    b = sdtpu.Context(config="tiny", steps=5, sampler="euler_a"
                      ).generate("the horse", seed=2)
    np.testing.assert_array_equal(a, b)

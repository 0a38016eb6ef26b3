"""A1111-style two-pass hires fix (Context.hires_fix): base-resolution
generate -> nearest latent upscale -> high-res partial denoise -> decode,
one fully-convolutional param tree serving both passes."""

import numpy as np
import pytest

import sdtpu
from sdtpu.engine.errors import SdtpuError


def test_hires_fix_shapes_and_determinism():
    ctx = sdtpu.Context(config="tiny", steps=4)
    size = ctx.cfg.image_size
    a = ctx.hires_fix("the horse", scale=2, strength=0.5, seed=9)
    assert a.shape == (2 * size, 2 * size, 3) and a.dtype == np.uint8
    b = ctx.hires_fix("the horse", scale=2, strength=0.5, seed=9)
    np.testing.assert_array_equal(a, b)
    c = ctx.hires_fix("the horse", scale=2, strength=0.5, seed=10)
    assert not np.array_equal(a, c)
    # batch form
    out = ctx.hires_fix(["the horse", "a photograph"], scale=2, seed=1)
    assert out.shape == (2, 2 * size, 2 * size, 3)


def test_hires_second_pass_stays_anchored_to_base():
    """At low strength the hires image must track the base image (the
    second pass only refines); across different seeds the base images
    differ, so the hires outputs must differ the same way."""
    ctx = sdtpu.Context(config="tiny", steps=4)
    size = ctx.cfg.image_size
    base = ctx.generate("the horse", seed=3)
    hi = ctx.hires_fix("the horse", scale=2, strength=0.25, seed=3)
    # compare against the nearest-upsampled base image: a weak-but-real
    # anchor — at strength .25 the hires pass keeps most base structure,
    # so correlation must beat an unrelated-seed control by a margin
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1).astype(np.float32)
    other = ctx.hires_fix("the horse", scale=2, strength=0.25, seed=4)

    def corr(x, y):
        x = x.astype(np.float32).ravel() - x.mean()
        y = y.astype(np.float32).ravel() - y.mean()
        return float((x * y).sum() / (np.linalg.norm(x) *
                                      np.linalg.norm(y) + 1e-9))

    assert corr(hi, up) > corr(other, up) + 0.1


def test_hires_weighted_prompt_and_validation():
    ctx = sdtpu.Context(config="tiny", steps=3)
    size = ctx.cfg.image_size
    a = ctx.hires_fix("the horse rides a (photograph:1.3)", scale=2, seed=5)
    assert a.shape == (2 * size, 2 * size, 3)
    with pytest.raises(SdtpuError):
        ctx.hires_fix("x", scale=1)
    with pytest.raises(SdtpuError):
        ctx.hires_fix("x", strength=1.0)
    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=2)
    with pytest.raises(SdtpuError):
        ctx9.hires_fix("x")


def test_hires_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    a = ctx1.hires_fix(prompts, scale=2, seed=6)
    b = ctx8.hires_fix(prompts, scale=2, seed=6)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

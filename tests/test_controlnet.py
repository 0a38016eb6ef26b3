"""ControlNet tests: structural parity with the UNet encoder, the zero-init
no-op invariant (the paper's training trick — and our correctness anchor),
scale gating, LDM checkpoint round-trip, and e2e generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY
from sdtpu.models import controlnet as cn_mod
from sdtpu.models import temb as temb_mod
from sdtpu.models import unet as unet_mod


def _n_skips(u):
    n = 1  # conv_in
    n += len(u.channel_mult) * u.num_res_blocks
    n += len(u.channel_mult) - 1  # downsamples
    return n


@pytest.fixture(scope="module")
def cn_zero():
    return cn_mod.init(jax.random.PRNGKey(0), TINY.unet, zero_init_outs=True)


@pytest.fixture(scope="module")
def cn_rand():
    return cn_mod.init(jax.random.PRNGKey(1), TINY.unet, zero_init_outs=False)


def _cn_eval(cn, b=2):
    u = TINY.unet
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (b, TINY.latent_size, TINY.latent_size,
                           u.in_channels), jnp.float32)
    hint = jax.random.uniform(jax.random.PRNGKey(3),
                              (b, TINY.image_size, TINY.image_size, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(4),
                            (b, TINY.clip.context_len, u.context_dim))
    te = temb_mod.apply(temb_mod.init(jax.random.PRNGKey(5), u),
                        jnp.full((b,), 500.0), u)
    hint_feat = cn_mod.embed_hint(cn, hint, TINY.upscale)
    return x, te, ctx, cn_mod.apply(cn, x, hint_feat, te, ctx, u)


def test_residual_count_and_shapes(cn_rand):
    u = TINY.unet
    x, te, ctx, (down, mid_r) = _cn_eval(cn_rand)
    assert len(down) == _n_skips(u)
    # first residual is on the conv_in grid at model_channels
    assert down[0].shape == (2, TINY.latent_size, TINY.latent_size,
                             u.model_channels)
    # mid residual is on the deepest grid at the widest channel count
    deep = TINY.latent_size // (2 ** (len(u.channel_mult) - 1))
    assert mid_r.shape == (2, deep, deep,
                           u.model_channels * u.channel_mult[-1])


def test_zero_init_controlnet_is_identity_on_unet(cn_zero):
    """All zero convs zero-initialized => every residual is exactly 0 and
    the controlled UNet output equals the base output bit-for-bit."""
    u = TINY.unet
    x, te, ctx, (down, mid_r) = _cn_eval(cn_zero)
    for r in down:
        assert np.abs(np.asarray(r)).max() == 0.0
    assert np.abs(np.asarray(mid_r)).max() == 0.0

    up = unet_mod.init(jax.random.PRNGKey(6), u, zero_init_outs=False)
    base = unet_mod.apply(up, x, te, ctx, u)
    ctl = unet_mod.apply(up, x, te, ctx, u, control=(down, mid_r))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ctl))


def test_control_residual_count_mismatch_raises(cn_rand):
    u = TINY.unet
    x, te, ctx, (down, mid_r) = _cn_eval(cn_rand)
    up = unet_mod.init(jax.random.PRNGKey(6), u, zero_init_outs=False)
    with pytest.raises(ValueError, match="residual count"):
        unet_mod.apply(up, x, te, ctx, u, control=(down[:-1], mid_r))


def test_hint_strides():
    assert cn_mod._hint_strides(8) == (1, 1, 2, 1, 2, 1, 2)
    assert cn_mod._hint_strides(4) == (1, 1, 1, 1, 2, 1, 2)
    assert cn_mod._hint_strides(2) == (1, 1, 1, 1, 1, 1, 2)
    assert cn_mod._hint_strides(1) == (1, 1, 1, 1, 1, 1, 1)
    with pytest.raises(ValueError):
        cn_mod._hint_strides(3)


def test_ldm_round_trip(cn_rand):
    """init -> export to control_model.* keys -> re-import: identical trees
    (pins controlnet_rules to the init layout, both directions)."""
    from sdtpu.io.weights import controlnet_to_ldm, load_controlnet_state_dict

    ldm = controlnet_to_ldm(cn_rand, TINY)
    assert all(k.startswith("control_model.") for k in ldm)
    assert "control_model.input_hint_block.0.weight" in ldm
    assert "control_model.middle_block_out.0.weight" in ldm
    back = load_controlnet_state_dict(ldm, TINY, strict=True)

    leaves_a, tdef_a = jax.tree_util.tree_flatten(cn_rand)
    leaves_b, tdef_b = jax.tree_util.tree_flatten(back)
    assert tdef_a == tdef_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_e2e_zero_cn_matches_base_and_scale_gates():
    ctx = sdtpu.Context(config="tiny", steps=3)
    size = ctx.cfg.image_size
    hint = (np.linspace(0, 255, size * size * 3).reshape(size, size, 3)
            .astype(np.uint8))

    base = ctx.generate("the horse", seed=11)

    cn_zero = cn_mod.init(jax.random.PRNGKey(0), ctx.cfg.unet,
                          zero_init_outs=True)
    ctx.load_controlnet("zero", cn_zero)
    a = ctx.generate("the horse", seed=11, control_image=hint, control="zero")
    # zero-init CN: exact no-op modulo uint8 rounding of fp reassociation
    assert np.mean(base == a) > 0.999
    assert np.abs(base.astype(int) - a.astype(int)).max() <= 1

    cn_rand = cn_mod.init(jax.random.PRNGKey(1), ctx.cfg.unet,
                          zero_init_outs=False)
    ctx.load_controlnet("rand", cn_rand)
    b = ctx.generate("the horse", seed=11, control_image=hint, control="rand")
    assert not np.array_equal(base, b)  # the control path acts

    c = ctx.generate("the horse", seed=11, control_image=hint, control="rand",
                     control_scale=0.0)
    # scale 0 gates the residuals off again
    assert np.mean(base == c) > 0.999

    # determinism with control
    b2 = ctx.generate("the horse", seed=11, control_image=hint,
                      control="rand")
    np.testing.assert_array_equal(b, b2)


def test_e2e_checkpoint_file_and_errors(tmp_path):
    import safetensors.numpy as st

    from sdtpu.io.weights import controlnet_to_ldm

    ctx = sdtpu.Context(config="tiny", steps=2)
    cn = cn_mod.init(jax.random.PRNGKey(1), ctx.cfg.unet,
                     zero_init_outs=False)
    path = tmp_path / "cn.safetensors"
    st.save_file({k: np.asarray(v, np.float32)
                  for k, v in controlnet_to_ldm(cn, ctx.cfg).items()},
                 str(path))
    ctx.load_controlnet("file", path)
    assert ctx.controlnet_names() == ["file"]

    size = ctx.cfg.image_size
    hint = np.zeros((size, size, 3), np.uint8)
    img = ctx.generate("the horse", seed=1, control_image=hint)
    assert img.shape == (size, size, 3)

    from sdtpu.engine.errors import SdtpuError

    with pytest.raises(SdtpuError):  # control= without image
        ctx.generate("x", control="file")
    with pytest.raises(SdtpuError):  # unknown adapter
        ctx.generate("x", control_image=hint, control="nope")
    with pytest.raises(SdtpuError):  # wrong resolution
        ctx.generate("x", control_image=np.zeros((8, 8, 3), np.uint8))


def test_multi_controlnet_composition():
    """Two adapters compose by summed residuals (diffusers MultiControlNet):
    [A, zero-init B] must equal single-A bit-for-bit, per-adapter scales
    route independently ([A at s, B at 0] == [A at s]), and a real second
    adapter changes the image."""
    import sdtpu
    from sdtpu.models import controlnet as cn_mod

    ctx = sdtpu.Context(config="tiny", steps=3)
    size = ctx.cfg.image_size
    hint_a = (np.linspace(0, 255, size * size * 3)
              .reshape(size, size, 3).astype(np.uint8))
    hint_b = hint_a[::-1].copy()
    a = cn_mod.init(jax.random.PRNGKey(1), ctx.cfg.unet,
                    zero_init_outs=False)
    b_zero = cn_mod.init(jax.random.PRNGKey(2), ctx.cfg.unet)  # zero outs
    b_real = cn_mod.init(jax.random.PRNGKey(2), ctx.cfg.unet,
                         zero_init_outs=False)
    ctx.load_controlnet("a", a)
    ctx.load_controlnet("bz", b_zero)
    ctx.load_controlnet("br", b_real)

    single = ctx.generate("the horse", seed=6, control="a",
                          control_image=hint_a, control_scale=0.8)
    multi_zero = ctx.generate(
        "the horse", seed=6, control=["a", "bz"],
        control_image=[hint_a, hint_b], control_scale=[0.8, 1.0])
    np.testing.assert_array_equal(single, multi_zero)

    multi_scale0 = ctx.generate(
        "the horse", seed=6, control=["a", "br"],
        control_image=[hint_a, hint_b], control_scale=[0.8, 0.0])
    np.testing.assert_array_equal(single, multi_scale0)

    multi_real = ctx.generate(
        "the horse", seed=6, control=["a", "br"],
        control_image=[hint_a, hint_b], control_scale=[0.8, 0.7])
    assert not np.array_equal(single, multi_real)
    # deterministic
    again = ctx.generate(
        "the horse", seed=6, control=["a", "br"],
        control_image=[hint_a, hint_b], control_scale=[0.8, 0.7])
    np.testing.assert_array_equal(multi_real, again)


def test_multi_controlnet_on_mesh_matches_single_device():
    import sdtpu
    from sdtpu.models import controlnet as cn_mod

    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    size = ctx1.cfg.image_size
    hint_a = (np.linspace(0, 255, size * size * 3)
              .reshape(size, size, 3).astype(np.uint8))
    hint_b = hint_a[::-1].copy()
    a = cn_mod.init(jax.random.PRNGKey(1), ctx1.cfg.unet,
                    zero_init_outs=False)
    b = cn_mod.init(jax.random.PRNGKey(2), ctx1.cfg.unet,
                    zero_init_outs=False)
    for c in (ctx1, ctx8):
        c.load_controlnet("a", a)
        c.load_controlnet("b", b)
    prompts = ["the horse", "a photograph"]
    x = ctx1.generate(prompts, seed=3, control=["a", "b"],
                      control_image=[hint_a, hint_b],
                      control_scale=[0.7, 0.4])
    y = ctx8.generate(prompts, seed=3, control=["a", "b"],
                      control_image=[hint_a, hint_b],
                      control_scale=[0.7, 0.4])
    assert np.abs(x.astype(int) - y.astype(int)).max() <= 1

"""Concat-conditioned model families: 9-channel dedicated-inpaint UNets
(config SD15_INPAINT / SD21_INPAINT, the RunwayML sd-*-inpainting
convention) and 5-channel depth-conditioned UNets (config SD2_DEPTH,
stable-diffusion-2-depth).

Correctness oracle: a concat checkpoint whose conv_in taps for the extra
channels are ZERO must reproduce the plain model bit-for-bit (the extra
planes contribute exactly 0 to every conv_in dot product, and the noise/key
protocol is shared), so `inpaint` on a zeroed 9-ch config is compared
against `generate`, and `depth2img` on a zeroed 5-ch config against
`img2img`. Capability extension — the reference is txt2img-only."""

import copy

import jax
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY
from sdtpu.engine.errors import ErrorCode, SdtpuError


def _expand_conv_in(params, extra_channels: int):
    """Return a deep-copied param tree whose unet conv_in takes
    4+extra_channels inputs, the extra taps zeroed — the standard init for
    fine-tuning an inpaint/depth model from a txt2img checkpoint."""
    p = copy.deepcopy(jax.tree.map(np.asarray, params))
    w = np.asarray(p["unet"]["conv_in"]["w"])  # [3, 3, C_in, C_out]
    neww = np.zeros(w.shape[:2] + (w.shape[2] + extra_channels, w.shape[3]),
                    w.dtype)
    neww[:, :, : w.shape[2]] = w
    p["unet"]["conv_in"] = dict(p["unet"]["conv_in"], w=neww)
    return p


@pytest.fixture(scope="module")
def image():
    size = TINY.image_size
    return np.random.default_rng(7).integers(
        0, 256, (size, size, 3), dtype=np.uint8)


def test_inpaint_checkpoint_zero_taps_reproduces_generate(image):
    ctx4 = sdtpu.Context(config="tiny", steps=3)
    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=3)
    assert ctx9.cfg.unet.in_channels == 9
    ctx9.params = jax.tree.map(np.asarray, _expand_conv_in(ctx4.params, 5))

    size = ctx4.cfg.image_size
    mask = np.zeros((size, size), np.uint8)
    mask[: size // 2] = 255
    a = ctx4.generate("the horse", seed=11)
    b = ctx9.inpaint("the horse", image, mask, strength=1.0, seed=11)
    # identical noise protocol + zero extra taps => same trajectory; only
    # conv reduction-order ulps may flip a pixel on a .5 boundary
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_depth_checkpoint_zero_taps_reproduces_img2img(image):
    ctx4 = sdtpu.Context(config="tiny", steps=4)
    ctx5 = sdtpu.Context(config="tiny_depth", steps=4)
    assert ctx5.cfg.unet.in_channels == 5
    ctx5.params = jax.tree.map(np.asarray, _expand_conv_in(ctx4.params, 1))

    size = ctx4.cfg.image_size
    depth = np.linspace(0, 4000, size * size, dtype=np.float32).reshape(
        size, size)
    a = ctx4.img2img("a photograph", image, strength=0.5, seed=3)
    b = ctx5.depth2img("a photograph", image, depth, strength=0.5, seed=3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_inpaint_checkpoint_mask_and_masked_image_act(image):
    """With real (random) extra taps the mask/masked-image planes must
    influence the output, and the program stays deterministic per seed."""
    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=3)
    size = ctx9.cfg.image_size
    m1 = np.zeros((size, size), np.uint8)
    m1[: size // 2] = 255
    m2 = 255 - m1
    a = ctx9.inpaint("the horse", image, m1, seed=5)
    a2 = ctx9.inpaint("the horse", image, m1, seed=5)
    b = ctx9.inpaint("the horse", image, m2, seed=5)
    np.testing.assert_array_equal(a, a2)
    assert not np.array_equal(a, b)
    # strength < 1 warm-starts from the noised full-image latents
    c = ctx9.inpaint("the horse", image, m1, strength=0.7, seed=5)
    assert c.shape == a.shape and not np.array_equal(a, c)


def test_depth_plane_acts_and_is_scale_invariant(image):
    ctx5 = sdtpu.Context(config="tiny_depth", steps=3)
    size = ctx5.cfg.image_size
    d1 = np.linspace(0, 1, size * size, dtype=np.float32).reshape(size, size)
    d2 = d1[::-1].copy()
    a = ctx5.depth2img("a photograph", image, d1, seed=2)
    b = ctx5.depth2img("a photograph", image, d2, seed=2)
    assert not np.array_equal(a, b)
    # per-sample min/max normalization: any affine remap of the depth
    # values is the same conditioning
    a_scaled = ctx5.depth2img("a photograph", image, 3000.0 * d1 + 42.0,
                              seed=2)
    np.testing.assert_array_equal(a, a_scaled)


def test_batched_inpaint_and_depth(image):
    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=2)
    ctx5 = sdtpu.Context(config="tiny_depth", steps=2)
    size = ctx9.cfg.image_size
    imgs = np.stack([image, image[::-1]])
    masks = np.zeros((2, size, size), np.uint8)
    masks[:, ::2] = 255
    out = ctx9.inpaint(["the horse", "a photograph"], imgs, masks, seed=1)
    assert out.shape == (2, size, size, 3)
    depths = np.stack([
        np.linspace(0, 1, size * size, dtype=np.float32).reshape(size, size),
        np.linspace(1, 0, size * size, dtype=np.float32).reshape(size, size),
    ])
    out = ctx5.depth2img(["the horse", "a photograph"], imgs, depths, seed=1)
    assert out.shape == (2, size, size, 3)


def test_ip2p_zero_taps_reproduces_generate(image):
    """InstructPix2Pix dual-CFG collapse: with zero extra conv_in taps the
    image-only and unconditional slots coincide, so
    e_un + g*(e_txt - e_img) + gi*(e_img - e_un) == e_un + g*(e_txt - e_un)
    — plain CFG (up to FP association), regardless of image_guidance."""
    ctx4 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny_ip2p", steps=3)
    assert ctx8.cfg.unet.in_channels == 8
    ctx8.params = jax.tree.map(np.asarray, _expand_conv_in(ctx4.params, 4))
    a = ctx4.generate("the horse", seed=8, guidance=7.5)
    b = ctx8.instruct_pix2pix("the horse", image, guidance=7.5,
                              image_guidance=1.3, seed=8)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_ip2p_image_guidance_acts(image):
    ctx8 = sdtpu.Context(config="tiny_ip2p", steps=3)
    a = ctx8.instruct_pix2pix("make it winter", image, seed=6)
    a2 = ctx8.instruct_pix2pix("make it winter", image, seed=6)
    np.testing.assert_array_equal(a, a2)
    b = ctx8.instruct_pix2pix("make it winter", image, image_guidance=3.0,
                              seed=6)
    assert not np.array_equal(a, b)
    c = ctx8.instruct_pix2pix("make it winter", image[::-1].copy(), seed=6)
    assert not np.array_equal(a, c)


def test_concat_configs_reject_unconditioned_programs(image):
    ctx9 = sdtpu.Context(config="tiny_inpaint", steps=2)
    ctx5 = sdtpu.Context(config="tiny_depth", steps=2)
    ctx4 = sdtpu.Context(config="tiny", steps=2)
    size = ctx9.cfg.image_size
    depth = np.ones((size, size), np.float32)
    with pytest.raises(SdtpuError) as e:
        ctx9.generate("the horse")
    assert e.value.code == ErrorCode.INVALID_ARGUMENT
    with pytest.raises(SdtpuError):
        ctx9.img2img("the horse", image)
    with pytest.raises(SdtpuError):
        ctx9.generate_batch([{"prompt": "x"}])
    with pytest.raises(SdtpuError):
        ctx9.refine(np.zeros((8, 8, 4), np.float32), "x")
    with pytest.raises(SdtpuError):
        ctx5.inpaint("x", image, np.zeros((size, size), np.uint8))
    with pytest.raises(SdtpuError):
        ctx4.depth2img("x", image, depth)
    with pytest.raises(SdtpuError):
        ctx5.img2img_batch([{"prompt": "x", "image": image}])
    ctx8 = sdtpu.Context(config="tiny_ip2p", steps=2)
    with pytest.raises(SdtpuError):
        ctx8.generate("x")
    with pytest.raises(SdtpuError):
        ctx8.img2img("x", image)
    with pytest.raises(SdtpuError):
        ctx8.inpaint("x", image, np.zeros((size, size), np.uint8))
    with pytest.raises(SdtpuError):
        ctx4.instruct_pix2pix("x", image)


def test_inpaint_depth_weights_roundtrip():
    """LDM name mapping covers the widened conv_in on both concat configs."""
    from sdtpu.config import TINY_DEPTH, TINY_INPAINT, TINY_IP2P
    from sdtpu.io.params import init_pipeline_params
    from sdtpu.io.weights import load_ldm_state_dict, params_to_ldm

    for cfg in (TINY_INPAINT, TINY_DEPTH, TINY_IP2P):
        params = jax.tree.map(
            np.asarray,
            init_pipeline_params(jax.random.PRNGKey(5), cfg, demo=True))
        sd = params_to_ldm(params, cfg)
        w = sd["model.diffusion_model.input_blocks.0.0.weight"]
        assert w.shape == (cfg.unet.model_channels, cfg.unet.in_channels,
                           3, 3)
        back = load_ldm_state_dict(sd, cfg)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = {tuple(str(k) for k in p): v for p, v in
                  jax.tree_util.tree_flatten_with_path(back)[0]}
        assert len(flat_a) == len(flat_b)
        for path, arr in flat_a:
            np.testing.assert_array_equal(
                arr, flat_b[tuple(str(k) for k in path)], err_msg=str(path))


def test_sdxl_inpaint_config_e2e():
    """SDXL-inpainting (9-ch XL conv_in): Context.inpaint routes to the
    concat-conditioned program on the XL graph — packed dual-tower
    conditioning + mask/masked-latent planes compose."""
    import sdtpu

    ctx = sdtpu.Context(config="tiny_xl_inpaint", steps=2)
    size = ctx.cfg.image_size
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
    mask = np.zeros((size, size), np.uint8)
    mask[: size // 2] = 255
    out = ctx.inpaint("a harbor", image, mask, seed=1)
    assert out.shape == (size, size, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(
        out, ctx.inpaint("a harbor", image, mask, seed=1))
    assert not np.array_equal(out, ctx.inpaint("a harbor", image, mask,
                                               seed=2))
    from sdtpu.config import SDXL, SDXL_INPAINT

    assert SDXL_INPAINT.unet.in_channels == 9
    assert SDXL_INPAINT.clip2 is not None
    assert SDXL_INPAINT.unet.context_dim == SDXL.unet.context_dim

"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the TP/DP plan compiles + executes via GSPMD and matches the
single-device pipeline numerically (modulo reduction reordering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sdtpu.config import TINY
from sdtpu.engine.pipeline import generate, jit_generate
from sdtpu.io.params import init_pipeline_params
from sdtpu.parallel.mesh import make_mesh
from sdtpu.parallel.sharding import jit_generate_sharded, param_pspecs, shard_params


@pytest.fixture(scope="module")
def params():
    return init_pipeline_params(jax.random.PRNGKey(0), TINY)


def test_mesh_construction():
    m = make_mesh(data=2, model=4)
    assert m.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(data=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh(data=4, model=4)


def test_param_pspec_rules(params):
    specs = param_pspecs(params, model_size=4)
    blk = specs["clip"]["blocks"][0]
    assert blk["q"]["w"] == P(None, "model")
    assert blk["q"]["b"] == P("model")
    assert blk["out"]["w"] == P("model", None)
    assert blk["out"]["b"] == P()
    assert blk["fc1"]["w"] == P(None, "model")
    assert blk["fc2"]["w"] == P("model", None)
    # convs replicated
    assert specs["unet"]["conv_in"]["w"] == P()
    # UNet transformer matmuls sharded
    st = specs["unet"]["down"][0]["blocks"][0]["st"]
    assert st["attn1"]["q"]["w"] == P(None, "model")
    assert st["attn2"]["out"]["w"] == P("model", None)
    assert st["ff1"]["w"] == P(None, "model")
    assert st["ff2"]["w"] == P("model", None)


def test_indivisible_dims_stay_replicated(params):
    # model_size=7 divides none of TINY's dims -> everything replicated
    specs = param_pspecs(params, model_size=7)
    assert all(s == P() for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))


def test_sharded_generate_matches_single_device(params):
    """The full SPMD generate (2x4 mesh: DP over batch, TP over transformer
    matmuls) must reproduce the single-device images."""
    mesh = make_mesh(data=2, model=4)
    tokens = jnp.asarray(
        np.tile(np.arange(TINY.clip.context_len, dtype=np.int32), (2, 1))
    )
    tokens = tokens.at[1].set(tokens[1][::-1])
    uncond = jnp.zeros((TINY.clip.context_len, TINY.clip.hidden), jnp.float32)
    key = jax.random.PRNGKey(11)
    g = jnp.float32(7.5)

    single = jit_generate(TINY, "dpm", 3, True)(params, tokens, uncond, key, g)

    sp = shard_params(params, mesh)
    fn = jit_generate_sharded(TINY, mesh, "dpm", 3, True)(params)
    sharded = fn(sp, tokens, uncond, key, g)

    a = np.asarray(single, np.int32)
    b = np.asarray(sharded, np.int32)
    # uint8 after float reductions reordered across devices: allow +-1 LSB
    assert np.abs(a - b).max() <= 1, f"max LSB diff {np.abs(a-b).max()}"
    # and the sharded run actually used the mesh
    assert len(fn(sp, tokens, uncond, key, g).devices()) == 8


def test_context_with_mesh_matches_single_device():
    """Context(mesh=(2,4)): multi-chip serving through the same API — images
    match the single-device context to 1 uint8 LSB."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    assert len(jax.tree.leaves(ctx8.params)[3].devices()) == 8
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, guidance=7.5, seed=4)
    b = ctx8.generate(prompts, guidance=7.5, seed=4)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # indivisible batch -> clean error
    import pytest as _pytest

    from sdtpu.engine.errors import SdtpuError

    with _pytest.raises(SdtpuError):
        ctx8.generate(["one"], guidance=7.5, seed=0)


def test_generate_batch_on_mesh_matches_single_device():
    """The micro-batched serving path (per-sample keys/guidance/negatives)
    must route through the mesh and reproduce single-device images to 1 LSB
    (VERDICT r1 #4: generate_batch previously ignored self.mesh)."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    reqs = [
        {"prompt": "the horse", "seed": 1},
        {"prompt": "a photograph", "seed": 2, "guidance": 9.0},
        {"prompt": "the horse", "seed": 3,
         "negative_prompt": "a photograph"},
    ]
    a = ctx1.generate_batch(reqs)
    b = ctx8.generate_batch(reqs)
    for i, (x, y) in enumerate(zip(a, b)):
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1, f"req {i}"
    # the compiled batch program actually lives on the mesh
    fn = [v for k, v in ctx8._gen_cache.items()
          if k[:4] == ("batch", 4, 3, "dpm")]
    assert fn and fn[0] is not None


def test_img2img_and_inpaint_on_mesh_match_single_device():
    """img2img/inpaint must also route through the mesh (VERDICT r1 #4)."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny", steps=4)
    ctx8 = sdtpu.Context(config="tiny", steps=4, mesh=(2, 4))
    size = ctx1.cfg.image_size
    row = np.linspace(0, 255, size, dtype=np.uint8)
    img = np.broadcast_to(row[None, :, None], (size, size, 3)).copy()
    imgs = np.stack([img, img[::-1].copy()])

    a = ctx1.img2img(["the horse", "a photograph"], imgs, strength=0.5,
                     seed=3)
    b = ctx8.img2img(["the horse", "a photograph"], imgs, strength=0.5,
                     seed=3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    mask = np.zeros((2, size, size), np.uint8)
    mask[:, :, size // 2:] = 255
    c = ctx1.inpaint(["the horse", "a photograph"], imgs, mask, seed=5)
    d = ctx8.inpaint(["the horse", "a photograph"], imgs, mask, seed=5)
    assert np.abs(c.astype(int) - d.astype(int)).max() <= 1

    # indivisible batch -> clean typed error
    from sdtpu.engine.errors import SdtpuError

    with pytest.raises(SdtpuError):
        ctx8.img2img("one", img, strength=0.5, seed=0)


def test_spatial_sharding_matches_single_device(params):
    """spatial=True: conv activations W-sharded over the model axis (GSPMD
    halo exchange) — must still reproduce single-device images (the HLO
    evidence that convs actually shard lives in tools/analyze_tp_hlo.py and
    docs/PERF_NOTES.md)."""
    mesh = make_mesh(data=2, model=4)
    tokens = jnp.asarray(
        np.tile(np.arange(TINY.clip.context_len, dtype=np.int32), (2, 1)))
    uncond = jnp.zeros((TINY.clip.context_len, TINY.clip.hidden), jnp.float32)
    key = jax.random.PRNGKey(11)
    g = jnp.float32(7.5)

    single = jit_generate(TINY, "dpm", 3, True)(params, tokens, uncond, key, g)
    sp = shard_params(params, mesh)
    fn = jit_generate_sharded(TINY, mesh, "dpm", 3, True, spatial=True)(params)
    sharded = fn(sp, tokens, uncond, key, g)
    a = np.asarray(single, np.int32)
    b = np.asarray(sharded, np.int32)
    assert np.abs(a - b).max() <= 1, f"max LSB diff {np.abs(a-b).max()}"


def test_xl_context_with_mesh_matches_single_device():
    """SDXL topology on the (2,4) virtual mesh: the packed-conditioning
    row (pooled embedding as a trailing context row) must ride the
    data-sharded token axis untouched, and the name-based TP rules must
    shard the depth-nested XL transformer blocks — images match the
    single-device context to 1 uint8 LSB."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny_xl", steps=3)
    ctx8 = sdtpu.Context(config="tiny_xl", steps=3, mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, guidance=7.5, seed=4)
    b = ctx8.generate(prompts, guidance=7.5, seed=4)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # the XL nested-block kernels actually got a TP spec (not replicated)
    from sdtpu.parallel.sharding import param_pspecs

    specs = param_pspecs(ctx8.params, 4)
    l1 = specs["unet"]["down"][1]["blocks"][0]["st"]["blocks"][0]
    from jax.sharding import PartitionSpec as P

    assert l1["attn1"]["q"]["w"] == P(None, "model")
    assert l1["attn1"]["out"]["w"] == P("model", None)


def test_controlnet_on_mesh_matches_single_device():
    """ControlNet conditioning over the (2,4) mesh: the adapter tree rides
    the same TP plan as the base params (its transformer matmuls shard,
    zero-convs replicate), the hint image batch-shards over `data` — images
    match the single-device context to 1 uint8 LSB (roadmap: ControlNet/mesh
    composition)."""
    import sdtpu
    from sdtpu.models import controlnet as cn_mod

    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    size = ctx1.cfg.image_size
    hint = (np.linspace(0, 255, size * size * 3).reshape(size, size, 3)
            .astype(np.uint8))
    cn = cn_mod.init(jax.random.PRNGKey(1), ctx1.cfg.unet,
                     zero_init_outs=False)
    ctx1.load_controlnet("edge", cn)
    ctx8.load_controlnet("edge", cn)
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, seed=9, control_image=hint, control="edge",
                      control_scale=0.7)
    b = ctx8.generate(prompts, seed=9, control_image=hint, control="edge",
                      control_scale=0.7)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # and the adapter actually acts on the mesh path too
    base = ctx8.generate(prompts, seed=9)
    assert not np.array_equal(np.asarray(b), np.asarray(base))


def test_two_stage_split_on_mesh_matches_single_device():
    """denoising_end/latent-output base stage + refine second stage, both
    over the mesh (roadmap: refiner/mesh composition). The euler split is
    bit-exact single-device; across the mesh the same split must land
    within 1 uint8 LSB of the single-device stitched image, and the
    intermediate latents must agree to float tolerance."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny", steps=4, sampler="euler")
    ctx8 = sdtpu.Context(config="tiny", steps=4, sampler="euler",
                         mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    lat1 = ctx1.generate(prompts, seed=3, denoising_end=0.5,
                         output="latent")
    lat8 = ctx8.generate(prompts, seed=3, denoising_end=0.5,
                         output="latent")
    assert lat8.shape == lat1.shape and lat8.dtype == np.float32
    np.testing.assert_allclose(lat1, lat8, rtol=2e-4, atol=2e-4)

    img1 = ctx1.refine(lat1, prompts, seed=3, denoising_start=0.5)
    img8 = ctx8.refine(lat1, prompts, seed=3, denoising_start=0.5)
    assert np.abs(img1.astype(int) - img8.astype(int)).max() <= 1

    # full two-stage on-mesh vs single-device stitched result
    full1 = ctx1.generate(prompts, seed=3)
    stitched8 = ctx8.refine(lat8, prompts, seed=3, denoising_start=0.5)
    assert np.abs(full1.astype(int) - stitched8.astype(int)).max() <= 1


def test_weighted_long_prompts_on_mesh_match_single_device():
    """Long/weighted prompts (chunked [B, k, T] tokens + per-token weights)
    over the mesh, on both the generate and the micro-batched serving path
    (roadmap: long-prompt/mesh composition)."""
    import sdtpu

    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    filler = " ".join(["the horse riding"] * 6)
    prompts = [filler + " in the (photograph:1.4)", "an (astronaut:0.8)"]
    a = ctx1.generate(prompts, seed=5)
    b = ctx8.generate(prompts, seed=5)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    reqs = [
        {"prompt": prompts[0], "seed": 1},
        {"prompt": prompts[1], "seed": 2, "negative_prompt": filler},
    ]
    ra = ctx1.generate_batch(reqs)
    rb = ctx8.generate_batch(reqs)
    for i, (x, y) in enumerate(zip(ra, rb)):
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1, f"req {i}"


def test_concat_models_on_mesh_match_single_device():
    """9-ch dedicated-inpaint and 5-ch depth checkpoints over the (2,4)
    mesh: the extra conditioning planes batch-shard over `data`, the
    widened conv_in rides the TP plan — within 1 uint8 LSB of the
    single-device programs."""
    import sdtpu

    size = TINY.image_size
    image = np.random.default_rng(3).integers(
        0, 256, (2, size, size, 3), dtype=np.uint8)
    masks = np.zeros((2, size, size), np.uint8)
    masks[0, : size // 2] = 255
    masks[1, :, : size // 2] = 255
    prompts = ["the horse", "a photograph"]

    ctx1 = sdtpu.Context(config="tiny_inpaint", steps=3)
    ctx8 = sdtpu.Context(config="tiny_inpaint", steps=3, mesh=(2, 4))
    a = ctx1.inpaint(prompts, image, masks, seed=4)
    b = ctx8.inpaint(prompts, image, masks, seed=4)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    depths = np.stack([
        np.linspace(0, 1, size * size, dtype=np.float32).reshape(size, size),
        np.linspace(1, 0, size * size, dtype=np.float32).reshape(size, size),
    ])
    ctx1 = sdtpu.Context(config="tiny_depth", steps=3)
    ctx8 = sdtpu.Context(config="tiny_depth", steps=3, mesh=(2, 4))
    a = ctx1.depth2img(prompts, image, depths, strength=0.5, seed=4)
    b = ctx8.depth2img(prompts, image, depths, strength=0.5, seed=4)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    ctx1 = sdtpu.Context(config="tiny_ip2p", steps=3)
    ctx8 = sdtpu.Context(config="tiny_ip2p", steps=3, mesh=(2, 4))
    a = ctx1.instruct_pix2pix(prompts, image, image_guidance=1.4, seed=4)
    b = ctx8.instruct_pix2pix(prompts, image, image_guidance=1.4, seed=4)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

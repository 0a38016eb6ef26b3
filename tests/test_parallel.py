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

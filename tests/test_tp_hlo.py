"""Pin the GSPMD-emitted communication pattern of the TP plan
(VERDICT r3 #5: promote tools/analyze_tp_hlo.py into a test).

The sharding plan (parallel/sharding.py) is declarative — GSPMD inserts
the collectives. These tests compile the sharded generate program on the
virtual 8-device CPU mesh (2 data x 4 model) and assert on what the
partitioner ACTUALLY emitted, so a regression in the annotations (a
kernel that silently loses its spec, an activation constraint that stops
propagating) fails loudly instead of shipping as a silent 4x
communication blowup. The reference has no multi-device path to compare
against (SURVEY.md §2.4); the contract pinned here is the repo's own
Megatron-style design:

* every col/row-sharded transformer matmul pair costs ONE all-reduce at
  the row output — so all-reduce count scales with block count, and
  reduce-scatter / all-to-all stay absent;
* convs replicate (per-shard conv output shapes match the unsharded
  model — no halo exchange in the default plan).
"""

import re

import jax
import jax.numpy as jnp
import pytest

from sdtpu.config import TINY
from sdtpu.io.params import init_pipeline_params
from sdtpu.parallel.hlo import collective_counts, op_output_shapes
from sdtpu.parallel.mesh import make_mesh
from sdtpu.parallel import sharding as sh

pytestmark = pytest.mark.slow  # one sharded whole-pipeline compile (~1 min)


@pytest.fixture(scope="module")
def compiled_hlo():
    mesh = make_mesh(data=2, model=4)
    params = init_pipeline_params(jax.random.PRNGKey(0), TINY)
    tokens = jnp.zeros((2, TINY.clip.context_len), jnp.int32)
    uncond = jnp.zeros((TINY.clip.context_len, TINY.clip.hidden),
                       jnp.float32)
    fn = sh.jit_generate_sharded(TINY, mesh, "dpm", 1, True)(params)
    lowered = fn.jfn.lower(params, tokens, uncond, jax.random.PRNGKey(0),
                           jnp.float32(7.5))
    return lowered.compile().as_text()


def test_collective_counts_pinned(compiled_hlo):
    """Exact counts for the TINY generate program at steps=1 on 2x4.

    If an XLA upgrade shifts these, re-run tools/analyze_tp_hlo.py,
    eyeball that the structural tests below still hold, and re-pin.
    A JUMP (2x+) means the TP plan itself regressed."""
    counts = collective_counts(compiled_hlo)
    assert counts == {
        "all-reduce": 35,
        "collective-permute": 30,
        "all-gather": 1,
        "reduce-scatter": 0,
        "all-to-all": 0,
    }, counts


def test_no_scatter_or_alltoall(compiled_hlo):
    """The Megatron pairs produce pure all-reduces; any reduce-scatter or
    all-to-all means GSPMD stopped fusing the pattern we designed for."""
    counts = collective_counts(compiled_hlo)
    assert counts["reduce-scatter"] == 0
    assert counts["all-to-all"] == 0
    assert counts["all-reduce"] > 0, "TP plan emitted no communication"


def test_convs_replicate_dots_shard(compiled_hlo):
    """Per-shard conv output channels match the UNASHARDED model widths
    (convs replicate by design — sharding them costs halo exchange for
    sub-MXU shard sizes at SD widths); at least one dot output is
    model-axis-shrunk (the transformer matmuls DO shard)."""
    shapes = op_output_shapes(compiled_hlo)
    full_widths = {TINY.unet.model_channels * m for m in TINY.unet.channel_mult}
    conv_channels = set()
    for shp in shapes["convolution"]:
        m = re.match(r"\w+\[[\d,]+\]", shp)
        assert m, shp
        conv_channels.add(int(shp[shp.index("[") + 1:shp.index("]")]
                              .split(",")[-1]))
    # every UNet level width appears UNSHARDED among conv outputs
    assert full_widths <= conv_channels, (full_widths, conv_channels)
    # and no conv output channel is a model-axis fraction of a level width
    sharded_widths = {w // 4 for w in full_widths} - full_widths - {
        TINY.unet.in_channels, TINY.unet.out_channels, 3}
    assert not (sharded_widths & conv_channels), (
        "conv outputs shrank by the model axis — the replicate-convs "
        "design regressed", sharded_widths & conv_channels)


def test_collective_counts_root_and_async_forms():
    """ADVICE r4: real-TPU compiles emit collectives as fusion ROOTs and in
    async start/done form; the counter must see both and count a
    start/done pair exactly once (pure text-parsing unit test, no mesh)."""
    hlo = "\n".join([
        "ENTRY %main (p0: f32[8]) -> f32[8] {",
        "  %p0 = f32[8]{0} parameter(0)",
        "  %ar0 = f32[8]{0} all-reduce(%p0), replica_groups={}",
        "  %ars = f32[8]{0} all-reduce-start(%ar0), replica_groups={}",
        "  %ard = f32[8]{0} all-reduce-done(%ars)",
        "  %ags = f32[16]{0} all-gather-start(%ard), dimensions={0}",
        "  %agd = f32[16]{0} all-gather-done(%ags)",
        "  ROOT %cp = f32[8]{0} collective-permute(%ard), "
        "source_target_pairs={{0,1}}",
        "}",
    ])
    counts = collective_counts(hlo)
    assert counts["all-reduce"] == 2      # sync + start (done not counted)
    assert counts["all-gather"] == 1      # start only
    assert counts["collective-permute"] == 1  # ROOT-prefixed
    assert counts["reduce-scatter"] == 0
    shapes = op_output_shapes(
        "ROOT %c = f32[1,4,4,8]{3,2,1,0} convolution(%a, %b), dims\n"
        "%d = f32[2,8]{1,0} dot(%x, %y), contracting_dims={1}")
    assert shapes["convolution"]["f32[1,4,4,8]{3,2,1,0}"] == 1
    assert shapes["dot"]["f32[2,8]{1,0}"] == 1

"""TP-plan evidence (VERDICT r1 #5): compile the sharded generate program on
the virtual 8-device CPU mesh (2 data x 4 model), dump the SPMD-partitioned
HLO, and count what GSPMD actually emitted:

* collectives (all-reduce / all-gather / collective-permute / reduce-scatter)
  — the cost of the Megatron pairs;
* convolution per-shard shapes — evidence that conv compute is replicated
  (per-shard conv shapes do NOT shrink with the model axis), i.e. every model
  shard redoes the full conv stack;
* per-shard dot shapes — evidence the transformer matmuls DO shrink.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
tools/analyze_tp_hlo.py [--spatial]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from sdtpu.config import TINY  # noqa: E402
from sdtpu.io.params import init_pipeline_params  # noqa: E402
from sdtpu.parallel.mesh import make_mesh  # noqa: E402
from sdtpu.parallel import sharding as sh  # noqa: E402


def main() -> int:
    spatial = "--spatial" in sys.argv
    mesh = make_mesh(data=2, model=4)
    params = init_pipeline_params(jax.random.PRNGKey(0), TINY)
    tokens = jnp.zeros((2, TINY.clip.context_len), jnp.int32)
    uncond = jnp.zeros((TINY.clip.context_len, TINY.clip.hidden), jnp.float32)

    build = sh.jit_generate_sharded(TINY, mesh, "dpm", 3, True,
                                    spatial=spatial)
    fn = build(params)
    jfn = getattr(fn, "jfn", fn)
    compiled = jfn.lower(params, tokens, uncond, jax.random.PRNGKey(0),
                         jnp.float32(7.5)).compile()
    hlo = compiled.as_text()

    from sdtpu.parallel.hlo import collective_counts, op_output_shapes

    counts = collective_counts(hlo)
    shapes = op_output_shapes(hlo)
    conv_shapes, dot_shapes = shapes["convolution"], shapes["dot"]
    # collectives inside fusions/while bodies still appear as op lines; also
    # count raw occurrences as a cross-check
    raw = {k: hlo.count(f" {k}(") for k in
           ("all-reduce", "all-gather", "collective-permute",
            "reduce-scatter")}

    print(f"mesh: {dict(mesh.shape)}  spatial={spatial}")
    print(f"collectives (op-def lines): {counts}")
    print(f"collectives (raw mentions): {raw}")
    print("convolution per-shard output shapes (count):")
    for shp, n in conv_shapes.most_common():
        print(f"  {n:3d} x {shp}")
    print("dot per-shard output shapes (count):")
    for shp, n in dot_shapes.most_common(12):
        print(f"  {n:3d} x {shp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

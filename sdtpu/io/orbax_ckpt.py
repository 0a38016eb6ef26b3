"""Orbax checkpoints: sharded, direct-to-mesh parameter loading.

The native ``*.sdtpu.safetensors`` format (io/weights.py) is a single-host
file; at pod scale every host would read the full tree and re-shard. Orbax
checkpoints restore each shard straight to its device from a (possibly
distributed) store — the production loading path for ``Context(mesh=...)``
deployments.

The tree structure is derived from the config (eval_shape of the init), so a
checkpoint can be restored without running the initializer.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp


def save_checkpoint(params, path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)
        ckptr.wait_until_finished()


def abstract_params(cfg, dtype=None, mesh=None, demo: bool = True):
    """Abstract pytree (shape/dtype/sharding) for a pipeline config —
    the restore template."""
    from sdtpu.io.params import init_pipeline_params

    tree = jax.eval_shape(
        lambda: init_pipeline_params(jax.random.PRNGKey(0), cfg, demo=demo)
    )

    shardings = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        from sdtpu.parallel.sharding import param_pspecs

        pspecs = param_pspecs(tree, mesh.shape["model"])
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), pspecs,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
        )

    def to_abstract(leaf, sh=None):
        dt = jnp.dtype(dtype) if dtype and jnp.issubdtype(
            leaf.dtype, jnp.floating) else leaf.dtype
        return jax.ShapeDtypeStruct(leaf.shape, dt, sharding=sh)

    if shardings is None:
        return jax.tree.map(to_abstract, tree)
    return jax.tree.map(to_abstract, tree, shardings)


def load_checkpoint(path, cfg, dtype=None, mesh=None):
    """Restore a pipeline param tree; with `mesh`, each leaf lands already
    sharded per the TP/DP plan (no host full-copy)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    template = abstract_params(cfg, dtype=dtype, mesh=mesh)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def is_orbax_checkpoint(path) -> bool:
    p = Path(path)
    return (p / "_CHECKPOINT_METADATA").exists() or (
        p.is_dir() and any(p.glob("**/_CHECKPOINT_METADATA"))
    )

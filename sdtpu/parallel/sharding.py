"""Sharding plans: map the param/activation pytrees onto the (data, model) mesh.

Design (TPU-idiomatic, NOT a translation — the reference has no multi-device
story, SURVEY.md §2.4): annotate shardings, let GSPMD insert the ICI
collectives.

* **data** axis: batch sharding of prompts/latents/images — zero-communication
  scale-out for throughput.
* **model** axis: Megatron-style tensor parallelism over every transformer
  matmul pair — q/k/v/fc1/ff1 kernels column-sharded (output dim), out/fc2/ff2
  kernels row-sharded (input dim), so each pair costs one psum (XLA emits the
  all-reduce at the row-parallel output). Convolutions and norms stay
  replicated: at SD v1.x shapes the conv channel counts (<=1280) under-fill a
  TP shard and XLA's spatial-partitioning halo exchange costs more than it
  saves; the attention/MLP matmuls that dominate the transformer blocks are
  where the model axis pays.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_flatten_with_path, tree_unflatten

COL_PARENTS = {"q", "k", "v", "qkv", "kv", "fc1", "ff1"}  # output-dim sharded
ROW_PARENTS = {"out", "fc2", "ff2"}                # input-dim sharded


def _path_names(path) -> list[str]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def param_pspecs(params, model_size: int):
    """PartitionSpec tree for the pipeline param pytree.

    Only shards a kernel when the sharded dim is divisible by the model-axis
    size (otherwise replicate — correctness over forced splits).
    """
    leaves, treedef = tree_flatten_with_path(params)
    specs = []
    for path, leaf in leaves:
        names = _path_names(path)
        parent = names[-2] if len(names) >= 2 else ""
        field = names[-1]
        spec = P()
        is_kernel = field in ("w", "w_q")
        if (leaf.ndim == 2 and is_kernel and parent in COL_PARENTS
                and leaf.shape[1] % model_size == 0):
            spec = P(None, "model")
        elif (leaf.ndim == 2 and is_kernel and parent in ROW_PARENTS
              and leaf.shape[0] % model_size == 0):
            spec = P("model", None)
        elif (
            leaf.ndim == 1
            and field in ("b", "w_scale")
            and parent in COL_PARENTS
            and leaf.shape[0] % model_size == 0
        ):
            spec = P("model")
        specs.append(spec)
    return tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place the param tree on the mesh per the TP plan."""
    model_size = mesh.shape["model"]
    pspecs = param_pspecs(params, model_size)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )


def jit_pipeline_sharded(fn, mesh: Mesh, params, arg_pspecs,
                         spatial: bool = False):
    """jit ``fn(params, *args)`` over the mesh.

    in_shardings: params per the TP plan, each further positional arg per
    ``arg_pspecs`` (a PartitionSpec per arg — ``P("data", ...)`` for batched
    tensors, ``P()`` for replicated scalars/keys). The whole program (CLIP +
    UNet scan + VAE) runs as one SPMD program; GSPMD propagates the
    annotations and emits the ICI collectives. The uint8 image output is
    batch-sharded over `data`.

    ``spatial=True`` additionally constrains UNet conv activations to
    ``P("data", None, "model", None)`` so GSPMD spatially partitions the
    conv stack (halo exchange) instead of replicating it — see
    parallel/spatial.py and the measured tradeoff in docs/PERF_NOTES.md.
    """
    pspecs = param_pspecs(params, mesh.shape["model"])
    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    in_sh = (param_sh, *(NamedSharding(mesh, p) for p in arg_pspecs))
    if spatial:
        from sdtpu.parallel import spatial as sp

        spec = NamedSharding(mesh, P("data", None, "model", None))
        inner = fn

        def traced(*args):
            prev = sp.set_spec(spec)
            try:
                return inner(*args)
            finally:
                sp.set_spec(prev)

        fn = traced
    return jax.jit(
        fn,
        in_shardings=in_sh,
        out_shardings=NamedSharding(mesh, P("data", None, None, None)),
    )


def jit_program_sharded(cfg, mesh: Mesh, *, kind: str = "generate",
                        sampler: str = "dpm", steps: int = 20,
                        use_cfg: bool = True, kernels: str = "xla",
                        spatial: bool = False, end_step=None,
                        output: str = "image", start_step: int = 0,
                        with_hint: bool = False, weighted: bool = False,
                        cfg_interval=None, pag_layers=None):
    """Compile any Context serving program (generate / refine, with optional
    ControlNet hint, long/weighted prompts, or a truncated base stage) over
    the mesh.

    The single-device paths pass the optional tensors as kwargs; jit
    ``in_shardings`` apply to positionals only, so this wrapper fixes a
    positional order — (params, tokens, uncond, key, guidance[, latents]
    [, hint, control_scale][, token_weights]) — shards each slot, and
    returns a callable that re-accepts the Context's kwargs form.

    Sharding plan per optional slot: latents / hint are batched images
    (``P("data", ...)``); control_scale is a replicated scalar; chunked
    tokens [B, k, T] and token_weights [B, k, T] batch-shard on dim 0.
    ControlNet params ride the normal ``param_pspecs`` walk — its
    transformer matmuls pick up the Megatron TP plan, zero-convs replicate.
    """
    import functools

    from sdtpu.engine import pipeline as pl

    tok_spec = P("data", None, None) if weighted else P("data", None)
    names: list[str] = []
    extra_specs: list[P] = []
    if kind == "refine":
        names.append("latents")
        extra_specs.append(P("data", None, None, None))
    if with_hint:
        names += ["hint", "control_scale"]
        # hints are [N_adapters, B, H, W, C]: batch-shard dim 1
        extra_specs += [P(None, "data", None, None, None), P()]
    if weighted:
        names.append("token_weights")
        extra_specs.append(P("data", None, None))
    if pag_layers:
        # perturbed-attention guidance strength: replicated traced scalar
        names.append("pag_scale")
        extra_specs.append(P())

    if kind == "generate":
        base = functools.partial(
            pl.generate, cfg=cfg, sampler=sampler, steps=steps,
            use_cfg=use_cfg, kernels=kernels, end_step=end_step,
            output=output, cfg_interval=cfg_interval, pag_layers=pag_layers,
        )
    elif kind == "refine":
        base = functools.partial(
            pl.refine, cfg=cfg, sampler=sampler, steps=steps,
            start_step=start_step, use_cfg=use_cfg, kernels=kernels,
            cfg_interval=cfg_interval, pag_layers=pag_layers,
        )
    else:
        raise ValueError(f"unknown sharded program kind {kind!r}")

    def positional(params, tokens, uncond, key, guidance, *extra):
        kw = dict(zip(names, extra))
        if kind == "refine":
            latents = kw.pop("latents")
            return base(params, tokens, uncond, key, guidance, latents, **kw)
        return base(params, tokens, uncond, key, guidance, **kw)

    def build(params):
        jfn = jit_pipeline_sharded(
            positional, mesh, params,
            arg_pspecs=(tok_spec, P(), P(), P(), *extra_specs),
            spatial=spatial,
        )

        def call(params, tokens, uncond, key, guidance, *pos, **kw):
            want = names[len(pos):]
            if set(kw) != set(want):
                raise TypeError(
                    f"sharded {kind} program compiled for extras {names}, "
                    f"called with {sorted(kw)} — rebuild with matching "
                    f"with_hint/weighted flags")
            extra = list(pos) + [kw[n] for n in want]
            return jfn(params, tokens, uncond, key, guidance, *extra)

        call.jfn = jfn  # underlying jax.jit object (lower()/compile() access)
        return call

    return build


def jit_generate_sharded(cfg, mesh: Mesh, sampler: str = "dpm",
                         steps: int = 20, use_cfg: bool = True,
                         kernels: str = "xla", spatial: bool = False):
    """Compile the plain generate program over the mesh (single shared
    negative embedding, one key, scalar guidance — the `Context.generate`
    signature)."""
    return jit_program_sharded(
        cfg, mesh, kind="generate", sampler=sampler, steps=steps,
        use_cfg=use_cfg, kernels=kernels, spatial=spatial,
    )

"""Multi-chip scaling: device meshes and sharding plans.

The reference is a single-NPU engine (SURVEY.md §2.4 — its "communication
backend" is zero-copy shared memory on one SoC). The TPU rebuild treats
scale as first-class: ``mesh.make_mesh`` builds a ``(data, model)``
``jax.sharding.Mesh``; ``sharding.shard_params`` / ``jit_generate_sharded``
annotate the param/IO pytrees so GSPMD emits ICI collectives (DP over the
image batch, Megatron-style TP over the transformer matmul pairs). Entry
points: ``Context(mesh=(data, model))`` for serving,
``__graft_entry__.dryrun_multichip`` for CI-style validation on a virtual
CPU mesh.
"""

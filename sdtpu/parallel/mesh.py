"""Device mesh construction.

The reference is a single-NPU engine whose "communication backend" is
zero-copy shared memory (SURVEY.md §2.4, §5.8); the TPU-native equivalent of
"don't move bytes, share them" is device-resident HBM arrays inside one jit'd
program — and, beyond one chip, a ``jax.sharding.Mesh`` where XLA emits ICI
collectives from sharding annotations. Axes:

* ``data``  — batch (independent images): pure DP, no communication inside
  the UNet, embarrassingly parallel over ICI.
* ``model`` — tensor parallelism over attention heads / MLP hidden / conv
  output channels (Megatron-style pairs), for latency scaling of a single
  image.

Pipeline/expert parallelism intentionally do not exist here: the model is a
20-iteration recurrent UNet (pipelining across layers would bubble every
step boundary) and has no MoE layers. Sequence/spatial parallelism of the
conv stack is NOT implemented: the current plan keeps convolutions and
norms replicated on the model axis (see sharding.py's module docstring for
the measured rationale); only the transformer matmuls are tensor-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``model=None`` uses all remaining devices.

    Device order follows jax.devices(), which on TPU enumerates chips so
    that adjacent ids are ICI neighbors — keeping the (usually
    communication-heavy) `model` axis on the fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))

"""DDIM sampler (eta=0, deterministic), discrete-timestep form.

Standard DDIM update on the SD v1.x schedule with uniform timestep spacing
(the CompVis convention: timesteps ``[1, 1+c, ..., 1+(S-1)c][::-1]`` with
``c = N // S``; the "previous" alpha-bar of the final step is
``alphas_cumprod[0]``). The reference ships DPM as its production sampler and
lists PLMS/DDIM as the quality config (reference: README.md:61); we provide
all three behind one interface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    model_t: jnp.ndarray          # [steps] discrete timestep fed to the UNet
    sqrt_abar: jnp.ndarray        # [steps] sqrt(alphabar_t)
    sqrt_1m_abar: jnp.ndarray     # [steps] sqrt(1 - alphabar_t)
    sqrt_abar_prev: jnp.ndarray   # [steps]
    sqrt_1m_abar_prev: jnp.ndarray

    # uniform marginal accessors at each step's start time (v-pred support)
    @property
    def alpha_s(self):
        return self.sqrt_abar

    @property
    def sigma_s(self):
        return self.sqrt_1m_abar


class State(NamedTuple):
    # DDIM is single-step; keep a dummy field so the interface is uniform.
    unused: jnp.ndarray


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0) -> Plan:
    del start_step  # DDIM is single-step: no history to restart
    ts = schedule.ddim_timesteps(steps)                # descending, e.g. 951..1
    abar = schedule.alphas_cumprod[ts]                 # [steps]
    abar_prev = np.concatenate(
        [schedule.alphas_cumprod[ts[1:]], schedule.alphas_cumprod[:1]]
    )
    return Plan(
        model_t=to_f32(ts),
        sqrt_abar=to_f32(np.sqrt(abar)),
        sqrt_1m_abar=to_f32(np.sqrt(1.0 - abar)),
        sqrt_abar_prev=to_f32(np.sqrt(abar_prev)),
        sqrt_1m_abar_prev=to_f32(np.sqrt(1.0 - abar_prev)),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    del shape
    return State(unused=jnp.zeros((), dtype))


def step(p: Plan, i, x, eps, state: State):
    x0 = (x - p.sqrt_1m_abar[i] * eps) / p.sqrt_abar[i]
    x_next = p.sqrt_abar_prev[i] * x0 + p.sqrt_1m_abar_prev[i] * eps
    return x_next, state

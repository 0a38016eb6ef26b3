"""PLMS (pseudo linear multistep) sampler.

Adams-Bashforth multistep on the noise prediction with the DDIM transfer
formula (the CompVis PLMS method; the reference's quality config names
"PLMS/DPM 20 steps", reference: README.md:61). The AB order ramps 1->4 as
history fills; the order selection is encoded as a per-step ``[steps, 4]``
coefficient table so the scan body is branch-free:

    order 1:  e
    order 2:  (3 e - e1) / 2
    order 3:  (23 e - 16 e1 + 5 e2) / 12
    order 4:  (55 e - 59 e1 + 37 e2 - 9 e3) / 24

Deviation from CompVis: their step 0 spends a second model eval on a
pseudo-improved-Euler correction; "plms" uses a plain 1st-order step instead
(the k-diffusion convention), keeping exactly one UNet eval per scan
iteration. Affects step 0 only. Select sampler "plms_exact" to get the
CompVis-exact first step (the pipeline runs the two-eval corrector as a
pre-scan prologue, engine/pipeline.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers import ddim
from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    model_t: jnp.ndarray
    sqrt_abar: jnp.ndarray
    sqrt_1m_abar: jnp.ndarray
    sqrt_abar_prev: jnp.ndarray
    sqrt_1m_abar_prev: jnp.ndarray
    ab_coef: jnp.ndarray  # [steps, 4] Adams-Bashforth weights for (e, e1, e2, e3)

    # uniform marginal accessors at each step's start time (v-pred support)
    @property
    def alpha_s(self):
        return self.sqrt_abar

    @property
    def sigma_s(self):
        return self.sqrt_1m_abar


class State(NamedTuple):
    e1: jnp.ndarray
    e2: jnp.ndarray
    e3: jnp.ndarray


_AB_TABLE = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
        [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
        [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
    ]
)


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0) -> Plan:
    """`start_step` > 0 (img2img warm start): the AB order ramp restarts at 1
    from the first executed step — earlier history buffers are zero-filled
    and must not enter the blend."""
    base = ddim.plan(schedule, steps)
    orders = np.clip(np.arange(steps) - start_step, 0, 3)
    return Plan(
        model_t=base.model_t,
        sqrt_abar=base.sqrt_abar,
        sqrt_1m_abar=base.sqrt_1m_abar,
        sqrt_abar_prev=base.sqrt_abar_prev,
        sqrt_1m_abar_prev=base.sqrt_1m_abar_prev,
        ab_coef=to_f32(_AB_TABLE[orders]),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    z = jnp.zeros(shape, dtype)
    return State(e1=z, e2=z, e3=z)


def step(p: Plan, i, x, eps, state: State):
    c = p.ab_coef[i]
    e_prime = c[0] * eps + c[1] * state.e1 + c[2] * state.e2 + c[3] * state.e3
    x0 = (x - p.sqrt_1m_abar[i] * e_prime) / p.sqrt_abar[i]
    x_next = p.sqrt_abar_prev[i] * x0 + p.sqrt_1m_abar_prev[i] * e_prime
    return x_next, State(e1=eps, e2=state.e1, e3=state.e2)

"""DPM-Solver++ (2M): 2nd-order multistep solver, data-prediction form.

The math matches the reference's C++ solver (reference: dpm_solver.cpp:84-181):
noise-pred -> data-pred conversion ``y = (x - sigma*eps)/alpha``
(dpm_solver.cpp:139), 1st-order update at step 0, 2nd-order multistep
afterwards with coefficient ``1/(2 r_i)`` (dpm_solver.cpp:127,141-171), on the
SD v1.x linear-sqrt beta schedule interpolated at continuous times.

Everything data-dependent is precomputed into ``[steps]`` coefficient tables
(``plan``), so ``step`` is pure branch-free vector math suitable for a
``lax.scan`` body. Setting the 2nd-order mix-in coefficient ``i2r`` to 0 at
step 0 collapses the update to 1st order without a ``lax.cond``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    """Per-step coefficient tables; every field has shape [steps]."""

    model_t: jnp.ndarray     # UNet-facing timestep at the step's start time
    alpha_s: jnp.ndarray      # alpha(t_s)   (v-prediction conversion)
    inv_alpha_s: jnp.ndarray  # 1 / alpha(t_s)          (data-pred)
    sigma_s: jnp.ndarray      # sigma(t_s)              (data-pred)
    sigma_ratio: jnp.ndarray  # sigma(t_next)/sigma(t_s)
    alpha_phi: jnp.ndarray    # alpha(t_next) * expm1(-h_i)
    i2r: jnp.ndarray          # 1/(2 r_i); 0 at step 0  (2nd-order mix-in)


class State(NamedTuple):
    prev_y: jnp.ndarray  # previous step's data prediction


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    """`start_step` > 0 (img2img/inpaint warm start): the trajectory is
    truncated, so solver history restarts there — the first EXECUTED step is
    pure 1st order (i2r=0), matching how CompVis/diffusers re-init multistep
    solvers on a shortened schedule."""
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))           # [steps+1], 1 -> 1/N
    model_t = schedule.model_times(ts[:-1])       # [steps]
    alpha = schedule.marginal_alpha(ts)           # [steps+1]
    sigma = schedule.marginal_sigma(ts)
    lam = schedule.marginal_lambda(ts)
    h = lam[1:] - lam[:-1]                        # [steps]
    phi = np.expm1(-h)
    r = np.ones_like(h)
    r[1:] = h[:-1] / h[1:]
    i2r = 1.0 / (2.0 * r)
    i2r[: start_step + 1] = 0.0  # first executed step: pure 1st order
    return Plan(
        model_t=to_f32(model_t),
        alpha_s=to_f32(alpha[:-1]),
        inv_alpha_s=to_f32(1.0 / alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        sigma_ratio=to_f32(sigma[1:] / sigma[:-1]),
        alpha_phi=to_f32(alpha[1:] * phi),
        i2r=to_f32(i2r),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    return State(prev_y=jnp.zeros(shape, dtype))


def step(p: Plan, i, x, eps, state: State):
    """One DPM-Solver++(2M) update. `i` may be a traced scan counter."""
    y = (x - p.sigma_s[i] * eps) * p.inv_alpha_s[i]
    d = (1.0 + p.i2r[i]) * y - p.i2r[i] * state.prev_y
    x_next = p.sigma_ratio[i] * x - p.alpha_phi[i] * d
    return x_next, State(prev_y=y)

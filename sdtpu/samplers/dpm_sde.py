"""DPM-Solver++(2M) SDE, midpoint variant, eta=1 (k-diffusion's
"DPM++ 2M SDE" — the community's most-used stochastic solver; the
reference ships deterministic DPM/PLMS only, README.md:61).

k-diffusion's update (sample_dpmpp_2m_sde, solver_type="midpoint"),
mapped from its sigma space (x_k = x/alpha, sigma_k = sigma/alpha,
h = lambda_next - lambda, lambda = log(alpha/sigma)) back to VP space:

    x_next = (sigma_next/sigma) * exp(-h) * x
             + alpha_next * (1 - exp(-2h)) * [y + mix * (y - y_prev)]
             + sigma_next * sqrt(1 - exp(-2h)) * noise
    mix    = h / (2 * h_prev)            (0 at the first executed step)

with y the data prediction (x - sigma*eps)/alpha. Everything
data-independent precomputes to [steps] tables, so ``step`` is branch-free
vector math for the ``lax.scan`` body; the per-step standard-normal draw
threads in from the request key (``NEEDS_NOISE``), per sample in batched
serving — deterministic per seed, independent of batch composition.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32

#: pipeline contract: step() takes a per-step standard-normal `noise` array
NEEDS_NOISE = True


class Plan(NamedTuple):
    """Per-step coefficient tables; every field has shape [steps]."""

    model_t: jnp.ndarray     # UNet-facing timestep at the step's start time
    alpha_s: jnp.ndarray     # alpha(t_s)   (v-prediction conversion)
    inv_alpha_s: jnp.ndarray  # 1 / alpha(t_s)          (data-pred)
    sigma_s: jnp.ndarray     # sigma(t_s)               (data-pred)
    c_x: jnp.ndarray         # (sigma_next/sigma_s) * exp(-h)
    c_y: jnp.ndarray         # alpha_next * (1 - exp(-2h))
    mix: jnp.ndarray         # h / (2 h_prev); 0 at first executed step
    c_n: jnp.ndarray         # sigma_next * sqrt(1 - exp(-2h))


class State(NamedTuple):
    prev_y: jnp.ndarray  # previous step's data prediction


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    """`start_step` > 0 (img2img/inpaint warm start): solver history
    restarts there — the first EXECUTED step is pure 1st order (mix=0)."""
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))    # [steps+1], 1 -> 1/N
    model_t = schedule.model_times(ts[:-1])
    alpha = schedule.marginal_alpha(ts)
    sigma = schedule.marginal_sigma(ts)
    lam = schedule.marginal_lambda(ts)
    h = lam[1:] - lam[:-1]                        # [steps], > 0
    em2h = -np.expm1(-2.0 * h)                    # 1 - exp(-2h)
    mix = np.zeros_like(h)
    mix[1:] = h[1:] / (2.0 * h[:-1])
    mix[: start_step + 1] = 0.0
    return Plan(
        model_t=to_f32(model_t),
        alpha_s=to_f32(alpha[:-1]),
        inv_alpha_s=to_f32(1.0 / alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        c_x=to_f32(sigma[1:] / sigma[:-1] * np.exp(-h)),
        c_y=to_f32(alpha[1:] * em2h),
        mix=to_f32(mix),
        c_n=to_f32(sigma[1:] * np.sqrt(em2h)),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    return State(prev_y=jnp.zeros(shape, dtype))


def step(p: Plan, i, x, eps, state: State, noise=None):
    """One DPM++(2M) SDE update; `noise` is a standard-normal array shaped
    like x (required — the pipeline supplies it when NEEDS_NOISE is set)."""
    y = (x - p.sigma_s[i] * eps) * p.inv_alpha_s[i]
    d = y + p.mix[i] * (y - state.prev_y)
    x_next = p.c_x[i] * x + p.c_y[i] * d + p.c_n[i] * noise
    return x_next, State(prev_y=y)

"""Euler-ancestral sampler (k-diffusion "Euler a", stochastic).

One Euler step toward the ancestral (DDPM posterior) noise level, then fresh
noise back up to the marginal: in the k-diffusion parametrization
(``x_k = x/alpha``, ``sigma_k = sigma/alpha``):

    sigma_up^2   = sigma_k_next^2 * (sigma_k^2 - sigma_k_next^2) / sigma_k^2
    sigma_down   = sqrt(sigma_k_next^2 - sigma_up^2)
    x_k(next)    = x_k + (sigma_down - sigma_k) * eps + sigma_up * noise

mapped back to VP space. All three coefficients precompute to per-step
tables; ``step`` needs a fresh standard-normal draw per step, which the
pipeline threads in (``NEEDS_NOISE``) from the request key via a dedicated
``fold_in`` tag range — per-sample in batched serving, so results stay
deterministic per seed and independent of batch composition.

Stochastic by construction: unlike the deterministic samplers, different
step counts land on genuinely different images (the community's usual
reason for picking "Euler a"). The reference ships DPM/PLMS only
(reference: README.md:61); this is a capability extension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32

#: pipeline contract: step() takes a per-step standard-normal `noise` array
NEEDS_NOISE = True


class Plan(NamedTuple):
    """Per-step tables, shape [steps]."""

    model_t: jnp.ndarray   # UNet-facing timestep at the step's start time
    alpha_s: jnp.ndarray   # alpha(t_s)  (v-pred conversion + warm starts)
    sigma_s: jnp.ndarray   # sigma(t_s)
    a_ratio: jnp.ndarray   # alpha(t_next) / alpha(t_s)
    b_coef: jnp.ndarray    # alpha(t_next) * (sigma_down - sigma_k)
    n_coef: jnp.ndarray    # alpha(t_next) * sigma_up


class State(NamedTuple):
    unused: jnp.ndarray  # stateless; uniform interface only


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    del start_step  # stateless: nothing to restart
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))       # [steps+1], 1 -> 1/N
    alpha = schedule.marginal_alpha(ts)
    sigma = schedule.marginal_sigma(ts)
    sigk = sigma / alpha                      # k-diffusion sigma, decreasing
    s2, n2 = sigk[:-1] ** 2, sigk[1:] ** 2
    up2 = n2 * (s2 - n2) / s2
    down = np.sqrt(n2 - up2)
    return Plan(
        model_t=to_f32(schedule.model_times(ts[:-1])),
        alpha_s=to_f32(alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        a_ratio=to_f32(alpha[1:] / alpha[:-1]),
        b_coef=to_f32(alpha[1:] * (down - sigk[:-1])),
        n_coef=to_f32(alpha[1:] * np.sqrt(up2)),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    del shape
    return State(unused=jnp.zeros((), dtype))


def step(p: Plan, i, x, eps, state: State, noise=None):
    """One ancestral step; `noise` is a standard-normal array shaped like x
    (required — the pipeline supplies it when NEEDS_NOISE is set)."""
    x_next = p.a_ratio[i] * x + p.b_coef[i] * eps + p.n_coef[i] * noise
    return x_next, state

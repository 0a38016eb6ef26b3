"""Euler sampler (k-diffusion "Euler discrete", deterministic).

Euler integration of the probability-flow ODE in the k-diffusion
parametrization: with ``x_k = x / alpha`` and ``sigma_k = sigma / alpha``,
the ODE derivative is exactly the noise prediction (``dx_k/dsigma_k = eps``),
so one step is

    x_k(next) = x_k + (sigma_k_next - sigma_k) * eps

mapped back to the VP-space ``x`` our pipeline carries. Both coefficients
fold into per-step tables, so ``step`` is one fused multiply-add — the
cheapest sampler in the family. Stateless (no multistep history), hence
trivially correct under img2img warm starts.

The reference ships DPM/PLMS only (reference: README.md:61); Euler (and the
ancestral variant, sdtpu.samplers.euler_a) are capability extensions that
match the most common community sampler choices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    """Per-step tables, shape [steps]."""

    model_t: jnp.ndarray   # UNet-facing timestep at the step's start time
    alpha_s: jnp.ndarray   # alpha(t_s)  (v-pred conversion + warm starts)
    sigma_s: jnp.ndarray   # sigma(t_s)
    a_ratio: jnp.ndarray   # alpha(t_next) / alpha(t_s)
    b_coef: jnp.ndarray    # alpha(t_next) * (sigma_k_next - sigma_k)


class State(NamedTuple):
    unused: jnp.ndarray  # Euler is stateless; uniform interface only


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    del start_step  # stateless: nothing to restart
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))       # [steps+1], 1 -> 1/N
    alpha = schedule.marginal_alpha(ts)
    sigma = schedule.marginal_sigma(ts)
    sigk = sigma / alpha                      # k-diffusion sigma
    return Plan(
        model_t=to_f32(schedule.model_times(ts[:-1])),
        alpha_s=to_f32(alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        a_ratio=to_f32(alpha[1:] / alpha[:-1]),
        b_coef=to_f32(alpha[1:] * (sigk[1:] - sigk[:-1])),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    del shape
    return State(unused=jnp.zeros((), dtype))


def step(p: Plan, i, x, eps, state: State):
    """x_next = alpha_next * (x/alpha + (sigk_next - sigk) * eps)."""
    return p.a_ratio[i] * x + p.b_coef[i] * eps, state

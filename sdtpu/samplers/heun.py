"""Heun and DPM2 samplers (k-diffusion "Heun" / "DPM2"): single-step
2nd-order solvers that spend a SECOND UNet eval per step.

Both integrate the probability-flow ODE in the k-diffusion parametrization
(``x_k = x / alpha``, ``sigma_k = sigma / alpha``, derivative = eps):

* **Heun** (improved Euler, Karras et al. 2022 Alg. 1): full Euler step to
  ``t_next``, re-evaluate there, average the two derivatives:

      x_k(next) = x_k + (sk_next - sk) * (eps(t_s) + eps(t_next)) / 2

* **DPM2** (Lu et al. 2022 single-step order 2, k-diffusion form): Euler
  step to the LOG-sigma midpoint, re-evaluate there, take the full step
  with the midpoint derivative alone:

      sk_mid    = exp((log sk + log sk_next) / 2)
      x_k(next) = x_k + (sk_next - sk) * eps(t_mid)

Unlike the multistep family (dpm/plms/lms/unipc) these have no history —
exactly correct under img2img warm starts and trajectory truncation — but
cost 2 model evals per step. The pipeline drives them through the
``NEEDS_SECOND_EVAL`` protocol (engine/pipeline.denoise): ``predictor``
produces the probe point, the engine runs the second UNet eval there (time
``model_t2``, marginals ``alpha_m``/``sigma_m`` for v-prediction), and
``step`` combines both derivatives. All coefficients fold into per-step
tables as usual.

The reference ships DPM/PLMS only (reference: README.md:61); these are
capability extensions matching the k-diffusion sampler set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32

NEEDS_SECOND_EVAL = True


class Plan(NamedTuple):
    """Per-step tables, shape [steps]."""

    model_t: jnp.ndarray   # UNet-facing timestep at the step's start
    alpha_s: jnp.ndarray   # alpha(t_s)  (v-pred conversion + warm starts)
    sigma_s: jnp.ndarray   # sigma(t_s)
    model_t2: jnp.ndarray  # UNet-facing timestep of the SECOND eval
    alpha_m: jnp.ndarray   # alpha at the second-eval point (v-pred there)
    sigma_m: jnp.ndarray   # sigma at the second-eval point
    a_mid: jnp.ndarray     # x -> probe: x_mid = a_mid * x + b_mid * eps1
    b_mid: jnp.ndarray
    a_ratio: jnp.ndarray   # full step: x' = a_ratio * x + b_coef * d
    b_coef: jnp.ndarray
    w1: jnp.ndarray        # d = w1 * eps1 + w2 * eps2
    w2: jnp.ndarray


class State(NamedTuple):
    unused: jnp.ndarray  # stateless; uniform interface only


def _sigk_to_t(schedule: NoiseSchedule, sigk: np.ndarray) -> np.ndarray:
    """Invert sigma_k(t) on the train grid (monotonic increasing in t) —
    the same inversion karras_times uses (schedule.py:104-108)."""
    a_grid = np.exp(schedule.log_alpha_grid)
    sigk_grid = np.sqrt(np.maximum(1.0 - a_grid * a_grid, 1e-20)) / a_grid
    return np.interp(sigk, sigk_grid, schedule.t_grid)


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform", kind: str = "heun") -> Plan:
    del start_step  # stateless: nothing to restart
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))       # [steps+1], 1 -> 1/N
    alpha = schedule.marginal_alpha(ts)
    sigma = schedule.marginal_sigma(ts)
    sigk = sigma / alpha                             # k-diffusion sigma

    if kind == "heun":
        # probe = the full Euler step endpoint; derivatives average 50/50
        t_mid = ts[1:]
        sk_mid = sigk[1:]
        w1 = np.full(steps, 0.5)
        w2 = np.full(steps, 0.5)
    elif kind == "dpm2":
        # probe = the log-sigma midpoint; its derivative alone takes the step
        sk_mid = np.exp(0.5 * (np.log(sigk[:-1]) + np.log(sigk[1:])))
        t_mid = _sigk_to_t(schedule, sk_mid)
        w1 = np.zeros(steps)
        w2 = np.ones(steps)
    else:
        raise ValueError(f"unknown kind {kind!r}; expected 'heun' or 'dpm2'")

    a_mid = schedule.marginal_alpha(t_mid)
    s_mid = schedule.marginal_sigma(t_mid)
    return Plan(
        model_t=to_f32(schedule.model_times(ts[:-1])),
        alpha_s=to_f32(alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        model_t2=to_f32(schedule.model_times(t_mid)),
        alpha_m=to_f32(a_mid),
        sigma_m=to_f32(s_mid),
        a_mid=to_f32(a_mid / alpha[:-1]),
        b_mid=to_f32(a_mid * (sk_mid - sigk[:-1])),
        a_ratio=to_f32(alpha[1:] / alpha[:-1]),
        b_coef=to_f32(alpha[1:] * (sigk[1:] - sigk[:-1])),
        w1=to_f32(w1),
        w2=to_f32(w2),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    del shape
    return State(unused=jnp.zeros((), dtype))


def predictor(p: Plan, i, x, eps):
    """Probe point for the second eval (VP space): Euler to the probe time."""
    return p.a_mid[i] * x + p.b_mid[i] * eps


def step(p: Plan, i, x, eps, state: State, eps2=None):
    """Combined 2nd-order update. `eps2` is the model's prediction at the
    probe point (required — the pipeline supplies it when NEEDS_SECOND_EVAL
    is set)."""
    d = p.w1[i] * eps + p.w2[i] * eps2
    return p.a_ratio[i] * x + p.b_coef[i] * d, state

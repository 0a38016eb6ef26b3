"""UniPC sampler: order-2 unified predictor-corrector, data-prediction form.

UniPC (Zhao et al., 2023) increases accuracy at no extra model evals by
CORRECTING the previous step with the current step's model output before
predicting the next one. Exponential-integrator derivation on the exact
kernel ``d(x/sigma)/dlambda = e^lambda * x0(lambda)`` (at order 2 the
UniPC ``B(h)`` basis choice — bh1 vs bh2 — cancels algebraically, so these
closed forms are THE order-2 update):

  one-step (s -> t, h = lambda_t - lambda_s > 0, phi1 = 1 - e^-h,
  phik = phi1/h - 1):

    predictor:  x_t = (sigma_t/sigma_s) x_s + alpha_t phi1 m_s
                      - alpha_t phik (h/h_prev) (m_s - m_prev)
    corrector:  x_t' = (sigma_t/sigma_s) x_s + alpha_t phi1 m_s
                      - alpha_t phik (m_t - m_s)

where ``m`` is the data prediction ``(x - sigma eps)/alpha``. The corrector
reuses the model output already computed at the predicted sample — one UNet
eval per step, like every other sampler here, but with local accuracy
between 2nd and 3rd order. All coefficients fold into per-step tables;
history restarts (img2img warm starts) gate both the 2nd-order predictor
term and the corrector off at the first executed step, mirroring
sdtpu.samplers.dpm.

Capability extension: the reference ships DPM/PLMS only
(reference: README.md:61).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    """Per-step tables, shape [steps]."""

    model_t: jnp.ndarray      # UNet-facing timestep at the step's start time
    alpha_s: jnp.ndarray      # alpha(t_s)   (v-pred conversion)
    inv_alpha_s: jnp.ndarray  # 1/alpha(t_s) (data prediction)
    sigma_s: jnp.ndarray      # sigma(t_s)
    # predictor (transition i -> i+1)
    p_sr: jnp.ndarray   # sigma(t_next)/sigma(t_s)
    p_m0: jnp.ndarray   # alpha(t_next) * phi1(h_i)
    p_d: jnp.ndarray    # -alpha(t_next) * phik(h_i) * h_i/h_{i-1}; 0 if no history
    # corrector (re-does transition i-1 -> i with the step-i model output)
    c_g: jnp.ndarray    # 1 where the corrector is active, 0 at the first step
    c_sr: jnp.ndarray   # sigma(t_s)/sigma(t_prev)
    c_m0: jnp.ndarray   # alpha(t_s) * phi1(h_{i-1})
    c_d: jnp.ndarray    # -alpha(t_s) * phik(h_{i-1})


class State(NamedTuple):
    last_x: jnp.ndarray  # previous step's (corrected) sample
    m_prev: jnp.ndarray  # previous step's data prediction


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))          # [steps+1], 1 -> 1/N
    alpha = schedule.marginal_alpha(ts)
    sigma = schedule.marginal_sigma(ts)
    lam = schedule.marginal_lambda(ts)
    h = lam[1:] - lam[:-1]                       # [steps], > 0
    h_prev = np.concatenate([[1.0], h[:-1]])     # [steps]; [0] is a dummy
    phi1 = -np.expm1(-h)                         # 1 - e^-h
    phik = phi1 / h - 1.0                        # negative

    p_d = -alpha[1:] * phik * h / h_prev
    p_d[: start_step + 1] = 0.0  # first executed step: no history

    # corrector tables are the transition (i-1 -> i), i.e. h shifted by one
    c_g = np.ones(steps)
    c_g[: start_step + 1] = 0.0  # first executed step: nothing to correct
    c_sr = np.concatenate([[1.0], sigma[1:-1] / sigma[:-2]])
    c_m0 = np.concatenate([[0.0], alpha[1:-1] * phi1[:-1]])
    c_d = np.concatenate([[0.0], -alpha[1:-1] * phik[:-1]])
    return Plan(
        model_t=to_f32(schedule.model_times(ts[:-1])),
        alpha_s=to_f32(alpha[:-1]),
        inv_alpha_s=to_f32(1.0 / alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        p_sr=to_f32(sigma[1:] / sigma[:-1]),
        p_m0=to_f32(alpha[1:] * phi1),
        p_d=to_f32(p_d),
        c_g=to_f32(c_g),
        c_sr=to_f32(c_sr),
        c_m0=to_f32(c_m0),
        c_d=to_f32(c_d),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    return State(last_x=jnp.zeros(shape, dtype),
                 m_prev=jnp.zeros(shape, dtype))


def step(p: Plan, i, x, eps, state: State):
    """One UniPC step: correct the arrival at `x` using this step's model
    output, then predict the next sample. `i` may be a traced scan counter."""
    m = (x - p.sigma_s[i] * eps) * p.inv_alpha_s[i]
    corr = (p.c_sr[i] * state.last_x + p.c_m0[i] * state.m_prev
            + p.c_d[i] * (m - state.m_prev))
    xc = p.c_g[i] * corr + (1.0 - p.c_g[i]) * x
    x_next = p.p_sr[i] * xc + p.p_m0[i] * m + p.p_d[i] * (m - state.m_prev)
    return x_next, State(last_x=xc, m_prev=m)

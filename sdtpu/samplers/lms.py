"""LMS sampler (k-diffusion "LMS", Adams-Bashforth on the actual sigma grid).

Linear multistep integration of the probability-flow ODE in the
k-diffusion parametrization (``x_k = x / alpha``, ``sigma_k = sigma /
alpha``, ``dx_k/dsigma_k = eps`` — see sdtpu.samplers.euler). Where PLMS
uses the FIXED uniform-grid Adams-Bashforth weights (plms.py:56-63), LMS
integrates the Lagrange interpolation basis over the real (non-uniform)
sigma interval of each step:

    c_j = integral_{sig_i}^{sig_{i+1}} prod_{m != j}
              (t - sig_{i-m}) / (sig_{i-j} - sig_{i-m}) dt

so the method stays 4th-order-accurate under any spacing (Karras included)
— this is exactly scipy's `integrate.quad` construction in k-diffusion's
`sample_lms`, done here once at plan time with a dense trapezoid rule into
a static ``[steps, 4]`` table; the scan body stays one fused
multiply-accumulate over the eps history. History rides State like PLMS;
the order ramps 1->4 from the first EXECUTED step (img2img warm starts
zero the higher-order taps).

Capability extension over the reference (DPM/PLMS only, reference:
README.md:61); matches the A1111/k-diffusion "LMS" and "LMS Karras"
sampler choices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32


class Plan(NamedTuple):
    model_t: jnp.ndarray   # [steps] UNet-facing timestep at step start
    alpha_s: jnp.ndarray   # alpha(t_s) (v-pred conversion + warm starts)
    sigma_s: jnp.ndarray   # sigma(t_s)
    a_ratio: jnp.ndarray   # alpha(t_next) / alpha(t_s)
    lms_coef: jnp.ndarray  # [steps, 4] alpha(t_next) * integrated weights
    #                        for (eps, e1, e2, e3)


class State(NamedTuple):
    e1: jnp.ndarray
    e2: jnp.ndarray
    e3: jnp.ndarray


def _weights(sigk: np.ndarray, i: int, order: int, n_quad: int = 4096):
    """Integrated Lagrange-basis weights for step i at the given order."""
    lo, hi = sigk[i], sigk[i + 1]
    t = np.linspace(lo, hi, n_quad)
    out = np.zeros(4)
    for j in range(order):
        basis = np.ones_like(t)
        for m in range(order):
            if m != j:
                basis *= (t - sigk[i - m]) / (sigk[i - j] - sigk[i - m])
        out[j] = np.trapezoid(basis, t)
    return out


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0,
         spacing: str = "uniform") -> Plan:
    """`start_step` > 0 (img2img warm start): the order ramp restarts at 1
    from the first executed step — zero-filled history never enters."""
    ts = (schedule.karras_times(steps) if spacing == "karras"
          else schedule.sampling_times(steps))       # [steps+1]
    alpha = np.asarray(schedule.marginal_alpha(ts), np.float64)
    sigma = np.asarray(schedule.marginal_sigma(ts), np.float64)
    sigk = sigma / alpha
    coef = np.zeros((steps, 4))
    for i in range(steps):
        order = int(min(max(i - start_step, 0) + 1, 4))
        coef[i] = alpha[i + 1] * _weights(sigk, i, order)
    return Plan(
        model_t=to_f32(schedule.model_times(ts[:-1])),
        alpha_s=to_f32(alpha[:-1]),
        sigma_s=to_f32(sigma[:-1]),
        a_ratio=to_f32(alpha[1:] / alpha[:-1]),
        lms_coef=to_f32(coef),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    z = jnp.zeros(shape, dtype)
    return State(e1=z, e2=z, e3=z)


def step(p: Plan, i, x, eps, state: State):
    c = p.lms_coef[i]
    d = c[0] * eps + c[1] * state.e1 + c[2] * state.e2 + c[3] * state.e3
    return p.a_ratio[i] * x + d, State(e1=eps, e2=state.e1, e3=state.e2)

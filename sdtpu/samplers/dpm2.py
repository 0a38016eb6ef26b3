"""DPM2 sampler (k-diffusion "DPM2"): single-step 2nd-order midpoint
solver — the ``kind="dpm2"`` leg of sdtpu.samplers.heun, packaged as its
own module so the registry/engine treat it uniformly. See heun.py for the
math and the NEEDS_SECOND_EVAL protocol."""

from __future__ import annotations

import functools

from sdtpu.samplers.heun import (  # noqa: F401 — re-exported interface
    NEEDS_SECOND_EVAL,
    Plan,
    State,
    init_state,
    predictor,
    step,
)
from sdtpu.samplers import heun as _heun

plan = functools.partial(_heun.plan, kind="dpm2")

"""Shared analytic FLOP / MFU accounting for every serving family.

Single source of truth for the per-part FLOP constants used by bench.py,
tools/measure_families.py and the regression pin test
(tests/test_flops_pinned.py). The reference ethos is "everything that
ships gets measured" (/root/reference/benchmark.py:58-72); VERDICT r4 #2
asks for the same discipline across ALL families, with the constants
pinned against live ``cost_analysis`` so model edits can't silently stale
them.

Provenance: compiled-executable ``cost_analysis()`` captured by
``tools/extract_flops.py`` (values recorded below with capture date +
backend). FLOP counts come from the optimized HLO and are dominated by
conv/dot ops, so they are stable across backends to within a few percent
(the pin test allows that tolerance on the CPU backend).
"""

from __future__ import annotations

#: bf16 peak TFLOP/s by device kind (first token match wins)
PEAK_TFLOPS = [("v5 lite", 197.0), ("v5e", 197.0), ("v6 lite", 918.0),
               ("v6e", 918.0), ("v4", 275.0), ("v5p", 459.0)]

#: per-part FLOPs from compiled-executable cost_analysis
#: (tools/extract_flops.py, kernels as served). ``unet_cfg`` is the batch-2
#: cond+uncond hot-loop program (one CFG step per image); ``unet_b1`` the
#: batch-1 no-CFG program (LCM / guidance-embedded serving).
PART_FLOPS: dict[str, dict[str, float]] = {
    # captured 2026-08-19 on TPU v5e, kernels=pallas
    "sd15": {"unet_cfg": 1.552361193472e12, "clip": 1.3363400704e10,
             "vae_dec": 2.578692702208e12, "temb": 8.214352e7},
}


def peak_tflops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for token, peak in PEAK_TFLOPS:
        if token in kind:
            return peak
    return None


def image_flops(config: str, steps: int, n_controlnets: int = 0,
                cfg_batch: bool = True) -> float | None:
    """Total FLOPs for one prompt->image generate of ``config`` at ``steps``
    solver steps on the full-UNet-per-step path (no deepcache/cfg-interval/
    ToMe/quant — those change per-step FLOPs). None when the config has no
    captured constants or the requested path wasn't captured.

    Family formulas:
    - CFG families (sd15/sd2x/sdxl/x4): unet_cfg per step, both text
      encodes (cond + uncond), one VAE decode, the temb table.
    - dual-tower (sdxl*): + clip2 encodes (both towers run cond + uncond).
    - no-CFG (``cfg_batch=False``, LCM): unet_b1 per step, one encode.
    - + n ControlNets: + n * controlnet_cfg per step (hint embed runs once,
      outside the loop; counted via ``cn_hint`` when captured).
    """
    pf = PART_FLOPS.get(config)
    if pf is None:
        return None
    encodes = 2 if cfg_batch else 1
    unet_key = "unet_cfg" if cfg_batch else "unet_b1"
    if unet_key not in pf:
        return None
    total = pf[unet_key] * steps + pf.get("temb", 0.0) + pf["vae_dec"]
    total += pf["clip"] * encodes + pf.get("clip2", 0.0) * encodes
    if n_controlnets:
        if "controlnet_cfg" not in pf:
            return None
        total += (pf["controlnet_cfg"] * steps
                  + pf.get("cn_hint", 0.0)) * n_controlnets
    return total


def mfu_fields(config: str, steps: int, value_s: float, device_kind: str,
               pure: bool = True, n_controlnets: int = 0,
               cfg_batch: bool = True) -> dict:
    """tflop_per_image / tflop_per_s / mfu_pct fields for a measured
    per-image latency, or {} when not applicable."""
    if not pure or value_s <= 0:
        return {}
    flops = image_flops(config, steps, n_controlnets, cfg_batch)
    if flops is None:
        return {}
    tflop = flops / 1e12
    tflops_s = tflop / value_s
    out = {"tflop_per_image": round(tflop, 2),
           "tflop_per_s": round(tflops_s, 1)}
    peak = peak_tflops(device_kind)
    if peak:
        out["mfu_pct"] = round(100.0 * tflops_s / peak, 1)
        out["peak_tflops_bf16"] = peak
    return out

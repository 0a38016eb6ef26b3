"""Regression pin for the analytic FLOP constants (VERDICT r4 #2).

sdtpu/bench/flops.py embeds per-part FLOP constants captured from
compiled-executable ``cost_analysis()`` on the real chip. A model edit that
changes FLOPs (channel widths, attention shape, extra blocks) would
silently stale them — and every MFU number derived from them — so this
test recompiles each pinned part on the CPU backend and asserts the live
``cost_analysis`` agrees within tolerance.

Tolerance: the committed constants are TPU captures with production
(pallas) kernels; the CPU backend compiles the xla-kernel variant, whose
conv/dot set differs only in attention bookkeeping — measured deltas are
under 3% for every sd15 part (2026-08-20 capture), so 6% catches any real
model change (the smallest structural edit, e.g. one resblock, shifts the
UNet by ~3x that) without flaking on backend drift.

Marked slow: full-shape CPU compiles take ~40 s for sd15 (bigger configs
scale with their UNet size). Not in the smoke tier.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from sdtpu.bench.flops import PART_FLOPS  # noqa: E402

pytestmark = pytest.mark.slow

TOL = 0.06


def _extract(config, controlnet=False):
    from extract_flops import extract

    return extract(config, kernels="xla", controlnet=controlnet)


@pytest.mark.parametrize("config", sorted(PART_FLOPS))
def test_constants_match_live_cost_analysis(config):
    needs_cn = any(k.startswith(("controlnet", "cn_"))
                   for k in PART_FLOPS[config])
    live = _extract(config, controlnet=needs_cn)
    for part, pinned in PART_FLOPS[config].items():
        got = live[part]["flops"]
        assert got == pytest.approx(pinned, rel=TOL), (
            f"{config}.{part}: pinned {pinned:.4g} vs live cost_analysis "
            f"{got:.4g} ({100 * (got - pinned) / pinned:+.1f}%) — the model "
            f"changed; re-run tools/extract_flops.py --config {config} and "
            f"update sdtpu/bench/flops.py")


def test_image_flops_formula_sd15():
    """The per-image composition: 20-step CFG sd15 ~ 33-35 TFLOP (unet_cfg
    x20 + 2 text encodes + VAE decode + temb table)."""
    from sdtpu.bench import flops as fl

    total = fl.image_flops("sd15", 20)
    pf = PART_FLOPS["sd15"]
    assert total == pytest.approx(
        pf["unet_cfg"] * 20 + pf["clip"] * 2 + pf["vae_dec"] + pf["temb"])
    assert 30e12 < total < 40e12


def test_mfu_fields_gating():
    from sdtpu.bench import flops as fl

    assert fl.mfu_fields("sd15", 20, 0.5, "TPU v5 lite")["mfu_pct"] > 0
    assert fl.mfu_fields("sd15", 20, 0.5, "TPU v5 lite", pure=False) == {}
    assert fl.mfu_fields("nope", 20, 0.5, "TPU v5 lite") == {}
    # unknown device: throughput reported, no %peak claim
    out = fl.mfu_fields("sd15", 20, 0.5, "FPGA x9000")
    assert "tflop_per_s" in out and "mfu_pct" not in out

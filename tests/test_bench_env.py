"""bench.py environment hardening (VERDICT r4 weak #3/#4): synthetic-probe
unit tests for the degraded-session detectors and the compile-cache
hit/miss signal — the logic that keeps a broken session from being recorded
as a broken build (the round-3 capture failure mode). Pure-CPU, no model.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (top-level imports are stdlib-only)

pytestmark = pytest.mark.smoke

HEALTHY = {"dispatch_ms": 0.04, "trivial_compile_s": 0.5,
           "transfer_ms_64kb": 30.0, "first_fetch_s": 0.2}
# a uniformly slow session: every probe signal elevated but (hypothetically)
# the median might still squeak into the band — warnings must fire anyway
SLOW = {"dispatch_ms": 29.0, "trivial_compile_s": 45.0,
        "transfer_ms_64kb": 5200.0, "first_fetch_s": 9.0}


def test_healthy_probe_no_warnings():
    assert bench.env_evidence(HEALTHY, init_s=21.0) == []


def test_slow_probe_warns_even_in_band():
    """env_evidence is consulted unconditionally (bench main stores it as
    env_warnings BEFORE any band check), so an in-band median with an
    anomalous probe still carries the evidence."""
    ev = bench.env_evidence(SLOW, init_s=580.0)
    assert len(ev) == 4
    joined = " ".join(ev)
    for signal in ("dispatch_ms", "trivial_compile_s",
                   "transfer_ms_64kb", "init_s"):
        assert signal in joined, (signal, ev)


def test_probe_tax_scales_with_image_bytes():
    """The predicted per-call tunnel tax = one dispatch + the image fetch
    scaled from the 64 KB round-trip; 1024px fetches 4x the bytes of 512px."""
    t512 = bench.probe_tax_ms(HEALTHY, 512)
    t1024 = bench.probe_tax_ms(HEALTHY, 1024)
    img_kb64 = 512 * 512 * 3 / 65536.0
    assert t512 == pytest.approx(
        HEALTHY["dispatch_ms"] + HEALTHY["transfer_ms_64kb"] * img_kb64,
        rel=0.01)
    assert t1024 == pytest.approx(4 * t512, rel=0.05)
    # a degraded tunnel predicts a visibly larger tax
    assert bench.probe_tax_ms(SLOW, 512) > 100 * t512


def test_cache_entry_count_tracks_new_entries(tmp_path, monkeypatch):
    """The hit/miss signal: entries written to the persistent cache dir
    during a run mean the pipeline compiled new HLO (miss)."""
    import jax

    monkeypatch.setenv("SDTPU_COMPILE_CACHE", str(tmp_path / "xla"))
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        _check_counts(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def _check_counts(tmp_path):
    assert bench.cache_entry_count() == 0  # dir absent
    d = tmp_path / "xla"
    d.mkdir()
    (d / "jit_prog-aaaa-cache").write_bytes(b"x")
    before = bench.cache_entry_count()
    (d / "jit_prog-bbbb-cache").write_bytes(b"y")
    after = bench.cache_entry_count()
    assert before == 1 and after == 2
    assert after > before  # -> miss=True in the emitted JSON

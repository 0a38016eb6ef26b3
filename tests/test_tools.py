"""Tooling tests: checkpoint converter round trip, native format, size
override, sweep smoke."""

import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY
from sdtpu.io.params import init_pipeline_params
from sdtpu.io.weights import (
    NATIVE_SUFFIX,
    load_native,
    load_pipeline_params,
    params_to_ldm,
    save_native,
)

REPO = Path(__file__).resolve().parent.parent


def test_native_format_roundtrip(tmp_path):
    params = init_pipeline_params(jax.random.PRNGKey(1), TINY)
    f = tmp_path / f"model{NATIVE_SUFFIX}"
    save_native(params, f)
    back = load_native(f)
    a = jax.tree_util.tree_flatten_with_path(params)[0]
    b = {tuple(map(str, p)): v
         for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert len(a) == len(b)
    for p, v in a:
        np.testing.assert_array_equal(np.asarray(v), b[tuple(map(str, p))])


def test_convert_weights_cli(tmp_path):
    """Full converter flow: LDM safetensors -> native dir -> Context loads it
    and generates (the todlc.py-equivalent path, end to end)."""
    import safetensors.numpy

    params = init_pipeline_params(jax.random.PRNGKey(2), TINY)
    sd = params_to_ldm(jax.tree.map(np.asarray, params), TINY)
    ckpt = tmp_path / "sd.safetensors"
    safetensors.numpy.save_file(sd, str(ckpt))
    out_dir = tmp_path / "model_dir"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_weights.py"),
         str(ckpt), str(out_dir), "--config", "tiny", "--dtype", "float32"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr
    assert (out_dir / f"model{NATIVE_SUFFIX}").exists()

    # idempotent re-run skips (reference: todlc.py:85-101)
    r2 = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_weights.py"),
         str(ckpt), str(out_dir), "--config", "tiny"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert "exists" in r2.stdout

    loaded = load_pipeline_params(out_dir, TINY)
    np.testing.assert_array_equal(
        np.asarray(loaded["unet"]["conv_in"]["w"]),
        np.asarray(params["unet"]["conv_in"]["w"]),
    )
    # Context consumes the converted dir (demo tokenizer fallback)
    ctx = sdtpu.Context(model_dir=out_dir, config="tiny", steps=2)
    img = ctx.generate("the horse", seed=0)
    assert img.shape == (TINY.image_size, TINY.image_size, 3)


def test_size_override():
    ctx = sdtpu.Context(config="tiny", steps=2, size=32)
    img = ctx.generate("the horse", seed=0)
    assert img.shape == (32, 32, 3)
    with pytest.raises(sdtpu.SdtpuError):
        sdtpu.Context(config="tiny", steps=2, size=33)


def test_sweep_quick(tmp_path):
    from sdtpu.bench.sweep import run_sweep

    res = run_sweep(config="tiny", iters=1, quick=True,
                    out_dir=str(tmp_path), sizes=(16,), steps_list=(2,))
    assert len(res) == 1
    assert res[0]["s_per_image"] > 0
    assert (tmp_path / "sweep.jsonl").exists()


def test_benchmark_parts_tiny(tmp_path):
    from sdtpu.bench.runner import benchmark_parts

    summary = benchmark_parts(
        TINY, warmup=1, iters=3, out_dir=tmp_path, kernels="xla",
    )
    assert set(summary) == {"temb", "text_encoder", "unet", "vae_decoder"}
    for name, r in summary.items():
        assert not r.get("error"), name
        assert r["latency_ms"] > 0
        assert (tmp_path / f"{name}.json").exists()
    from sdtpu.bench.analyze import analyze

    report = analyze(tmp_path)
    assert "unet" in report and "pipeline estimate" in report


def test_profile_ops_tiny():
    import jax

    from sdtpu.bench.xprof import profile_ops, summarize
    from sdtpu.io.params import init_pipeline_params
    from sdtpu.models import vae

    params = init_pipeline_params(jax.random.PRNGKey(0), TINY)
    fn = jax.jit(lambda z: vae.apply(params["vae"], z, TINY.vae))
    z = jax.numpy.zeros((1, TINY.latent_size, TINY.latent_size, 4))
    ops = profile_ops(fn, (z,))
    assert ops, "no device events captured"
    text = summarize(ops)
    assert "per-class totals" in text


def test_orbax_checkpoint_roundtrip_and_sharded_restore(tmp_path):
    from sdtpu.io.orbax_ckpt import (
        is_orbax_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from sdtpu.parallel.mesh import make_mesh

    params = init_pipeline_params(jax.random.PRNGKey(6), TINY)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(params, ckpt)
    assert is_orbax_checkpoint(ckpt)

    # plain restore: exact round trip
    back = load_checkpoint(ckpt, TINY)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # direct-to-mesh restore: values equal, leaves sharded over 8 devices
    mesh = make_mesh(data=2, model=4)
    sharded = load_checkpoint(ckpt, TINY, mesh=mesh)
    qw = sharded["clip"]["blocks"][0]["q"]["w"]
    assert len(qw.devices()) == 8 or len(qw.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(qw), np.asarray(params["clip"]["blocks"][0]["q"]["w"]))


def test_context_loads_orbax_dir(tmp_path):
    from sdtpu.io.orbax_ckpt import save_checkpoint

    params = init_pipeline_params(jax.random.PRNGKey(8), TINY)
    save_checkpoint(params, tmp_path / "ckpt")
    ctx = sdtpu.Context(model_dir=tmp_path / "ckpt", config="tiny", steps=2)
    img = ctx.generate("the horse", seed=0)
    assert img.shape == (TINY.image_size, TINY.image_size, 3)


def test_convert_weights_int8w_roundtrip(tmp_path):
    """--int8w bakes weight-only int8 (w8/w8_scale) into the artifact; the
    Context loads it and generates, scales stay float32 through cast_params
    (the deployed-int8 path, reference: todlc.py two-phase export)."""
    import safetensors.numpy

    params = init_pipeline_params(jax.random.PRNGKey(3), TINY)
    sd = params_to_ldm(jax.tree.map(np.asarray, params), TINY)
    ckpt = tmp_path / "sd.safetensors"
    safetensors.numpy.save_file(sd, str(ckpt))
    out_dir = tmp_path / "model_int8w"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_weights.py"),
         str(ckpt), str(out_dir), "--config", "tiny", "--dtype", "float32",
         "--int8w", "dense"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr

    loaded = load_pipeline_params(out_dir, TINY)
    # conv sites replaced by w8/w8_scale where big enough; TINY weights are
    # small so force-check the format by at least one quantized site OR all
    # kept bf16 (min_elems gate) — verify the tree loads and runs either way
    from sdtpu.io.params import cast_params

    casted = cast_params(loaded, "bfloat16")

    def scales_f32(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "w8_scale":
                    assert v.dtype == np.float32
                else:
                    scales_f32(v)
        elif isinstance(node, list):
            for v in node:
                scales_f32(v)

    scales_f32(casted)
    ctx = sdtpu.Context(model_dir=out_dir, config="tiny", steps=2)
    img = ctx.generate("the horse", seed=0)
    assert img.shape == (TINY.image_size, TINY.image_size, 3)


def test_validate_real_packet(tmp_path):
    """tools/validate_real.py end to end on the synthetic LDM fixture
    (VERDICT r2 task 8): convert -> fixed-seed image -> determinism gate ->
    PSNR gate vs a reference image -> JSON verdict. Only the real-weights
    artifact is missing in this environment, not the code path."""
    import json

    import safetensors.numpy

    params = init_pipeline_params(jax.random.PRNGKey(4), TINY)
    from sdtpu.io.weights import params_to_ldm as _to_ldm

    sd = _to_ldm(jax.tree.map(np.asarray, params), TINY)
    ckpt = tmp_path / "sd.safetensors"
    safetensors.numpy.save_file(sd, str(ckpt))

    work = tmp_path / "val"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_real.py"), str(ckpt),
         "--config", "tiny", "--steps", "2", "--work-dir", str(work),
         "--platform", "cpu", "--json-out", str(tmp_path / "verdict.json")],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    verdict = json.loads((tmp_path / "verdict.json").read_text())
    assert verdict["pass"] is True
    assert verdict["gates"]["deterministic"]["pass"] is True
    assert verdict["gates"]["psnr"]["pass"] is None      # skipped, no ref
    assert verdict["gates"]["clip_score"]["pass"] is None
    img_png = work / "astronaut_seed0.png"
    assert img_png.exists() and (work / "astronaut_seed0.bin").exists()

    # PSNR gate: the image itself as reference passes; an unrelated
    # reference fails and flips the exit code
    r2 = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_real.py"),
         str(work / "model"), "--config", "tiny", "--steps", "2",
         "--work-dir", str(work), "--platform", "cpu",
         "--ref-image", str(img_png)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    v2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert v2["gates"]["psnr"]["pass"] is True
    assert v2["gates"]["psnr"]["psnr_db"] == float("inf")

    from PIL import Image

    bad = tmp_path / "bad_ref.png"
    Image.fromarray(
        np.zeros((TINY.image_size, TINY.image_size, 3), np.uint8)).save(bad)
    r3 = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_real.py"),
         str(work / "model"), "--config", "tiny", "--steps", "2",
         "--work-dir", str(work), "--platform", "cpu",
         "--ref-image", str(bad), "--min-psnr", "25"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r3.returncode == 1, r3.stdout + r3.stderr


@pytest.mark.slow
@pytest.mark.parametrize("family,config", [
    ("lcm", "tiny_lcm"),
    ("sdxl_2stage", "tiny_xl"),
    ("controlnet", "tiny"),
    ("x4", "tiny_x4"),
])
def test_validate_real_families(tmp_path, family, config):
    """Every shipped serving family drives through the one-command
    validation packet (VERDICT r4 #7): a checkpoint-bearing environment can
    run `validate_real --family <x>` on day one. Demo weights exercise the
    full path (convert gate skipped); gates must run and pass."""
    import json

    cmd = [sys.executable, str(REPO / "tools" / "validate_real.py"), "demo",
           "--family", family, "--config", config, "--steps", "2",
           "--work-dir", str(tmp_path / "val"), "--platform", "cpu",
           "--json-out", str(tmp_path / "verdict.json")]
    if family == "sdxl_2stage":
        cmd += ["--refiner-config", "tiny_xl_ref"]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO))
    assert r.returncode == 0, r.stdout + r.stderr
    v = json.loads((tmp_path / "verdict.json").read_text())
    assert v["family"] == family and v["config"] == config
    assert v["pass"] is True
    assert v["gates"]["deterministic"]["pass"] is True
    # the family image landed on disk
    assert (tmp_path / "val" / "astronaut_seed0.bin").exists()


def test_validate_real_unconvertible_config_errors(tmp_path):
    """A file checkpoint with a config outside the wired conversion set is
    a typed usage error (rc=2), not a crash."""
    ckpt = tmp_path / "x.safetensors"
    ckpt.write_bytes(b"\0" * 8)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_real.py"),
         str(ckpt), "--family", "lcm", "--config", "tiny_lcm",
         "--work-dir", str(tmp_path / "val"), "--platform", "cpu"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    assert r.returncode == 2, r.stdout + r.stderr
    assert "already-converted model dir" in r.stdout

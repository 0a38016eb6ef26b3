"""Persistent compile cache: a second process must HIT the cache written by
the first (VERDICT r1 #7 — the analogue of the reference's serialized HTP
context blobs, qnn_context.cpp:894-956, whose reuse it verified by logging
init time, context.cpp:77-79). Runs on the CPU backend with the TINY config;
the cache mechanism (jax persistent compilation cache) is backend-uniform.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
cache = sys.argv[1]
import jax
# cache EVERYTHING: with the default 1s min-compile-time floor, a program
# compiling at ~1s gets cached in one process but not another (compile-time
# jitter on a loaded 1-core box), making "no new entries" assertions flaky
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# relocatable keys (see Context): the default GPU sub-cache flag bakes the
# cache dir's absolute path into every key
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
import sdtpu
t0 = time.perf_counter()
ctx = sdtpu.Context(model_dir=None, steps=2, sampler="dpm", config="tiny",
                    compile_cache=cache)
img = ctx.generate("cache probe", seed=0)
dt = time.perf_counter() - t0
assert img.shape == (16, 16, 3)
print(json.dumps({"elapsed_s": dt}))
"""


def _run(cache_dir: Path) -> float:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, str(cache_dir)],
        capture_output=True, text=True, cwd=str(REPO), timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": str(REPO), "HOME": str(cache_dir.parent)},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])["elapsed_s"]


def test_second_process_hits_persistent_cache(tmp_path):
    cache = tmp_path / "xla-cache"
    cache.mkdir()
    _run(cache)
    entries_after_first = {p.name for p in cache.iterdir()}
    assert entries_after_first, "first run must write cache entries"

    _run(cache)
    entries_after_second = {p.name for p in cache.iterdir()}
    # a cache HIT adds no new executables; a miss would re-serialize under
    # a different key
    assert entries_after_second == entries_after_first


def _cli(args, cwd, home):
    return subprocess.run(
        [sys.executable, "-m", "sdtpu.cli", *args],
        capture_output=True, text=True, cwd=str(cwd), timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": str(REPO), "HOME": str(home)},
    )


def test_warmup_packed_artifact_round_trip(tmp_path):
    """VERDICT r3 #8: `sdtpu warmup --pack` builds a deployable compile-
    cache artifact; a FRESH process pointed at the UNPACKED artifact must
    warm-start (cache hit: its generate adds no new executables) — the
    analogue of shipping the reference's serialized HTP blobs
    (qnn_context.cpp:894-956)."""
    build = tmp_path / "build-cache"
    artifact = tmp_path / "warmcache.tar.gz"
    r = _cli(["warmup", "--configs", "tiny", "--steps", "2",
              "--cache-dir", str(build), "--pack", str(artifact),
              "--platform", "cpu", "--log-level", "4"],
             cwd=REPO, home=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert lines[-1]["entries"] > 0
    assert lines[-1]["artifact"] == str(artifact)
    assert artifact.exists() and artifact.stat().st_size > 0

    deploy = tmp_path / "deploy-cache"
    r = _cli(["warmup", "--unpack", str(artifact),
              "--cache-dir", str(deploy)], cwd=REPO, home=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    shipped = {p.name for p in deploy.iterdir()}
    assert shipped == {p.name for p in build.iterdir() if p.is_file()}

    # fresh-process first-generate from the shipped cache: HIT, not rebuild
    _run(deploy)
    assert {p.name for p in deploy.iterdir()} == shipped


def test_warmup_unpack_rejects_traversal(tmp_path):
    """ADVICE r4 (medium): a tampered artifact whose member escapes the
    cache dir — including the str-prefix trap '../<dir>2/f' that resolves
    to a SIBLING sharing the path prefix — must be rejected, and nothing
    may be written outside --cache-dir."""
    import tarfile

    cache = tmp_path / "xla"
    cache.mkdir()
    sibling_trap = tmp_path / "xla2"  # str-startswith would admit this
    for member in ("../xla2/pwned", "../outside", "/abs/path", "a/../../b"):
        art = tmp_path / "evil.tar.gz"
        with tarfile.open(art, "w:gz") as tf:
            p = tmp_path / "payload"
            p.write_bytes(b"x")
            tf.add(p, arcname=member)
        r = _cli(["warmup", "--unpack", str(art), "--cache-dir", str(cache)],
                 cwd=REPO, home=tmp_path)
        assert r.returncode != 0, (member, r.stdout)
        assert "unsafe archive member" in (r.stdout + r.stderr), member
        assert not sibling_trap.exists()
        assert not (tmp_path / "outside").exists()
        assert not any(cache.iterdir())
    # a well-formed flat member still unpacks
    art = tmp_path / "good.tar.gz"
    with tarfile.open(art, "w:gz") as tf:
        p = tmp_path / "entry"
        p.write_bytes(b"ok")
        tf.add(p, arcname="entry")
    r = _cli(["warmup", "--unpack", str(art), "--cache-dir", str(cache)],
             cwd=REPO, home=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (cache / "entry").read_bytes() == b"ok"

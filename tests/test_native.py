"""Native (C++) component parity vs the Python implementations.

Builds csrc/libsdtpu on demand (skips if no toolchain). The contract: native
tokenizer ids and DPM updates must be numerically identical / fp32-close to
the Python side — the same golden-test bar the reference applied to its C++
components by hand (reference: test/test_dpm.cpp, test/test_tokenizer.cpp).
"""

import shutil

import numpy as np
import pytest

from sdtpu.tokenizer import Tokenizer, bytes_to_unicode

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="no native toolchain",
)


@pytest.fixture(scope="module")
def lib():
    from sdtpu.io import native

    try:
        return native.load_library()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native build failed: {e}")


@pytest.fixture(scope="module")
def flat_file(tmp_path_factory):
    from sdtpu.engine.context import DEMO_MERGES

    base = list(bytes_to_unicode().values())
    lines = (base + [c + "</w>" for c in base]
             + [f"{a} {b}" for a, b in DEMO_MERGES])
    p = tmp_path_factory.mktemp("tok") / "ctokenizer.txt"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return p


PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "The   QUICK brownfox ...",
    "it's 123 things, isn't it?",
    "hello,world!!!don't 'll x",
    "résumé café née",
    "emoji 🚀🚀 test",
    "日本語のテキスト",
    "mixed 日本 and english",
    "a&amp;b &#65; &#x42;",
    "x&copy;y &hellip; &mdash; &eacute;t&eacute; &nleqslant; &notanentity; &lt",
    "&#147;quoted&#148; &#x1F600; &#0; &#xD800; &#999999999; &# &",
    "quote's and can't and we're and I'm and you'll and he'd and they've",
    "'s at start",
    "numbers 0 1 22 333 4444",
    "İstanbul STRASSE ΣΙΓΜΑ",
    "",
    # punct-run-then-contraction: the apostrophe is consumed greedily by the
    # run, exactly as CLIP's regex does ("!!'s" -> ["!!'", "s"])
    "!!'s (.'s --'ll #'t ''s",
]


def test_native_tokenizer_matches_python(lib, flat_file):
    from sdtpu.io.native import NativeTokenizer

    py = Tokenizer.from_flat_file(flat_file)
    nat = NativeTokenizer(flat_file)
    assert nat.vocab_size == py.vocab_size
    for p in PROMPTS:
        assert nat.tokenize(p) == py.tokenize(p), f"mismatch on {p!r}"


def test_native_tokenizer_truncation(lib, flat_file):
    from sdtpu.io.native import NativeTokenizer

    py = Tokenizer.from_flat_file(flat_file)
    nat = NativeTokenizer(flat_file)
    long = "horse " * 200
    assert nat.tokenize(long, 77) == py.tokenize(long, 77)
    assert nat.tokenize("the horse", 16) == py.tokenize("the horse", 16)


def test_native_dpm_matches_python(lib):
    from sdtpu.io.native import NativeDpm
    from sdtpu.samplers import dpm
    from sdtpu.samplers.schedule import NoiseSchedule

    steps = 20
    sched = NoiseSchedule.sd_v1()
    plan = dpm.plan(sched, steps)
    nat = NativeDpm()
    nat.prepare(steps)

    np.testing.assert_allclose(
        nat.model_ts(), np.asarray(plan.model_t), atol=1e-3)

    rng = np.random.default_rng(0)
    x_py = rng.standard_normal(64).astype(np.float32)
    x_nat = x_py.copy()
    st = dpm.init_state(x_py.shape)
    import jax.numpy as jnp

    for i in range(steps):
        eps = rng.standard_normal(64).astype(np.float32)
        x_jnp, st = dpm.step(plan, i, jnp.asarray(x_py), jnp.asarray(eps), st)
        x_py = np.asarray(x_jnp)
        x_nat = nat.update(i, x_nat, eps)
        np.testing.assert_allclose(x_nat, x_py, atol=2e-4,
                                   err_msg=f"step {i}")


def test_native_error_surface(lib, flat_file):
    from sdtpu.io.native import NativeDpm, NativeTokenizer

    with pytest.raises(RuntimeError, match="invalid argument"):
        NativeTokenizer("/nonexistent/vocab.txt")
    nat = NativeDpm()
    with pytest.raises(RuntimeError, match="runtime error"):
        nat.update(0, np.zeros(4, np.float32), np.zeros(4, np.float32))


def test_simple_app_e2e_engine(lib, tmp_path):
    """The native E2E app drives the embedded-Python engine through the C
    ABI: setup -> generate -> img2img(output fed back) -> raw .bin outputs
    (the reference's simple_app flow, test/simple_app.cpp:6-38, plus the
    img2img extension)."""
    import os
    import pathlib
    import subprocess

    csrc = pathlib.Path(__file__).resolve().parents[1] / "csrc"
    app = csrc / "build" / "simple_app"
    if not app.exists():
        pytest.skip("simple_app not built")
    env = {**os.environ,
           "PYTHONPATH": f"{csrc.parent}:{os.environ.get('PYTHONPATH', '')}",
           "JAX_PLATFORMS": "cpu"}
    run = subprocess.run(
        [str(app), "the horse", "tiny"], cwd=tmp_path,
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    a = np.fromfile(tmp_path / "output.bin", np.uint8)
    b = np.fromfile(tmp_path / "output2.bin", np.uint8)
    assert a.size == 16 * 16 * 3 and b.size == a.size
    assert not np.array_equal(a, b)  # img2img at strength .5 repaints


def test_threaded_capi_under_tsan(flat_file):
    """8 threads hammer the shared tokenizer, the mutex-guarded global error
    table, and per-thread DPM solvers under -fsanitize=thread (the race
    detection the reference's 3-thread init, context.cpp:49-80, never had).
    TSan aborts the binary on any data race; the binary itself checks
    cross-thread id consistency against single-threaded golden ids."""
    import os
    import pathlib
    import subprocess

    csrc = pathlib.Path(__file__).resolve().parents[1] / "csrc"
    build = subprocess.run(
        ["make", "-C", str(csrc), "SANITIZE=thread"],
        capture_output=True, text=True, timeout=600,
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build failed: {build.stderr[-500:]}")
    run = subprocess.run(
        [str(csrc / "build-thread" / "test_threads"), str(flat_file), "8",
         "100"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1"},
    )
    assert run.returncode == 0, run.stderr[-2000:] + run.stdout[-500:]


def test_capi_refcount_semantics(lib):
    """Engine handle validation without embedding: a garbage pointer must be
    rejected as INVALID_CONTEXT, not crash (reference: TRY_RETRIEVE_CONTEXT,
    libsdod.cpp:48-63)."""
    import ctypes

    lib.sdtpu_set_steps.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    bogus = ctypes.c_void_p(0)
    assert lib.sdtpu_set_steps(bogus, 20) in (4, 6)  # INVALID_CONTEXT | UNSUPPORTED


def test_capi_lora_routing(lib, tmp_path):
    """C-ABI LoRA knob: sdtpu_load_lora + sdtpu_generate_image_lora route a
    named adapter per request, matching the Python Context outputs (both
    sides random-init tiny params from PRNGKey(0), so they agree exactly)."""
    import ctypes

    import jax
    from jax.tree_util import tree_map_with_path

    import sdtpu
    from sdtpu.train.lora import extract_lora, inject_lora, save_lora_npz

    c_void_p, c_char_p = ctypes.c_void_p, ctypes.c_char_p
    lib.sdtpu_setup.argtypes = [
        ctypes.POINTER(c_void_p), c_char_p, c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32]
    lib.sdtpu_load_lora.argtypes = [c_void_p, c_char_p, c_char_p]
    lib.sdtpu_generate_image_lora.argtypes = [
        c_void_p, c_char_p, ctypes.c_float, c_char_p,
        ctypes.POINTER(c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.sdtpu_release.argtypes = [c_void_p]
    lib.sdtpu_free_buffer.argtypes = [c_void_p]

    py = sdtpu.Context(config="tiny", steps=2)
    lp = inject_lora(py.params["unet"], rank=2, key=jax.random.PRNGKey(3))
    i = [0]

    def bump(p, leaf):
        if getattr(p[-1], "key", None) == "lora_b":
            i[0] += 1
            return 0.1 * jax.random.normal(
                jax.random.PRNGKey(3000 + i[0]), leaf.shape, leaf.dtype)
        return leaf

    npz = tmp_path / "style.npz"
    save_lora_npz(extract_lora(tree_map_with_path(bump, lp)), npz)
    py.load_lora("style", npz)
    want_lora = py.generate("the horse", seed=0, lora="style")
    want_base = py.generate("the horse", seed=0)

    handle = c_void_p()
    rc = lib.sdtpu_setup(ctypes.byref(handle), None, b"tiny", 2, 0, 0)
    if rc == 6:  # SDTPU_UNSUPPORTED: built without embedded python
        pytest.skip("libsdtpu built without SDTPU_EMBED_PYTHON")
    assert rc == 0
    try:
        assert lib.sdtpu_load_lora(handle, b"style", str(npz).encode()) == 0

        def gen(lora):
            buf, n = c_void_p(), ctypes.c_size_t()
            rc = lib.sdtpu_generate_image_lora(
                handle, b"the horse", 7.5, lora, ctypes.byref(buf),
                ctypes.byref(n))
            assert rc == 0, rc
            size = py.cfg.image_size
            out = np.ctypeslib.as_array(
                ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
                (n.value,)).copy().reshape(size, size, 3)
            lib.sdtpu_free_buffer(buf)
            return out

        # embedded context seed starts at 0, increments per call — pass
        # the adapter first so both calls see their expected seed
        got_lora = gen(b"style")     # seed 0
        assert np.array_equal(got_lora, want_lora)
        got_base = gen(b"")          # seed 1
        assert np.array_equal(got_base, py.generate("the horse", seed=1))
        assert not np.array_equal(got_lora, got_base)
        assert want_base.shape == got_base.shape
        # unknown adapter -> clean error, context still live
        buf, n = c_void_p(), ctypes.c_size_t()
        rc = lib.sdtpu_generate_image_lora(
            handle, b"the horse", 7.5, b"nope", ctypes.byref(buf),
            ctypes.byref(n))
        assert rc != 0
    finally:
        lib.sdtpu_release(handle)


def test_capi_concat_models_and_embedding(lib, tmp_path):
    """C ABI for the round-3 families: sdtpu_depth2img_image (5-ch),
    sdtpu_edit_image (8-ch ip2p), and sdtpu_load_embedding (textual
    inversion) — each matching the Python Context bit-for-bit (both sides
    random-init from PRNGKey(0))."""
    import ctypes

    import sdtpu

    c_void_p, c_char_p = ctypes.c_void_p, ctypes.c_char_p
    lib.sdtpu_setup.argtypes = [
        ctypes.POINTER(c_void_p), c_char_p, c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32]
    lib.sdtpu_depth2img_image.argtypes = [
        c_void_p, c_char_p, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.POINTER(c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.sdtpu_edit_image.argtypes = [
        c_void_p, c_char_p, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.sdtpu_load_embedding.argtypes = [c_void_p, c_char_p, c_char_p]
    lib.sdtpu_release.argtypes = [c_void_p]
    lib.sdtpu_free_buffer.argtypes = [c_void_p]

    def fetch(buf, n, size):
        out = np.ctypeslib.as_array(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
            (n.value,)).copy().reshape(size, size, 3)
        lib.sdtpu_free_buffer(buf)
        return out

    # ---- depth2img over the C ABI --------------------------------------
    py5 = sdtpu.Context(config="tiny_depth", steps=2)
    size = py5.cfg.image_size
    image = np.random.default_rng(0).integers(
        0, 256, (size, size, 3)).astype(np.uint8)
    depth = np.linspace(0, 500, size * size, dtype=np.float32).reshape(
        size, size)
    want = py5.depth2img("the horse", image, depth, strength=0.5, seed=0)

    handle = c_void_p()
    rc = lib.sdtpu_setup(ctypes.byref(handle), None, b"tiny_depth", 2, 0, 0)
    if rc == 6:
        pytest.skip("libsdtpu built without SDTPU_EMBED_PYTHON")
    assert rc == 0
    try:
        buf, n = c_void_p(), ctypes.c_size_t()
        img_c = np.ascontiguousarray(image)
        dep_c = np.ascontiguousarray(depth)
        rc = lib.sdtpu_depth2img_image(
            handle, b"the horse", 7.5, 0.5,
            img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img_c.size,
            dep_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dep_c.size, ctypes.byref(buf), ctypes.byref(n))
        assert rc == 0, rc
        assert np.array_equal(fetch(buf, n, size), want)
        # wrong depth count -> clean error
        rc = lib.sdtpu_depth2img_image(
            handle, b"x", 7.5, 0.5,
            img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img_c.size,
            dep_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dep_c.size - 1, ctypes.byref(buf), ctypes.byref(n))
        assert rc != 0
    finally:
        lib.sdtpu_release(handle)

    # ---- ip2p + textual inversion over the C ABI -----------------------
    py8 = sdtpu.Context(config="tiny_ip2p", steps=2)
    ids = py8.tokenizer.encode("horse")
    vecs = np.asarray(py8.params["clip"]["token_embedding"])[ids]
    npz = tmp_path / "h.npz"
    np.savez(npz, emb=vecs)
    want = py8.instruct_pix2pix("a horse photo", image, guidance=6.0,
                                image_guidance=1.4, seed=0)

    handle = c_void_p()
    assert lib.sdtpu_setup(ctypes.byref(handle), None, b"tiny_ip2p",
                           2, 0, 0) == 0
    try:
        assert lib.sdtpu_load_embedding(
            handle, b"<h>", str(npz).encode()) == 0
        buf, n = c_void_p(), ctypes.c_size_t()
        img_c = np.ascontiguousarray(image)
        rc = lib.sdtpu_edit_image(
            handle, b"a <h> photo", 6.0, 1.4,
            img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img_c.size, ctypes.byref(buf), ctypes.byref(n))
        assert rc == 0, rc
        assert np.array_equal(fetch(buf, n, size), want)
    finally:
        lib.sdtpu_release(handle)


def test_capi_quality_knobs(lib):
    """C-ABI PAG/DeepCache/ToMe knobs (sdtpu_set_pag_scale /
    sdtpu_set_deepcache / sdtpu_set_tome_ratio): each reconfigures the
    live embedded context and matches the Python Context outputs."""
    import ctypes

    import sdtpu

    c_void_p, c_char_p = ctypes.c_void_p, ctypes.c_char_p
    lib.sdtpu_setup.argtypes = [
        ctypes.POINTER(c_void_p), c_char_p, c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32]
    lib.sdtpu_set_pag_scale.argtypes = [c_void_p, ctypes.c_float]
    lib.sdtpu_set_deepcache.argtypes = [c_void_p, ctypes.c_int32]
    lib.sdtpu_set_tome_ratio.argtypes = [c_void_p, ctypes.c_float]
    lib.sdtpu_generate_image.argtypes = [
        c_void_p, c_char_p, ctypes.c_float,
        ctypes.POINTER(c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.sdtpu_release.argtypes = [c_void_p]
    lib.sdtpu_free_buffer.argtypes = [c_void_p]

    py = sdtpu.Context(config="tiny", steps=3)
    want_pag = py.generate("the horse", seed=0, pag_scale=3.0)
    py_dc = sdtpu.Context(config="tiny", steps=3, deepcache=2)
    want_dc = py_dc.generate("the horse", seed=1)

    handle = c_void_p()
    rc = lib.sdtpu_setup(ctypes.byref(handle), None, b"tiny", 3, 0, 0)
    if rc == 6:  # SDTPU_UNSUPPORTED: built without embedded python
        pytest.skip("libsdtpu built without SDTPU_EMBED_PYTHON")
    assert rc == 0
    try:
        def gen():
            buf, n = c_void_p(), ctypes.c_size_t()
            assert lib.sdtpu_generate_image(
                handle, b"the horse", 7.5, ctypes.byref(buf),
                ctypes.byref(n)) == 0
            size = py.cfg.image_size
            out = np.ctypeslib.as_array(
                ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
                (n.value,)).copy().reshape(size, size, 3)
            lib.sdtpu_free_buffer(buf)
            return out

        assert lib.sdtpu_set_pag_scale(handle, 3.0) == 0
        assert np.array_equal(gen(), want_pag)          # seed 0
        assert lib.sdtpu_set_pag_scale(handle, 0.0) == 0
        assert lib.sdtpu_set_deepcache(handle, 2) == 0
        assert np.array_equal(gen(), want_dc)           # seed 1
        # invalid cadence -> clean error, context still live
        assert lib.sdtpu_set_deepcache(handle, 1) != 0
        assert lib.sdtpu_set_deepcache(handle, 0) == 0
        assert lib.sdtpu_set_tome_ratio(handle, 0.9) != 0
        assert lib.sdtpu_set_tome_ratio(handle, 0.5) == 0
        out = gen()                                     # seed 2
        # tiny's levels sit under the 4096-token gate: bit-equal baseline
        assert np.array_equal(out, py.generate("the horse", seed=2))
    finally:
        lib.sdtpu_release(handle)


def test_capi_upscale(lib):
    """C ABI for the x4-upscaler family: sdtpu_upscale_image consumes the
    low-res input at the LATENT grid and matches the Python Context
    bit-for-bit; wrong-size inputs error cleanly."""
    import ctypes

    import sdtpu

    c_void_p, c_char_p = ctypes.c_void_p, ctypes.c_char_p
    lib.sdtpu_setup.argtypes = [
        ctypes.POINTER(c_void_p), c_char_p, c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32]
    lib.sdtpu_upscale_image.argtypes = [
        c_void_p, c_char_p, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(c_void_p), ctypes.POINTER(ctypes.c_size_t)]
    lib.sdtpu_release.argtypes = [c_void_p]
    lib.sdtpu_free_buffer.argtypes = [c_void_p]

    py = sdtpu.Context(config="tiny_x4", steps=2)
    ls = py.cfg.latent_size
    size = py.cfg.image_size
    low = np.random.default_rng(3).integers(
        0, 256, (ls, ls, 3)).astype(np.uint8)
    want = py.upscale("a castle", low, noise_level=5, guidance=9.0, seed=0)

    handle = c_void_p()
    rc = lib.sdtpu_setup(ctypes.byref(handle), None, b"tiny_x4", 2, 0, 0)
    if rc == 6:
        pytest.skip("libsdtpu built without SDTPU_EMBED_PYTHON")
    assert rc == 0
    try:
        buf, n = c_void_p(), ctypes.c_size_t()
        low_c = np.ascontiguousarray(low)
        rc = lib.sdtpu_upscale_image(
            handle, b"a castle", 9.0, 5,
            low_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            low_c.size, ctypes.byref(buf), ctypes.byref(n))
        assert rc == 0, rc
        got = np.ctypeslib.as_array(
            ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
            (n.value,)).copy().reshape(size, size, 3)
        lib.sdtpu_free_buffer(buf)
        assert np.array_equal(got, want)
        # wrong grid size (full-res input) -> clean error, context live
        big = np.zeros((size, size, 3), np.uint8)
        rc = lib.sdtpu_upscale_image(
            handle, b"x", 9.0, 5,
            big.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            big.size, ctypes.byref(buf), ctypes.byref(n))
        assert rc != 0
        # out-of-range noise level -> clean error
        rc = lib.sdtpu_upscale_image(
            handle, b"x", 9.0, 999,
            low_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            low_c.size, ctypes.byref(buf), ctypes.byref(n))
        assert rc != 0
    finally:
        lib.sdtpu_release(handle)

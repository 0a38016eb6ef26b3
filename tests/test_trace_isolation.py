"""Trace-time state must be thread/context-local (VERDICT r2 weak #3).

Two pieces of state are consulted during jit tracing: the calibration
recorder (models/layers.py) and the spatial-sharding spec
(parallel/spatial.py). Context.__init__ spawns a thread pool and traces may
run concurrently, so both are ContextVars — a trace in one thread must never
see state installed by another thread's trace. These tests force two traces
to overlap with a barrier and assert no cross-contamination.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models import layers as L


def _int8_site(key, d_in=16, d_out=32):
    from sdtpu.quant.ptq import quantize_weight

    w = jax.random.normal(key, (d_in, d_out), jnp.float32)
    w_q, w_scale = quantize_weight(w)
    return {"w_q": w_q, "w_scale": w_scale}


def test_calibration_recorder_is_trace_local():
    """Thread A traces with a recorder installed; thread B traces the same
    quantized dense concurrently and must see NO recorder (a module-global
    recorder would fire on B's foreign tracer and mis-capture)."""
    p = _int8_site(jax.random.PRNGKey(0))
    x = jnp.ones((4, 16), jnp.float32)
    barrier = threading.Barrier(2, timeout=30)
    failures: list[str] = []
    calls: list = []

    def calib_thread():
        def fn(xx):
            token = L.set_calibration_recorder(
                lambda w_q, absmax: calls.append(absmax))
            try:
                barrier.wait()
                return L.dense(p, xx)
            finally:
                L.set_calibration_recorder(token)

        try:
            jax.jit(fn)(x)
            if len(calls) != 1:
                failures.append(f"recorder fired {len(calls)} times, want 1")
        except Exception as e:  # pragma: no cover - diagnostic
            failures.append(f"calib thread: {e!r}")

    def plain_thread():
        def fn(xx):
            barrier.wait()
            if L._CALIB_RECORDER.get() is not None:
                failures.append("thread B saw thread A's recorder mid-trace")
            return L.dense(p, xx)

        try:
            jax.jit(fn)(x)
        except Exception as e:  # pragma: no cover - diagnostic
            failures.append(f"plain thread: {e!r}")

    threads = [threading.Thread(target=calib_thread),
               threading.Thread(target=plain_thread)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not failures, failures
    # the recorder itself is cleared after A's trace
    assert L._CALIB_RECORDER.get() is None


def test_spatial_spec_is_trace_local():
    """Thread A traces with the W-axis sharding spec installed; thread B's
    concurrent trace must see constrain() as the identity."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdtpu.parallel import spatial as sp
    from sdtpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=4)
    spec = NamedSharding(mesh, P("data", None, "model", None))
    x = jnp.ones((2, 8, 8, 4), jnp.float32)
    barrier = threading.Barrier(2, timeout=30)
    failures: list[str] = []

    def sharded_thread():
        def fn(xx):
            prev = sp.set_spec(spec)
            try:
                barrier.wait()
                y = sp.constrain(xx)
                if y is xx:
                    failures.append("thread A's constrain was a no-op")
                return y
            finally:
                sp.set_spec(prev)

        try:
            jax.jit(fn)(x)
        except Exception as e:  # pragma: no cover - diagnostic
            failures.append(f"sharded thread: {e!r}")

    def plain_thread():
        def fn(xx):
            barrier.wait()
            y = sp.constrain(xx)
            if y is not xx:
                failures.append("thread B picked up thread A's spatial spec")
            return y + 0.0

        try:
            jax.jit(fn)(x)
        except Exception as e:  # pragma: no cover - diagnostic
            failures.append(f"plain thread: {e!r}")

    threads = [threading.Thread(target=sharded_thread),
               threading.Thread(target=plain_thread)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not failures, failures
    assert sp._SPEC.get() is None


def test_concurrent_context_init_and_calibration_programs_correct():
    """End-to-end version: a calibration capture (quant.ptq.calibrate) runs
    while another thread traces and executes a plain TINY UNet eval. Both
    programs must produce the same numbers as their serial runs."""
    from sdtpu.config import TINY
    from sdtpu.models import unet
    from sdtpu.quant.ptq import quantize_unet

    key = jax.random.PRNGKey(1)
    params = unet.init(key, TINY.unet, zero_init_outs=False)
    s = TINY.latent_size
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (2, s, s, TINY.unet.in_channels))
    te = jax.random.normal(jax.random.PRNGKey(3),
                           (2, TINY.unet.time_embed_dim))
    ctx = jax.random.normal(
        jax.random.PRNGKey(4), (2, TINY.clip.context_len,
                                TINY.unet.context_dim))

    ref = np.asarray(unet.apply(params, x, te, ctx, TINY.unet))

    pq = {"unet": quantize_unet({"unet": params})["unet"]}
    barrier = threading.Barrier(2, timeout=60)
    results: dict = {}
    failures: list[str] = []

    def capture_thread():
        # minimal jitted capture mirroring ptq.calibrate's recorder protocol
        def fn(p, xx):
            cap = []
            token = L.set_calibration_recorder(
                lambda w_q, absmax: cap.append(absmax))
            try:
                barrier.wait()
                y = unet.apply(p["unet"], xx, te, ctx, TINY.unet)
            finally:
                L.set_calibration_recorder(token)
            if not cap:
                failures.append("capture saw no quantized sites")
                return y, jnp.zeros(())
            return y, jnp.stack(cap).max()

        try:
            _, absm = jax.jit(fn)(pq, x)
            results["absmax"] = float(absm)
        except Exception as e:
            failures.append(f"capture thread: {e!r}")

    def plain_thread():
        def fn(p, xx):
            barrier.wait()
            return unet.apply(p, xx, te, ctx, TINY.unet)

        try:
            results["plain"] = np.asarray(jax.jit(fn)(params, x))
        except Exception as e:
            failures.append(f"plain thread: {e!r}")

    threads = [threading.Thread(target=capture_thread),
               threading.Thread(target=plain_thread)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not failures, failures
    # the un-calibrated trace produced exactly the serial program
    np.testing.assert_allclose(results["plain"], ref, rtol=1e-5, atol=1e-5)
    assert results["absmax"] > 0.0

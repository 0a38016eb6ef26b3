"""Measure continuous (iteration-level) batching vs barrier micro-batching
on the real chip: throughput AND per-request latency under an arrival
process (run on TPU; takes ~10-15 min including compiles).

    python tools/measure_stream.py --slots 4 --requests 24 \
        --arrival-ms 150 --legs stream,batch

Two legs over the SAME arrival trace (request i arrives at i*arrival_ms):

* ``stream``  — engine/stream.StreamScheduler with ``--slots`` slots:
  requests join the pool the moment a slot frees; one denoising step is
  the scheduling unit.
* ``batch``   — the MicroBatcher policy (engine/server.py): collect up to
  ``--slots`` same-kind requests for up to ``--max-wait-ms``, run the
  batch as one compiled call, double-buffered (dispatch k+1 before
  fetching k) — the production static path measured in BENCH_RESULTS
  "Double-buffered serving loop".

Reports per-leg: images/s, per-request completion latency p50/p90/max (from
arrival to host-side pixels). arrival_ms=0 is the closed-loop saturation
case (all requests queued upfront) where the two should match on
throughput and differ on latency shape only via batch boundaries.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import statistics
import time


def _percentiles(xs):
    xs = sorted(xs)
    p = lambda q: xs[min(len(xs) - 1, int(q * (len(xs) - 1)))]  # noqa: E731
    return {"p50": round(statistics.median(xs), 4), "p90": round(p(0.9), 4),
            "max": round(max(xs), 4)}


def leg_stream(ctx, arrivals, prompts, slots, steps_of, max_block=1):
    import jax.numpy as jnp
    import numpy as np

    from sdtpu.engine.stream import StreamScheduler

    sched = StreamScheduler(ctx, slots=slots,
                            step_choices=tuple(set(steps_of)),
                            max_block=max_block)
    # warm the compiled programs (admit + step + decode) outside the clock
    wid = sched.submit("warmup", seed=0)
    sched.drain()
    del wid
    # ... including every power-of-two block program and decode batch
    # width the trace can reach (block compiles mid-trace would otherwise
    # bill multi-second compile stalls to the measured leg)
    k = 2
    while k <= sched.max_block:
        out = sched._kstep(k)(
            ctx.params, sched._x, sched._state, sched._cond, sched._un,
            sched._t_idx, sched._guidance, sched._keys, sched._plan_idx,
            sched._n_steps)
        np.asarray(out[0])
        k *= 2
    for b in range(1, slots + 1):
        np.asarray(sched._decode_fn(ctx.params, sched._x,
                                    jnp.zeros(b, jnp.int32)))
    sched.ticks = sched.dispatches = 0

    done_at = {}
    sub_at = {}
    t0 = time.perf_counter()
    i = 0
    while len(done_at) < len(arrivals):
        now = time.perf_counter() - t0
        while i < len(arrivals) and arrivals[i] <= now:
            rid = sched.submit(prompts[i % len(prompts)], seed=100 + i,
                               steps=steps_of[i])
            sub_at[rid] = arrivals[i]
            i += 1
        if sched._queue or sched._live:
            sched.tick()
            for rid, img in sched.completed().items():
                done_at[rid] = time.perf_counter() - t0
        else:
            time.sleep(min(0.005, max(0.0, arrivals[i] - now)))
    total = max(done_at.values())
    lats = [done_at[r] - sub_at[r] for r in done_at]
    return total, lats, {"ticks": sched.ticks, "dispatches": sched.dispatches}


def leg_batch(ctx, arrivals, prompts, slots, max_wait_s, steps_of):
    """The MicroBatcher's collect policy + the double-buffered dispatch
    schedule, inline (same policy as engine/server.MicroBatcher._run).

    With a mixed-steps trace, only SAME-step-count requests share a batch
    (the server's kind-keyed grouping: the step count is baked into the
    compiled batch program) — the structural disadvantage vs the stream
    pool, which mixes step counts inside one eval."""
    # warmup at the batch sizes the trace will produce (padded pow-2 sizes
    # are what the server compiles; here we dispatch exact sizes 1..slots)
    for k in sorted(set(steps_of)):
        ctx.set_steps(k)
        for b in range(1, slots + 1):
            ctx.generate_batch([{"prompt": "warmup", "seed": i}
                                for i in range(b)])

    done_at = {}
    t0 = time.perf_counter()
    i = 0            # next arrival not yet absorbed
    ready = []       # arrived, unbatched request indices (FIFO)
    pending = None   # (ids, fetch)

    def absorb(now):
        nonlocal i
        while i < len(arrivals) and arrivals[i] <= now:
            ready.append(i)
            i += 1

    while len(done_at) < len(arrivals):
        now = time.perf_counter() - t0
        absorb(now)
        if ready:
            # head-of-line kind; collect same-kind mates, linger max_wait
            kind = steps_of[ready[0]]
            deadline = now + max_wait_s
            batch = [j for j in ready if steps_of[j] == kind][:slots]
            while (len(batch) < slots and i < len(arrivals)
                   and pending is None and arrivals[i] <= deadline):
                time.sleep(max(0.0, arrivals[i]
                               - (time.perf_counter() - t0)))
                absorb(time.perf_counter() - t0)
                batch = [j for j in ready if steps_of[j] == kind][:slots]
            for j in batch:
                ready.remove(j)
            ctx.set_steps(kind)
            fetch = ctx.generate_batch_async(
                [{"prompt": prompts[j % len(prompts)], "seed": 100 + j}
                 for j in batch])
            if pending is not None:
                pids, pfetch = pending
                pfetch()
                tdone = time.perf_counter() - t0
                for j in pids:
                    done_at[j] = tdone
            pending = (batch, fetch)
            continue
        if pending is not None:
            pids, pfetch = pending
            pfetch()
            tdone = time.perf_counter() - t0
            for j in pids:
                done_at[j] = tdone
            pending = None
        elif i < len(arrivals):
            time.sleep(max(0.0, arrivals[i] - now))
    total = max(done_at.values())
    lats = [done_at[j] - arrivals[j] for j in done_at]
    return total, lats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd15")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--arrival-ms", type=float, default=150.0)
    ap.add_argument("--poisson", type=int, default=None, metavar="SEED",
                    help="draw exponential inter-arrival gaps (mean "
                         "--arrival-ms) from this seed instead of the "
                         "uniform i*arrival_ms trace; both legs replay "
                         "the SAME trace")
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--steps-mix", default=None, metavar="K1,K2,...",
                    help="heterogeneous traffic: request i uses the i-th "
                         "step count (cycled). The stream pool mixes step "
                         "counts inside one eval; the batcher groups by "
                         "step count (kind-keyed), its production policy")
    ap.add_argument("--legs", default="stream,batch")
    ap.add_argument("--max-block", type=int, default=1,
                    help="stream leg: dispatch up to k=min-remaining pooled "
                         "steps as ONE program (power-of-two blocks) — "
                         "pays the per-dispatch tunnel tax once per block "
                         "instead of per step")
    args = ap.parse_args()

    import sdtpu
    from sdtpu.engine.logging import LogLevel

    ctx = sdtpu.Context(model_dir=None, steps=args.steps,
                        config=args.config, log_level=LogLevel.ERROR)
    if args.poisson is not None:
        import random

        rng = random.Random(args.poisson)
        t, arrivals = 0.0, []
        for _ in range(args.requests):
            arrivals.append(t)
            t += rng.expovariate(1e3 / max(args.arrival_ms, 1e-6))
    else:
        arrivals = [i * args.arrival_ms / 1e3 for i in range(args.requests)]
    prompts = ["a photograph of an astronaut riding a horse",
               "a watercolor painting of a fox in a forest",
               "macro photo of a snowflake on dark wool",
               "a city street at night in the rain"]
    mix = ([int(s) for s in args.steps_mix.split(",")]
           if args.steps_mix else [args.steps])
    steps_of = [mix[i % len(mix)] for i in range(args.requests)]

    out = {"config": args.config, "steps": args.steps, "slots": args.slots,
           "requests": args.requests, "arrival_ms": args.arrival_ms,
           "trace": ("poisson" if args.poisson is not None else "uniform"),
           "poisson_seed": args.poisson,
           "steps_mix": (mix if args.steps_mix else None),
           "max_block": args.max_block}
    for leg in args.legs.split(","):
        t0 = time.perf_counter()
        extra = {}
        if leg == "stream":
            total, lats, extra = leg_stream(ctx, arrivals, prompts,
                                            args.slots, steps_of,
                                            args.max_block)
        elif leg == "batch":
            total, lats = leg_batch(ctx, arrivals, prompts, args.slots,
                                    args.max_wait_ms / 1e3, steps_of)
        else:
            raise SystemExit(f"unknown leg {leg!r}")
        out[leg] = {
            "total_s": round(total, 3),
            "images_per_s": round(args.requests / total, 3),
            "latency": _percentiles(lats),
            "wall_incl_warmup_s": round(time.perf_counter() - t0, 1),
            **extra,
        }
        print(json.dumps({leg: out[leg]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Per-op device profiling via jax.profiler traces.

The true analogue of the reference's detailed per-layer profiling
(reference: benchmark.py:41-45 ``detailed=True`` -> per-layer latency list;
analyze_results.py:129-133 top-10 slowest layers): capture one traced
execution, parse the XSpace proto through ``jax.profiler.ProfileData``, and
aggregate per-op durations from the device plane.
"""

from __future__ import annotations

import glob
import tempfile
from collections import defaultdict

import jax

#: op-name prefix -> class (mirrors the reference's layer-name classification,
#: analyze_results.py:20-93)
_CLASS_RULES = [
    ("convolution", "conv"),
    ("conv", "conv"),
    ("dot", "matmul"),
    ("custom-call", "custom/pallas"),
    ("fusion", "fusion"),
    ("reduce", "reduce"),
    ("exponential", "softmax"),
    ("divide", "softmax"),
    ("logistic", "activation"),
    ("tanh", "activation"),
    ("copy", "copy"),
    ("transpose", "shaping"),
    ("reshape", "shaping"),
    ("broadcast", "shaping"),
    ("concatenate", "shaping"),
    ("slice", "shaping"),
    ("dynamic", "shaping"),
    ("all-", "collective"),
    ("convert", "cast"),
]


def classify(op_name: str) -> str:
    base = op_name.lstrip("%").split(".")[0].split(":")[-1].lower()
    for prefix, cls in _CLASS_RULES:
        if base.startswith(prefix):
            return cls
    return "other"


def profile_ops(fn, args, out_dir: str | None = None) -> dict:
    """Run `fn(*args)` once under the profiler; return
    {op_name: {total_us, count, class}} aggregated over device-plane events.
    """
    import numpy as np

    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile outside the trace
    d = out_dir or tempfile.mkdtemp(prefix="sdtpu_xprof_")
    with jax.profiler.trace(d):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    files = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if not files:
        return {}
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(sorted(files)[-1], "rb").read()
    )
    ops: dict = defaultdict(lambda: {"total_us": 0.0, "count": 0})
    for plane in pd.planes:
        name = plane.name.lower()
        is_device = ("tpu" in name or "gpu" in name
                     or "xlapjrtcpuclient" in name or "/device" in name)
        if not is_device:
            # CPU-backend device events live on the host plane's client line
            if name != "/host:cpu":
                continue
        # TPU device planes carry several OVERLAPPING views of the same
        # execution: "XLA Modules" (whole program), "XLA Ops" (the per-op
        # sync timeline) and "Async XLA Ops" (DMA spans that overlap
        # compute). Summing all of them double-counts and lets async copy
        # WAIT time dwarf compute; only "XLA Ops" is the per-op truth.
        lnames = [ln.name for ln in plane.lines]
        only = "XLA Ops" if "XLA Ops" in lnames else None
        for line in plane.lines:
            lname = line.name.lower()
            if only is not None and line.name != only:
                continue
            if name == "/host:cpu" and not lname.startswith("tf_xlapjrt"):
                continue
            for ev in line.events:
                if ev.name.startswith(("end:", "ThreadpoolListener")):
                    continue
                rec = ops[ev.name]
                rec["total_us"] += ev.duration_ns / 1e3
                rec["count"] += 1
    for op_name, rec in ops.items():
        rec["class"] = classify(op_name)
    return dict(ops)


def summarize(ops: dict, top: int = 10) -> str:
    """Text report: top-N slowest ops + per-class totals (the reference
    analyzer's two views, analyze_results.py:129-146)."""
    if not ops:
        return "(no device events captured)"
    rows = sorted(ops.items(), key=lambda kv: -kv[1]["total_us"])
    total = sum(r["total_us"] for _, r in rows) or 1.0
    out = [f"top {top} ops by device time:"]
    for op_name, r in rows[:top]:
        out.append(
            f"  {r['total_us']:10.1f} us {100*r['total_us']/total:5.1f}%  "
            f"x{r['count']:<4d} [{r['class']:13s}] {op_name[:70]}"
        )
    by_class: dict = defaultdict(float)
    for _, r in rows:
        by_class[r["class"]] += r["total_us"]
    out.append("per-class totals:")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        out.append(f"  {us:10.1f} us {100*us/total:5.1f}%  {cls}")
    return "\n".join(out)

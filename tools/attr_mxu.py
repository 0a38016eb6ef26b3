"""Per-conv-shape / per-dot-shape MXU utilization attribution
(VERDICT r3 #2 + missing #3: a committed, reproducible per-op table for
the hot programs, the ethos of the reference's per-layer latency list —
/root/reference/analyze_results.py:129-146 prints the top-10 slowest
layers per model; here every MXU op class gets device time, analytic
FLOPs, achieved TFLOP/s and %peak).

How it works (one process, one part, one chip):

1. jit + lower the part's hot program (UNet CFG step / VAE decode / CLIP)
   at production shapes, compile, and parse the POST-optimization HLO:
   every `convolution` and `dot` op def, its output/operand shapes, and
   which fused computation it lives in (fusion op -> calls=%comp).
2. run the program once under jax.profiler (sdtpu.bench.xprof) and match
   device events to HLO op names (fusion.N events attribute to the
   convs/dots inside computation N, FLOP-weighted when a fusion holds
   several).
3. aggregate by shape key -> device time, FLOPs/exec, TFLOP/s, %peak
   (bf16), share of part time; print a markdown table to paste into
   docs/UTILIZATION.md.

    python tools/attr_mxu.py --part unet          # on the real chip
    python tools/attr_mxu.py --part vae --size 512
"""

from __future__ import annotations

import argparse
import math
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_TFLOPS = [("v5 lite", 197.0), ("v5e", 197.0), ("v6 lite", 918.0),
               ("v6e", 918.0), ("v4", 275.0), ("v5p", 459.0)]

_SHAPE = re.compile(r"(?:[a-z]+\d*|pred)\[([\d,]*)\]")
_DEF = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = (\S+) (\w[\w-]*)\(")
_COMP_HDR = re.compile(r"^(?:ENTRY )?%?([\w.-]+)\s+\(.*\)\s+->")
_CALLS = re.compile(r"calls=%?([\w.-]+)")
_LHS_CONTRACT = re.compile(r"lhs_contracting_dims=\{([\d,]+)\}")
_DIM_LABELS = re.compile(r"dim_labels=\w+_(\w+)->")
_WIN_SIZE = re.compile(r"window=\{[^}]*\bsize=([\dx]+)")
_WIN_LHS_DILATE = re.compile(r"window=\{[^}]*\blhs_dilate=([\dx]+)")


def _dims(type_str: str):
    m = _SHAPE.search(type_str)
    if not m:
        return None
    if m.group(1) == "":
        return ()
    return tuple(int(d) for d in m.group(1).split(","))


def _operands(line: str, start: int):
    """Names of the op's operands. ``start`` is the index just past the
    kind's opening paren (from the _DEF match) — scanning from the line's
    FIRST "(" is wrong on TPU HLO, where the type's tiled-layout annotation
    (``{1,0:T(8,128)(2,1)}``) contains parens before the operand list."""
    inner = line[start:]
    depth = 1
    out = []
    buf = []
    for ch in inner:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        if ch == "," and depth == 1:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf).strip())
    names = []
    for tok in out:
        # "bf16[2,64,64,320]{3,2,1,0} %fusion.1" or just "%param.0"
        name = tok.split()[-1].lstrip("%")
        names.append(name)
    return names


def parse_hlo(hlo: str):
    """Return (mxu_ops, comp_of, shape_of):
    mxu_ops: {op_name: {kind, flops, key}} for every conv/dot;
    comp_of: {computation_name: [op_name, ...]} (convs/dots inside);
    fusion_calls: {fusion_op_name: computation_name}.
    """
    shape_of: dict[str, tuple] = {}
    lines = hlo.splitlines()
    # pass 1: output shape of every named op (incl. computation params)
    for line in lines:
        m = _DEF.match(line)
        if m:
            shape_of[m.group(1)] = _dims(m.group(2))
            continue
        # computation params: "%param_0.1 = bf16[...]{...} parameter(0)"
        # are covered by _DEF ("parameter" is the op kind)
    mxu: dict[str, dict] = {}
    comp_ops: dict[str, list] = defaultdict(list)
    fusion_calls: dict[str, str] = {}
    comp = None
    for line in lines:
        h = _COMP_HDR.match(line)
        if h and line.rstrip().endswith("{"):
            comp = h.group(1)
            continue
        m = _DEF.match(line)
        if not m:
            continue
        name, type_str, kind = m.groups()
        if kind == "fusion":
            c = _CALLS.search(line)
            if c:
                fusion_calls[name] = c.group(1)
            continue
        if kind not in ("convolution", "dot"):
            continue
        out = _dims(type_str) or ()
        ops = _operands(line, m.end())
        lhs = shape_of.get(ops[0]) if ops else None
        rhs = shape_of.get(ops[1]) if len(ops) > 1 else None
        flops = 0.0
        key = None
        if kind == "convolution" and out and rhs:
            # FLOPs = 2 * prod(out) * (effective kernel taps * Cin).
            # TPU rewrites batched dots into convolutions (often with
            # lhs_dilate, which inserts ZEROS between real input samples:
            # only every d-th tap inside a k-wide window is a real MAC, so
            # the effective taps per dim are ceil(k/d), not k). Cin/Cout
            # come from dim_labels ('i'/'o' in the rhs labels) because the
            # rewrites are NOT hwio/oihw laid out.
            dl = _DIM_LABELS.search(line)
            rhs_labels = dl.group(1) if dl else ""
            cout = out[-1] if out else 1
            cin = None
            if "o" in rhs_labels and rhs_labels.index("o") < len(rhs):
                cout = rhs[rhs_labels.index("o")]
            if "i" in rhs_labels and rhs_labels.index("i") < len(rhs):
                cin = rhs[rhs_labels.index("i")]
            ws = _WIN_SIZE.search(line)
            ksizes = ([int(v) for v in ws.group(1).split("x")]
                      if ws else [])
            wd = _WIN_LHS_DILATE.search(line)
            dil = ([int(v) for v in wd.group(1).split("x")]
                   if wd else [1] * len(ksizes))
            if cin is not None and ksizes:
                taps = math.prod(-(-k // d) for k, d in zip(ksizes, dil))
                flops = 2.0 * math.prod(out) * taps * cin
            else:  # no window/labels clause: plain 1x1 / matmul form
                flops = (2.0 * math.prod(out) * math.prod(rhs)
                         / max(cout, 1))
            key = (f"conv {('x'.join(map(str, lhs)) if lhs else '?')}"
                   f" * {'x'.join(map(str, rhs))}")
        elif kind == "dot" and out and lhs:
            mc = _LHS_CONTRACT.search(line)
            k = 1
            if mc:
                for d in (int(i) for i in mc.group(1).split(",")):
                    if d < len(lhs):
                        k *= lhs[d]
            flops = 2.0 * math.prod(out) * k
            key = (f"dot {'x'.join(map(str, lhs))}"
                   f" . {'x'.join(map(str, rhs or ()))}")
        if key:
            mxu[name] = {"kind": kind, "flops": flops, "key": key}
            comp_ops[comp].append(name)
    return mxu, comp_ops, fusion_calls


def attribute(ops_us: dict, mxu: dict, comp_ops: dict, fusion_calls: dict):
    """Map xprof events to shape keys. Returns
    ({key: {us, flops, count}}, matched_us, total_us)."""
    per_key: dict[str, dict] = defaultdict(
        lambda: {"us": 0.0, "flops": 0.0, "count": 0})
    matched_us = 0.0
    total_us = 0.0
    for ev_name, rec in ops_us.items():
        us = rec["total_us"]
        total_us += us
        # device events on the TPU backend are named with the full HLO def
        # text ("%fusion.3 = f32[...] fusion(...), calls=..."); the op name
        # is the token before " = "
        name = ev_name.split(" = ")[0].strip().lstrip("%")
        targets = []
        if name in mxu:
            targets = [name]
        elif name in fusion_calls:
            targets = comp_ops.get(fusion_calls[name], [])
        elif name in comp_ops:  # event named after the computation itself
            targets = comp_ops[name]
        if not targets:
            continue
        matched_us += us
        fl = [mxu[t]["flops"] for t in targets]
        tot = sum(fl) or 1.0
        for t, f in zip(targets, fl):
            k = mxu[t]["key"]
            per_key[k]["us"] += us * f / tot
            # accumulate total EXECUTED flops directly: several distinct HLO
            # ops share one shape key (repeated UNet blocks), so a
            # flops-per-exec * count-at-print scheme would multiply by the
            # number of distinct ops and inflate TFLOP/s by that factor
            per_key[k]["flops"] += f * rec["count"]
            per_key[k]["count"] += rec["count"]
    return per_key, matched_us, total_us


def build_part(part: str, size: int, config: str = "sd15",
               kernels: str = "xla"):
    import jax
    import jax.numpy as jnp

    from sdtpu.config import CONFIGS
    from sdtpu.io.params import init_pipeline_params

    import dataclasses

    from sdtpu.io.params import cast_params

    cfg = CONFIGS[config]
    if size != cfg.image_size:
        cfg = dataclasses.replace(cfg, latent_size=size // 8)
    # jit the init: eager init is thousands of individual dispatches, which
    # costs minutes over the tunneled device (~1.5 ms each). Select the ONE
    # part inside the jit so XLA dead-code-eliminates the others' init and
    # the f32 full pipeline never lands on the chip (production dtype: cast
    # to cfg.compute_dtype, the program Context actually serves — SDXL's
    # f32+bf16 full-pipeline copies would OOM a 16 GB v5e).
    part_key = part if part in ("unet", "vae", "clip") else "unet"
    params = {part_key: jax.jit(
        lambda k: cast_params(init_pipeline_params(k, cfg),
                              cfg.compute_dtype)[part_key])(
        jax.random.PRNGKey(0))}
    dt = cfg.compute_dtype
    ls = cfg.latent_size
    if part == "unet":
        from sdtpu.models import unet

        p = jax.device_put(params["unet"])
        x = jnp.zeros((2, ls, ls, cfg.unet.in_channels), dt)
        te = jnp.zeros((2, cfg.unet.time_embed_dim), dt)
        rows = jnp.zeros((2, cfg.clip.context_len, cfg.unet.context_dim),
                         dt)
        fn = jax.jit(lambda p, x, te, r: unet.apply(p, x, te, r, cfg.unet,
                                                    kernels))
        args = (p, x, te, rows)
    elif part == "vae":
        from sdtpu.models import vae

        p = jax.device_put(params["vae"])
        z = jnp.zeros((1, ls, ls, cfg.latent_channels), dt)
        fn = jax.jit(lambda p, z: vae.apply(p, z, cfg.vae, kernels))
        args = (p, z)
    elif part == "clip":
        from sdtpu.models import clip

        p = jax.device_put(params["clip"])
        toks = jnp.zeros((2, cfg.clip.context_len), jnp.int32)
        fn = jax.jit(lambda p, t: clip.apply(p, t, cfg.clip, dtype=dt))
        args = (p, toks)
    else:
        raise SystemExit(f"unknown part {part!r}")
    return fn, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="unet", choices=["unet", "vae", "clip"])
    ap.add_argument("--config", default="sd15")
    ap.add_argument("--size", type=int, default=None,
                    help="image size (default: the config's native size)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--kernels", default="xla",
                    help="'xla' (every MXU op visible to HLO attribution) "
                         "or 'pallas' (the production program — flash "
                         "attention is a custom call, so its FLOPs show "
                         "as unattributed device time)")
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    ap.add_argument("--debug-events", action="store_true",
                    help="print the top raw profiler event names (for "
                         "diagnosing event-name <-> HLO-name matching)")
    args = ap.parse_args()

    import jax

    if args.platform != "auto":
        # the site config pins the remote-TPU platform regardless of
        # JAX_PLATFORMS; only the config API reliably overrides it
        jax.config.update("jax_platforms", args.platform)

    # reuse the session's persistent compile cache (same settings as
    # Context): the UNet-at-production-shape compile is minutes cold,
    # seconds warm, and attribution doesn't change the program
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path("~/.cache/sdtpu/xla").expanduser()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")

    from sdtpu.bench.xprof import profile_ops

    from sdtpu.config import CONFIGS

    size = args.size or CONFIGS[args.config].image_size
    fn, fargs = build_part(args.part, size, args.config, args.kernels)
    lowered = fn.lower(*fargs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    mxu, comp_ops, fusion_calls = parse_hlo(hlo)
    ops_us = profile_ops(fn, fargs)
    if args.debug_events:
        for n in sorted(ops_us, key=lambda k: -ops_us[k]["total_us"])[:30]:
            print(f"# ev {ops_us[n]['total_us']:9.1f}us "
                  f"x{ops_us[n]['count']:<3d} {n[:100]}")
        print(f"# sample hlo mxu names: {list(mxu)[:6]}")
        print(f"# sample fusions: {list(fusion_calls)[:6]}")
    per_key, matched_us, total_us = attribute(ops_us, mxu, comp_ops,
                                              fusion_calls)

    kind = jax.devices()[0].device_kind.lower()
    peak = next((p for tok, p in PEAK_TFLOPS if tok in kind), None)
    rows = sorted(per_key.items(), key=lambda kv: -kv[1]["us"])
    print(f"# part={args.part} config={args.config} size={size} "
          f"kernels={args.kernels} device={kind} peak_bf16={peak} TFLOP/s")
    print(f"# device total {total_us/1e3:.3f} ms; attributed to MXU ops "
          f"{matched_us/1e3:.3f} ms ({100*matched_us/max(total_us,1):.1f}%)")
    print()
    print("| shape (act * weight / lhs . rhs) | time ms | % part | "
          "GFLOP | TFLOP/s | %peak |")
    print("|---|---|---|---|---|---|")
    for key, r in rows[: args.top]:
        tflops = r["flops"] / max(r["us"] * 1e-6, 1e-12) / 1e12
        pk = f"{100 * tflops / peak:.0f}%" if peak else "-"
        print(f"| {key} | {r['us']/1e3:.3f} | "
              f"{100*r['us']/max(total_us,1):.1f}% | "
              f"{r['flops']/1e9:.1f} | {tflops:.1f} | {pk} |")
    mxu_fl = sum(r["flops"] for r in per_key.values())
    if total_us:
        eff = mxu_fl / (total_us * 1e-6) / 1e12
        print(f"\n# whole-part: {mxu_fl/1e12:.2f} TFLOP / "
              f"{total_us/1e3:.2f} ms = {eff:.1f} TFLOP/s"
              + (f" = {100*eff/peak:.1f}% peak" if peak else ""))
    # where the NON-attributed time goes: per-op-class totals (the
    # reference analyzer's second view, analyze_results.py:135-146)
    from collections import defaultdict as _dd

    from sdtpu.bench.xprof import classify

    by_class = _dd(float)
    for ev_name, rec in ops_us.items():
        name = ev_name.split(" = ")[0].strip().lstrip("%")
        by_class[classify(name)] += rec["total_us"]
    print("\n| op class | time ms | % part |")
    print("|---|---|---|")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"| {cls} | {us/1e3:.3f} | {100*us/max(total_us,1):.1f}% |")


if __name__ == "__main__":
    main()

"""One production-scale training-step benchmark on the real chip.

Runs the LDM eps-prediction train step (sdtpu/train) at SD15 512px,
batch 2, bf16 params, jax.checkpoint remat, pallas attention — prints
compile time, per-step latency, and the descending loss. The reference
has no training story; this is the TPU-native extension's hardware proof.

Usage: python tools/bench_train.py   (needs the real TPU chip)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax, jax.numpy as jnp, numpy as np
from sdtpu.config import SD15
from sdtpu.models import clip, temb, unet
from sdtpu.train import init_train_state, jit_train_step, make_optimizer

key = jax.random.PRNGKey(0)
ku, kc, kt, kb = jax.random.split(key, 4)
t0 = time.time()
up = jax.jit(lambda k: unet.init(k, SD15.unet, zero_init_outs=False))(ku)
up = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                  if jnp.issubdtype(a.dtype, jnp.floating) else a, up)
frozen = {"clip": clip.init(kc, SD15.clip), "temb": temb.init(kt, SD15.unet)}
frozen = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a, frozen)
print(f"init {time.time()-t0:.1f}s", flush=True)

opt = make_optimizer(lr=1e-5)
state = init_train_state(up, opt)
b = 2
batch = {"latents": jax.random.normal(kb, (b, 64, 64, 4), jnp.float32),
         "tokens": jnp.tile(jnp.arange(77, dtype=jnp.int32)[None], (b, 1))}
step = jit_train_step(SD15, opt, kernels="pallas", remat=True, donate=True)
t0 = time.time()
state, m = step(state, frozen, batch, jax.random.PRNGKey(1))
print(f"compile+step {time.time()-t0:.1f}s loss={float(m['loss']):.4f} "
      f"gnorm={float(m['grad_norm']):.3f}", flush=True)
ts = []
for i in range(5):
    batch2 = {"latents": batch["latents"] + i*1e-3, "tokens": batch["tokens"]}
    t0 = time.time()
    state, m = step(state, frozen, batch2, jax.random.PRNGKey(2+i))
    float(m["loss"])
    ts.append(time.time()-t0)
print(f"steady train step (SD15 512px, batch {b}, remat, pallas attn): "
      f"{min(ts)*1e3:.1f} ms  loss={float(m['loss']):.4f}", flush=True)

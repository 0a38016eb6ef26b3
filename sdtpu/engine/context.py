"""Context: the pipeline orchestrator.

Python/JAX rebuild of the reference's ``Context`` class (reference:
context.h:27-52, context.cpp:14-421) with the same phased lifecycle:

    initialize -> load_models -> load_tokenizer -> prepare_solver
    -> prepare_buffers -> prepare_schedule -> set_seed -> generate

Mapping of concerns:

* model graphs -> one param pytree + AOT-jitted executables (compiled-
  executable caching is the analogue of the reference's serialized HTP
  context blobs, qnn_context.cpp:894-956);
* ION zero-copy buffers -> device-resident jnp arrays (nothing to manage);
* burst power mode -> nothing to manage (no clock knob on TPU);
* uncond ("") prompt embedding precomputed at setup
  (reference: context.cpp:233-239);
* ``_failed_and_gave_up`` latch: a failed phase turns later phases into
  no-ops, surfaced as INVALID_CONTEXT on generate (reference:
  context.cpp:84,95,181,192,202,246,293);
* multithreaded init (reference: context.cpp:49-80 spawns 3 threads): weight
  load / tokenizer load run on a thread pool when ``threads > 1``;
* steps: any value works (compiled per steps value and cached) — the
  reference hardcodes steps==20 (context.cpp:250-251); we keep 20 as the
  default/benchmark config.
"""

from __future__ import annotations

import concurrent.futures as _fut
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import CONFIGS, PipelineConfig
from sdtpu.engine import logging as slog
from sdtpu.engine.errors import ErrorCode, ErrorTable, SdtpuError
from sdtpu.engine.pipeline import encode_text, jit_generate
from sdtpu.io.params import cast_params, init_pipeline_params, param_count
from sdtpu.tokenizer import Tokenizer

#: Merge table for the built-in demo tokenizer (random-init weights mode).
#: Sized so TINY.clip.vocab_size == 512 + len(DEMO_MERGES) + 2.
DEMO_MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"), ("in", "g</w>"),
    ("e", "r</w>"), ("an", "d</w>"), ("o", "f</w>"), ("r", "i"), ("ri", "d"),
    ("rid", "ing</w>"), ("h", "o"), ("ho", "r"), ("hor", "s"),
    ("hors", "e</w>"), ("o", "n</w>"), ("a", "s"), ("as", "t"), ("o", "n"),
    ("p", "h"), ("ph", "o"), ("g", "raph</w>"),
]


class Context:
    """Prompt -> uint8 image engine with reference-parity lifecycle."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        steps: int = 20,
        sampler: str = "dpm",
        config: PipelineConfig | str = "sd15",
        log_level: slog.LogLevel = slog.LogLevel.ERROR,
        kernels: str = "auto",
        quantize: str = "none",
        threads: int = 3,
        seed: int = 0,
        size: Optional[int] = None,
        fuse_qkv: bool = False,
        mesh: Optional[tuple[int, int]] = None,
        compile_cache: Optional[str] = "~/.cache/sdtpu/xla",
        lora: Optional[str] = None,
        embeddings: Optional[dict] = None,
        cfg_interval: Optional[tuple] = None,
        clip_skip: int = 1,
        freeu: Optional[tuple] = None,
        guidance_rescale: float = 0.0,
        pag_layers: tuple = ("mid",),
        tome_ratio: float = 0.0,
        deepcache: Optional[int] = None,
    ) -> None:
        self.fuse_qkv = fuse_qkv
        # LoRA adapters (sdtpu.train.lora.save_lora_npz artifacts) overlaid
        # on the UNet — serve fine-tunes without touching the base
        # checkpoint. Accepts one path (back-compat: becomes the "default"
        # adapter, applied to every request) or a {name: path} registry for
        # per-request selection (generate(..., lora=name) / the HTTP
        # server's "lora" field). Adapter matmuls run unmerged
        # (layers.dense); pass a merged tree through model_dir instead for
        # zero-overhead single-adapter serving.
        self.lora = lora
        self._adapters: dict[str, dict] = {}
        self._lora_params: dict[str, dict] = {}   # adapter name -> overlay
        self._lora_default: Optional[str] = None
        self._controlnets: dict[str, dict] = {}   # name -> controlnet tree
        self._embeddings: dict[str, int] = {}     # TI placeholder -> n rows
        self._embeddings_spec = dict(embeddings or {})
        self.mesh = None
        if mesh is not None:
            # multi-chip serving: (data, model) mesh — DP over the prompt
            # batch, TP over the transformer matmuls (sdtpu.parallel)
            from sdtpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(data=mesh[0], model=mesh[1])
        if isinstance(config, str):
            config = CONFIGS[config.lower()]
        if size is not None:
            # resolution override (e.g. 768x768 high-res config,
            # BASELINE.md stretch config) — the UNet/VAE are fully
            # convolutional; only the latent grid changes
            import dataclasses as _dc

            if size % (8 * config.upscale) or size < config.upscale * 8:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"size must be a positive multiple of "
                    f"{8 * config.upscale}, got {size}",
                )
            config = _dc.replace(config, latent_size=size // config.upscale)
        if clip_skip != 1:
            # A1111 "CLIP skip": tap the text tower clip_skip-1 blocks
            # early (then the final LN, as A1111 does). Single-tower
            # configs only — XL's towers already tap penultimate hiddens.
            import dataclasses as _dc

            if (not isinstance(clip_skip, int) or clip_skip < 1
                    or clip_skip > config.clip.layers
                    or config.clip2 is not None):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"clip_skip must be an int in [1, clip.layers] on a "
                    f"single-tower config, got {clip_skip!r}",
                )
            config = _dc.replace(
                config, clip=_dc.replace(config.clip,
                                         skip_last=clip_skip - 1))
        if freeu is not None:
            # FreeU (training-free quality knob): (b1, b2, s1, s2)
            import dataclasses as _dc

            if len(freeu) != 4:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"freeu must be (b1, b2, s1, s2), got {freeu!r}",
                )
            config = _dc.replace(
                config, unet=_dc.replace(
                    config.unet,
                    freeu=tuple(float(v) for v in freeu)))
        if tome_ratio:
            # ToMe-SD (Bolya & Hoffman 2023): merge redundant spatial
            # tokens before the large self-attentions; static, so 0.0
            # keeps every program untouched (pinned by test_tome)
            import dataclasses as _dc

            if not 0.0 < tome_ratio <= 0.75:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"tome_ratio must be in (0, 0.75] (at most the 3/4 of "
                    f"tokens outside the 2x2 merge targets), got "
                    f"{tome_ratio}",
                )
            config = _dc.replace(
                config, unet=_dc.replace(config.unet,
                                         tome_ratio=float(tome_ratio)))
        if deepcache is not None:
            # DeepCache (Ma et al. 2023): full UNet every N steps, cached
            # deep-feature splice in between (engine/pipeline.denoise)
            import dataclasses as _dc

            if not isinstance(deepcache, int) or deepcache < 2:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"deepcache must be an int interval >= 2 (full-eval "
                    f"cadence), got {deepcache!r}",
                )
            config = _dc.replace(config, deepcache_interval=deepcache)
        if guidance_rescale:
            # CFG rescale (Lin et al. 2023) — the v-prediction
            # overexposure fix; static, so 0 keeps the program untouched
            import dataclasses as _dc

            if not 0.0 <= guidance_rescale <= 1.0:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"guidance_rescale must be in [0, 1], got "
                    f"{guidance_rescale}",
                )
            config = _dc.replace(config,
                                 guidance_rescale=float(guidance_rescale))
        self.cfg = config
        self.errors = ErrorTable()
        self.logger = slog.Logger(log_level, name=f"sdtpu@{hex(id(self))[-4:]}")
        self._failed = False
        self._gen_cache: dict = {}
        #: context-default PAG strength (set_pag_scale / C ABI); a generate
        #: call's explicit pag_scale always wins
        self._default_pag: Optional[float] = None
        self._uncond = None
        self.params = None
        self.tokenizer: Optional[Tokenizer] = None
        self.steps = int(steps)
        from sdtpu.samplers import SAMPLERS

        if sampler.lower() not in SAMPLERS:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"unknown sampler {sampler!r}; available: {sorted(SAMPLERS)}",
                self.errors,
            )
        self.sampler = sampler
        if cfg_interval is not None:
            lo, hi = cfg_interval
            if not (0.0 <= lo < hi <= 1.0):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"cfg_interval must be 0 <= lo < hi <= 1, got "
                    f"{cfg_interval}", self.errors)
            cfg_interval = (float(lo), float(hi))
        #: guidance-interval optimization: CFG (and its uncond UNet eval)
        #: only on the middle (lo, hi) fraction of the trajectory —
        #: a latency AND quality lever (engine/pipeline.denoise)
        self.cfg_interval = cfg_interval
        pag_layers = ((pag_layers,) if isinstance(pag_layers, str)
                      else tuple(pag_layers))
        if not set(pag_layers) <= {"down", "mid", "up"} or not pag_layers:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"pag_layers must be a non-empty subset of "
                f"('down', 'mid', 'up'), got {pag_layers!r}")
        #: UNet sections whose self-attention is identity-perturbed when a
        #: request passes pag_scale (perturbed-attention guidance; the
        #: program is only built/compiled once a request asks for it)
        self.pag_layers = pag_layers
        self.seed = int(seed)
        if kernels == "auto":
            kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.kernels = kernels
        if quantize not in ("none", "int8", "int8w", "int8w_dense"):
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"quantize must be none|int8|int8w|int8w_dense, got "
                f"{quantize!r}", self.errors,
            )
        self.quantize = quantize
        self.model_dir = Path(model_dir) if model_dir else None
        if compile_cache:
            # persistent compiled-executable cache — the analogue of the
            # reference's serialized HTP context blobs (qnn_context.cpp:
            # 894-956): cold compile of the full pipeline is minutes, warm
            # start is seconds.
            cache_dir = str(Path(compile_cache).expanduser())
            if not jax.config.jax_compilation_cache_dir:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
                # keep cache keys independent of the cache dir's absolute
                # path: by default jax injects GPU-only sub-cache paths
                # (xla_gpu_per_fusion_autotune_cache_dir, rooted under the
                # cache dir) into the compile options, which are hashed
                # into every cache key — so the same program keyed from a
                # different dir MISSES and a packed warm-start artifact
                # (`sdtpu warmup --pack`) would only work at its build
                # path. Those sub-caches do nothing on CPU/TPU; drop them.
                jax.config.update("jax_persistent_cache_enable_xla_caches",
                                  "")

        with slog.logger_scope(self.logger):
            t0 = time.perf_counter()
            if self.steps < 1:
                self._fail(ErrorCode.INVALID_ARGUMENT,
                           f"steps must be >= 1, got {steps}")
            self._init_mt(threads)
            self.logger.info(
                f"initialized in {time.perf_counter() - t0:.2f}s "
                f"({param_count(self.params or {})/1e6:.1f}M params, "
                f"backend={jax.default_backend()})"
            )

    # ------------------------------------------------------------------
    # phased init
    # ------------------------------------------------------------------

    def _fail(self, code: ErrorCode, reason: str):
        self._failed = True
        raise SdtpuError(code, reason, self.errors)

    def _init_mt(self, threads: int) -> None:
        """Parallel phase init (reference: context.cpp:49-80)."""
        if threads > 1:
            with _fut.ThreadPoolExecutor(max_workers=2) as ex:
                f_models = ex.submit(self._load_models)
                f_tok = ex.submit(self._load_tokenizer)
                f_models.result()
                f_tok.result()
        else:
            self._load_models()
            self._load_tokenizer()
        self._prepare_buffers()
        # textual-inversion embeddings need BOTH the params (table rows
        # append) and the tokenizer (placeholder registration)
        for word, src in self._embeddings_spec.items():
            self.load_embedding(word, src)

    def _load_models(self) -> None:
        if self._failed:
            return
        t0 = time.perf_counter()
        try:
            if self.model_dir is None:
                self.logger.info("no model_dir: random-init demo weights")
                # one jitted program: a single device dispatch instead of
                # hundreds of tiny init ops (matters over remote backends).
                # The compute-dtype cast happens INSIDE the program so the
                # f32 intermediates die per-leaf — casting the whole tree
                # afterwards would hold f32 + bf16 copies simultaneously
                # (~15.6 GB at SDXL scale, an OOM on one 16 GB chip)
                params = jax.jit(
                    lambda k: cast_params(init_pipeline_params(k, self.cfg),
                                          self.cfg.compute_dtype)
                )(jax.random.PRNGKey(0))
            else:
                from sdtpu.io.orbax_ckpt import is_orbax_checkpoint, load_checkpoint
                from sdtpu.io.weights import load_pipeline_params

                if is_orbax_checkpoint(self.model_dir):
                    params = load_checkpoint(
                        self.model_dir, self.cfg,
                        dtype=self.cfg.compute_dtype, mesh=self.mesh,
                    )
                else:
                    params = load_pipeline_params(self.model_dir, self.cfg)
            params = cast_params(params, self.cfg.compute_dtype)
            if self.quantize == "int8":
                from sdtpu.quant.ptq import count_quantized, quantize_unet

                params = quantize_unet(params)
                self.logger.info(
                    f"int8 PTQ: {count_quantized(params)} matmul sites quantized"
                )
            elif self.quantize.startswith("int8w"):
                # weight-only int8: halve the UNet's per-eval HBM weight
                # stream; compute stays bf16 (dequant in VMEM inside the
                # Pallas conv kernel — sdtpu.quant.ptq.quantize_weights_only)
                from sdtpu.quant.ptq import quantize_weights_only

                # UNet only: its weights re-stream every denoise step (the
                # measured bottleneck); VAE convs at >64px planes would hit
                # the XLA dequant fallback and pay a materialized copy
                dense_too = self.quantize == "int8w_dense"
                params = dict(params)
                params["unet"] = quantize_weights_only(
                    params["unet"], include_dense=dense_too)
                self.logger.info(
                    f"weight-only int8 ({self.quantize}): UNet convs"
                    + ("+matmuls" if dense_too else "")
                )
            elif self.fuse_qkv:
                # neutral on v5e at SD widths (bench: 0.679 vs 0.657 s/img —
                # the post-GEMM split costs what the wider GEMM saves);
                # kept as an option for other shapes/hardware
                from sdtpu.io.params import fuse_attention_projections

                params = fuse_attention_projections(params)
            if self.mesh is not None:
                from sdtpu.parallel.sharding import shard_params

                params = shard_params(params, self.mesh)
            self.params = params
            if self.lora is not None:
                spec = ({"default": self.lora} if isinstance(self.lora, str)
                        else dict(self.lora))
                if isinstance(self.lora, str):
                    # single-path form: the adapter applies to EVERY request
                    # unless a call selects another (or lora="") explicitly
                    self._lora_default = "default"
                for name, path in spec.items():
                    self.load_lora(name, path)
        except SdtpuError:
            self._failed = True
            raise
        except Exception as e:  # noqa: BLE001
            self._fail(ErrorCode.RUNTIME_ERROR, f"model load failed: {e}")
        self.logger.info(f"models loaded in {time.perf_counter() - t0:.2f}s")

    def _load_tokenizer(self) -> None:
        if self._failed:
            return
        try:
            flat = self.model_dir / "ctokenizer.txt" if self.model_dir else None
            if flat is not None and flat.exists():
                self.tokenizer = Tokenizer.from_flat_file(flat)
            else:
                self.tokenizer = Tokenizer.from_merges(DEMO_MERGES)
            if self.tokenizer.vocab_size > self.cfg.clip.vocab_size:
                self._fail(
                    ErrorCode.INVALID_ARGUMENT,
                    f"tokenizer vocab {self.tokenizer.vocab_size} exceeds model"
                    f" vocab {self.cfg.clip.vocab_size}",
                )
        except SdtpuError:
            raise
        except Exception as e:  # noqa: BLE001
            self._fail(ErrorCode.RUNTIME_ERROR, f"tokenizer load failed: {e}")

    def _prepare_buffers(self) -> None:
        """Precompute the uncond ("") embedding (reference: context.cpp:233-239)."""
        if self._failed:
            return
        self._encode = jax.jit(lambda p, t: encode_text(p, t, self.cfg))
        self._encode_chunked = jax.jit(
            lambda p, t, w: encode_text(p, t, self.cfg, w))
        self._uncond = self._embed_prompt("")

    def _embed_prompt(self, text: str):
        tokens = jnp.asarray(
            [self.tokenizer.tokenize(text, self.cfg.clip.context_len)],
            jnp.int32,
        )
        return self._encode(self.params, tokens)[0]

    def _build_text_inputs(self, prompts: list[str],
                           negative_prompt: Optional[str]):
        """-> (tokens, weights-or-None, uncond embedding).

        Legacy path (everything fits one window, no attention syntax):
        tokens [B, T], weights None — bit-identical to earlier releases.
        Long/weighted prompts (sdtpu.text): tokens [B, k, T] + weights,
        every batch member (and the negative prompt) padded to the same
        chunk count; the uncond embedding re-encodes at [k*T, D]."""
        from sdtpu import text as text_mod

        L = self.cfg.clip.context_len
        neg = negative_prompt or ""
        if any(text_mod.has_schedule(p, self.steps)
               for p in (*prompts, neg)):
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                "prompt scheduling ([from:to:when] / [a|b]) is supported "
                "on Context.generate only", self.errors)
        chunky = any(text_mod.needs_chunking(self.tokenizer, p, L)
                     for p in prompts)
        chunky = chunky or (negative_prompt and text_mod.needs_chunking(
            self.tokenizer, neg, L))
        if not chunky:
            # attention syntax with all-unit weights (e.g. "(x:1.0)" or
            # escaped brackets) still needs STRIPPING before tokenizing
            plain = [text_mod.strip_syntax(p)
                     if text_mod.has_attention_syntax(p) else p
                     for p in prompts]
            tokens = jnp.asarray(
                [self.tokenizer.tokenize(p, L) for p in plain], jnp.int32)
            if negative_prompt:
                neg_plain = (text_mod.strip_syntax(neg)
                             if text_mod.has_attention_syntax(neg) else neg)
                uncond = self._embed_prompt(neg_plain)
            else:
                uncond = self._uncond
            return tokens, None, uncond
        per = [text_mod.chunked_tokens(self.tokenizer, p, L) for p in prompts]
        nt, _ = text_mod.chunked_tokens(self.tokenizer, neg, L)
        k = max(max(t.shape[0] for t, _ in per), nt.shape[0])
        per = [text_mod.chunked_tokens(self.tokenizer, p, L, min_chunks=k)
               for p in prompts]
        nt, nw = text_mod.chunked_tokens(self.tokenizer, neg, L,
                                         min_chunks=k)
        tokens = jnp.asarray(np.stack([t for t, _ in per]), jnp.int32)
        weights = jnp.asarray(np.stack([w for _, w in per]), jnp.float32)
        uncond = self._encode_chunked(
            self.params, jnp.asarray(nt[None], jnp.int32),
            jnp.asarray(nw[None], jnp.float32))[0]
        self.logger.info(
            f"long/weighted prompt path: {k} chunk(s), {k * L} ctx tokens")
        return tokens, weights, uncond

    # ------------------------------------------------------------------
    # knobs (reference C API: libsdod_set_steps / set_seed)
    # ------------------------------------------------------------------

    def _use_cfg(self, guidance) -> bool:
        """Whether a program needs the CFG batch: never for
        guidance-embedded (LCM) configs — the distilled model consumes the
        scale through its time MLP (config.UNetConfig.time_cond_proj_dim)
        — otherwise whenever guidance != 1."""
        if self.cfg.unet.time_cond_proj_dim:
            return False
        return guidance != 1.0

    def set_steps(self, steps: int) -> None:
        if steps < 1:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT, f"steps must be >= 1, got {steps}",
                self.errors,
            )
        self.steps = int(steps)

    def set_seed(self, seed: int) -> None:
        self.seed = int(seed)

    def set_pag_scale(self, scale: float) -> None:
        """Context-default perturbed-attention-guidance strength, applied
        when a generate call does not pass `pag_scale` itself; 0 disables
        (the C-ABI knob — per-call args stay the Python-first surface)."""
        self._default_pag = float(scale) if scale else None

    def set_deepcache(self, interval: int) -> None:
        """Re-configure DeepCache (full-UNet cadence; 0 disables) on a live
        context. Clears the compiled-program cache: the cadence is baked
        into each program (engine/pipeline.denoise)."""
        import dataclasses as _dc

        if interval and (not isinstance(interval, int) or interval < 2):
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"deepcache must be 0 (off) or an int >= 2, got {interval!r}",
                self.errors,
            )
        self.cfg = _dc.replace(
            self.cfg, deepcache_interval=int(interval) if interval else None)
        self._gen_cache.clear()

    def set_tome_ratio(self, ratio: float) -> None:
        """Re-configure ToMe token merging (0 disables) on a live context;
        clears the compiled-program cache (the merge plan is static)."""
        import dataclasses as _dc

        if ratio and not 0.0 < ratio <= 0.75:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"tome_ratio must be 0 (off) or in (0, 0.75], got {ratio!r}",
                self.errors,
            )
        self.cfg = _dc.replace(
            self.cfg, unet=_dc.replace(self.cfg.unet,
                                       tome_ratio=float(ratio or 0.0)))
        self._gen_cache.clear()

    # ------------------------------------------------------------------
    # LoRA adapter registry (per-request style/subject serving)
    # ------------------------------------------------------------------

    def load_lora(self, name: str, path) -> None:
        """Register (or replace) a LoRA adapter under `name`. The adapter
        tree (a few MB) is loaded once; the param overlay is built lazily on
        first use and SHARES every base weight array — N adapters cost N
        adapter trees, not N models. Accepts native ``.npz`` artifacts
        (sdtpu.train.lora) and community kohya-format ``.safetensors``
        adapters (UNet + text-encoder sites, sdtpu.io.kohya)."""
        if str(path).endswith(".safetensors"):
            from sdtpu.io.kohya import load_lora_kohya

            self._adapters[name] = load_lora_kohya(path, self.cfg)
        else:
            from sdtpu.train.lora import load_lora_npz

            self._adapters[name] = load_lora_npz(path)
        self._lora_params.pop(name, None)
        self.logger.info(f"LoRA adapter {name!r} loaded from {path}")

    def lora_names(self) -> list[str]:
        return sorted(self._adapters)

    # ------------------------------------------------------------------
    # ControlNet registry (spatially-conditioned generation)
    # ------------------------------------------------------------------

    def load_controlnet(self, name: str, source) -> None:
        """Register a ControlNet under ``name``. ``source``: a param tree
        (dict), an LDM ``control_model.*`` safetensors checkpoint path, a
        native flat-tree safetensors, or the string "random" (demo weights —
        random zero-convs so the control path visibly acts without trained
        weights). Select per request via ``generate(control=name,
        control_image=...)``."""
        from sdtpu.models import controlnet as cn_mod

        if isinstance(source, dict):
            cn = source
        elif source == "random":
            cn = jax.jit(lambda k: cn_mod.init(
                k, self.cfg.unet, zero_init_outs=False)
            )(jax.random.PRNGKey(len(self._controlnets) + 1))
        else:
            import safetensors.numpy as st

            from sdtpu.io.weights import (
                _unflatten_tree,
                load_controlnet_state_dict,
            )

            tensors = st.load_file(str(source))
            if any(k.startswith("control_model.") for k in tensors):
                cn = load_controlnet_state_dict(tensors, self.cfg)
            else:
                cn = _unflatten_tree(tensors)
        cn = cast_params(cn, self.cfg.compute_dtype)
        if self.mesh is not None:
            # place per the TP plan once at load (the adapter's transformer
            # matmuls pick up the Megatron pairs; zero-convs replicate) so
            # the sharded generate program's in_shardings hit, not reshard
            from sdtpu.parallel.sharding import shard_params

            cn = shard_params({"controlnet": cn}, self.mesh)["controlnet"]
        self._controlnets[name] = cn
        self.logger.info(f"ControlNet {name!r} loaded")

    def controlnet_names(self) -> list[str]:
        return sorted(self._controlnets)

    def load_embedding(self, placeholder: str, source) -> None:
        """Textual-inversion embedding: teach the prompt vocabulary a new
        standalone word whose learned vector(s) append to the CLIP token
        embedding table (the A1111 "embeddings/" / diffusers
        load_textual_inversion feature; the reference has a fixed vocab).

        ``placeholder``: the whitespace-free trigger word (e.g.
        "<my-style>"). ``source``: a [k, D] (or [D]) array, a dict of
        arrays — for dual-tower XL configs keys "clip_l"/"clip_g", or any
        single entry otherwise — or a path to an .npz / .safetensors file
        of that dict (A1111 safetensors' "emb_params" key is understood).
        Multi-vector embeddings (k > 1) expand the placeholder to k prompt
        tokens, so they consume k of the context window."""
        # dual-tower XL wants both; the refiner conditions on bigG only
        towers = [t for t in ("clip", "clip2")
                  if (t == "clip" or self.cfg.clip2 is not None)
                  and t in self.params]
        vecs = self._read_embedding_arrays(source, towers)
        k = vecs[0].shape[0]
        p = dict(self.params)
        start = None
        for tower, v in zip(towers, vecs):
            tp = dict(p[tower])
            table = tp["token_embedding"]
            if v.ndim != 2 or v.shape[0] != k or v.shape[1] != table.shape[1]:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"{tower} embedding must be [k, {table.shape[1]}], got "
                    f"{v.shape}", self.errors)
            if start is None:
                start = int(table.shape[0])
            tp["token_embedding"] = jnp.concatenate(
                [jnp.asarray(table), jnp.asarray(v, table.dtype)], axis=0)
            p[tower] = tp
        if self.mesh is not None:
            from sdtpu.parallel.sharding import shard_params

            p = shard_params(p, self.mesh)
        self.params = p
        # overlays/compiled closures captured the old table
        self._lora_params.clear()
        self.tokenizer.add_placeholder(
            placeholder, list(range(start, start + k)))
        self._embeddings[placeholder] = k
        self.logger.info(
            f"textual-inversion embedding {placeholder!r}: {k} vector(s)")

    def _read_embedding_arrays(self, source, towers) -> list[np.ndarray]:
        """-> per-tower [k, D] arrays, in `towers` order ("clip" -> key
        "clip_l", "clip2" -> "clip_g"; single-tower also accepts a bare
        array / single-entry dict / A1111's "emb_params")."""
        if isinstance(source, (str, Path)):
            s = str(source)
            if s.endswith(".npz"):
                data = dict(np.load(s))
            elif s.endswith(".pt"):
                # A1111 textual-inversion artifact: a torch pickle with
                # {"string_to_param": {"*": [k, D] tensor}}
                import torch

                obj = torch.load(s, map_location="cpu", weights_only=True)
                tensor = obj["string_to_param"]["*"]
                data = {"emb": tensor.detach().to(torch.float32).numpy()}
            else:
                import safetensors.numpy as st

                data = st.load_file(s)
        elif isinstance(source, dict):
            data = source
        else:
            data = {"emb": np.asarray(source)}
        data = {k: np.atleast_2d(np.asarray(v, np.float32))
                for k, v in data.items()}
        key_of = {"clip": "clip_l", "clip2": "clip_g"}
        if all(key_of[t] in data for t in towers):
            return [data[key_of[t]] for t in towers]
        if len(towers) == 1:
            if len(data) == 1:
                return [next(iter(data.values()))]
            for key in ("emb_params", "emb"):  # A1111 / ours
                if key in data:
                    return [data[key]]
        raise SdtpuError(
            ErrorCode.INVALID_ARGUMENT,
            f"cannot pick {[key_of[t] for t in towers]} embedding arrays "
            f"from keys {sorted(data)}", self.errors)

    def embedding_names(self) -> list[str]:
        return sorted(self._embeddings)

    def _resolve_control(self, control, control_image):
        """-> (tuple of adapter trees or None, hints [N, B, H, W, C] or
        None). Accepts single values or parallel lists (multi-ControlNet:
        residuals sum, the diffusers MultiControlNet convention)."""
        if control_image is None:
            if control:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    "control= given without control_image", self.errors)
            return None, None
        imgs = (list(control_image) if isinstance(control_image, (list,
                                                                  tuple))
                else [control_image])
        names = (list(control) if isinstance(control, (list, tuple))
                 else [control] * len(imgs))
        if len(names) != len(imgs):
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"{len(names)} control names for {len(imgs)} control "
                f"images", self.errors)
        cns, hints = [], []
        for name, image in zip(names, imgs):
            if name is None:
                if len(self._controlnets) != 1:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"control adapter name required (loaded: "
                        f"{sorted(self._controlnets)})", self.errors)
                name = next(iter(self._controlnets))
            if name not in self._controlnets:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"unknown ControlNet {name!r}; loaded: "
                    f"{sorted(self._controlnets)}", self.errors)
            img = np.asarray(image)
            if img.ndim == 3:
                img = img[None]
            size = self.cfg.image_size
            if img.shape[1:3] != (size, size):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"control_image must be {size}x{size}, got "
                    f"{img.shape[1:3]}", self.errors)
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            cns.append(self._controlnets[name])
            hints.append(np.asarray(img, np.float32))
        b = max(h.shape[0] for h in hints)
        hints = [np.broadcast_to(h, (b,) + h.shape[1:]) for h in hints]
        return tuple(cns), jnp.asarray(np.stack(hints), jnp.float32)

    def _params_for(self, lora: Optional[str]):
        """Resolve the param tree for a request's adapter selection.

        ``None`` means the context default (the single-path ``lora=``
        constructor form); ``""`` explicitly selects the base model."""
        if lora is None:
            lora = self._lora_default
        if not lora:
            return self.params
        if lora not in self._adapters:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"unknown LoRA adapter {lora!r}; loaded: "
                f"{sorted(self._adapters)}", self.errors,
            )
        p = self._lora_params.get(lora)
        if p is None:
            from sdtpu.train.lora import apply_lora

            adapters = self._adapters[lora]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                adapters = jax.device_put(
                    adapters, NamedSharding(self.mesh, P()))
            p = dict(self.params)
            if isinstance(adapters, dict) and set(adapters) <= {
                    "unet", "clip", "clip2"}:
                # full-tree overlay (kohya adapters carry text-encoder
                # sites too; sdtpu.io.kohya.load_lora_kohya)
                for tower, overlay in adapters.items():
                    if overlay and tower in p:
                        p[tower] = apply_lora(p[tower], overlay)
            else:
                p["unet"] = apply_lora(p["unet"], adapters)
            self._lora_params[lora] = p
        return p

    # ------------------------------------------------------------------
    # generate
    # ------------------------------------------------------------------

    def _compiled(self, batch: int, use_cfg: bool, params=None,
                  end_step=None, output: str = "image",
                  with_hint: bool = False, weighted: bool = False,
                  pag: bool = False):
        """Compiled generate program for this batch/steps/sampler — and for
        this param-tree STRUCTURE: a LoRA overlay adds adapter leaves, so the
        cache keys on the pytree structure too (all adapters with the same
        rank/targets share one compiled program; params are a traced
        argument). `end_step`/`output`: the base half of a two-stage
        pipeline (truncated scan, latent output). `with_hint`/`weighted`
        only matter on the mesh path, where the AOT in_shardings fix the
        positional signature (single-device jit retraces on new kwargs)."""
        params = self.params if params is None else params
        key = (batch, self.steps, self.sampler, use_cfg,
               jax.tree_util.tree_structure(params), end_step, output,
               with_hint and self.mesh is not None,
               weighted and self.mesh is not None, pag)
        fn = self._gen_cache.get(key)
        if fn is None:
            pag_layers = self.pag_layers if pag else None
            if self.mesh is not None:
                from sdtpu.parallel.sharding import jit_program_sharded

                if batch % self.mesh.shape["data"]:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"batch {batch} not divisible by data axis "
                        f"{self.mesh.shape['data']}", self.errors,
                    )
                fn = jit_program_sharded(
                    self.cfg, self.mesh, kind="generate",
                    sampler=self.sampler, steps=self.steps, use_cfg=use_cfg,
                    kernels=self.kernels, end_step=end_step, output=output,
                    with_hint=with_hint, weighted=weighted,
                    cfg_interval=self.cfg_interval, pag_layers=pag_layers,
                )(params)
            else:
                fn = jit_generate(
                    self.cfg, self.sampler, self.steps, use_cfg,
                    self.kernels, end_step=end_step, output=output,
                    cfg_interval=self.cfg_interval, pag_layers=pag_layers,
                )
            self._gen_cache[key] = fn
        return fn

    def _generate_scheduled(self, prompts, guidance, seed, negative_prompt,
                            lora):
        """A1111 prompt editing ([from:to:when] / [a|b] alternation,
        sdtpu.text.schedule_table): the deduped prompt variants encode into
        ONE table and the scan gathers the active variant per step — still
        a single compiled program, no per-step host work. Single-tower
        configs, single-window prompts (v1)."""
        import functools

        from sdtpu import text as text_mod
        from sdtpu.engine import pipeline as pl

        if self.cfg.clip2 is not None:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                "prompt scheduling is single-tower only (XL pending)",
                self.errors)
        neg = negative_prompt or ""
        if text_mod.has_schedule(neg, self.steps):
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                "scheduling inside the negative prompt is not supported",
                self.errors)
        L = self.cfg.clip.context_len
        variants, idx = text_mod.schedule_table(prompts, self.steps)
        tok_rows, w_rows = [], []
        for row in variants:
            per = [text_mod.chunked_tokens(self.tokenizer, p, L)
                   for p in row]
            if any(t.shape[0] > 1 for t, _ in per):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"scheduled prompts must fit one {L}-token window "
                    f"(long-prompt chunking + scheduling is unsupported)",
                    self.errors)
            tok_rows.append(np.stack([t[0] for t, _ in per]))   # [B, T]
            w_rows.append(np.stack([w[0] for _, w in per]))
        # [V, B, 1, T]: the k=1 chunked form carries the per-token weights
        tokens = jnp.asarray(np.stack(tok_rows), jnp.int32)[:, :, None]
        weights = jnp.asarray(np.stack(w_rows), jnp.float32)[:, :, None]
        if negative_prompt:
            uncond = self._embed_prompt(
                text_mod.strip_syntax(neg)
                if text_mod.has_attention_syntax(neg) else neg)
        else:
            uncond = self._uncond
        if seed is None:
            seed = self.seed
            self.seed += 1
        use_cfg = self._use_cfg(guidance)
        params = self._params_for(lora)
        t0 = time.perf_counter()
        key = ("sched", tokens.shape[0], len(prompts), self.steps,
               self.sampler, use_cfg,
               jax.tree_util.tree_structure(params))
        fn = self._gen_cache.get(key)
        if fn is None:
            part = functools.partial(
                pl.generate, cfg=self.cfg, sampler=self.sampler,
                steps=self.steps, use_cfg=use_cfg, kernels=self.kernels,
                cfg_interval=self.cfg_interval,
            )
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                from sdtpu.parallel.sharding import jit_pipeline_sharded

                if len(prompts) % self.mesh.shape["data"]:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"batch {len(prompts)} not divisible by data axis "
                        f"{self.mesh.shape['data']}", self.errors)

                def inner(prm, tok, unc, k_, g_, w_, i_):
                    return part(prm, tok, unc, k_, g_, token_weights=w_,
                                sched_idx=i_)

                fn = jit_pipeline_sharded(
                    inner, self.mesh, params,
                    arg_pspecs=(
                        P(None, "data", None, None),  # tokens [V,B,1,T]
                        P(),                          # uncond
                        P(),                          # key
                        P(),                          # guidance
                        P(None, "data", None, None),  # weights
                        P(),                          # sched idx [steps]
                    ),
                )
            else:
                fn = jax.jit(part)
            self._gen_cache[key] = fn
        args = (params, tokens, uncond, jax.random.PRNGKey(seed),
                jnp.float32(guidance))
        if self.mesh is not None:
            img = fn(*args, weights, jnp.asarray(idx))
        else:
            img = fn(*args, token_weights=weights,
                     sched_idx=jnp.asarray(idx))
        img = np.asarray(img)
        self.logger.info(
            f"scheduled generation ({tokens.shape[0]} variants) took "
            f"{time.perf_counter() - t0:.3f}s")
        return img

    def _require_txt2img(self, what: str) -> None:
        """Concat-conditioned checkpoints (9-ch inpaint / 5-ch depth UNets)
        cannot run unconditioned-latent programs: conv_in needs the extra
        planes at every step."""
        ic = self.cfg.unet.in_channels
        if ic != self.cfg.latent_channels:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"{what} needs a standard txt2img UNet; this config's takes "
                f"{ic} input channels — use inpaint() (9-ch) or depth2img() "
                f"(5-ch) instead", self.errors)

    def generate(
        self,
        prompt: str | list[str],
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        out: Optional[np.ndarray] = None,
        lora: Optional[str] = None,
        control_image=None,
        control: Optional[str] = None,
        control_scale: float = 1.0,
        denoising_end: Optional[float] = None,
        output: str = "image",
        pag_scale: Optional[float] = None,
    ) -> np.ndarray:
        """prompt -> uint8 RGB image [H, W, 3] (or [B, H, W, 3] for a list).

        `pag_scale`: perturbed-attention guidance strength (Ahn et al.
        2024) — one extra self-attention-perturbed UNet eval per step in
        the sections from the context's `pag_layers` (default the mid
        block), steering away from the structure-blind prediction. Traced:
        changing the value never recompiles; enabling it the first time
        compiles a dedicated program. Composes with CFG, negative prompts,
        ControlNet, and two-stage splits.

        `negative_prompt`: replaces the "" unconditional embedding in the CFG
        mix (same shapes — no recompile). `out`: optional preallocated caller
        buffer to fill (the reference's caller-allocated output protocol,
        api/libsdod.h:91-114). `seed` overrides the context seed for this
        call; otherwise the context seed is used and incremented (fresh image
        per call, reproducible stream). `lora`: adapter name from the
        registry (`load_lora`); "" forces the base model, None uses the
        context default.

        ControlNet: `control_image` ([H, W, C] or [B, H, W, C], uint8 or
        [0, 1] float at the output resolution) conditions generation through
        the adapter named by `control` (`load_controlnet`; optional when
        exactly one is loaded), weighted by `control_scale` (traced — no
        recompile across values).

        Two-stage pipelines (SDXL base+refiner): `denoising_end` in (0, 1]
        truncates the scan at round(steps * denoising_end) steps and
        `output="latent"` returns the f32 latents instead of decoding —
        feed them to a refiner Context's `refine(latents,
        denoising_start=...)` on the same `steps` timeline.
        """
        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            self._require_txt2img("generate")
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            if not prompts:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT, "empty prompt list", self.errors
                )
            from sdtpu import text as text_mod

            if any(text_mod.has_schedule(p, self.steps) for p in prompts):
                if (control_image is not None or denoising_end is not None
                        or output != "image"):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        "prompt scheduling composes with plain txt2img "
                        "only (no ControlNet/two-stage/latent output yet)",
                        self.errors)
                img = self._generate_scheduled(
                    prompts, guidance, seed, negative_prompt, lora)
                if isinstance(prompt, str):
                    img = img[0]
                if out is not None:
                    out[...] = img
                    return out
                return img
            t0 = time.perf_counter()
            if seed is None:
                seed = self.seed
                self.seed += 1
            if pag_scale is None:
                pag_scale = self._default_pag  # set_pag_scale / C ABI
            use_cfg = self._use_cfg(guidance)
            params = self._params_for(lora)
            tokens, weights, uncond = self._build_text_inputs(
                prompts, negative_prompt)
            cn, hint = self._resolve_control(control, control_image)
            if cn is not None:
                params = dict(params)
                params["controlnet"] = cn
                if hint.shape[1] not in (1, len(prompts)):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"control_image batch {hint.shape[1]} != prompt "
                        f"batch {len(prompts)}", self.errors)
                if hint.shape[1] == 1 and len(prompts) > 1:
                    hint = jnp.broadcast_to(
                        hint, (hint.shape[0], len(prompts))
                        + hint.shape[2:])
            end_step = None
            if denoising_end is not None:
                if not 0.0 < denoising_end <= 1.0:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"denoising_end must be in (0, 1], got "
                        f"{denoising_end}", self.errors)
                end_step = max(1, round(self.steps * denoising_end))
                if end_step == self.steps:
                    end_step = None  # full trajectory: the standard program
            if output not in ("image", "latent"):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"output must be image|latent, got {output!r}",
                    self.errors)
            fn = self._compiled(len(prompts), use_cfg, params,
                                end_step=end_step, output=output,
                                with_hint=cn is not None,
                                weighted=weights is not None,
                                pag=pag_scale is not None)
            call_kwargs = {}
            if cn is not None:
                call_kwargs.update(
                    hint=hint,
                    control_scale=jnp.asarray(control_scale, jnp.float32))
            if weights is not None:
                call_kwargs["token_weights"] = weights
            if pag_scale is not None:
                call_kwargs["pag_scale"] = jnp.float32(pag_scale)
            img = fn(
                params, tokens, uncond,
                jax.random.PRNGKey(seed), jnp.float32(guidance),
                **call_kwargs,
            )
            img = np.asarray(img)
            if isinstance(prompt, str):
                img = img[0]
            self.logger.info(
                f"image generation took {time.perf_counter() - t0:.3f}s "
                f"(steps={self.steps}, sampler={self.sampler}, seed={seed})"
            )
            if output == "latent":
                return img  # f32 scale-factored latents; `out` n/a
            if out is not None:
                if out.shape != img.shape or out.dtype != np.uint8:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"out buffer mismatch: {out.shape}/{out.dtype} vs "
                        f"{img.shape}/uint8", self.errors,
                    )
                np.copyto(out, img)
                return out
            return img

    def refine(
        self,
        latents,
        prompt: str | list[str],
        guidance: float = 7.5,
        seed: Optional[int] = None,
        denoising_start: float = 0.0,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """Continue denoising already-noisy latents, then decode — the
        second stage of a two-stage pipeline (SDXL base + refiner):

            base = sdtpu.Context(config="sdxl")
            ref  = sdtpu.Context(config="sdxl_refiner")
            lat  = base.generate(p, denoising_end=0.8, output="latent")
            img  = ref.refine(lat, p, denoising_start=0.8)

        `latents`: the base stage's `output="latent"` array ([h, w, C] or
        [B, h, w, C] f32), carrying the marginal at
        round(steps * denoising_start) on THIS context's steps timeline
        (use equal `steps` on both contexts). `denoising_start=0.0` with
        pure-noise latents reproduces `generate` exactly (pinned by test).
        Also works on any single-model config (refiner-less two-phase
        splits, latent-space editing)."""
        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            self._require_txt2img("refine")
            if not 0.0 <= denoising_start < 1.0:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"denoising_start must be in [0, 1), got "
                    f"{denoising_start}", self.errors)
            start_step = round(self.steps * denoising_start)
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            lat = jnp.asarray(latents, jnp.float32)
            if lat.ndim == 3:
                lat = lat[None]
            want = (len(prompts), self.cfg.latent_size, self.cfg.latent_size,
                    self.cfg.latent_channels)
            if lat.shape != want:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"latents shape {lat.shape} != {want}", self.errors)
            t0 = time.perf_counter()
            tokens, weights, uncond = self._build_text_inputs(
                prompts, negative_prompt)
            if seed is None:
                seed = self.seed
                self.seed += 1
            use_cfg = self._use_cfg(guidance)
            params = self._params_for(lora)
            key = ("refine", len(prompts), self.steps, self.sampler,
                   use_cfg, start_step,
                   jax.tree_util.tree_structure(params),
                   weights is not None and self.mesh is not None)
            fn = self._gen_cache.get(key)
            if fn is None:
                if self.mesh is not None:
                    from sdtpu.parallel.sharding import jit_program_sharded

                    if len(prompts) % self.mesh.shape["data"]:
                        raise SdtpuError(
                            ErrorCode.INVALID_ARGUMENT,
                            f"batch {len(prompts)} not divisible by data "
                            f"axis {self.mesh.shape['data']}", self.errors,
                        )
                    fn = jit_program_sharded(
                        self.cfg, self.mesh, kind="refine",
                        sampler=self.sampler, steps=self.steps,
                        use_cfg=use_cfg, kernels=self.kernels,
                        start_step=start_step,
                        weighted=weights is not None,
                        cfg_interval=self.cfg_interval,
                    )(params)
                else:
                    from sdtpu.engine.pipeline import jit_refine

                    fn = jit_refine(self.cfg, self.sampler, self.steps,
                                    start_step, use_cfg, self.kernels,
                                    cfg_interval=self.cfg_interval)
                self._gen_cache[key] = fn
            kw = {} if weights is None else {"token_weights": weights}
            img = np.asarray(fn(
                params, tokens, uncond, jax.random.PRNGKey(seed),
                jnp.float32(guidance), lat, **kw,
            ))
            if isinstance(prompt, str):
                img = img[0]
            self.logger.info(
                f"refine took {time.perf_counter() - t0:.3f}s "
                f"(steps={start_step}->{self.steps}, sampler={self.sampler})"
            )
            return img

    def generate_batch_async(self, requests: list[dict],
                             lora: Optional[str] = None):
        """Dispatch one compiled call for several independent requests
        (server-side micro-batching) and return a ``finish()`` callable that
        fetches the images — so a caller can DISPATCH batch k+1 before
        fetching batch k, overlapping the host fetch + delivery of one batch
        with the device compute of the next (JAX dispatch is async; the
        device never idles while the host copies pixels out).

        Each request dict: ``prompt`` (str, required) and optional
        ``guidance``/``seed``/``negative_prompt`` — all PER-SAMPLE (vector
        guidance, one PRNG key per sample, stacked negative embeddings). The
        batch is padded up to the next power of two so only O(log max_batch)
        programs are ever compiled. A batch of 1 is bit-identical to
        `generate`; larger batches are numerically equivalent but may differ
        by float-rounding of the batched tiling.

        ``lora`` selects one adapter for the WHOLE batch (adapters change
        the UNet weights, so the HTTP micro-batcher groups requests by
        adapter, like img2img groups by strength); requests may carry a
        uniform ``lora`` key instead.
        """
        import functools

        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            self._require_txt2img("generate_batch")
            from sdtpu import text as _tm

            for r in requests:
                for t in (r.get("prompt", ""), r.get("negative_prompt")
                          or ""):
                    if _tm.has_schedule(t, self.steps):
                        raise SdtpuError(
                            ErrorCode.INVALID_ARGUMENT,
                            "prompt scheduling is supported on "
                            "Context.generate only", self.errors)
            if not requests:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT, "empty request list",
                    self.errors,
                )
            for r in requests:
                if not isinstance(r.get("prompt"), str):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        "each request needs a string 'prompt'", self.errors,
                    )
            req_loras = {r.get("lora") for r in requests if "lora" in r}
            if len(req_loras) > 1 or (req_loras and lora is not None
                                      and lora not in req_loras):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"mixed LoRA adapters in one batch: {sorted(map(str, req_loras))}"
                    " — group requests by adapter", self.errors,
                )
            if lora is None and req_loras:
                lora = next(iter(req_loras))
            params = self._params_for(lora)
            n = len(requests)
            p = 1
            while p < n:
                p *= 2
            if self.mesh is not None:
                # the padded batch must tile the data axis exactly
                d = self.mesh.shape["data"]
                p = -(-p // d) * d
            t0 = time.perf_counter()
            pad = requests + [requests[0]] * (p - n)
            from sdtpu import text as text_mod

            L = self.cfg.clip.context_len
            weights = None
            chunky = any(
                text_mod.needs_chunking(self.tokenizer, r["prompt"], L)
                or (r.get("negative_prompt") and text_mod.needs_chunking(
                    self.tokenizer, r["negative_prompt"], L))
                for r in pad)
            if chunky:
                # long/weighted prompts: every batch member (and negative)
                # pads to the widest chunk count (sdtpu.text)
                per = [text_mod.chunked_tokens(self.tokenizer, r["prompt"], L)
                       for r in pad]
                negs = [text_mod.chunked_tokens(
                    self.tokenizer, r.get("negative_prompt") or "", L)
                    for r in pad]
                k = max(max(t.shape[0] for t, _ in per),
                        max(t.shape[0] for t, _ in negs))
                per = [text_mod.chunked_tokens(
                    self.tokenizer, r["prompt"], L, min_chunks=k)
                    for r in pad]
                negs = [text_mod.chunked_tokens(
                    self.tokenizer, r.get("negative_prompt") or "", L,
                    min_chunks=k) for r in pad]
                tokens = jnp.asarray(np.stack([t for t, _ in per]), jnp.int32)
                weights = jnp.asarray(np.stack([w for _, w in per]),
                                      jnp.float32)
            else:
                tokens = jnp.asarray(
                    [self.tokenizer.tokenize(
                        text_mod.strip_syntax(r["prompt"])
                        if text_mod.has_attention_syntax(r["prompt"])
                        else r["prompt"], L) for r in pad],
                    jnp.int32,
                )
            guidance = jnp.asarray(
                [float(r.get("guidance", 7.5)) for r in pad], jnp.float32)
            seeds = []
            for r in pad:
                s = r.get("seed")
                if s is None:
                    s = self.seed
                    self.seed += 1
                seeds.append(int(s))
            keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
            if chunky:
                uncond = jnp.stack([
                    self._encode_chunked(
                        self.params, jnp.asarray(nt[None], jnp.int32),
                        jnp.asarray(nw[None], jnp.float32))[0]
                    for nt, nw in negs
                ])
            else:
                uncond = jnp.stack([
                    self._embed_prompt(
                        text_mod.strip_syntax(r["negative_prompt"])
                        if text_mod.has_attention_syntax(r["negative_prompt"])
                        else r["negative_prompt"])
                    if r.get("negative_prompt") else self._uncond
                    for r in pad
                ])
            # per-sample PAG: the extra perturbed eval is static per
            # program, so the batch enables it when ANY request asks;
            # non-asking batch-mates ride with scale 0.0 (an exact no-op
            # in the combine — eps + 0*(delta) — so their images stay
            # bit-identical to the PAG-free program)
            pag_on = any("pag_scale" in r for r in requests)
            pscale = None
            if pag_on:
                pscale = jnp.asarray(
                    [float(r.get("pag_scale", 0.0)) for r in pad],
                    jnp.float32)
            cache_key = ("batch", p, self.steps, self.sampler,
                         jax.tree_util.tree_structure(params),
                         chunky and self.mesh is not None, pag_on)
            fn = self._gen_cache.get(cache_key)
            if fn is None:
                from sdtpu.engine.pipeline import generate as _generate

                part = functools.partial(
                    _generate, cfg=self.cfg, sampler=self.sampler,
                    steps=self.steps,
                    # guidance-embedded (LCM) configs never CFG-batch; the
                    # per-sample guidance vector rides the w embedding
                    use_cfg=not self.cfg.unet.time_cond_proj_dim,
                    kernels=self.kernels,
                    cfg_interval=self.cfg_interval,
                    pag_layers=self.pag_layers if pag_on else None,
                )
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from sdtpu.parallel.sharding import jit_pipeline_sharded

                    specs = [
                        # tokens [B, T] (or chunked [B, k, T])
                        P("data", None, None) if chunky else P("data", None),
                        P("data", None, None),  # per-sample uncond [B,T,D]
                        P("data", None),        # per-sample keys [B, 2]
                        P("data"),              # per-sample guidance [B]
                    ]
                    # in_shardings bind positionals; lift the kw-only
                    # token_weights [B, k, T] / pag_scale [B] into the
                    # signature (extras keep the call-site order below)
                    kw_names = (["token_weights"] if chunky else [])
                    if chunky:
                        specs.append(P("data", None, None))
                    if pag_on:
                        kw_names.append("pag_scale")
                        specs.append(P("data"))
                    if kw_names:
                        def inner(prm, tok, unc, k_, g_, *extra):
                            return part(prm, tok, unc, k_, g_,
                                        **dict(zip(kw_names, extra)))
                    else:
                        inner = part
                    fn = jit_pipeline_sharded(
                        inner, self.mesh, params, arg_pspecs=tuple(specs),
                    )
                else:
                    fn = jax.jit(part)
                self._gen_cache[cache_key] = fn
            if self.mesh is not None:
                # the stacked uncond rows are committed (multi-device) arrays
                # from the sharded encoder — re-place per the batch sharding
                from jax.sharding import NamedSharding, PartitionSpec as P

                uncond = jax.device_put(
                    uncond, NamedSharding(self.mesh, P("data", None, None)))
            extras = [a for a in (weights, pscale) if a is not None]
            if self.mesh is not None:
                dev = fn(params, tokens, uncond, keys, guidance, *extras)
            else:
                kw = {}
                if weights is not None:
                    kw["token_weights"] = weights
                if pscale is not None:
                    kw["pag_scale"] = pscale
                dev = fn(params, tokens, uncond, keys, guidance, **kw)
            self.logger.debug(
                f"batch of {n} (padded {p}) dispatched in "
                f"{time.perf_counter() - t0:.3f}s")

            def finish():
                out = np.asarray(dev)
                self.logger.info(
                    f"batch of {n} (padded {p}) took "
                    f"{time.perf_counter() - t0:.3f}s"
                )
                return [out[i] for i in range(n)]

            return finish

    def generate_batch(self, requests: list[dict],
                       lora: Optional[str] = None) -> list[np.ndarray]:
        """Blocking `generate_batch_async` (one compiled call, fetched)."""
        return self.generate_batch_async(requests, lora)()

    def img2img_batch_async(self, requests: list[dict],
                            strength: float = 0.6,
                            lora: Optional[str] = None):
        """Dispatch several independent img2img requests as ONE compiled
        call and return a ``finish()`` fetch callable (see
        `generate_batch_async` for the overlap rationale). Each request
        dict: ``prompt`` (str) and ``image`` (uint8 [H, W, 3]) required,
        optional per-sample ``guidance``/``seed``/``negative_prompt``.
        `strength` is shared across the batch — it selects the compiled
        program's start step, so the HTTP batcher groups requests by it
        (and by LoRA adapter). Padded to the next power of two (and to the
        mesh data axis)."""
        return self._image_batch_async("img2img", requests, strength, lora)

    def inpaint_batch_async(self, requests: list[dict],
                            strength: float = 1.0,
                            lora: Optional[str] = None):
        """Batched inpainting: like `img2img_batch_async` with a required
        per-request ``mask`` (uint8/float [H, W], nonzero = repaint). Works
        on both the standard (mask-pinning) and dedicated 9-ch inpaint
        configs — the program branch is static per config."""
        return self._image_batch_async("inpaint", requests, strength, lora)

    def inpaint_batch(self, requests: list[dict], strength: float = 1.0,
                      lora: Optional[str] = None) -> list[np.ndarray]:
        """Blocking `inpaint_batch_async` (one compiled call, fetched)."""
        return self.inpaint_batch_async(requests, strength, lora)()

    def _image_batch_async(self, mode, requests, strength, lora):
        import functools

        from sdtpu.engine import pipeline as pl

        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            if not requests:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT, "empty request list",
                    self.errors,
                )
            if not (0.0 < strength <= 1.0):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"strength must be in (0, 1], got {strength}", self.errors,
                )
            lc = self.cfg.latent_channels
            ic = self.cfg.unet.in_channels
            ok_ic = (lc, 2 * lc + 1) if mode == "inpaint" else (lc,)
            if ic not in ok_ic:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"{mode} batching supports UNet in_channels {ok_ic}, "
                    f"this config has {ic}", self.errors)
            size = self.cfg.image_size
            for r in requests:
                if not isinstance(r.get("prompt"), str):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        "each request needs a string 'prompt'", self.errors,
                    )
                im = np.asarray(r.get("image"))
                if im.shape != (size, size, 3) or im.dtype != np.uint8:
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"each request needs a uint8 [{size},{size},3] "
                        f"'image', got {im.shape}/{im.dtype}", self.errors,
                    )
                if mode == "inpaint":
                    m = np.asarray(r.get("mask"))
                    if m.shape != (size, size):
                        raise SdtpuError(
                            ErrorCode.INVALID_ARGUMENT,
                            f"each request needs a [{size},{size}] 'mask', "
                            f"got {m.shape}", self.errors,
                        )
            req_loras = {r.get("lora") for r in requests if "lora" in r}
            if len(req_loras) > 1 or (req_loras and lora is not None
                                      and lora not in req_loras):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"mixed LoRA adapters in one batch: {sorted(map(str, req_loras))}"
                    " — group requests by adapter", self.errors,
                )
            if lora is None and req_loras:
                lora = next(iter(req_loras))
            params = self._params_for(lora)
            n = len(requests)
            p = 1
            while p < n:
                p *= 2
            if self.mesh is not None:
                d = self.mesh.shape["data"]
                p = -(-p // d) * d
            t0 = time.perf_counter()
            pad = requests + [requests[0]] * (p - n)
            start_step = int(round(self.steps * (1.0 - strength)))
            start_step = min(max(start_step, 0), self.steps - 1)
            tokens = jnp.asarray(
                [self.tokenizer.tokenize(r["prompt"], self.cfg.clip.context_len)
                 for r in pad], jnp.int32,
            )
            guidance = jnp.asarray(
                [float(r.get("guidance", 7.5)) for r in pad], jnp.float32)
            seeds = []
            for r in pad:
                s = r.get("seed")
                if s is None:
                    s = self.seed
                    self.seed += 1
                seeds.append(int(s))
            keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
            uncond = jnp.stack([
                self._embed_prompt(r["negative_prompt"])
                if r.get("negative_prompt") else self._uncond
                for r in pad
            ])
            images = jnp.asarray(
                np.stack([np.asarray(r["image"]) for r in pad]),
                jnp.float32) / 127.5 - 1.0
            masks = None
            if mode == "inpaint":
                ms = []
                for r in pad:
                    m = np.asarray(r["mask"])
                    sc = 255.0 if m.dtype == np.uint8 else 1.0
                    ms.append((np.asarray(m, np.float32) / sc)[..., None])
                masks = jnp.asarray(np.stack(ms))
            cache_key = (mode + "_batch", p, self.steps, start_step,
                         self.sampler,
                         jax.tree_util.tree_structure(params))
            fn = self._gen_cache.get(cache_key)
            if fn is None:
                base = pl.inpaint if mode == "inpaint" else pl.img2img
                part = functools.partial(
                    base, cfg=self.cfg, sampler=self.sampler,
                    steps=self.steps, start_step=start_step,
                    use_cfg=not self.cfg.unet.time_cond_proj_dim,
                    kernels=self.kernels, cfg_interval=self.cfg_interval,
                )
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from sdtpu.parallel.sharding import jit_pipeline_sharded

                    specs = [
                        P("data", None),              # tokens
                        P("data", None, None),        # per-sample uncond
                        P("data", None),              # per-sample keys
                        P("data"),                    # per-sample guidance
                        P("data", None, None, None),  # images
                    ]
                    if mode == "inpaint":
                        specs.append(P("data", None, None, None))  # masks
                    fn = jit_pipeline_sharded(
                        part, self.mesh, params, arg_pspecs=tuple(specs),
                    )
                else:
                    fn = jax.jit(part)
                self._gen_cache[cache_key] = fn
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                uncond = jax.device_put(
                    uncond, NamedSharding(self.mesh, P("data", None, None)))
            args = (params, tokens, uncond, keys, guidance, images)
            if masks is not None:
                args += (masks,)
            dev = fn(*args)

            def finish():
                out = np.asarray(dev)
                self.logger.info(
                    f"{mode} batch of {n} (padded {p}) took "
                    f"{time.perf_counter() - t0:.3f}s"
                )
                return [out[i] for i in range(n)]

            return finish

    def img2img_batch(self, requests: list[dict], strength: float = 0.6,
                      lora: Optional[str] = None) -> list[np.ndarray]:
        """Blocking `img2img_batch_async` (one compiled call, fetched)."""
        return self.img2img_batch_async(requests, strength, lora)()

    def img2img(
        self,
        prompt: str | list[str],
        image: np.ndarray,
        strength: float = 0.6,
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """Image-to-image. `image`: uint8 [H, W, 3] (or [B, H, W, 3]) at the
        context's resolution. `strength` in (0, 1]: fraction of the denoise
        trajectory applied — 1.0 ignores the input image, small values stay
        close to it. Capability extension (the reference is txt2img-only)."""
        return self._image_conditioned(
            "img2img", prompt, image, None, strength, guidance, seed,
            negative_prompt, lora,
        )

    def inpaint(
        self,
        prompt: str | list[str],
        image: np.ndarray,
        mask: np.ndarray,
        strength: float = 1.0,
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """Inpainting with the standard (non-inpaint) checkpoint. `image`:
        uint8 [H, W, 3] (or [B, H, W, 3]); `mask`: [H, W] (or [B, H, W])
        uint8/bool — nonzero pixels are REPAINTED from the prompt, zero
        pixels keep the input image (uint8 values between 0 and 255 give a
        soft blend). Capability extension (the reference is txt2img-only)."""
        return self._image_conditioned(
            "inpaint", prompt, image, mask, strength, guidance, seed,
            negative_prompt, lora,
        )

    def depth2img(
        self,
        prompt: str | list[str],
        image: np.ndarray,
        depth: np.ndarray,
        strength: float = 0.8,
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """Depth-conditioned img2img (config ``sd2_depth``,
        stable-diffusion-2-depth: a 5-channel UNet that takes the latents
        plus a depth plane at every step). `image`: uint8 [H, W, 3] (or
        [B, H, W, 3]); `depth`: [H, W] (or [B, H, W]) float — any monotone
        depth scale (run your monocular estimator of choice caller-side;
        MiDaS upstream). It is normalized per sample to [-1, 1] at latent
        resolution inside the program. Capability extension (the reference
        is txt2img-only)."""
        return self._image_conditioned(
            "depth", prompt, image, None, strength, guidance, seed,
            negative_prompt, lora, depth=depth,
        )

    def hires_fix(
        self,
        prompt: str | list[str],
        scale: int = 2,
        strength: float = 0.6,
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """A1111-style two-pass "hires fix": generate at the context's base
        resolution, nearest-upscale the clean latents by `scale` (the
        "Latent" upscaler mode), then denoise the last
        round(steps*strength) steps at the higher resolution and decode —
        large images without the base model's high-res coherence failures.
        One param tree serves both passes (the UNet/VAE are fully
        convolutional); the second pass compiles per (scale, batch) and is
        cached. Returns uint8 [H*scale, W*scale, 3] (batched for a list).
        Capability extension (the reference is txt2img-only)."""
        import functools

        from sdtpu.engine import pipeline as pl

        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            self._require_txt2img("hires_fix")
            if not isinstance(scale, int) or scale < 2:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"scale must be an int >= 2, got {scale!r}", self.errors)
            if not (0.0 < strength < 1.0):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"strength must be in (0, 1), got {strength}",
                    self.errors)
            single = isinstance(prompt, str)
            prompts = [prompt] if single else list(prompt)
            if seed is None:
                seed = self.seed
                self.seed += 1
            # pass 1: base-resolution clean latents (device->host is a few
            # hundred KB; simplicity beats keeping them resident)
            lat = self.generate(prompts, guidance=guidance, seed=seed,
                                negative_prompt=negative_prompt, lora=lora,
                                output="latent")
            start_step = int(round(self.steps * (1.0 - strength)))
            start_step = min(max(start_step, 0), self.steps - 1)
            tokens, weights, uncond = self._build_text_inputs(
                prompts, negative_prompt)
            use_cfg = self._use_cfg(guidance)
            params = self._params_for(lora)
            weighted_mesh = weights is not None and self.mesh is not None
            cache_key = ("hires", scale, len(prompts), self.steps,
                         start_step, self.sampler, use_cfg,
                         jax.tree_util.tree_structure(params), weighted_mesh)
            fn = self._gen_cache.get(cache_key)
            if fn is None:
                part = functools.partial(
                    pl.hires_refine, cfg=self.cfg, scale=scale,
                    sampler=self.sampler, steps=self.steps,
                    start_step=start_step, use_cfg=use_cfg,
                    kernels=self.kernels, cfg_interval=self.cfg_interval,
                )
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from sdtpu.parallel.sharding import jit_pipeline_sharded

                    if len(prompts) % self.mesh.shape["data"]:
                        raise SdtpuError(
                            ErrorCode.INVALID_ARGUMENT,
                            f"batch {len(prompts)} not divisible by data "
                            f"axis {self.mesh.shape['data']}", self.errors,
                        )
                    specs = [
                        P("data", None, None) if weighted_mesh
                        else P("data", None),     # tokens
                        P(),                      # shared uncond
                        P(),                      # PRNG key
                        P(),                      # guidance scalar
                        P("data", None, None, None),  # base latents
                    ]
                    inner = part
                    if weighted_mesh:
                        def inner(prm, tok, unc, k_, g_, lat_, w_):
                            return part(prm, tok, unc, k_, g_, lat_,
                                        token_weights=w_)

                        specs.append(P("data", None, None))
                    fn = jit_pipeline_sharded(
                        inner, self.mesh, params, arg_pspecs=tuple(specs))
                else:
                    fn = jax.jit(part)
                self._gen_cache[cache_key] = fn
            # a dedicated fold keeps the hires forward-diffusion draw
            # disjoint from pass 1's noise stream (threefry bit streams
            # share prefixes across shapes under one key)
            key2 = jax.random.fold_in(jax.random.PRNGKey(seed), 1 << 23)
            args = (params, tokens, uncond, key2, jnp.float32(guidance),
                    jnp.asarray(lat))
            if weighted_mesh:
                out = np.asarray(fn(*args, weights))
            elif weights is not None:
                out = np.asarray(fn(*args, token_weights=weights))
            else:
                out = np.asarray(fn(*args))
            return out[0] if single else out

    def instruct_pix2pix(
        self,
        prompt: str | list[str],
        image: np.ndarray,
        guidance: float = 7.5,
        image_guidance: float = 1.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """Instruction-based image editing (config ``sd15_ip2p``,
        timbrooks/instruct-pix2pix): `prompt` is an EDIT instruction
        ("make it winter"), `image` the uint8 input at the context's
        resolution. Dual CFG: `guidance` steers toward the instruction,
        `image_guidance` toward the input image (higher = more faithful;
        both traced — no recompile across values). Capability extension
        (the reference is txt2img-only)."""
        return self._image_conditioned(
            "ip2p", prompt, image, None, 1.0, guidance, seed,
            negative_prompt, lora, image_guidance=image_guidance,
        )

    def upscale(
        self,
        prompt: str | list[str],
        image: np.ndarray,
        noise_level: int = 20,
        guidance: float = 9.0,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ) -> np.ndarray:
        """SD x4 latent upscaler (config ``sd_x4``): text-guided 4x
        super-resolution. `image` is the LOW-RES uint8 input at the
        latent grid size (cfg.latent_size, e.g. 128x128 -> 512x512);
        `noise_level` (< cfg.max_noise_level, traced — no recompile)
        sets the conditioning noise augmentation: higher frees the model
        from the input's artifacts at the cost of fidelity. Capability
        extension (the reference is fixed-resolution txt2img)."""
        if not 0 <= int(noise_level) < self.cfg.max_noise_level:
            raise SdtpuError(
                ErrorCode.INVALID_ARGUMENT,
                f"noise_level must be in [0, {self.cfg.max_noise_level}), "
                f"got {noise_level}", self.errors)
        return self._image_conditioned(
            "upsc", prompt, image, None, 1.0, guidance, seed,
            negative_prompt, lora, noise_level=int(noise_level),
        )

    def _image_conditioned(
        self, mode, prompt, image, mask, strength, guidance, seed,
        negative_prompt, lora=None, depth=None, image_guidance=None,
        noise_level=None,
    ) -> np.ndarray:
        """Shared img2img/inpaint/depth2img/instruct-pix2pix path:
        validate, tokenize, build/reuse the compiled program, run."""
        import functools

        from sdtpu.engine import pipeline as pl

        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            if not (0.0 < strength <= 1.0):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"strength must be in (0, 1], got {strength}", self.errors,
                )
            single = isinstance(prompt, str)
            prompts = [prompt] if single else list(prompt)
            img = np.asarray(image)
            if img.ndim == 3:
                img = img[None]
            # the x4 upscaler consumes the LOW-RES input at the latent grid
            size = (self.cfg.latent_size if mode == "upsc"
                    else self.cfg.image_size)
            want = (len(prompts), size, size, 3)
            if img.shape != want or img.dtype != np.uint8:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"image must be uint8 {want}, got {img.shape}/{img.dtype}",
                    self.errors,
                )
            lc = self.cfg.latent_channels
            ic = self.cfg.unet.in_channels
            if mode == "img2img" and ic != lc:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"this config's UNet takes {ic} input channels (concat-"
                    f"conditioned checkpoint); use inpaint() or depth2img()",
                    self.errors)
            if mode == "inpaint" and ic not in (lc, 2 * lc + 1):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"inpaint needs a standard ({lc}-ch) or dedicated-"
                    f"inpaint ({2 * lc + 1}-ch) UNet, this config has {ic}",
                    self.errors)
            if mode == "depth" and ic != lc + 1:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"depth2img needs a depth-conditioned ({lc + 1}-ch) "
                    f"UNet (config sd2_depth), this config has {ic}",
                    self.errors)
            if mode == "ip2p" and ic != 2 * lc:
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"instruct_pix2pix needs an {2 * lc}-ch UNet (config "
                    f"sd15_ip2p), this config has {ic}", self.errors)
            if mode == "upsc" and (ic != lc + 3
                                   or not self.cfg.unet.num_class_embeds):
                raise SdtpuError(
                    ErrorCode.INVALID_ARGUMENT,
                    f"upscale needs a {lc + 3}-ch noise-level-conditioned "
                    f"UNet (config sd_x4), this config has {ic} channels/"
                    f"{self.cfg.unet.num_class_embeds} class rows",
                    self.errors)
            if mode == "inpaint":
                m = np.asarray(mask)
                if m.ndim == 2:
                    m = m[None]
                if m.shape != (len(prompts), size, size):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"mask must be [B, {size}, {size}], got {m.shape}",
                        self.errors,
                    )
                scale = 255.0 if m.dtype == np.uint8 else 1.0
                m = (np.asarray(m, np.float32) / scale)[..., None]
            if mode == "depth":
                d = np.asarray(depth)
                if d.ndim == 2:
                    d = d[None]
                if d.shape != (len(prompts), size, size):
                    raise SdtpuError(
                        ErrorCode.INVALID_ARGUMENT,
                        f"depth must be [B, {size}, {size}], got {d.shape}",
                        self.errors,
                    )
                d = np.asarray(d, np.float32)[..., None]
            start_step = int(round(self.steps * (1.0 - strength)))
            start_step = min(max(start_step, 0), self.steps - 1)
            tokens, weights, uncond = self._build_text_inputs(
                prompts, negative_prompt)
            if seed is None:
                seed = self.seed
                self.seed += 1
            use_cfg = self._use_cfg(guidance)
            params = self._params_for(lora)
            weighted_mesh = weights is not None and self.mesh is not None
            cache_key = (mode, len(prompts), self.steps, start_step,
                         self.sampler, use_cfg,
                         jax.tree_util.tree_structure(params), weighted_mesh)
            fn = self._gen_cache.get(cache_key)
            if fn is None:
                base = {"inpaint": pl.inpaint,
                        "ip2p": pl.instruct_pix2pix,
                        "upsc": pl.upscale}.get(mode, pl.img2img)
                pkw = dict(cfg=self.cfg, sampler=self.sampler,
                           steps=self.steps, use_cfg=use_cfg,
                           kernels=self.kernels)
                if mode == "upsc":  # full trajectory; no warm start
                    pkw["cfg_interval"] = self.cfg_interval
                elif mode != "ip2p":  # ip2p always starts from pure noise
                    pkw["start_step"] = start_step
                    pkw["cfg_interval"] = self.cfg_interval
                part = functools.partial(base, **pkw)
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P

                    from sdtpu.parallel.sharding import jit_pipeline_sharded

                    if len(prompts) % self.mesh.shape["data"]:
                        raise SdtpuError(
                            ErrorCode.INVALID_ARGUMENT,
                            f"batch {len(prompts)} not divisible by data axis"
                            f" {self.mesh.shape['data']}", self.errors,
                        )
                    specs = [
                        # tokens [B, T] (chunked: [B, k, T])
                        P("data", None, None) if weighted_mesh
                        else P("data", None),
                        P(),                          # shared uncond
                        P(),                          # PRNG key
                        P(),                          # guidance scalar
                        P("data", None, None, None),  # image [B, H, W, 3]
                    ]
                    if mode == "inpaint":
                        specs.append(P("data", None, None, None))  # mask
                    if mode == "ip2p":
                        specs.append(P())  # image_guidance scalar
                    if mode == "upsc":
                        specs.append(P())  # noise_level scalar
                    # in_shardings bind positionals; lift the kw-only
                    # depth planes / token_weights into the signature
                    kw_names = []
                    if mode == "depth":
                        specs.append(P("data", None, None, None))  # depth
                        kw_names.append("depth")
                    if weighted_mesh:
                        specs.append(P("data", None, None))
                        kw_names.append("token_weights")
                    inner = part
                    if kw_names:
                        n_kw = len(kw_names)

                        def inner(prm, tok, unc, k_, g_, *rest):
                            pos, lift = rest[:-n_kw], rest[-n_kw:]
                            return part(prm, tok, unc, k_, g_, *pos,
                                        **dict(zip(kw_names, lift)))

                    fn = jit_pipeline_sharded(
                        inner, self.mesh, params, arg_pspecs=tuple(specs))
                else:
                    fn = jax.jit(part)
                self._gen_cache[cache_key] = fn
            x = jnp.asarray(img, jnp.float32) / 127.5 - 1.0
            args = (params, tokens, uncond, jax.random.PRNGKey(seed),
                    jnp.float32(guidance), x)
            if mode == "inpaint":
                args += (jnp.asarray(m),)
            if mode == "ip2p":
                args += (jnp.float32(image_guidance),)
            if mode == "upsc":
                args += (jnp.int32(noise_level),)
            kw = {}
            if mode == "depth":
                kw["depth"] = jnp.asarray(d)
            if weights is not None:
                kw["token_weights"] = weights
            if self.mesh is not None and kw:
                # the mesh program's wrapper took these as positionals,
                # in the kw_names order (depth, then token_weights)
                out = np.asarray(fn(*args, *kw.values()))
            else:
                out = np.asarray(fn(*args, **kw))
            return out[0] if single else out

    def generate_async(
        self,
        prompt: str | list[str],
        guidance: float = 7.5,
        seed: Optional[int] = None,
        negative_prompt: Optional[str] = None,
        lora: Optional[str] = None,
    ):
        """Dispatch generation without blocking; returns the device array
        (JAX dispatch is asynchronous — the analogue of the reference's
        ``execute_async`` + notify callback, qnn_context.cpp:716-725).
        Call ``np.asarray(result)`` (or ``.block_until_ready()``) to wait;
        meanwhile the host can tokenize/queue further prompts.
        """
        with slog.logger_scope(self.logger):
            if self._failed:
                raise SdtpuError(
                    ErrorCode.INVALID_CONTEXT,
                    "context previously failed and gave up", self.errors,
                )
            self._require_txt2img("generate_async")
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            tokens, weights, uncond = self._build_text_inputs(
                prompts, negative_prompt)
            if seed is None:
                seed = self.seed
                self.seed += 1
            use_cfg = self._use_cfg(guidance)
            params = self._params_for(lora)
            fn = self._compiled(len(prompts), use_cfg, params,
                                weighted=weights is not None)
            kw = {} if weights is None else {"token_weights": weights}
            return fn(
                params, tokens, uncond,
                jax.random.PRNGKey(seed), jnp.float32(guidance), **kw,
            )

    # ------------------------------------------------------------------

    def last_error(self, code: ErrorCode) -> Optional[str]:
        """(reference: libsdod_get_last_error_extra_info, libsdod.cpp:187-209)."""
        return self.errors.last(code)

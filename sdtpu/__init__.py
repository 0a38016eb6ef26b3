"""sdtpu — TPU-native Stable Diffusion txt2img engine (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the QNN/SNPE on-device Stable
Diffusion stack (see SURVEY.md): CLIP BPE tokenizer + text encoder, iterative
UNet denoiser with classifier-free guidance, PLMS/DDIM/DPM-solver samplers,
VAE decoder — all compiled so the whole denoising loop runs as one on-device
``lax.scan`` with no host round-trips.

Public API (mirrors the reference C API semantics, libsdod.h:47-138):

    >>> import sdtpu
    >>> ctx = sdtpu.Context(model_dir=None, steps=20)   # random-init demo weights
    >>> img = ctx.generate("a photograph of an astronaut riding a horse",
    ...                    guidance=7.5)                # uint8 (512, 512, 3)
"""

from sdtpu.version import __version__
from sdtpu.engine.context import Context
from sdtpu.engine.errors import (
    SdtpuError,
    ErrorCode,
)
from sdtpu.tokenizer import Tokenizer

__all__ = [
    "__version__",
    "Context",
    "SdtpuError",
    "ErrorCode",
    "Tokenizer",
]

"""ctypes bindings to the native host runtime (csrc/libsdtpu).

The native library provides fast host-side components (CLIP BPE tokenizer,
DPM solver) plus the C ABI engine facade. Python binds via ctypes (no
pybind11 in this environment). ``load_library`` builds on demand with make.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_REPO = Path(__file__).resolve().parent.parent.parent
_CSRC = _REPO / "csrc"
_LIB = _CSRC / "build" / "libsdtpu.so"

_lib: Optional[ctypes.CDLL] = None


def build_library() -> Path:
    subprocess.run(
        ["make", "-C", str(_CSRC), str(_LIB.relative_to(_CSRC))],
        check=True, capture_output=True,
    )
    return _LIB


def load_library(build: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists():
        if not build:
            raise FileNotFoundError(f"{_LIB} not built (make -C csrc)")
        build_library()
    lib = ctypes.CDLL(str(_LIB))

    lib.sdtpu_get_error_description.restype = ctypes.c_char_p
    lib.sdtpu_get_error_description.argtypes = [ctypes.c_int]
    lib.sdtpu_get_last_error_extra_info.restype = ctypes.c_char_p
    lib.sdtpu_get_last_error_extra_info.argtypes = [ctypes.c_int,
                                                    ctypes.c_void_p]

    lib.sdtpu_tokenizer_create.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.sdtpu_tokenizer_vocab_size.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.sdtpu_tokenizer_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.sdtpu_tokenizer_release.argtypes = [ctypes.c_void_p]

    lib.sdtpu_dpm_create.argtypes = [
        ctypes.c_int32, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.sdtpu_dpm_prepare.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.sdtpu_dpm_model_ts.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.sdtpu_dpm_update.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
    lib.sdtpu_dpm_release.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _check(status: int, lib, ctx=None):
    if status != 0:
        desc = lib.sdtpu_get_error_description(status).decode()
        extra = lib.sdtpu_get_last_error_extra_info(status, ctx)
        raise RuntimeError(
            f"libsdtpu: {desc}" + (f" ({extra.decode()})" if extra else ""))


class NativeTokenizer:
    """CLIP BPE via the native library — id-identical to sdtpu.Tokenizer but
    ~2 orders of magnitude faster per prompt (C++ scanner + merge loop)."""

    def __init__(self, flat_file: str | Path):
        self._lib = load_library()
        h = ctypes.c_void_p()
        _check(self._lib.sdtpu_tokenizer_create(
            str(flat_file).encode(), ctypes.byref(h)), self._lib)
        self._h = h

    @property
    def vocab_size(self) -> int:
        n = ctypes.c_int32()
        _check(self._lib.sdtpu_tokenizer_vocab_size(
            self._h, ctypes.byref(n)), self._lib)
        return n.value

    def tokenize(self, text: str, context_len: int = 77) -> list[int]:
        out = (ctypes.c_int32 * context_len)()
        _check(self._lib.sdtpu_tokenizer_tokenize(
            self._h, text.encode("utf-8"), context_len, out), self._lib)
        return list(out)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.sdtpu_tokenizer_release(self._h)
            self._h = None


class NativeDpm:
    """Native DPM-Solver++(2M) — numerically matches sdtpu.samplers.dpm."""

    def __init__(self, train_steps=1000, lin_start=0.00085, lin_end=0.0120):
        self._lib = load_library()
        h = ctypes.c_void_p()
        _check(self._lib.sdtpu_dpm_create(
            train_steps, lin_start, lin_end, ctypes.byref(h)), self._lib)
        self._h = h
        self._steps = 0

    def prepare(self, steps: int) -> None:
        _check(self._lib.sdtpu_dpm_prepare(self._h, steps), self._lib)
        self._steps = steps

    def model_ts(self):
        import numpy as np

        out = np.zeros(self._steps, np.float32)
        _check(self._lib.sdtpu_dpm_model_ts(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._steps), self._lib)
        return out

    def update(self, step: int, x, eps):
        import numpy as np

        x = np.ascontiguousarray(x, np.float32)
        eps = np.ascontiguousarray(eps, np.float32)
        _check(self._lib.sdtpu_dpm_update(
            self._h, step,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            eps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.size), self._lib)
        return x

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.sdtpu_dpm_release(self._h)
            self._h = None

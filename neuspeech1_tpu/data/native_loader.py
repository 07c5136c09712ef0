"""ctypes wrapper for the C++ clip loader (csrc/clip_loader.cc).

Compiles the shared library on first use (g++, cached next to the source),
and exposes batch loading of .npy signal clips straight into one
[B, modal_ch, n_samples] float32 array — the native fast path for the
signal side of the input pipeline. Falls back cleanly (raises ImportError)
when no toolchain is available; `DataLoader` keeps working via the Python
path in that case.

Measured honesty note: on the 1-core build machine the thread pool is ~0.84x
of numpy's page-cache memcpy path (237 vs 284 ms per 64x208x4800 batch);
the win materializes on multi-core production hosts (parallel file IO +
f8->f4 conversion outside the GIL). Output is byte-exact vs the Python path
(tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "clip_loader.cc")
_LIB_CACHE: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()


def _build_lib() -> ctypes.CDLL:
    global _LIB_CACHE
    with _LOCK:
        if _LIB_CACHE is not None:
            return _LIB_CACHE
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            raise ImportError(f"native source not found: {src}")
        out = os.path.join(os.path.dirname(src), "libcliploader.so")
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                   src, "-o", out]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise ImportError(
                    f"native loader build failed:\n{proc.stderr[:2000]}"
                )
        lib = ctypes.CDLL(out)
        lib.clip_loader_create.restype = ctypes.c_void_p
        lib.clip_loader_create.argtypes = [ctypes.c_int]
        lib.clip_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.clip_loader_load_batch.restype = ctypes.c_int
        lib.clip_loader_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB_CACHE = lib
        return lib


class NativeClipLoader:
    """Threaded batch .npy loader with channel slice/pad + time clip/pad
    (parity with `EEGDataset._load_signal` + `_pad_time`)."""

    def __init__(self, num_threads: int = 4):
        self._lib = _build_lib()
        self._pool = self._lib.clip_loader_create(num_threads)

    def load_batch(
        self,
        paths: Sequence[str],
        modal_ch: int,
        n_samples: int,
        channel_slice=None,
    ) -> np.ndarray:
        n = len(paths)
        out = np.zeros((n, modal_ch, n_samples), dtype=np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if channel_slice is None:
            ch_start, ch_stop = 0, -1
        else:
            ch_start, ch_stop = channel_slice
        rc = self._lib.clip_loader_load_batch(
            self._pool, arr, n, ch_start, ch_stop, modal_ch,
            n_samples, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native loader failed on {paths[rc - 1]!r}")
        return out

    def close(self):
        if self._pool:
            self._lib.clip_loader_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def native_available() -> bool:
    try:
        _build_lib()
        return True
    except ImportError:
        return False

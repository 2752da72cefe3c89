"""ctypes bindings to the native augmentation engine (native/augment.cc).

Auto-builds ``native/libpsgaug.so`` with the system compiler on first use
(cached), and degrades gracefully to the pure-Python path when no
compiler/library is available — ``available()`` gates the fast path in the
loader.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpsgaug.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:  # no compiler / make failure
        log.info("native augment build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.psg_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.psg_augment_batch.restype = None
        lib.psg_native_version.restype = ctypes.c_int
        assert lib.psg_native_version() == 1
        _lib = lib
    except Exception as e:  # pragma: no cover
        log.info("native augment load failed: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def augment_batch(images: np.ndarray, seed: int,
                  background: Tuple[int, int, int] = (255, 255, 255),
                  augment: bool = True, num_threads: int = 4) -> np.ndarray:
    """uint8 [N,H,W,3] -> fp32 [N,H,W,3] in [-1,1], optionally augmented.

    Deterministic in (images, seed).  Releases the GIL for the whole batch.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native augment library unavailable")
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    out = np.empty((n, h, w, 3), np.float32)
    bg = np.asarray(background, np.uint8)
    lib.psg_augment_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_uint64(np.uint64(seed & (2**64 - 1))),
        bg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        1 if augment else 0,
        num_threads,
    )
    return out

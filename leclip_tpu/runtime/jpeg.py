"""ctypes binding for the native JPEG decode runtime (decode.cpp).

Compiles `libleclip_decode.so` on first use (g++ -O3 against the system
libjpeg) and exposes ``decode_batch(paths)``: header-parse for dimensions,
allocate exact numpy buffers, then one multithreaded native call that decodes
straight into them. Falls back to PIL when the toolchain/libjpeg is missing,
so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decode.cpp")
_SO = os.path.join(_HERE, "libleclip_decode.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"") or b""
        print(f"native decode build failed ({out.decode(errors='replace')[:200]}); "
              "falling back to PIL")
        return None


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            _lib = False
            return _lib
        lib = ctypes.CDLL(path)
        lib.leclip_jpeg_dims.restype = ctypes.c_int
        lib.leclip_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.leclip_decode_jpeg_batch.restype = ctypes.c_int
        lib.leclip_decode_jpeg_batch.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return bool(_load())


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _pil_decode_bytes(blob: bytes) -> np.ndarray:
    import io

    from PIL import Image

    with Image.open(io.BytesIO(blob)) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def decode_batch(paths: Sequence[str], threads: int = 8) -> List[np.ndarray]:
    """Decode JPEG files → list of [H, W, 3] uint8 arrays (native when
    possible; non-JPEG or failed files fall back to PIL)."""
    lib = _load()
    if not lib:
        return [_pil_decode(p) for p in paths]
    return decode_bytes_batch([open(p, "rb").read() for p in paths], threads)


def decode_bytes_batch(blobs: Sequence[bytes], threads: int = 8) -> List[np.ndarray]:
    """Decode in-memory JPEG blobs (the serving path — no filesystem round
    trip); same native/PIL-fallback behavior as :func:`decode_batch`."""
    lib = _load()
    if not lib:
        return [_pil_decode_bytes(b) for b in blobs]

    n = len(blobs)
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    rc = (ctypes.c_int * n)()
    datas = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])

    # dimension pre-pass → exact output buffers
    outs: List[Optional[np.ndarray]] = []
    caps = (ctypes.c_long * n)()
    ptrs = (ctypes.c_void_p * n)()
    fallback_idx = []
    for i, b in enumerate(blobs):
        h, w = ctypes.c_int(), ctypes.c_int()
        ok = lib.leclip_jpeg_dims(datas[i], lens[i], ctypes.byref(h), ctypes.byref(w))
        if ok != 0:
            fallback_idx.append(i)
            outs.append(None)
            buf = np.zeros(1, np.uint8)
        else:
            buf = np.empty((h.value, w.value, 3), np.uint8)
            outs.append(buf)
        caps[i] = buf.nbytes
        ptrs[i] = buf.ctypes.data_as(ctypes.c_void_p)

    lib.leclip_decode_jpeg_batch(n, datas, lens, ptrs, caps, hs, ws, rc, threads)

    result: List[np.ndarray] = []
    for i in range(n):
        if outs[i] is None or rc[i] != 0:
            result.append(_pil_decode_bytes(blobs[i]))
        else:
            result.append(outs[i])
    return result

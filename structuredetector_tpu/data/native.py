"""ctypes bindings for the native IO library (native/sdnet_io.cpp).

The native tier of the input pipeline: fused JPEG/PNG decode (DCT-space
scaled decode for JPEG) + bilinear resize + flip + ImageNet normalize in
C++ threads, filling one contiguous NHWC float32 batch buffer. Replaces
the PIL decode path of the reference's DataLoader workers
(reference dataset.py:41-49) with a no-GIL, single-copy loader.

Falls back gracefully: `available()` is False when the shared library
hasn't been built (`make -C native`), and callers keep using PIL.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from .augment import IMAGENET_MEAN, IMAGENET_STD

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> Path:
    return Path(__file__).resolve().parent.parent.parent / "native" / "libsdnet_io.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("SDNET_IO_LIB", str(_lib_path()))
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = None
        return None

    try:
        version = lib.sdnet_io_version()
    except AttributeError:
        version = 0
    if version < 3:
        # stale build without the exact-mode argument (v2) or the uint8
        # feed variants (v3): treat as absent rather than crash
        # mid-batch with a silent ABI mismatch
        _LIB = None
        return None

    lib.sdnet_load_image.restype = ctypes.c_int
    lib.sdnet_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.sdnet_load_batch.restype = ctypes.c_int
    lib.sdnet_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.sdnet_load_image_u8.restype = ctypes.c_int
    lib.sdnet_load_image_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.sdnet_load_batch_u8.restype = ctypes.c_int
    lib.sdnet_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
    ]
    if version >= 4:
        lib.sdnet_decode_mem.restype = ctypes.c_int
        lib.sdnet_decode_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.sdnet_decode_mem_u8.restype = ctypes.c_int
        lib.sdnet_decode_mem_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def supports_decode_bytes() -> bool:
    """True when the built library has the v4 in-memory decode entry
    points (`decode_bytes`). `available()` accepts v3 builds for the
    file-based loaders — a server must check THIS before routing
    requests through `decode_bytes`, or a stale build turns every
    request into a 400."""
    lib = _load()
    return lib is not None and lib.sdnet_io_version() >= 4


_MEAN = np.ascontiguousarray(IMAGENET_MEAN, np.float32)
_STD = np.ascontiguousarray(IMAGENET_STD, np.float32)


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


_RAW01_MEAN = np.zeros(3, np.float32)
_RAW01_STD = np.ones(3, np.float32)


def load_image(
    path, out_w: int, out_h: int, hflip: bool = False, vflip: bool = False,
    normalize: bool = True, exact: bool = True, dtype=np.float32,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Decode+resize one image -> ((out_h, out_w, 3) float32, original
    (w, h)). normalize=True applies ImageNet mean/std; False yields raw
    [0, 1] (for on-device augmentation). dtype=np.uint8 yields the raw
    resized pixels with no float conversion at all (the 4x-smaller
    host->device feed; /255 + normalize then run on device) — requires
    normalize=False. exact=True is bit-identical with the PIL host path
    (Pillow-semantics resample, full decode); exact=False is the fast
    approximate path (DCT-scaled decode + 2-tap bilinear)."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    if dtype == np.uint8:
        assert not normalize, "uint8 output is raw pixels (normalize=False)"
        out = np.empty((out_h, out_w, 3), np.uint8)
        r = lib.sdnet_load_image_u8(
            str(path).encode(), out_w, out_h, int(hflip), int(vflip),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(ow), ctypes.byref(oh), int(exact),
        )
    else:
        out = np.empty((out_h, out_w, 3), np.float32)
        mean, std = (_MEAN, _STD) if normalize else (_RAW01_MEAN, _RAW01_STD)
        r = lib.sdnet_load_image(
            str(path).encode(), out_w, out_h, int(hflip), int(vflip),
            _fptr(mean), _fptr(std), _fptr(out),
            ctypes.byref(ow), ctypes.byref(oh), int(exact),
        )
    if not r:
        raise IOError(f"native decode failed for {path}")
    return out, (ow.value, oh.value)


def decode_bytes(
    data: bytes, out_w: int, out_h: int,
    normalize: bool = True, exact: bool = True, dtype=np.float32,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """In-memory decode+resize (the serving request path): JPEG/PNG
    payload bytes -> ((out_h, out_w, 3), original (w, h)). Same
    normalize/exact/dtype semantics as `load_image`; releases the GIL
    inside the C++ decode, so concurrent request handlers scale.
    Requires a v4+ native build."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    if lib.sdnet_io_version() < 4:
        raise RuntimeError("native IO build too old for decode_bytes "
                           "(rebuild: make -C native)")
    buf = np.frombuffer(data, np.uint8)
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    if dtype == np.uint8:
        assert not normalize, "uint8 output is raw pixels (normalize=False)"
        out = np.empty((out_h, out_w, 3), np.uint8)
        r = lib.sdnet_decode_mem_u8(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_long(len(data)), out_w, out_h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(ow), ctypes.byref(oh), int(exact),
        )
    else:
        out = np.empty((out_h, out_w, 3), np.float32)
        mean, std = (_MEAN, _STD) if normalize else (_RAW01_MEAN, _RAW01_STD)
        r = lib.sdnet_decode_mem(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_long(len(data)), out_w, out_h,
            _fptr(mean), _fptr(std), _fptr(out),
            ctypes.byref(ow), ctypes.byref(oh), int(exact),
        )
    if not r:
        raise IOError("native decode failed for in-memory payload "
                      f"({len(data)} bytes)")
    return out, (ow.value, oh.value)


def load_batch(
    paths: Sequence, out_w: int, out_h: int,
    flips: Optional[np.ndarray] = None, n_threads: int = 4,
    normalize: bool = True, exact: bool = True, dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode -> ((N, out_h, out_w, 3) float32,
    orig sizes (N, 2) int32, ok flags (N,) bool). normalize=True applies
    ImageNet mean/std; False yields raw [0, 1] pixels (the feed for
    on-device augmentation); dtype=np.uint8 yields raw resized pixels
    with no float conversion (4x-smaller host->device feed, requires
    normalize=False). exact: see `load_image`."""
    lib = _load()
    assert lib is not None, "native IO library not built (make -C native)"
    n = len(paths)
    orig = np.zeros((n, 2), np.int32)
    ok = np.zeros((n,), np.int32)
    flips_arr = (
        np.ascontiguousarray(flips, np.int32)
        if flips is not None
        else np.zeros((n, 2), np.int32)
    )
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if dtype == np.uint8:
        assert not normalize, "uint8 output is raw pixels (normalize=False)"
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        lib.sdnet_load_batch_u8(
            c_paths, n, out_w, out_h,
            flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads, int(exact),
        )
        return out, orig, ok.astype(bool)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    mean, std = (_MEAN, _STD) if normalize else (_RAW01_MEAN, _RAW01_STD)
    lib.sdnet_load_batch(
        c_paths, n, out_w, out_h,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _fptr(mean), _fptr(std), _fptr(out),
        orig.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads, int(exact),
    )
    return out, orig, ok.astype(bool)

"""ctypes bindings to the native C++ runtime pieces.

``libcap2det_native.so`` carries:
  * selective-search region proposals (native/selective_search.cc) —
    replaces the OpenCV ximgproc dependency of the reference's offline
    tools,
  * a buffered TFRecord reader with CRC32C and readahead
    (native/tfrecord_reader.cc) — the native input path.

The library is built lazily with ``make`` on first use; all callers must
handle `NativeUnavailable` and fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcap2det_native.so")

_lib = None
_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable("native build failed: %s" % detail)


def load():
    """Returns the loaded shared library, building it if necessary."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.cap2det_selective_search.restype = ctypes.c_int
        lib.cap2det_selective_search.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.cap2det_felzenszwalb.restype = ctypes.c_int
        lib.cap2det_felzenszwalb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tfr_open.restype = ctypes.c_void_p
        lib.tfr_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.tfr_next.restype = ctypes.c_long
        lib.tfr_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.tfr_close.restype = None
        lib.tfr_close.argtypes = [ctypes.c_void_p]
        lib.tfr_crc32c.restype = ctypes.c_uint
        lib.tfr_crc32c.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.cap2det_pack_s2d_u8.restype = ctypes.c_int
        lib.cap2det_pack_s2d_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]

        _lib = lib
        return _lib


def available():
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def selective_search(image, quality=True, min_box_side=20, seed=0,
                     max_boxes=4000):
    """Runs native selective search on an RGB uint8 image.

    Returns [N, 4] normalized [ymin, xmin, ymax, xmax] float32 proposals.
    """
    lib = load()
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    out = np.zeros((max_boxes, 4), np.float32)
    n = lib.cap2det_selective_search(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        1 if quality else 0,
        min_box_side,
        seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_boxes,
    )
    return out[:n].copy()


def felzenszwalb(image, k=100.0, min_size=20):
    """Graph segmentation; returns an int32 [H, W] label map."""
    lib = load()
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    labels = np.zeros((h, w), np.int32)
    lib.cap2det_felzenszwalb(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        float(k),
        min_size,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return labels


def pack_s2d(image, canvas_hw):
    """Packs a resized uint8 RGB image onto a zero-padded space-to-depth
    canvas in one native pass (native/image_pack.cc).

    Args:
      image: [nh, nw, 3] uint8, the keep-aspect-resized image.
      canvas_hw: (canvas_h, canvas_w) of the UNPACKED canvas; both even.

    Returns [canvas_h//2, canvas_w//2, 12] uint8, bit-identical to
    ``inception_v2.space_to_depth`` applied to the zero-padded
    [canvas_h, canvas_w, 3] canvas.
    """
    lib = load()
    ch, cw = canvas_hw
    if ch % 2 or cw % 2:
        raise ValueError("canvas dims must be even, got %r" % (canvas_hw,))
    image = np.ascontiguousarray(image, dtype=np.uint8)
    nh, nw = image.shape[:2]
    out = np.empty((ch // 2, cw // 2, 12), np.uint8)
    rc = lib.cap2det_pack_s2d_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nh,
        nw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ch // 2,
        cw // 2,
    )
    if rc != 0:
        raise ValueError(
            "pack_s2d: image %r does not fit canvas %r" % ((nh, nw), canvas_hw)
        )
    return out


def read_records_native(path, verify_crc=False, readahead=True):
    """Generator over raw records using the native reader."""
    lib = load()
    handle = lib.tfr_open(path.encode(), int(verify_crc), int(readahead))
    if not handle:
        raise IOError("cannot open %s" % path)
    try:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        while True:
            n = lib.tfr_next(handle, ctypes.byref(ptr))
            if n == -1:
                return
            if n < 0:
                raise IOError("corrupt TFRecord in %s" % path)
            yield ctypes.string_at(ptr, n)
    finally:
        lib.tfr_close(handle)

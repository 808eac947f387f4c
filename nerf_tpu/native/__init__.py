"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; host-side heavy lifting (snapshot
parsing — the data-loader role the reference fills with nlohmann-json's
C++ msgpack parser, src/nerf_render.cu:83-88) is C++ here too. The .so is
built on demand by build_native.sh (g++ is assumed present; falls back to
pure Python when unavailable).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsnapshot_codec.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_codec() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the snapshot codec; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["bash", os.path.join(_DIR, "build_native.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.snapshot_scan.restype = ctypes.c_int
    lib.snapshot_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.snapshot_read_f32.restype = ctypes.c_int
    lib.snapshot_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


FIELDS = ("params", "density_grid", "aabb", "bound", "scale", "cascade",
          "density_grid_size", "mean_density")


def fast_scan_snapshot(data: bytes):
    """Natively decode a snapshot msgpack.

    Returns (fields, spliced) or None. `fields` maps each numeric snapshot
    field to an np.ndarray (arrays) or float (scalars); `spliced` is the
    original msgpack bytes with the huge `params`/`density_grid` arrays
    replaced by empty ones, so the config remainder decodes in Python in
    microseconds.
    """
    import numpy as np

    lib = load_codec()
    if lib is None:
        return None
    meta = (ctypes.c_int64 * (5 * len(FIELDS)))()
    rc = lib.snapshot_scan(data, len(data), meta)
    if rc != 0:
        return None
    fields = {}
    spans = []
    for i, name in enumerate(FIELDS):
        count, offset, found = meta[5 * i], meta[5 * i + 1], meta[5 * i + 2]
        hdr, end = meta[5 * i + 3], meta[5 * i + 4]
        if not found:
            continue
        arr = np.empty(count, np.float32)
        rc = lib.snapshot_read_f32(
            data, len(data), offset, count,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            return None
        if name in ("params", "density_grid", "aabb"):
            fields[name] = arr
        else:
            fields[name] = float(arr[0])
        if name in ("params", "density_grid"):
            spans.append((hdr, end))
    # splice the big arrays out (replace with 0-element fixarray 0x90)
    spans.sort()
    parts, prev = [], 0
    for hdr, end in spans:
        parts.append(data[prev:hdr])
        parts.append(b"\x90")
        prev = end
    parts.append(data[prev:])
    return fields, b"".join(parts)

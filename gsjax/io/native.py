"""ctypes bindings for the native C++ parsing library (native/loader.cpp).

The reference keeps its only native component (the WASM sorter) for the
hot sort path; our sort is a device op, so the native tier here serves the
*ingest* hot loop instead — the reference's per-vertex TS DataView parse
(/root/reference/src/loaders/PLYLoader.ts:578-712) becomes a C++ parser
that decodes interleaved PLY vertices at memory speed.

Falls back to None (→ numpy parser) when the shared library has not been
built. Build with `make -C native` (produces native/libgsjax_io.so).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libgsjax_io.so")
    if not os.path.exists(path):
        # build on first use when a toolchain is available (the .so is
        # not versioned); any failure falls back to the numpy parser
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                capture_output=True,
                timeout=120,
                check=False,
            )
        except Exception:
            return None
        if not os.path.exists(path):
            return None
    lib = ctypes.CDLL(path)
    lib.gsjax_parse_ply.restype = ctypes.c_int
    lib.gsjax_parse_ply.argtypes = [
        ctypes.c_char_p,  # buf
        ctypes.c_size_t,  # nbytes
        ctypes.c_size_t,  # row offset (data start)
        ctypes.c_int,  # n vertices
        ctypes.c_int,  # row stride bytes
        ctypes.POINTER(ctypes.c_int),  # field offsets [62]
        ctypes.c_int,  # sh K
        ctypes.c_void_p,  # means out [n,3] f32
        ctypes.c_void_p,  # log_scales out [n,3]
        ctypes.c_void_p,  # quats out [n,4]
        ctypes.c_void_p,  # sh out [n,K,3]
        ctypes.c_void_p,  # opacity out [n]
    ]
    _LIB = lib
    return lib


def parse_ply_native(buf: bytes, use_shs: bool = True):
    """Parse a plain 3DGS PLY with the native library. Returns the dict
    consumed by gsjax.io.ply._assemble, or None if unavailable/unsuitable."""
    lib = _load_lib()
    if lib is None:
        return None
    from gsjax.io.ply import parse_ply_header

    header = parse_ply_header(buf)
    vert = next((e for e in header.elements if e.name == "vertex"), None)
    if vert is None:
        return None
    props = dict()
    off = 0
    stride = 0
    for name, dt in vert.properties:
        size = np.dtype(dt).itemsize
        if dt != "<f4":
            return None  # native fast path handles all-float rows only
        props[name] = off
        off += size
    stride = off

    need = ["x", "y", "z", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1",
            "rot_2", "rot_3", "opacity", "f_dc_0", "f_dc_1", "f_dc_2"]
    if any(nm not in props for nm in need):
        return None
    n_rest = sum(1 for nm in props if nm.startswith("f_rest_"))
    k = 1 + n_rest // 3 if use_shs else 1
    if k not in (1, 4, 9, 16):
        return None

    offsets = (ctypes.c_int * 62)()
    for i in range(62):
        offsets[i] = -1
    for i, nm in enumerate(need):
        offsets[i] = props[nm]
    # layout contract with loader.cpp: [x y z s0 s1 s2 r0 r1 r2 r3 op dc0
    # dc1 dc2 rest...], rest slot = 14 + channel*15 + coeff (channel-major,
    # 15 slots per channel regardless of the file's actual degree).
    per_ch = n_rest // 3
    for c in range(3):
        for j in range(min(per_ch, 15)):
            offsets[14 + c * 15 + j] = props.get(f"f_rest_{c * per_ch + j}", -1)

    n = vert.count
    means = np.empty((n, 3), np.float32)
    log_scales = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)
    sh = np.zeros((n, k, 3), np.float32)
    opacity = np.empty((n,), np.float32)

    rc = lib.gsjax_parse_ply(
        buf,
        len(buf),
        header.data_offset,
        n,
        stride,
        offsets,
        k,
        means.ctypes.data_as(ctypes.c_void_p),
        log_scales.ctypes.data_as(ctypes.c_void_p),
        quats.ctypes.data_as(ctypes.c_void_p),
        sh.ctypes.data_as(ctypes.c_void_p),
        opacity.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return {
        "means": means,
        "log_scales": log_scales,
        "quats": quats,
        "sh": sh,
        "opacity_logits": opacity,
    }

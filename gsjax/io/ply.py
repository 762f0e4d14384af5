"""3D-Gaussian-Splatting .ply loader.

Capability parity with the reference PLYLoader
(/root/reference/src/loaders/PLYLoader.ts): header parse
(_parsePLYHeader, :541-575), the full-SH fast parse
(_ParseFullPLYBufferFast, :578-712) and the no-SH path
(_ParsePLYBuffer, :389-538), with the Polycam axis-flip option
(:516-528, 868-880). The quantized-codebook variant lives in
gsjax/io/qply.py.

Vectorized numpy instead of the reference's per-vertex DataView loop; the
native C++ fast path (gsjax/io/native.py) parses interleaved vertices at
memory speed for multi-GB scenes.

Property semantics (≙ PLYLoader.ts:606-706):
  scale_*   log-space → stored directly as log_scales
  opacity   logit → stored directly as opacity_logits
  rot_*     (w, x, y, z), unnormalized → normalized on use
  f_dc_*    SH degree-0 coefficients
  f_rest_*  45 higher-order coefficients, channel-major in file:
            f_rest_[0..14] = R coeffs 1..15, [15..29] = G, [30..44] = B.
            (The reference's fast path reads f_rest_38 twice where 39 is
            intended — PLYLoader.ts:685, SURVEY §2.4 — fixed here.)
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from gsjax.core.gaussians import Gaussians

_PLY_DTYPES = {
    "float": ("<f4", 4),
    "float32": ("<f4", 4),
    "double": ("<f8", 8),
    "float64": ("<f8", 8),
    "int": ("<i4", 4),
    "int32": ("<i4", 4),
    "uint": ("<u4", 4),
    "uint32": ("<u4", 4),
    "short": ("<i2", 2),
    "int16": ("<i2", 2),
    "ushort": ("<u2", 2),
    "uint16": ("<u2", 2),
    "float16": ("<f2", 2),
    "half": ("<f2", 2),
    "char": ("<i1", 1),
    "int8": ("<i1", 1),
    "uchar": ("<u1", 1),
    "uint8": ("<u1", 1),
}


@dataclasses.dataclass
class PlyElement:
    name: str
    count: int
    properties: list  # [(name, numpy dtype str)]


@dataclasses.dataclass
class PlyHeader:
    elements: list
    data_offset: int


def parse_ply_header(buf: bytes) -> PlyHeader:
    """≙ _parsePLYHeader (PLYLoader.ts:541-575)."""
    end_tag = b"end_header\n"
    end = buf.find(end_tag)
    if not buf.startswith(b"ply") or end < 0:
        raise ValueError("Invalid PLY file")  # ≙ PLYLoader.ts:72-74
    header = buf[:end].decode("ascii", errors="replace")
    if "binary_little_endian" not in header:
        raise ValueError("Only binary_little_endian PLY is supported")
    elements: list[PlyElement] = []
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "element":
            elements.append(PlyElement(parts[1], int(parts[2]), []))
        elif parts[0] == "property" and elements:
            if parts[1] == "list":
                raise ValueError("list properties are not supported")
            dt = _PLY_DTYPES.get(parts[1])
            if dt is None:
                raise ValueError(f"unsupported PLY property type {parts[1]}")
            elements[-1].properties.append((parts[2], dt[0]))
    return PlyHeader(elements=elements, data_offset=end + len(end_tag))


def element_recarray(buf: bytes, header: PlyHeader, elem: PlyElement, offset: int):
    """View one element's packed rows as a numpy structured array."""
    dtype = np.dtype([(n, t) for n, t in elem.properties])
    nbytes = dtype.itemsize * elem.count
    arr = np.frombuffer(buf, dtype=dtype, count=elem.count, offset=offset)
    return arr, offset + nbytes


def load_ply(
    path_or_bytes,
    use_shs: bool = True,
    format: str = "",
    quantized: bool = False,
    use_native: bool = True,
    banded: bool = False,
):
    """Load a 3DGS .ply into a Gaussians pytree
    (≙ PLYLoader.LoadAsync signature url/scene/onProgress/format/useShs/
    quantized, PLYLoader.ts:30-37). With quantized=True and banded=True,
    returns a BandedGaussians keeping each band group's native SH size
    (core/banded.py ≙ the reference's bandsIndices partitioning)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(os.fspath(path_or_bytes), "rb") as fh:
            buf = fh.read()
    if quantized:
        from gsjax.io.qply import parse_qply

        return parse_qply(buf, format=format, banded=banded)
    if banded:
        raise ValueError("banded=True requires quantized=True")
    if use_native:
        try:
            from gsjax.io.native import parse_ply_native

            out = parse_ply_native(buf, use_shs=use_shs)
            if out is not None:
                return _assemble(out, format)
        except Exception:
            # Unsupported layouts return None (expected); a raising native
            # parser is a bug worth surfacing — warn once, then fall back
            # to the numpy parser so loading still succeeds.
            import warnings

            warnings.warn(
                "native PLY parser raised; falling back to the numpy "
                "parser (set use_native=False to silence)",
                RuntimeWarning,
                stacklevel=2,
            )
    return _parse_ply_numpy(buf, use_shs=use_shs, format=format)


def _parse_ply_numpy(buf: bytes, use_shs: bool, format: str) -> Gaussians:
    header = parse_ply_header(buf)
    vert = next((e for e in header.elements if e.name == "vertex"), None)
    if vert is None:
        raise ValueError("PLY has no vertex element")
    rows, _ = element_recarray(buf, header, vert, header.data_offset)
    names = {n for n, _ in vert.properties}

    n = vert.count
    d = {}
    d["means"] = np.stack(
        [rows["x"], rows["y"], rows["z"]], axis=-1
    ).astype(np.float32)

    if "scale_0" in names:
        d["log_scales"] = np.stack(
            [rows["scale_0"], rows["scale_1"], rows["scale_2"]], -1
        ).astype(np.float32)
    else:
        # ≙ PLYLoader.ts:465-470 default tiny scale
        d["log_scales"] = np.full((n, 3), np.log(0.01), np.float32)

    if "rot_0" in names:
        d["quats"] = np.stack(
            [rows["rot_0"], rows["rot_1"], rows["rot_2"], rows["rot_3"]], -1
        ).astype(np.float32)
    else:
        d["quats"] = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))

    if "opacity" in names:
        d["opacity_logits"] = rows["opacity"].astype(np.float32)
    else:
        d["opacity_logits"] = np.full((n,), 30.0, np.float32)

    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    k = 1 + n_rest // 3 if use_shs else 1
    if k not in (1, 4, 9, 16):
        k = next(v for v in (16, 9, 4, 1) if v <= k)
    sh = np.zeros((n, k, 3), np.float32)
    if "f_dc_0" in names:
        for c in range(3):
            sh[:, 0, c] = rows[f"f_dc_{c}"]
    elif "red" in names:
        from gsjax.core.gaussians import SH_C0

        for c, nm in enumerate(("red", "green", "blue")):
            sh[:, 0, c] = (rows[nm].astype(np.float32) / 255.0 - 0.5) / SH_C0
    if use_shs and k > 1:
        # channel-major in file → [N, coeff, channel]
        for c in range(3):
            for j in range(k - 1):
                sh[:, 1 + j, c] = rows[f"f_rest_{c * (n_rest // 3) + j}"]
    d["sh"] = sh
    return _assemble(d, format)


def save_ply(g: Gaussians, path=None) -> bytes:
    """Serialize to the standard 3DGS .ply layout (the exact inverse of
    load_ply's property semantics; the reference has no PLY *export* —
    its only save path is Scene.saveToFile → .splat, Scene.ts:368-403 —
    this is parity-plus for interop with graphdeco tooling)."""
    import jax

    means, log_scales, quats, sh, opacity = (
        np.asarray(jax.device_get(x))
        for x in (g.means, g.log_scales, g.quats, g.sh, g.opacity_logits)
    )
    n, k = sh.shape[0], sh.shape[1]
    n_rest = 3 * (k - 1)
    props = (
        ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity", "scale_0", "scale_1", "scale_2"]
        + [f"rot_{i}" for i in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in props)
        + "end_header\n"
    ).encode("ascii")
    out = np.zeros((n, len(props)), np.float32)
    out[:, 0:3] = means
    out[:, 6:9] = sh[:, 0, :]
    # channel-major f_rest (≙ the load_ply read order)
    for c in range(3):
        out[:, 9 + c * (k - 1) : 9 + (c + 1) * (k - 1)] = sh[:, 1:, c]
    base = 9 + n_rest
    out[:, base] = opacity
    out[:, base + 1 : base + 4] = log_scales
    out[:, base + 4 : base + 8] = quats
    blob = header + out.tobytes()
    if path is not None:
        with open(os.fspath(path), "wb") as fh:
            fh.write(blob)
    return blob


def _assemble(d: dict, format: str) -> Gaussians:
    import jax.numpy as jnp

    means = d["means"]
    quats = d["quats"]
    if format == "polycam":
        # ≙ PLYLoader.ts:516-528: flip y/z of positions and the matching
        # quaternion components
        means = means * np.array([1, -1, -1], np.float32)
        quats = quats * np.array([1, 1, -1, -1], np.float32)
    return Gaussians(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(d["log_scales"]),
        quats=jnp.asarray(quats),
        sh=jnp.asarray(d["sh"]),
        opacity_logits=jnp.asarray(d["opacity_logits"]),
    )

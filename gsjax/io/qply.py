"""Quantized-codebook PLY loader.

Capability parity with the reference's _ParseQPLYBuffer
(/root/reference/src/loaders/PLYLoader.ts:893-1196). Format:

  - 4 vertex groups `element vertex_<i> <count>` (i = number of active SH
    bands for that group: 0..3), rows stored group-sequential;
  - positions as raw f16 (int16 bit pattern, PLYLoader.ts:1082-1093);
  - every other attribute is a u8 index into one of the 256-entry f16
    codebooks from `element codebook_centers 256` (stored after all
    vertex data, row-interleaved int16, PLYLoader.ts:1146-1152):
      scaling        → log-scale      (exp'd by the reference :1097-1102)
      rotation_re/im → quaternion w / xyz (:1105-1117)
      features_dc    → SH DC coefficients (:1131-1141)
      opacity        → opacity logit  (sigmoided by the reference :1141-1144)
      features_rest_<k> → SH band coefficient k (shared across channels),
        file layout channel-major per group ([R coeffs][G coeffs][B
        coeffs], :1160-1169)
  - group boundaries surface as the reference's `bandsIndices`
    (:1190-1195); here mixed degrees are simply zero-padded SH (inert in
    eval), so no band machinery survives.

Decoding is vectorized numpy (u8 fancy-indexing into the codebooks)
instead of the reference's per-vertex DataView loop. The header/decode
helpers are shared with io/stream.load_qply_streamed, which fills the
same structured row arrays chunk-by-chunk.
"""

from __future__ import annotations

import re

import numpy as np

from gsjax.core.gaussians import Gaussians

_SIZES = {
    "double": 8,
    "int": 4,
    "uint": 4,
    "float": 4,
    "short": 2,
    "ushort": 2,
    "uchar": 1,
}

_SH_STRIDE = {0: 0, 1: 3, 2: 8, 3: 15}


def parse_qheader(head: bytes):
    """Parse a quantized-PLY header (bytes through ``end_header``).

    Returns (groups, cb_props, data_start): groups in FILE order as
    (bands, count, numpy dtype); cb_props the codebook column names."""
    end_tag = b"end_header\n"
    hi = head.find(end_tag)
    if not head.startswith(b"ply") or hi < 0:
        raise ValueError("Unable to read .ply file header")
    header = head[:hi].decode("ascii", errors="replace")
    data_start = hi + len(end_tag)

    groups = []  # FILE order: (bands, count, dtype)
    sections = re.split(r"\nelement ", "\n" + header)
    cb_props = []
    for sec in sections:
        sec = sec.strip()
        if not sec or sec.startswith("ply") or sec.startswith("format"):
            continue
        first, *rest = sec.splitlines()
        m = re.match(r"vertex_(\d+)\s+(\d+)", first)
        props = [
            tuple(line.split()[1:3])
            for line in rest
            if line.startswith("property ")
        ]
        if m:
            dtype = np.dtype(
                [(name, "<i2" if t == "short" else "<u1") for t, name in props]
            )
            if dtype.itemsize != sum(_SIZES[t] for t, _n in props):
                raise ValueError("unsupported property type in quantized PLY")
            groups.append((int(m.group(1)), int(m.group(2)), dtype))
        elif first.startswith("codebook_centers"):
            cb_props = [name for _t, name in props]
    if len(groups) != 4:
        raise ValueError(f"expected 4 quantized vertex groups, got {len(groups)}")
    return groups, cb_props, data_start


def decode_qply(groups, rows_by_group, cb_raw, cb_props,
                format: str = "", banded: bool = False):
    """Decode structured index rows + codebooks into the scene.

    groups/rows_by_group in file order; decoding emits band-ascending
    groups (the reference's bandsIndices order, PLYLoader.ts:1190-1195)."""
    codebooks = {
        name: cb_raw[:, j].view(np.float16).astype(np.float32)
        for j, name in enumerate(cb_props)
    }
    order = sorted(range(len(groups)), key=lambda i: groups[i][0])
    out = []
    for gi in order:
        bands, count, dtype = groups[gi]
        rows = rows_by_group[gi]
        means = np.stack(
            [rows[c].view(np.float16).astype(np.float32) for c in ("x", "y", "z")],
            axis=-1,
        )
        log_scales = np.stack(
            [codebooks["scaling"][rows[f"scale_{i}"]] for i in range(3)], axis=-1
        )
        quats = np.stack(
            [codebooks["rotation_re"][rows["rot_0"]]]
            + [codebooks["rotation_im"][rows[f"rot_{i}"]] for i in (1, 2, 3)],
            axis=-1,
        )
        opacity = codebooks["opacity"][rows["opacity"]]

        # native per-band SH size: K = 1 + stride (no zero padding —
        # band-0 splats store 12 B of SH, not 192 B)
        stride = _SH_STRIDE[bands]
        sh = np.zeros((count, 1 + stride, 3), np.float32)
        for c in range(3):
            sh[:, 0, c] = codebooks["features_dc"][rows[f"f_dc_{c}"]]
        if stride:
            rest_names = [n for n in dtype.names if n.startswith("f_rest_")]
            # file layout channel-major: f_rest_[c·stride + k] is channel
            # c, coefficient k; codebook features_rest_k is per-coefficient
            for c in range(3):
                for k in range(stride):
                    name = rest_names[c * stride + k]
                    sh[:, 1 + k, c] = codebooks[f"features_rest_{k}"][rows[name]]
        out.append((means, log_scales, quats, sh, opacity))

    from gsjax.core.banded import BandedGaussians
    from gsjax.io.ply import _assemble

    bg = BandedGaussians.from_groups(
        _assemble(
            {
                "means": means,
                "log_scales": log_scales,
                "quats": quats,
                "sh": sh,
                "opacity_logits": opacity,
            },
            format,
        )
        for means, log_scales, quats, sh, opacity in out
        if means.shape[0] > 0
    )
    return bg if banded else bg.to_gaussians()


def parse_qply(buf: bytes, format: str = "", banded: bool = False):
    """Parse a quantized-codebook PLY.

    banded=False (default): one zero-padded Gaussians at the max degree
    PRESENT IN THE FILE (intentional: a file holding only band-0/1 groups
    yields K=4 and sh_degree=1, not the K=16 the r1 loader always padded
    to — the trailing zero bands are inert in eval, and the smaller K is
    the whole point of the banded storage; pad with
    jnp.pad(g.sh, ((0,0),(0,16-K),(0,0))) if a fixed K=16 is required).
    banded=True: a BandedGaussians whose groups keep their NATIVE SH
    size — a band-0 splat stores 1 coefficient, not 16 (≙ the
    reference's bandsIndices partitioning, PLYLoader.ts:1190-1195; eval
    branches per band like vertex.glsl.ts:180-189 via
    core/banded.project_banded)."""
    groups, cb_props, data_start = parse_qheader(buf[: 1024 * 10])
    rows_by_group = []
    offset = data_start
    for _bands, count, dtype in groups:
        rows_by_group.append(np.frombuffer(buf, dtype=dtype, count=count,
                                           offset=offset))
        offset += dtype.itemsize * count
    nb = len(cb_props)
    cb_raw = np.frombuffer(
        buf, dtype="<i2", count=256 * nb, offset=offset
    ).reshape(256, nb)
    return decode_qply(groups, rows_by_group, cb_raw, cb_props, format, banded)

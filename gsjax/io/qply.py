"""Quantized-codebook PLY loader (placeholder — full implementation
tracked for this round; ≙ _ParseQPLYBuffer, /root/reference/src/loaders/
PLYLoader.ts:893-1196)."""

from __future__ import annotations


def parse_qply(buf: bytes, format: str = ""):
    raise NotImplementedError(
        "quantized PLY support is being implemented; see gsjax/io/qply.py"
    )

"""Film / accumulation buffer helpers.

Reference: RenderLayer (/root/reference/src/render-layer.h:11-26) accumulates
rgba + count under per-tile mutexes; in the wavefront design every lane owns
its pixel sample so accumulation is a pure add — no locking concept exists.
This module provides the host-facing resolve (average + sRGB + PNG), the
CLI tail of the reference (pc/pbrlab-cli.cc:49-57).
"""
from __future__ import annotations

import numpy as np

from ..io.image import linear_to_srgb, write_png


def resolve_to_srgb(linear_img: np.ndarray) -> np.ndarray:
    return linear_to_srgb(np.asarray(linear_img, np.float32))


def save_png(path: str, linear_img: np.ndarray) -> None:
    write_png(path, resolve_to_srgb(linear_img))

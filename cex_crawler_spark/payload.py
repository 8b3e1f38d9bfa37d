"""Deterministic payload synthesis — the sandbox stand-in for the network.

``payload_for(image_id)`` is a pure function mapping an image_id to the
exact page body a fetch of that URL yields: encoded image bytes + typed
metadata + caption.  It is the single source of truth used by

- the payload-table generator (synth.gen_payloads, via mapInPandas),
- the fetch simulator (operators/fetch.py, via mapInPandas) — the
  analog of the reference's browser fetch
  (/root/reference/exchange/base_scraper.py:78-143), which in this
  sandbox must be deterministic and network-free,
- the validator (recomputes the reference decode for the PSNR check),
- the single-node replayer oracle.

Because all four call the same function, the per-row invariant
(decoded-pixel PSNR ≥ 40 dB + caption equality, BASELINE input_hint)
is checkable without golden files.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from .functions.hashing import xxh64_str
from .functions.imaging import encode_image, phash64, reference_pixels

# Fixed "now" — mirrors synth.BASE_TIME (no wall-clock in the data path).
BASE_TIME = datetime(2025, 9, 12, 0, 0, 0)

ACTIONS = ["Listing", "Delisting", "上架", "下架", "removal", "上线"]


def _u(tag: str, image_id: str) -> int:
    """Unsigned 64-bit hash of (tag, image_id)."""
    return xxh64_str(f"{tag}|{image_id}") & ((1 << 64) - 1)


def caption_for(image_id: str) -> str:
    action = ACTIONS[_u("cact", image_id) % len(ACTIONS)]
    sym = _u("csym", image_id) % 500
    day = (BASE_TIME - timedelta(days=_u("cday", image_id) % 60)).strftime("%Y-%m-%d")
    batch = _u("cb", image_id) % 100
    return f"{action} of SYM{sym}/USDT scheduled {day} batch {batch}"


def shape_for(image_id: str) -> tuple[int, int, str]:
    w = 16 + _u("w", image_id) % 49
    h = 16 + _u("h", image_id) % 49
    fmt = "png" if _u("fmt", image_id) % 2 == 0 else "jpeg"
    return w, h, fmt


def payload_for(image_id: str) -> dict:
    """Full payload row: image_id, bytes, w, h, fmt, caption, phash."""
    w, h, fmt = shape_for(image_id)
    arr = reference_pixels(image_id, w, h)
    return {
        "image_id": image_id,
        "bytes": encode_image(arr, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(image_id),
        "phash": phash64(arr),
    }


def reference_decode(image_id: str) -> np.ndarray:
    """Ground-truth pixels the validator compares decodes against."""
    w, h, _ = shape_for(image_id)
    return reference_pixels(image_id, w, h)

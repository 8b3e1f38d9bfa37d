"""Payload content-type sniffing — magic-byte format detection.

A crawler cannot trust Content-Type headers or URL extensions (servers
lie, CDNs rewrite); the robust signal is the payload's leading magic
bytes, exactly as browsers do (WHATWG MIME sniffing) and as the
reference's image downloads implicitly assume by extension
(/root/reference mass-downloads icons/images by URL suffix only).

Pure Catalyst: ``hex(substring(bytes, 1, 16))`` prefix tests — the
whole classifier is a codegen CASE over a 32-char string, scan-side,
no UDF, no shuffle, and only the first 16 bytes of a possibly-huge
binary column are ever materialized into the expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (format, hex prefix at offset 0) — longest-prefix-first so JPEG's
# 3-byte magic does not shadow anything longer
_MAGIC = [
    ("png", "89504E470D0A1A0A"),
    ("gif", "47494638"),
    ("jpeg", "FFD8FF"),
    ("bmp", "424D"),
]


def sniff_format(data: Column) -> Column:
    """Detected format of a binary payload: png/gif/jpeg/bmp/webp, or
    'unknown'.  WEBP is RIFF-contained: bytes 0-3 'RIFF', 8-11 'WEBP'
    (the 4 bytes between are the chunk size and may be anything)."""
    head = F.hex(F.substring(data, 1, 16))
    out = F.lit("unknown")
    for fmt, magic in reversed(_MAGIC):
        out = F.when(head.startswith(magic), F.lit(fmt)).otherwise(out)
    webp = (F.substring(head, 1, 8) == "52494646") & (
        F.substring(head, 17, 8) == "57454250"
    )
    return F.when(webp, F.lit("webp")).otherwise(out)

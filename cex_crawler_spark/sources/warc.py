"""WARC (ISO 28500) rendering and parsing — crawl interchange format.

The reference exchanges nothing with other crawl tooling (per-exchange
JSON dumps only — /root/reference/exchange/base_scraper.py); a
web-scale crawler lives in a WARC world: Common Crawl publishes WARC,
replay/index tooling (pywb, CDX) consumes WARC, and a 100 TB crawl
that can't emit/ingest it is an island.  Two halves:

- **render** (`warc_record` + `render_warc_files`): pure Catalyst —
  header block + byte-accurate ``Content-Length`` via
  ``octet_length``, records group-concatenated per file key.  At scale
  one file per (host-bucket, round) keeps blobs bounded and the write
  embarrassingly parallel.
- **parse** (`parse_warc`): a Content-Length-HONORING sequential
  record scanner.  This is deliberately NOT a regex split: a payload
  may legally contain ``\\r\\n\\r\\nWARC/1.0`` (an archived robots
  page quoting a WARC, a crawl of Common Crawl docs …), and only
  walking ``Content-Length`` bytes at a time parses such archives
  correctly.  The scan is sequential WITHIN a file but independent
  ACROSS files, so it runs as vectorized-batch ``mapInPandas``
  (Arrow in/out, byte-level slicing on the encoded blob) — the
  documented slow-path escape hatch for semantics Catalyst can't
  express, parallel over files exactly like the image decoders
  (operators/multimodal.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = "\r\n"


def warc_record(
    uri: Column,
    date: Column,
    payload: Column,
    warc_type: str = "response",
) -> Column:
    """One WARC record as a string column.

    ``Content-Length`` is the BYTE length of the payload
    (``octet_length`` — multi-byte UTF-8 payloads must count bytes or
    every downstream reader mis-frames the archive).  The record id is
    deterministic (md5 of uri+date) so re-renders are bit-identical —
    the repo-wide determinism rule (SURVEY §2.10)."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit(f"WARC-Type: {warc_type}" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(uri, F.lit("|"), date)),
        F.lit(">" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def render_warc_files(
    records: DataFrame,
    file_col: str = "file_id",
    uri_col: str = "uri",
    date_col: str = "date",
    payload_col: str = "payload",
    warc_type: str = "response",
) -> DataFrame:
    """(file_id, warc) — records rendered and concatenated per file in
    (uri, date) order.  Deterministic: array_sort of (key, record)
    structs, not collect order.  One shuffle on the file key; file
    granularity is the caller's partitioning lever (host-bucket ×
    round at crawl scale)."""
    rec = warc_record(
        F.col(uri_col), F.col(date_col), F.col(payload_col), warc_type
    )
    return (
        records.select(
            F.col(file_col).alias("file_id"),
            F.struct(
                F.col(uri_col).alias("u"),
                F.col(date_col).alias("d"),
                rec.alias("rec"),
            ).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["rec"]
                ),
                "",
            ).alias("warc")
        )
    )


def warc_revisit_record(
    uri: Column, date: Column, ref_uri: Column, ref_date: Column,
    digest: Column,
) -> Column:
    """A WARC ``revisit`` record (ISO 28500 §6.7.2 shape): the payload
    was byte-identical to an earlier capture, so the archive stores
    only a pointer — ``WARC-Refers-To-Target-URI``/``-Date`` plus the
    shared payload digest, ``Content-Length: 0``.  At recrawl scale
    this is the mechanism that keeps a 100 TB archive from storing the
    unchanged 90 % of the web again every round."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: revisit" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("WARC-Date: "), date, F.lit(CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(uri, F.lit("|"), date)),
        F.lit(">" + CRLF),
        F.lit("WARC-Refers-To-Target-URI: "), ref_uri, F.lit(CRLF),
        F.lit("WARC-Refers-To-Date: "), ref_date, F.lit(CRLF),
        F.lit("WARC-Payload-Digest: md5:"), digest, F.lit(CRLF),
        F.lit("Content-Length: 0" + CRLF + CRLF + CRLF + CRLF),
    )


def render_warc_files_deduped(
    records: DataFrame,
    file_col: str = "file_id",
    uri_col: str = "uri",
    date_col: str = "date",
    payload_col: str = "payload",
) -> DataFrame:
    """(file_id, warc) like :func:`render_warc_files`, but each
    distinct payload digest stores its bytes ONCE: the canonical first
    capture (min (uri, date) — deterministic, not arrival order)
    renders as a full ``response`` record, every other capture as a
    :func:`warc_revisit_record` pointing at it.

    Scale shape = `dedup_exact`'s: one map-combinable min-struct
    aggregate on the 16-byte digest (never a window over the corpus),
    one join back, then the per-file group-concat — two shuffles
    total, both on narrow keys."""
    digest = F.md5(F.col(payload_col))
    tagged = records.withColumn("__digest", digest)
    firsts = tagged.groupBy("__digest").agg(
        F.min(
            F.struct(
                F.col(uri_col).alias("u"), F.col(date_col).alias("d")
            )
        ).alias("__first")
    )
    j = tagged.join(firsts, "__digest")
    is_first = (F.col(uri_col) == F.col("__first.u")) & (
        F.col(date_col) == F.col("__first.d")
    )
    rec = F.when(
        is_first,
        warc_record(F.col(uri_col), F.col(date_col), F.col(payload_col)),
    ).otherwise(
        warc_revisit_record(
            F.col(uri_col), F.col(date_col),
            F.col("__first.u"), F.col("__first.d"), F.col("__digest"),
        )
    )
    return (
        j.select(
            F.col(file_col).alias("file_id"),
            F.struct(
                F.col(uri_col).alias("u"),
                F.col(date_col).alias("d"),
                rec.alias("rec"),
            ).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["rec"]
                ),
                "",
            ).alias("warc")
        )
    )


def render_wet_files(
    records: DataFrame, file_col: str = "file_id"
) -> DataFrame:
    """WET sidecar render — the Common Crawl companion format: each
    ``response`` record's HTML payload is reduced to visible text
    (functions/text.html_to_text — the same pure-regex chain the text
    pipeline uses) and re-framed as a WARC ``conversion`` record with
    its own byte-accurate ``Content-Length``, grouped back into one
    blob per file key.

    This is what connects the crawl archive to the training-data
    pipeline at scale: downstream curation (dedup, quality, packing)
    reads WET text, never the 10× larger raw HTML.  Everything is
    Catalyst (the text extraction is regexp expressions, the framing is
    :func:`warc_record`); non-``response`` records (revisits, requests)
    carry no convertible payload and are dropped, per the WET
    convention."""
    from ..functions.text import html_to_text

    src = records.filter(F.col("warc_type") == "response").select(
        F.col(file_col).alias("file_id"),
        F.col("target_uri").alias("uri"),
        F.col("warc_date").alias("date"),
        html_to_text(F.col("payload")).alias("payload"),
    )
    return render_warc_files(src, warc_type="conversion")


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("rec_offset", T.LongType()),
        T.StructField("rec_length", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("refers_to", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)

_MAGIC = b"WARC/1.0\r\n"
_HDR_END = b"\r\n\r\n"


def _scan_warc(file_id: int, blob: bytes):
    """Yield one dict per record.  Strict: a malformed archive raises
    with the byte offset — a silently-skipped record is a lost page."""
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(_MAGIC, pos):
            raise ValueError(
                f"WARC file {file_id}: no record magic at byte {pos}"
            )
        hdr_end = blob.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(
                f"WARC file {file_id}: unterminated header at byte {pos}"
            )
        headers = {}
        for line in blob[pos + len(_MAGIC): hdr_end].split(b"\r\n"):
            name, _, value = line.partition(b":")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"WARC file {file_id}: bad Content-Length at byte {pos}"
            )
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        if blob[body_end: body_end + 4] != _HDR_END:
            raise ValueError(
                f"WARC file {file_id}: record at byte {pos} not "
                f"terminated after {clen} payload bytes"
            )
        yield {
            "file_id": file_id,
            "rec_offset": pos,
            "rec_length": body_end + 4 - pos,
            "warc_type": headers.get(b"warc-type", b"").decode(),
            "target_uri": headers.get(b"warc-target-uri", b"").decode(),
            "warc_date": headers.get(b"warc-date", b"").decode(),
            "refers_to": (
                headers[b"warc-refers-to-target-uri"].decode()
                if b"warc-refers-to-target-uri" in headers
                else None
            ),
            "content_length": clen,
            "payload": blob[body_start:body_end].decode("utf-8"),
        }
        pos = body_end + 4


def parse_warc(
    files: DataFrame, file_col: str = "file_id", warc_col: str = "warc"
) -> DataFrame:
    """Explode WARC blobs into one row per record (WARC_RECORD_SCHEMA).

    Content-Length framing, not delimiter splitting — payloads
    containing record-boundary byte sequences parse correctly (tested
    with planted ``\\r\\n\\r\\nWARC/1.0`` sentinels).  Offsets and
    lengths are byte-accurate against the UTF-8 encoding, matching the
    render side's ``octet_length``."""
    src = files.select(
        F.col(file_col).cast("long").alias("file_id"),
        F.col(warc_col).alias("warc"),
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in it:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["warc"]):
                rows.extend(_scan_warc(int(fid), blob.encode("utf-8")))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, schema=WARC_RECORD_SCHEMA)


def render_warc_gz_files(
    records: DataFrame,
    file_col: str = "file_id",
    uri_col: str = "uri",
    date_col: str = "date",
    payload_col: str = "payload",
) -> DataFrame:
    """(file_id, warc_gz:binary) — records as PER-RECORD gzip members
    concatenated, the ``.warc.gz`` layout the archive world actually
    ships (Common Crawl, IA): member-at-a-time compression is what
    lets a CDX pointer fetch ONE record with a ranged read + single
    inflate, instead of decompressing the file prefix.  Record text
    renders in Catalyst (same bytes as :func:`render_warc_files`);
    only the gzip framing runs in Python (``applyInPandas`` per file
    group — compression is inherently opaque to Catalyst).
    Deterministic: mtime=0, fixed level, (uri, date) member order."""
    import gzip

    rec = warc_record(
        F.col(uri_col), F.col(date_col), F.col(payload_col)
    )
    src = records.select(
        F.col(file_col).alias("file_id"),
        F.col(uri_col).alias("u"),
        F.col(date_col).alias("d"),
        rec.alias("rec"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["u", "d"])
        blob = b"".join(
            gzip.compress(r.encode("utf-8"), compresslevel=6, mtime=0)
            for r in pdf["rec"]
        )
        return pd.DataFrame(
            {"file_id": [pdf["file_id"].iloc[0]], "warc_gz": [blob]}
        )

    return src.groupBy("file_id").applyInPandas(
        pack, schema="file_id long, warc_gz binary"
    )


def parse_warc_gz(
    files: DataFrame, file_col: str = "file_id", warc_col: str = "warc_gz"
) -> DataFrame:
    """Explode ``.warc.gz`` blobs (one gzip member per record) into
    WARC_RECORD_SCHEMA rows.  ``rec_offset``/``rec_length`` are the
    COMPRESSED member's byte position and size — exactly what a CDX
    pointer into a ``.warc.gz`` archive means, so
    ``inflate(blob[off:off+len])`` yields the record.  Member
    boundaries come from zlib's own end-of-stream accounting
    (``unused_data``), never from scanning for magic bytes — gzip
    payload bytes may legally contain the member header pattern."""
    import zlib

    src = files.select(
        F.col(file_col).cast("long").alias("file_id"),
        F.col(warc_col).alias("warc_gz"),
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in it:
            rows = []
            for fid, blob in zip(pdf["file_id"], pdf["warc_gz"]):
                blob = bytes(blob)
                pos = 0
                while pos < len(blob):
                    z = zlib.decompressobj(wbits=31)
                    try:
                        member = z.decompress(blob[pos:])
                    except zlib.error as exc:
                        raise ValueError(
                            f"warc.gz file {fid}: bad gzip member at "
                            f"byte {pos}: {exc}"
                        )
                    if not z.eof:
                        raise ValueError(
                            f"warc.gz file {fid}: truncated member at "
                            f"byte {pos}"
                        )
                    member_len = len(blob) - pos - len(z.unused_data)
                    (record,) = _scan_warc(int(fid), member)
                    record["rec_offset"] = pos
                    record["rec_length"] = member_len
                    rows.append(record)
                    pos += member_len
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, schema=WARC_RECORD_SCHEMA)


def surt_urlkey(uri: Column) -> Column:
    """SURT-style canonical url key: reversed comma-joined host labels,
    ``)``, then the path — ``http://news.site.com/a/b`` →
    ``com,site,news)/a/b``.  The reversal puts a registrable domain's
    whole subtree into one contiguous sort range, which is what makes
    a flat sorted CDX file answerable with binary search at archive
    scale.  Pure Catalyst (split / reverse / join)."""
    host = F.regexp_extract(uri, r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(uri, r"^[a-z]+://[^/]*(/.*)$", 1)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )


def cdx_index(records: DataFrame) -> DataFrame:
    """CDX-style lookup index over :func:`parse_warc` output — one row
    per record: (urlkey, cdx_ts, original, digest, file_id,
    rec_offset, rec_length).  The (urlkey, timestamp) sort plus
    byte-exact (file, offset, length) pointers are what replay/lookup
    tooling (pywb, OpenWayback CDX servers) binary-search over; digest
    enables revisit-dedup across crawls.  Projection-only over the
    parse — no extra shuffle; sort order is left to the writer
    (`orderBy(urlkey, cdx_ts)` before a ranged write at scale)."""
    return records.select(
        surt_urlkey(F.col("target_uri")).alias("urlkey"),
        F.regexp_replace(F.col("warc_date"), "[^0-9]", "").alias("cdx_ts"),
        F.col("target_uri").alias("original"),
        F.md5("payload").alias("digest"),
        "file_id",
        "rec_offset",
        "rec_length",
    )

"""S14: frame-stream (MJPEG-style) sink.

The reference encodes the current frame per camera and yields it as a
``multipart/x-mixed-replace`` HTTP body (reference
``app/services/camera.py:351-379`` — JPEG parts separated by a
``--frame`` boundary). The engine-side twin keeps the exact container
semantics — boundary-delimited parts, one content-typed payload per
frame, emitted in frame order — and since round 3 can serve REAL
baseline JPEG parts via the from-spec pure-numpy codec
(``functions/jpeg.py``), exactly like the reference; PGM/RAWV remain
as the lossless options.

An MJPEG response is BY DEFINITION one ordered byte stream per viewer,
so the sink is a single-writer: frames are streamed from the cluster
via ``toLocalIterator`` (one partition in memory at a time, never a
``collect``) and appended to the output file/socket in order. That is
the correct shape at any scale — the fan-in to one HTTP response is
the presentation boundary; everything upstream (decode, frame
sampling) stays distributed. The HTTP server itself remains out of
scope (presentation layer), documented in COVERAGE.md.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

BOUNDARY = b"--frame"
_PART_HEADER = b"Content-Type: %s\r\nContent-Length: %d\r\n\r\n"


def write_frame_stream(
    frames: DataFrame, path: str, mime: str = "image/x-portable-graymap"
) -> int:
    """Append every frame (ordered by media_id, frame_idx) to ``path``
    as a multipart stream; returns the number of parts written.

    ``frames`` must carry ``media_id``, ``frame_idx`` and a binary
    ``frame_payload`` column. Ordering happens cluster-side (the sort
    is distributed); the driver only concatenates."""
    it = (
        frames.select("media_id", "frame_idx", "frame_payload")
        .orderBy("media_id", "frame_idx")
        .toLocalIterator()
    )
    n = 0
    ctype = mime.encode()
    with open(path, "wb") as out:
        for row in it:
            payload = bytes(row.frame_payload)
            out.write(BOUNDARY + b"\r\n")
            out.write(_PART_HEADER % (ctype, len(payload)))
            out.write(payload)
            out.write(b"\r\n")
            n += 1
        out.write(BOUNDARY + b"--\r\n")
    return n


_PART_RE = re.compile(
    rb"--frame\r\nContent-Type: ([^\r]+)\r\nContent-Length: (\d+)\r\n\r\n",
)


def read_frame_stream(path: str) -> list[bytes]:
    """Parse a multipart frame stream back into payload bytes (test /
    consumer-side twin; a browser does the same parse)."""
    blob = open(path, "rb").read()
    parts: list[bytes] = []
    pos = 0
    while True:
        m = _PART_RE.search(blob, pos)
        if not m:
            break
        length = int(m.group(2))
        start = m.end()
        parts.append(blob[start : start + length])
        pos = start + length
    return parts

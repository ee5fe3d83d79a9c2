"""Minimal MJPEG-in-AVI container codec, stdlib-only.

Motion JPEG is the one video format where REAL frame extraction is
feasible without a native codec: the container is a RIFF chunk walk and
every frame is a complete baseline JPEG — which `operators.jpegcodec`
already decodes to genuine pixels.  Together they close the last stub in
the multimodal tier: video frame sampling can hand content stages real
pixel buffers, not fabricated geometry.

Scope mirrors the other pure-Python codecs (png/gif/wav in
operators.multimodal, jpeg in operators.jpegcodec): a spec-valid writer
for exactly the subset the reader covers, an errors-as-data reader
(malformed input returns None, never raises — the reference's contract,
file_ingestion.py:61-63), and exact roundtrip pins in tests.  H.264/VP9
and friends honestly stay behind an import-gated native tier.

Reference anchor: the reference has no media handling at all; this is
north-star scope (multimodal columns for a training-data pipeline), like
the rest of operators/multimodal.py.
"""

from __future__ import annotations

import struct

#: fixed frame cadence for synthesized fixtures (microseconds per frame)
_US_PER_FRAME = 100_000  # 10 fps


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int) -> bytes:
    """Wrap pre-encoded JPEG frames as a complete, spec-valid AVI:
    RIFF('AVI ') with a full hdrl (avih + one 'vids'/'MJPG' stream) and
    a movi list of word-aligned '00dc' chunks.  No idx1 — optional per
    spec, and the reader below (like ffmpeg) walks movi directly."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(frames)
    max_frame = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        _US_PER_FRAME,          # dwMicroSecPerFrame
        max_frame * 10,         # dwMaxBytesPerSec (loose)
        0,                      # dwPaddingGranularity
        0,                      # dwFlags (no idx1 written, so no AVIF_HASINDEX)
        n,                      # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_frame,              # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,             # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII",
                      0, 0, 0, 0,       # dwFlags, wPriority, wLanguage, dwInitialFrames
                      1, 10,            # dwScale/dwRate = 10 fps
                      0, n,             # dwStart, dwLength (frames)
                      max_frame, 0xFFFFFFFF, 0)  # buf, quality, sampleSize
        + struct.pack("<HHHH", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(payload: bytes) -> list[bytes] | None:
    """RIFF walk -> the list of per-frame JPEG payloads ('00dc'/'00db'
    chunks of stream 0, in stream order), or None for non-AVI / corrupt
    input (errors-as-data; caller falls through to the next tier).
    Frames are returned as container bytes — pixel decode is the
    caller's choice of jpegcodec tier, so a frame COUNT never pays for
    pixels it doesn't need."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []
    try:
        pos, n = 12, len(payload)
        while pos + 8 <= n:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            if pos + 8 + size > n:
                return None  # truncated chunk
            if fourcc == b"LIST" and size >= 4:
                list_type = payload[pos + 8:pos + 12]
                if list_type == b"movi":
                    q = pos + 12
                    end = pos + 8 + size
                    while q + 8 <= end:
                        cc = payload[q:q + 4]
                        (csz,) = struct.unpack("<I", payload[q + 4:q + 8])
                        if q + 8 + csz > end:
                            return None
                        if cc in (b"00dc", b"00db"):
                            frames.append(payload[q + 8:q + 8 + csz])
                        q += 8 + csz + (csz & 1)
            pos += 8 + size + (size & 1)
    except (struct.error, IndexError):
        return None
    return frames if frames else None


def decode_avi_header(payload: bytes) -> dict | None:
    """Header-tier triage for AVI (the video sibling of the WAV/MP4
    walks in operators.multimodal): width/height/frame count/duration
    from the avih main header alone — first bytes only, no frame
    touched.  Returns ``{fmt, width, height, n_frames, duration_ms}``
    or None."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    try:
        pos, n = 12, len(payload)
        while pos + 8 <= n:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            if fourcc == b"LIST" and size >= 4:
                if payload[pos + 8:pos + 12] == b"hdrl":
                    q = pos + 12
                    end = min(pos + 8 + size, n)
                    while q + 8 <= end:
                        cc = payload[q:q + 4]
                        (csz,) = struct.unpack("<I", payload[q + 4:q + 8])
                        if cc == b"avih" and csz >= 40 and q + 8 + csz <= end:
                            vals = struct.unpack("<10I", payload[q + 8:q + 48])
                            us_pf, total, w, h = vals[0], vals[4], vals[8], vals[9]
                            return {
                                "fmt": "avi",
                                "width": int(w),
                                "height": int(h),
                                "n_frames": int(total),
                                "duration_ms": int(us_pf) * int(total) // 1000,
                            }
                        q += 8 + csz + (csz & 1)
            pos += 8 + size + (size & 1)
    except (struct.error, IndexError):
        return None
    return None

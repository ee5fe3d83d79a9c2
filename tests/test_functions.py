"""Scalar-function unit tests (SURVEY §5.2 item 2): Spark column
expressions vs CPython hashlib/urllib ground truth, including the
non-ASCII (Turkish) cases the reference is explicitly aware of
(crawler_core.py:44,49)."""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from data_integration_system_spark.functions.hashing import (
    content_hash,
    normalize_ws,
    url_hash,
)
from data_integration_system_spark.functions.urls import (
    domain_of,
    ext_of,
    is_blocked_ext,
    path_of,
)
from data_integration_system_spark.pipeline.extract import normalize_ws_py

TEXTS = [
    "hello world",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\r\nand  doubles",
    "merhaba dünya çğışöü",  # Turkish — non-ASCII utf-8
    "",
    "a",
]

URLS = [
    "https://www.Example.COM/path/page.html?q=1#frag",
    "http://sub.site.org/a/b/doc.PDF?download=true",
    "https://ex.com/",
    "https://ex.com/assets/app.min.js",
    "https://ex.com/img/logo.PNG",
    "https://ex.com/paper.pdf",
]


def _col_vals(spark, data, col):
    df = spark.createDataFrame([(d,) for d in data], "v string")
    return [r.out for r in df.select(col(F.col("v")).alias("out")).collect()]


def test_content_hash_matches_hashlib(spark):
    got = _col_vals(spark, TEXTS, content_hash)
    want = [hashlib.sha256(normalize_ws_py(t).encode()).hexdigest() for t in TEXTS]
    assert got == want  # utils.py:15-20 ported exactly, incl. UTF-8 bytes


def test_url_hash_matches_hashlib(spark):
    got = _col_vals(spark, URLS, url_hash)
    want = [hashlib.sha1(u.encode()).hexdigest() for u in URLS]
    assert got == want  # utils.py:11-12


def test_normalize_ws_matches_python_twin(spark):
    got = _col_vals(spark, TEXTS, normalize_ws)
    assert got == [normalize_ws_py(t) for t in TEXTS]


def test_domain_of_matches_urlparse(spark):
    got = _col_vals(spark, URLS, domain_of)
    want = [
        urlparse(u).netloc.lower().removeprefix("www.") for u in URLS
    ]  # utils.py:6-8 (leading-www variant per SURVEY §2A P1/P10)
    assert got == want


def test_path_of_matches_urlparse(spark):
    got = _col_vals(spark, URLS, path_of)
    assert got == [urlparse(u).path for u in URLS]


@pytest.mark.parametrize(
    ("url", "ext"),
    [
        ("https://ex.com/a/b/doc.PDF?download=true", ".pdf"),
        ("https://ex.com/x.tar.gz", ".gz"),
        ("https://ex.com/noext", ""),
        ("https://ex.com/q.html#frag", ".html"),
    ],
)
def test_ext_of(spark, url, ext):
    assert _col_vals(spark, [url], ext_of) == [ext]  # crawler_core.py:27-30


def test_blocklist(spark):
    got = _col_vals(spark, URLS, is_blocked_ext)
    want = [u.lower().split("?")[0].split("#")[0].endswith((".js", ".png")) for u in URLS]
    assert got == want  # crawler_core.py:15-24 family


def test_dedup_idempotence_property(spark):
    """f(f(x)) == f(x) for exact dedup (SURVEY §5.2 item 4)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 3)], "k string, v int"
    )
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert sorted((r.k) for r in once.collect()) == sorted(r.k for r in twice.collect())
    assert once.count() == 2


def test_union_of_partition_equals_input(spark):
    """A3 property: the two predicate-split halves recombine to the input
    exactly (crawler_core.py:182-193)."""
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    lo = df.filter(F.col("v") < 50)
    hi = df.filter(F.col("v") >= 50)
    assert lo.unionByName(hi).count() == 100
    assert lo.unionByName(hi).exceptAll(df).count() == 0


def test_spark_sql_surface_matches_dataframe(spark):
    """The engine's tables register as temp views (catalog.load_all), so
    the whole inventory is reachable from spark.sql too — flagship
    rewritten as SQL text must equal the DataFrame plan's result."""
    from data_integration_system_spark.catalog import load_all
    from data_integration_system_spark.registry import get_queries

    sf = "/root/testdata/sf0.001"
    load_all(spark, sf)
    sql_df = spark.sql("""
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """)
    df = get_queries()["multiway_star_join"](spark, sf)
    assert [tuple(r) for r in sql_df.collect()] == [tuple(r) for r in df.collect()]


def test_minhash_recall_against_exact(spark):
    """Quality guard for the LSH parameters (32 hashes, 8 bands x 4 rows):
    every true pair at exact Jaccard >= 0.8 must be recovered with >= 90%
    recall (theoretical: 1-(1-0.8^4)^8 ~ 0.985). Brute-force ground truth
    over the sf0.001 shingle sets — a drop means bands/rows or the
    bucket cap silently degraded."""
    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators.dedup import (
        dedup_minhash_near,
        shingle_sets,
    )

    sf = "/root/testdata/sf0.001"
    sh = {
        r.doc_id: set(r.shingles)
        for r in shingle_sets(table(spark, sf, "documents")).collect()
    }
    ids = sorted(sh)
    true_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= 0.8:
                true_pairs.add((a, b))
    assert true_pairs, "ground truth is vacuous — corpus has no 0.8+ pairs"
    found = {(r.doc_a, r.doc_b) for r in dedup_minhash_near(spark, sf).collect()}
    missed = true_pairs - found
    assert len(missed) <= 0.1 * len(true_pairs), f"minhash recall regressed: missed {missed}"


def test_lsh_hot_bucket_cap(spark):
    """The hot-bucket defense: a 200-doc boilerplate bucket must be
    dropped before the self-join (bounded candidates), while a small
    legitimate near-dup bucket survives."""
    from data_integration_system_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(i, boiler) for i in range(200)]
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (1001, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands = minhash_bands(docs)
    capped = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(bands, max_bucket=100).collect()}
    assert (1000, 1001) in capped  # small bucket: kept
    assert all(not (a < 200 and b < 200) for a, b in capped)  # hot bucket: dropped
    # uncapped would be quadratic in the hot bucket
    assert lsh_candidate_pairs(bands, max_bucket=None).count() >= 199 * 200 / 2


def test_ivf_recall_against_exact(spark):
    """Quality guard for the IVF approximate path: recall@5 vs the exact
    brute-force top-k. The synthetic embeddings are weakly clustered
    (max pairwise cosine ~0.44), so nprobe=3 of 10 centroids recovering
    half the true neighbors is the honest operating point — a drop below
    0.5 means the k-means fit, centroid assignment, or probe selection
    regressed (label-mean init alone gave 0.475; Lloyd rounds buy the
    rest)."""
    from data_integration_system_spark.registry import get_queries

    sf = "/root/testdata/sf0.001"
    qs = get_queries()
    exact = {(r.q_id, r.c_id) for r in qs["similarity_topk"](spark, sf).collect()}
    ivf = {(r.q_id, r.c_id) for r in qs["similarity_ivf_topk"](spark, sf).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 regressed: {recall:.2f}"


def test_multimodal_decode_gate_stub_fallback():
    """Non-container payloads (no image magic) -> the deterministic stub,
    and batch outputs are the stub's pure functions of the bytes — the
    contract the DuckDB oracles recompute."""
    import pandas as pd

    from data_integration_system_spark.operators import multimodal as mm

    assert mm._resolve_decode()(b"abcd") == mm._fake_decode(b"abcd")
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"abcd"]})
    out = next(mm.decode_batches(iter([pdf])))
    assert (out.width[0], out.height[0], out.fmt[0]) == (5, 5, "png")


def _make_png(w: int, h: int, color_type: int = 2, bit_depth: int = 8) -> bytes:
    """A GENUINE, fully-valid PNG file (signature + IHDR + zlib IDAT +
    IEND, correct CRCs) built with the stdlib only."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + bytes(w * nch) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg(w: int, h: int, progressive: bool = False, channels: int = 3) -> bytes:
    """A real JPEG marker stream: SOI + APP0(JFIF) + SOF0/SOF2 + EOI."""
    import struct

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    comps = b"".join(struct.pack("BBB", i + 1, 0x11, 0) for i in range(channels))
    payload = struct.pack(">BHHB", 8, h, w, channels) + comps
    sof = bytes([0xFF, 0xC2 if progressive else 0xC0])
    sof += struct.pack(">H", 2 + len(payload)) + payload
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_decode_image_header_real_bytes():
    """The pure-Python header parser extracts REAL dimensions/channels/
    bit depth from real container bytes (VERDICT r5 next-round #5) —
    no codec library involved."""
    from data_integration_system_spark.operators import multimodal as mm

    png = mm.decode_image_header(_make_png(640, 360, color_type=2))
    assert png == {"width": 640, "height": 360, "fmt": "png",
                   "bit_depth": 8, "channels": 3}
    rgba = mm.decode_image_header(_make_png(33, 7, color_type=6, bit_depth=16))
    assert (rgba["channels"], rgba["bit_depth"]) == (4, 16)

    base = mm.decode_image_header(_make_jpeg(1920, 1080))
    assert base == {"width": 1920, "height": 1080, "fmt": "jpeg",
                    "bit_depth": 8, "channels": 3}
    prog = mm.decode_image_header(_make_jpeg(255, 128, progressive=True, channels=1))
    assert (prog["width"], prog["height"], prog["channels"]) == (255, 128, 1)

    import struct

    gif = mm.decode_image_header(b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00\x00\x00")
    assert (gif["width"], gif["height"], gif["fmt"]) == (12, 34, "gif")

    # non-containers and truncated containers fall through to None
    assert mm.decode_image_header(b"plain text payload") is None
    assert mm.decode_image_header(_make_png(640, 360)[:20]) is None
    assert mm.decode_image_header(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF


def test_decode_batches_real_container_bytes():
    """decode_batches (the mapInPandas worker) must return REAL header
    dimensions for genuine container payloads and stub values for text
    payloads — in the same Arrow batch."""
    import pandas as pd

    from data_integration_system_spark.operators import multimodal as mm

    png, jpg, txt = _make_png(800, 600), _make_jpeg(64, 48), b"hello doc"
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [png, jpg, txt]})
    out = next(mm.decode_batches(iter([pdf])))
    got = {r.doc_id: (r.width, r.height, r.fmt) for r in out.itertuples()}
    assert got[1] == (800, 600, "png")
    assert got[2] == (64, 48, "jpeg")
    assert got[3] == mm._fake_decode(txt)
    # the resize stage sees the same real dims
    rs = next(mm.resize_batches(iter([pdf.iloc[:1]])))
    assert (rs.width[0], rs.height[0], rs.new_width[0], rs.new_height[0]) == (
        800, 600, 256, 192,
    )


def _make_wav(channels: int = 2, rate: int = 16000, n_frames: int = 1600) -> bytes:
    """A GENUINE WAV file written by the stdlib encoder."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def _make_wav_samples(samples: list[int], channels: int = 1, rate: int = 8000) -> bytes:
    """A GENUINE 16-bit PCM WAV carrying the given interleaved samples,
    written by the stdlib encoder."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_decode_wav_samples_exact_roundtrip():
    """The PCM sample decoder recovers the EXACT samples the stdlib
    encoder wrote — the audio twin of the PNG pixel roundtrip: real
    content decode, zero dependencies."""
    import struct

    from data_integration_system_spark.operators import multimodal as mm

    want = [0, 1000, -1000, 32767, -32768, 7, -7, 0]
    got = mm.decode_wav_samples(_make_wav_samples(want, channels=2, rate=44100))
    assert got == (2, 44100, want)

    # 8-bit unsigned recentres to signed
    hdr = b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = b"data" + struct.pack("<I", 4) + bytes([0, 128, 255, 64])
    got8 = mm.decode_wav_samples(hdr + fmt + data)
    assert got8 == (1, 8000, [-128, 0, 127, -64])

    # non-WAV and truncated payloads fall through, never raise
    assert mm.decode_wav_samples(b"not audio") is None
    assert mm.decode_wav_samples(_make_wav_samples(want)[:20]) is None

    # non-PCM codecs must NOT be misread as linear PCM: a mu-law stream
    # (fmt tag 7, bits=8) carries codewords, not samples — decoding it
    # as PCM would silently corrupt every downstream feature
    mulaw_fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 7, 1, 8000, 8000, 1, 8
    )
    assert mm.decode_wav_samples(hdr + mulaw_fmt + data) is None
    # ...while its HEADER metadata still parses (triage tier unaffected)
    assert mm.decode_audio_header(hdr + mulaw_fmt + data)["sample_rate"] == 8000


def _make_avi(n_frames: int = 3, w: int = 8, h: int = 8) -> bytes:
    """A GENUINE MJPEG AVI: each frame a flat-gray baseline JPEG at
    level (37*i)%256, wrapped by the spec-valid RIFF writer."""
    from data_integration_system_spark.operators.avicontainer import (
        encode_avi_mjpeg,
    )
    from data_integration_system_spark.operators.jpegcodec import encode_jpeg

    frames = [
        encode_jpeg(bytes([(37 * i) % 256]) * (w * h), w, h, 1, quant=1)
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, w, h)


def test_avi_mjpeg_roundtrip_real_frames():
    """The MJPEG AVI container codec (r7 — the last multimodal stub
    closed): the RIFF walk returns the exact per-frame JPEG bytes the
    writer wrapped, the avih header tier reports real geometry/count
    without touching a frame, decode_video_header dispatches AVI, each
    extracted frame pixel-decodes to its exact flat level through the
    full JPEG codec, and malformed input returns None (errors-as-data)."""
    from data_integration_system_spark.operators import avicontainer as av
    from data_integration_system_spark.operators import multimodal as mm
    from data_integration_system_spark.operators.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    frames = [
        encode_jpeg(bytes([(37 * i) % 256]) * 64, 8, 8, 1, quant=1)
        for i in range(4)
    ]
    avi = av.encode_avi_mjpeg(frames, 8, 8)
    assert av.decode_avi_frames(avi) == frames  # container walk is bit-exact
    hdr = av.decode_avi_header(avi)
    assert hdr == {"fmt": "avi", "width": 8, "height": 8,
                   "n_frames": 4, "duration_ms": 400}
    # the triage tier dispatches RIFF/AVI to the avih walk
    assert mm.decode_video_header(avi) == hdr
    # every extracted frame decodes to genuine uniform pixels
    for i, f in enumerate(av.decode_avi_frames(avi)):
        w, h, ch, buf = decode_jpeg_pixels(f)
        assert (w, h, ch) == (8, 8, 1)
        assert set(buf) == {(37 * i) % 256}
    # malformed input: None, never raise
    assert av.decode_avi_frames(b"RIFFxxxxWAVEfmt ") is None  # WAV, not AVI
    assert av.decode_avi_frames(avi[:50]) is None  # truncated mid-chunk
    assert av.decode_avi_header(b"not a container") is None
    # the frame sampler's REAL tier: an AVI payload reports the avih
    # frame count, not the size-derived stub count
    import pandas as pd

    out = pd.concat(
        mm.frame_sample_batches(
            iter([pd.DataFrame({"doc_id": [1], "payload": [avi]})])
        )
    )
    assert set(out["n_frames"]) == {4}
    assert list(out["frame_idx"]) == [0, 1, 2, 3]


def _encode_gif(indices: bytes, w: int, h: int, interlaced: bool = False) -> bytes:
    """A GENUINE GIF89a stream carrying the given 8-bit color indices
    over a grayscale palette (palette[i] = (i,i,i)), LZW-coded with the
    classic uncompressed trick: literal codes at 9 bits with a CLEAR
    every 250 symbols so the code width never grows.  Spec-valid and
    decodable by any GIF reader."""
    import struct

    clear, end = 256, 257
    codes = [clear]
    count = 0
    for i in indices:
        codes.append(i)
        count += 1
        if count == 250:
            codes.append(clear)
            count = 0
    codes.append(end)
    buf = nbits = 0
    packed = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        packed.append(buf & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlaced else 0])
    out += bytes([8])  # LZW min code size
    for i in range(0, len(packed), 255):
        block = packed[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def test_jpeg_codec_bounded_error_roundtrip():
    """The pure-Python baseline JPEG codec: encode -> decode recovers
    the pixels within the DCT-rounding bound (JPEG is lossy by design,
    so the pin is bounded error, unlike the byte-exact PNG/GIF/WAV
    pins).  Covers gray + RGB, non-multiple-of-8 dims, and a coarser
    quantization step."""
    from data_integration_system_spark.operators.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from data_integration_system_spark.operators import multimodal as mm

    for w, h in [(8, 8), (19, 11), (33, 5), (1, 1)]:
        pix = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
        got = decode_jpeg_pixels(encode_jpeg(pix, w, h, 1, quant=1))
        assert got is not None and got[:3] == (w, h, 1)
        assert max(abs(a - b) for a, b in zip(pix, got[3])) <= 3

    w, h = 21, 14
    pix3 = bytes((x * 11 + y * 3 + c * 77) % 256
                 for y in range(h) for x in range(w) for c in range(3))
    got3 = decode_jpeg_pixels(encode_jpeg(pix3, w, h, 3, quant=1))
    assert got3 is not None and got3[:3] == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(pix3, got3[3])) <= 4

    # coarser quant: still decodes at the right geometry, error bounded
    # by quant-step spillover on this smooth gradient
    smooth = bytes(min(255, x * 4 + y) for y in range(h) for x in range(w))
    gq = decode_jpeg_pixels(encode_jpeg(smooth, w, h, 1, quant=8))
    assert gq is not None and gq[:3] == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(smooth, gq[3])) <= 16

    # the header parser agrees with the full decoder on geometry
    jp = encode_jpeg(pix3, w, h, 3)
    hd = mm.decode_image_header(jp)
    assert (hd["width"], hd["height"], hd["channels"]) == (w, h, 3)
    # and the pixel-tier dispatch routes JPEG through the real decoder
    pw, ph, fmt, buf = mm._resolve_pixel_decode()(jp)
    assert (pw, ph, fmt) == (w, h, "jpeg") and buf is not None

    # corrupt / truncated / progressive fall through, never raise
    assert decode_jpeg_pixels(jp[:40]) is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    prog = jp.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None


def test_jpeg_decoder_restart_markers():
    """The decoder's DRI/RSTn path on a hand-built stream: restart
    markers byte-align the reader and reset DC predictors every
    interval — a flat image with per-interval absolute DC coding
    decodes exactly."""
    import struct

    from data_integration_system_spark.operators import jpegcodec as jc

    w, h = 32, 8  # 4 MCUs of one 8x8 block (grayscale 1x1)
    val = 200.0
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 2)  # DRI: restart every 2 MCUs
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    dht = bytes([0x00]) + bytes(jc._DC_BITS[:16]) + bytes(jc._DC_VALS)
    dht += bytes([0x10]) + bytes(jc._AC_BITS[:16]) + bytes(jc._AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0]) + b"\x00\x3f\x00"

    dc = int(round(8 * (val - 128.0)))
    block = [0] * 64
    block[0] = dc
    for interval, rst in ((0, 0xD0), (1, None)):
        bw = jc._BitWriter()
        pred = 0
        for _ in range(2):  # 2 MCUs per interval, DC pred resets between
            pred = jc._encode_block(bw, block, pred)
        out += bw.flush()
        if rst is not None:
            out += bytes([0xFF, rst])
    out += b"\xff\xd9"

    got = jc.decode_jpeg_pixels(bytes(out))
    assert got is not None and got[:3] == (w, h, 1)
    assert set(got[3]) == {int(val)}  # flat image, exact through DC-only


def test_jpeg_codec_pil_interop():
    """When PIL is importable, its decoder must read our encoder's
    stream (spec-validity beyond our own decoder) within JPEG error
    bounds.  Skipped in codec-less containers."""
    import pytest as _pytest

    PIL = _pytest.importorskip("PIL.Image")
    import io

    from data_integration_system_spark.operators.jpegcodec import encode_jpeg

    w, h = 24, 16
    pix = bytes((x * 5 + y * 9) % 256 for y in range(h) for x in range(w))
    with PIL.open(io.BytesIO(encode_jpeg(pix, w, h, 1, quant=1))) as img:
        assert (img.width, img.height) == (w, h)
        got = bytes(img.convert("L").tobytes())
    assert max(abs(a - b) for a, b in zip(pix, got)) <= 3


def test_jpeg_decoder_subsampled_stream():
    """The decoder's chroma-upsample path on a hand-built 4:2:0 stream
    (Y at 2x2, Cb/Cr at 1x1): a flat color decodes to the flat color —
    DC-only blocks are exact through quant=1 and nearest upsampling."""
    import struct

    from data_integration_system_spark.operators import jpegcodec as jc

    r0, g0, b0 = 200, 100, 50
    yf = 0.299 * r0 + 0.587 * g0 + 0.114 * b0
    cbf = 128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0
    crf = 128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    dht = bytes([0x00]) + bytes(jc._DC_BITS[:16]) + bytes(jc._DC_VALS)
    dht += bytes([0x10]) + bytes(jc._AC_BITS[:16]) + bytes(jc._AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0, 2, 0, 3, 0]) + b"\x00\x3f\x00"

    bw = jc._BitWriter()
    # one MCU: 4 Y blocks then Cb, Cr — flat planes are DC-only
    for plane_dc, nblocks in ((yf, 4), (cbf, 1), (crf, 1)):
        dc = int(round(8 * (plane_dc - 128.0)))
        pred = 0
        for _ in range(nblocks):
            block = [0] * 64
            block[0] = dc
            pred = jc._encode_block(bw, block, pred)
    out += bw.flush() + b"\xff\xd9"

    got = jc.decode_jpeg_pixels(bytes(out))
    assert got is not None and got[:3] == (16, 16, 3)
    rgb = got[3]
    pix = {(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]) for i in range(256)}
    assert len(pix) == 1  # flat stays flat through the upsample
    got_rgb = next(iter(pix))
    assert all(abs(a - b) <= 1 for a, b in zip(got_rgb, (r0, g0, b0)))


def test_decode_gif_pixels_exact_roundtrip():
    """The stdlib-only GIF decoder (LZW + palette + de-interlace)
    recovers the exact pixel indices as RGB: completes the image-decode
    triad (PNG pixels, GIF pixels, JPEG header-only)."""
    from data_integration_system_spark.operators import multimodal as mm

    w, h = 13, 9
    indices = bytes((i * 89 + 7) % 256 for i in range(w * h))
    got = mm.decode_gif_pixels(_encode_gif(indices, w, h))
    assert got is not None
    gw, gh, ch, rgb = got
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(bytes([i, i, i]) for i in indices)

    # interlaced: encode rows in the 4-pass interlace order, flag set;
    # the decoder must hand back the natural row order
    passes = [r for first, step in ((0, 8), (4, 8), (2, 4), (1, 2))
              for r in range(first, h, step)]
    interleaved = b"".join(indices[r * w:(r + 1) * w] for r in passes)
    got_i = mm.decode_gif_pixels(_encode_gif(interleaved, w, h, interlaced=True))
    assert got_i is not None and got_i[3] == rgb

    # a long stream forces real table growth in the decoder's dict path
    big = bytes((i * 31) % 256 for i in range(300 * 5))
    got_b = mm.decode_gif_pixels(_encode_gif(big, 300, 5))
    assert got_b is not None
    assert got_b[3] == b"".join(bytes([i, i, i]) for i in big)

    # corrupt / truncated fall through, never raise
    assert mm.decode_gif_pixels(b"GIF89a\x00") is None
    assert mm.decode_gif_pixels(_encode_gif(indices, w, h)[:40]) is None
    assert mm.decode_gif_pixels(b"not a gif") is None


def test_encode_png_roundtrip_all_channels():
    """The library PNG encoder (multimodal.encode_png, filters rotating
    through all five types) roundtrips byte-exactly through the pixel
    decoder for gray/gray+alpha/rgb/rgba buffers."""
    from data_integration_system_spark.operators import multimodal as mm

    for w, h, ch in [(9, 7, 1), (6, 5, 2), (8, 6, 3), (5, 5, 4)]:
        pixels = bytes((i * 131 + 17 * (i // 11)) % 256 for i in range(w * h * ch))
        png = mm.encode_png(pixels, w, h, channels=ch)
        got = mm.decode_png_pixels(png)
        assert got is not None
        assert got[:3] == (w, h, ch)
        assert got[3] == pixels
        # and the header tier agrees on the geometry
        hdr = mm.decode_image_header(png)
        assert (hdr["width"], hdr["height"], hdr["channels"]) == (w, h, ch)


def test_audio_features_real_sample_math(spark):
    """audio_features computes RMS/peak/zero-crossings from GENUINE
    decoded PCM samples (exact for a square wave), and emits NULL
    features for non-audio payloads — one Arrow-batched pass."""
    from data_integration_system_spark.operators.multimodal import audio_features

    amp = 1200
    square = [amp if (i // 4) % 2 == 0 else -amp for i in range(64)]
    rows = [
        (1, bytearray(_make_wav_samples(square, channels=1, rate=16000))),
        (2, bytearray(b"plain text payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.asDict() for r in audio_features(df).collect()}
    # |sample| == amp everywhere: rms_e2 = amp*100 exactly, peak = amp
    assert got[1]["rms_e2"] == amp * 100 and got[1]["peak"] == amp
    assert got[1]["n_samples"] == 64 and got[1]["sample_rate"] == 16000
    # sign flips every 4 samples across 64 samples -> 15 crossings
    assert got[1]["zero_crossings"] == 15
    assert got[2]["rms_e2"] is None and got[2]["channels"] is None


def _make_mp4(duration_ms: int = 5500, version: int = 0) -> bytes:
    """A real ISO BMFF box stream: ftyp + moov/mvhd with the given
    duration at a 1000-tick timescale."""
    import struct

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ts = 1000
    if version == 0:
        mvhd = b"\x00" + b"\x00" * 3 + struct.pack(">IIII", 0, 0, ts, duration_ms)
    else:
        mvhd = b"\x01" + b"\x00" * 3 + struct.pack(">QQIQ", 0, 0, ts, duration_ms)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    moov = box(b"moov", box(b"mvhd", mvhd))
    return ftyp + moov + box(b"mdat", b"\x00" * 32)


def test_decode_audio_video_headers_real_bytes():
    """WAV and MP4 header parsers extract real channel/rate/duration
    metadata from genuine container bytes (WAV via the stdlib encoder),
    and reject non-containers."""
    from data_integration_system_spark.operators import multimodal as mm

    wav = mm.decode_audio_header(_make_wav(channels=2, rate=16000, n_frames=1600))
    assert wav == {"fmt": "wav", "channels": 2, "sample_rate": 16000,
                   "bits": 16, "duration_ms": 100}
    mono = mm.decode_audio_header(_make_wav(channels=1, rate=8000, n_frames=4000))
    assert (mono["channels"], mono["sample_rate"], mono["duration_ms"]) == (1, 8000, 500)

    mp4 = mm.decode_video_header(_make_mp4(duration_ms=5500))
    assert mp4 == {"fmt": "mp4", "brand": "isom", "duration_ms": 5500}
    v1 = mm.decode_video_header(_make_mp4(duration_ms=123456, version=1))
    assert v1["duration_ms"] == 123456

    assert mm.decode_audio_header(b"not audio at all") is None
    assert mm.decode_audio_header(b"RIFFxxxxAVI LIST") is None  # RIFF, not WAVE
    assert mm.decode_video_header(b"no boxes here") is None
    assert mm.decode_image_header(_make_wav()) is None  # no cross-detection


def _encode_png(pixels: bytes, w: int, h: int, channels: int, filters: list[int]) -> bytes:
    """The REAL library encoder with an explicit filter schedule — the
    roundtrip test pins the shipped encode path, not a private copy."""
    from data_integration_system_spark.operators import multimodal as mm

    return mm.encode_png(pixels, w, h, channels, filters=filters)


def test_decode_png_pixels_exact_roundtrip():
    """The pure-Python PNG pixel decoder (VERDICT r6 #5: 'decode a real
    pixel') reproduces the original pixel buffer BYTE-EXACTLY through
    zlib + every scanline filter type (None/Sub/Up/Average/Paeth), for
    gray/rgb/rgba, including multi-IDAT streams."""
    import struct
    import zlib

    from data_integration_system_spark.operators import multimodal as mm

    for w, h, ch in [(7, 5, 3), (16, 9, 4), (1, 1, 1), (32, 3, 2)]:
        # deterministic pseudo-random pixels (no RNG): a spread pattern
        pixels = bytes((i * 97 + 41 * (i // 13)) % 256 for i in range(w * h * ch))
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            png = _encode_png(pixels, w, h, ch, filters)
            got = mm.decode_png_pixels(png)
            assert got is not None, (w, h, ch, filters)
            gw, gh, gch, buf = got
            assert (gw, gh, gch) == (w, h, ch)
            assert buf == pixels, f"pixel mismatch for filters={filters}"

    # multi-IDAT: the same stream split across several IDAT chunks
    pixels = bytes(range(0, 240, 5)) * 3  # 144 bytes = 12x4 gray
    png = _encode_png(pixels, 12, 12, 1, [4])
    # resplit the single IDAT into 3 chunks
    def chunks(b):
        pos, out = 8, []
        while pos + 8 <= len(b):
            (clen,) = struct.unpack(">I", b[pos:pos + 4])
            out.append((b[pos + 4:pos + 8], b[pos + 8:pos + 8 + clen]))
            pos += 12 + clen
        return out

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    parts = chunks(png)
    idat = next(d for t, d in parts if t == b"IDAT")
    third = max(1, len(idat) // 3)
    rebuilt = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", dict(parts)[b"IHDR"])
    for i in range(0, len(idat), third):
        rebuilt += chunk(b"IDAT", idat[i:i + third])
    rebuilt += chunk(b"IEND", b"")
    got = mm.decode_png_pixels(rebuilt)
    assert got is not None and got[3] == pixels

    # out-of-scope subsets fall through to the next tier, never raise
    assert mm.decode_png_pixels(b"not a png") is None
    assert mm.decode_png_pixels(_make_png(8, 8, color_type=3)) is None  # palette
    assert mm.decode_png_pixels(_make_png(8, 8, bit_depth=16)) is None
    assert mm.decode_png_pixels(_encode_png(b"\x00" * 12, 4, 3, 1, [0])[:30]) is None

    # zero-dimension IHDR must be rejected, not decoded to an empty
    # buffer: a width=5/height=0 stream with an empty zlib IDAT passes
    # every size check (len(raw) == 0 == h*(stride+1)) and would
    # ZeroDivisionError downstream geometry (w*h == 0)
    def _degenerate_png(w, h):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b""))

    assert mm.decode_png_pixels(_degenerate_png(5, 0)) is None
    assert mm.decode_png_pixels(_degenerate_png(0, 5)) is None


def test_resize_batches_uses_real_png_pixels():
    """The resize stage computes geometry from genuinely-decoded PNG
    pixel buffers (tier 1.5), stub geometry for text payloads, and NULL
    geometry for a truncated container prefix — in one Arrow batch."""
    import struct

    import pandas as pd

    from data_integration_system_spark.operators import multimodal as mm

    big = _encode_png(bytes(900 * 2 * 3), 900, 2, 3, [0, 1])  # 900x2 rgb
    # a JPEG prefix whose SOF is past the end (truncated container)
    trunc = b"\xff\xd8" + bytes([0xFF, 0xE1]) + struct.pack(">H", 2 + 60000) + b"\x00" * 100
    gif = _encode_gif(bytes(range(200)), 20, 10)
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "payload": [big, b"text payload", trunc, gif],
    })
    out = next(mm.resize_batches(iter([pdf]))).set_index("doc_id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (900, 2)
    assert out.loc[1, "new_width"] == mm._MAX_SIDE  # fit-box hit the cap
    sw, sh, _ = mm._fake_decode(b"text payload")
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (sw, sh)
    assert pd.isna(out.loc[3, "width"]) and pd.isna(out.loc[3, "new_width"])
    # GIF rides the real pixel tier too (LZW-decoded buffer geometry)
    assert (out.loc[4, "width"], out.loc[4, "height"]) == (20, 10)


def test_decode_jpeg_header_behind_stacked_metadata():
    """A genuine JPEG whose SOF hides behind stacked >64 KiB metadata
    segments (EXIF + ICC + XMP) must NOT get fabricated stub dimensions
    (advisor r6): the full payload parses to real dims, and a prefix too
    short to reach SOF reports the container honestly — fmt known, dims
    NULL, truncated flag set."""
    import struct

    from data_integration_system_spark.operators import multimodal as mm

    def appn(marker: int, body_len: int) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + body_len) + b"\x00" * body_len

    sof_payload = struct.pack(">BHHB", 8, 480, 640, 3) + b"".join(
        struct.pack("BBB", i + 1, 0x11, 0) for i in range(3)
    )
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    # 3 maximal APP1 segments (~192 KiB of metadata) before SOF — still
    # inside the raised HEAD_BYTES, so the prefix protocol decodes it
    stacked = b"\xff\xd8" + appn(0xE1, 65533) * 3 + sof + b"\xff\xd9"
    assert len(stacked) < mm.HEAD_BYTES
    got = mm.decode_image_header(stacked[: mm.HEAD_BYTES])
    assert (got["width"], got["height"], got["fmt"]) == (640, 480, "jpeg")

    # 5 maximal segments push SOF past HEAD_BYTES: the truncated prefix
    # must report truncation, never fall through to the stub
    huge = b"\xff\xd8" + appn(0xE1, 65533) * 5 + sof + b"\xff\xd9"
    assert len(huge) > mm.HEAD_BYTES
    trunc = mm.decode_image_header(huge[: mm.HEAD_BYTES])
    assert trunc is not None
    assert trunc["fmt"] == "jpeg" and trunc["width"] is None
    assert trunc.get("truncated") is True

    # and the decode dispatch propagates NULL dims instead of stub dims
    decode = mm._resolve_decode()
    w, h, fmt = decode(huge[: mm.HEAD_BYTES], true_len=len(huge))
    assert (w, h, fmt) == (None, None, "jpeg")


def test_decode_video_header_corrupt_mvhd_no_raise():
    """A corrupt mvhd v1 box declaring a 28-31 byte body at the end of
    the payload must not raise struct.error out of the decode stage
    (advisor r6) — errors-as-data: duration comes back None."""
    import struct

    from data_integration_system_spark.operators import multimodal as mm

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    for body_len in (28, 29, 30, 31):
        bad_mvhd = b"\x01" + b"\x00" * (body_len - 1)  # v1, short body
        payload = ftyp + box(b"moov", box(b"mvhd", bad_mvhd))
        got = mm.decode_video_header(payload)  # must not raise
        assert got == {"fmt": "mp4", "brand": "isom", "duration_ms": None}
    # a well-formed v1 mvhd still decodes
    ok = mm.decode_video_header(_make_mp4(duration_ms=777, version=1))
    assert ok["duration_ms"] == 777


def test_media_probe_classifies_mixed_batch(spark):
    """media_probe: one Arrow-batched pass classifies image/audio/video/
    unknown payloads into a typed metadata relation — the multimodal
    ingest triage stage, end-to-end through Spark."""
    from data_integration_system_spark.operators.multimodal import media_probe

    rows = [
        (1, bytearray(_make_png(320, 240))),
        (2, bytearray(_make_jpeg(64, 48))),
        (3, bytearray(_make_wav(channels=2, rate=44100, n_frames=441))),
        (4, bytearray(_make_mp4(duration_ms=2500))),
        (5, bytearray(b"plain text payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.asDict() for r in media_probe(df).collect()}
    assert (got[1]["kind"], got[1]["width"], got[1]["height"]) == ("image", 320, 240)
    assert (got[2]["kind"], got[2]["fmt"]) == ("image", "jpeg")
    assert (got[3]["kind"], got[3]["sample_rate"], got[3]["duration_ms"]) == (
        "audio", 44100, 10)
    assert (got[4]["kind"], got[4]["fmt"], got[4]["duration_ms"]) == (
        "video", "mp4", 2500)
    assert got[5]["kind"] == "unknown" and got[5]["fmt"] is None
    assert got[5]["n_bytes"] == 18


def test_multimodal_decode_gate_real_binding(monkeypatch):
    """With a (fake) PIL importable, payloads the header parser does NOT
    recognize go to the real binding — proving the codec path goes live
    unchanged when the library exists — while real container bytes still
    take the header fast path (never shipped to the codec)."""
    import sys
    import types

    import pandas as pd

    from data_integration_system_spark.operators import multimodal as mm

    class _Img:
        width, height, format = 320, 200, "WEBP"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    pil = types.ModuleType("PIL")
    pil.Image = types.ModuleType("PIL.Image")
    pil.Image.open = lambda fp: _Img()
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil.Image)

    pdf = pd.DataFrame(
        {"doc_id": [7, 8], "payload": [b"RIFFwebpfakebytes", _make_png(10, 20)]}
    )
    out = next(mm.decode_batches(iter([pdf])))
    got = {r.doc_id: (r.width, r.height, r.fmt) for r in out.itertuples()}
    assert got[7] == (320, 200, "webp")  # unrecognized header -> codec
    assert got[8] == (10, 20, "png")  # container magic -> header parser
    rs = next(mm.resize_batches(iter([pdf.iloc[:1]])))
    assert (rs.width[0], rs.height[0], rs.new_width[0], rs.new_height[0]) == (
        320, 200, 256, 160,
    )


def test_simhash_geometry_and_multilane_exactness(spark):
    """The adaptive simhash geometry (r7): m=1 reproduces the classic
    64-bit / 4x16 / D=3 layout; forcing a tiny target bucket switches
    to multi-lane signatures, where the pigeonhole guarantee must hold
    EXACTLY — the query's output equals the all-pairs set at Hamming
    <= D over the same signatures (recall 1.0 within the accepted
    distance, no blocking/verification mismatch)."""
    from pyspark.sql import functions as F

    from data_integration_system_spark.operators.dedup import (
        _simhash_geometry,
        _simhash_signatures,
        dedup_simhash,
    )
    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators._common import parallelize_scan

    assert _simhash_geometry(500) == (1, 4, 16, 3)
    assert _simhash_geometry(2_000_000) == (1, 4, 16, 3)
    m2 = _simhash_geometry(50_000_000)
    assert m2[0] >= 2 and m2[1] == 3 * m2[0] + 1 and m2[3] == 3 * m2[0]
    # width never regresses as lanes grow, and covered bits fit
    for n in (1, 10**4, 10**7, 10**9):
        m, c, w, d = _simhash_geometry(n)
        assert c * w <= 64 * m and d == 3 * m

    sf = "/root/testdata/sf0.001"
    # force multi-lane on the tiny corpus (target << 1 doc per bucket)
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash(spark, sf, target_bucket=1e-4).collect()
    }
    docs = parallelize_scan(table(spark, sf, "documents"))
    m, c, w, d = _simhash_geometry(docs.count(), 1e-4)
    assert m >= 2
    sigs = {r.doc_id: tuple(r.bits) for r in _simhash_signatures(docs, m, c * w).collect()}
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if ham <= d:
                want.add((a, b, ham))
    assert got == want


def test_embedding_lsh_recall_floor(spark):
    """Recall floor for the sign-LSH near-dup blocking vs brute force
    at sf0.001: with k=6 bits x L=6 tables and the corpus threshold
    0.3 (θ≈72°, p≈0.60), theory gives ≈1-(1-p^k)^L ≈ 0.24 — pin ≥0.2
    so a blocking regression (bucket bug, plane drift, the adaptive-k
    floor moving) is caught.  The synthetic threshold is adversarially
    low; at production thresholds (0.8+) the same s-curve puts recall
    near 1.  Precision is exact by construction (cosine verify)."""
    from pyspark.sql import functions as F

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.functions.vectors import cosine
    from data_integration_system_spark.operators.dedup import dedup_embedding_near

    sf = "/root/testdata/sf0.001"
    emb = table(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    want = {
        (r.va, r.vb)
        for r in a.join(b, F.col("va") < F.col("vb"))
        .select("va", "vb", F.round(cosine("ea", "eb"), 4).alias("c"))
        .filter(F.col("c") >= 0.3)  # same 4-dp rounding as the operator
        .collect()
    }
    got = {(r.vec_a, r.vec_b) for r in dedup_embedding_near(spark, sf).collect()}
    assert got <= want  # exact verify: no false positives, ever
    assert len(want & got) / max(1, len(want)) >= 0.2


def test_embedding_dim_mismatch_fails_fast(spark, tmp_path):
    """A wrong configured dim must raise at execution, not silently
    produce zero candidates (zip_with null-padding)."""
    import pytest as _pytest

    from data_integration_system_spark.operators.dedup import dedup_embedding_near

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    ).write.parquet(f"{sf}/embeddings.parquet")

    with _pytest.raises(Exception, match="dim mismatch"):
        dedup_embedding_near(spark, sf).count()
    # the same data under the CORRECT dim executes fine
    dedup_embedding_near(spark, sf, dim=3).count()


def test_multimodal_pil_decode_real_binding_with_generated_png():
    """Import-gated REAL-codec test (VERDICT r3 polish #8): when PIL is
    actually installed, _pil_decode must read a genuine PNG header. The
    payload is a handcrafted minimal 1x1 RGBA PNG, so the test needs no
    image-writing dependency; in containers without PIL it skips."""
    import base64

    import pytest as _pytest

    _pytest.importorskip("PIL.Image")
    from data_integration_system_spark.operators import multimodal as mm

    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    assert mm._pil_decode(png_1x1) == (1, 1, "png")
    # the header parser agrees with the real codec on the same bytes
    hdr = mm.decode_image_header(png_1x1)
    assert (hdr["width"], hdr["height"], hdr["fmt"]) == (1, 1, "png")


def test_assign_split_deterministic_and_exact(spark):
    """assign_split: reproducible across partitionings (unlike
    randomSplit), matches a hashlib ground-truth replay, hits the
    integer weights within binomial noise, and re-rolls under a new
    salt."""
    import hashlib as _hashlib

    import pytest as _pytest

    from data_integration_system_spark.functions.hashing import assign_split

    weights = {"train": 9000, "val": 500, "test": 500}
    df = spark.range(20000).select(F.col("id"))
    split = assign_split("id", weights, salt="v1").alias("split")

    a = {r.id: r.split for r in df.repartition(1).select("id", split).collect()}
    b = {r.id: r.split for r in df.repartition(17).select("id", split).collect()}
    assert a == b  # partitioning-independent

    # ground truth: sha256("v1:id") first 8 hex digits mod 10000
    def truth(i: int) -> str:
        bucket = int(_hashlib.sha256(f"v1:{i}".encode()).hexdigest()[:8], 16) % 10000
        if bucket < 9000:
            return "train"
        return "val" if bucket < 9500 else "test"

    assert all(a[i] == truth(i) for i in range(0, 20000, 97))

    from collections import Counter

    counts = Counter(a.values())
    assert abs(counts["train"] - 18000) < 400
    assert abs(counts["val"] - 1000) < 150 and abs(counts["test"] - 1000) < 150

    c = {r.id: r.split for r in df.select(
        "id", assign_split("id", weights, salt="v2").alias("split")).collect()}
    assert c != a  # new salt re-rolls membership
    assert not any(v is None for v in a.values())  # total cover, no gaps

    with _pytest.raises(ValueError, match="sum to 10000"):
        assign_split("id", {"train": 5000})


def test_decode_batches_prefix_protocol():
    """The metadata decode ships only HEAD_BYTES of each blob plus the
    true length: the stub must key off n_bytes (not the truncated
    head), and container headers still parse from the prefix."""
    import pandas as pd

    from data_integration_system_spark.operators import multimodal as mm

    big_png = _make_png(1234, 777)
    true_len = 100_000
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            # doc 1: text blob truncated to a 64-byte head; doc 2: a PNG
            # whose IHDR sits inside any honest prefix
            "payload": [b"x" * 64, big_png[:256]],
            "n_bytes": [true_len, len(big_png)],
        }
    )
    out = next(mm.decode_batches(iter([pdf]))).set_index("doc_id")
    assert out.loc[1, "n_bytes"] == true_len
    assert (out.loc[1, "width"], out.loc[1, "height"], out.loc[1, "fmt"]) == \
        mm._fake_decode_len(true_len)
    assert (out.loc[2, "width"], out.loc[2, "height"], out.loc[2, "fmt"]) == \
        (1234, 777, "png")


def test_embedding_lsh_design_band_recall_floor(spark):
    """r8: L now scales with k (_emb_lsh_tables) to hold recall at the
    DESIGN cosine (0.8) — the r8 rehearsal measured fixed-L=6 recall
    collapsing with adaptive k (0.24 -> 0.01 across three scales).
    Floor pinned on planted twins at cos=0.9 (the corpus itself has no
    pairs above ~0.44): with k=6/L=8 theory gives ~0.98; pin >= 0.8 so
    a plane/bucket/table-sizing regression is caught."""
    import scale_rehearsal as sr

    got = sr.planted_twin_recall(spark, "/root/testdata/sf0.001")
    assert got["planted"] >= 150
    assert got["recall_design_band"] >= 0.8, got


def test_emb_lsh_tables_schedule():
    """L schedule: floor 6 at tiny k, rises with k to hold the design
    recall, clamped at the documented ceiling."""
    from data_integration_system_spark.operators.dedup import (
        _EMB_MAX_TABLES,
        _emb_lsh_bits,
        _emb_lsh_tables,
    )

    ls = [_emb_lsh_tables(k) for k in range(6, 20)]
    assert ls == sorted(ls)  # monotone in k
    assert _emb_lsh_tables(6) == 8
    assert _emb_lsh_tables(13) <= _EMB_MAX_TABLES
    assert _emb_lsh_tables(19) == _EMB_MAX_TABLES  # clamp engages
    # the adaptive pairing at rehearsal scales
    assert _emb_lsh_tables(_emb_lsh_bits(200_000)) >= 30


def test_emb_lsh_recall_holds_at_every_corpus_size():
    """r9 repay of the r8-measured d3 clamp defect: _emb_lsh_bits caps
    k at _EMB_MAX_BITS = the largest k whose UNclamped L fits under
    _EMB_MAX_TABLES, so the closed-form design-band recall is >= target
    for ANY corpus size — at 2M vectors the r8 geometry (k=16, L
    clamped 48) gave ~0.71; now k=13/L=45 holds 0.9 and the expected
    bucket grows past the cap instead (hot-bucket cap scales with it)."""
    import math

    from data_integration_system_spark.operators.dedup import (
        _EMB_DESIGN_COS,
        _EMB_MAX_BITS,
        _EMB_MAX_TABLES,
        _EMB_TARGET_BUCKET,
        _EMB_TARGET_RECALL,
        _emb_lsh_bits,
        _emb_lsh_tables,
        _emb_max_bucket,
        _emb_tables_needed,
    )

    p = 1.0 - math.acos(_EMB_DESIGN_COS) / math.pi
    for n in (2_000, 60_000, 200_000, 2_000_000, 50_000_000, 10**9):
        k = _emb_lsh_bits(n)
        L = _emb_lsh_tables(k)
        assert k <= _EMB_MAX_BITS
        assert _emb_tables_needed(k) <= _EMB_MAX_TABLES  # clamp never bites
        recall = 1.0 - (1.0 - p**k) ** L
        assert recall >= _EMB_TARGET_RECALL - 1e-9, (n, k, L, recall)
        # the skew cap never drops TYPICAL buckets: >= 16x expected
        assert _emb_max_bucket(n, k) >= 16 * max(
            _EMB_TARGET_BUCKET, math.ceil(n / 2**k)
        )
    # the d3 regime specifically: k capped at 13, bucket ~244, cap ~3904
    assert _emb_lsh_bits(2_000_000) == 13
    assert _emb_max_bucket(2_000_000, 13) == math.ceil(2_000_000 / 8192) * 16


def _make_mjpeg_mp4(n_frames: int = 4, w: int = 8, h: int = 8) -> bytes:
    """A GENUINE MJPEG-in-MP4: each sample a flat-gray baseline JPEG at
    level (37*i)%256, wrapped by the spec-valid ISO BMFF writer."""
    from data_integration_system_spark.operators.jpegcodec import encode_jpeg
    from data_integration_system_spark.operators.mp4container import (
        encode_mp4_mjpeg,
    )

    frames = [
        encode_jpeg(bytes([(37 * i) % 256]) * (w * h), w, h, 1, quant=1)
        for i in range(n_frames)
    ]
    return encode_mp4_mjpeg(frames, w, h, sync_every=2)


def test_mp4_sample_table_roundtrip_real_frames():
    """The MP4 sample-table codec (VERDICT r9 #3): the stbl walk
    (stsc expansion across its two runs, stsz sizes, stco offsets)
    locates the exact per-sample JPEG bytes the writer laid into mdat;
    stss selects the declared keyframes; every extracted keyframe
    pixel-decodes to its exact flat level through the full JPEG codec;
    the moov/mvhd header tier (decode_video_header) reports the real
    duration; malformed input returns None (errors-as-data)."""
    from data_integration_system_spark.operators import multimodal as mm
    from data_integration_system_spark.operators import mp4container as m4
    from data_integration_system_spark.operators.jpegcodec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    frames = [
        encode_jpeg(bytes([(37 * i) % 256]) * 64, 8, 8, 1, quant=1)
        for i in range(5)
    ]
    mp4 = m4.encode_mp4_mjpeg(frames, 8, 8, sync_every=2)
    st = m4.decode_mp4_sample_table(mp4)
    # the table walk is bit-exact: every sample slice == its source frame
    assert [mp4[o:o + s] for o, s in st["samples"]] == frames
    assert (st["width"], st["height"], st["codec"]) == (8, 8, "jpeg")
    assert st["sync"] == [1, 3, 5]  # every-2nd-sample stss, 1-based
    assert st["timescale"] == 1000 and st["duration"] == 500
    # keyframe-only extraction returns exactly the sync set, 0-based
    kf = m4.extract_mp4_frames(mp4, keyframes_only=True)
    assert [i for i, _ in kf] == [0, 2, 4]
    for i, f in kf:
        w, h, ch, buf = decode_jpeg_pixels(f)
        assert (w, h, ch) == (8, 8, 1)
        assert set(buf) == {(37 * i) % 256}
    # all-samples extraction preserves order and bytes
    assert [b for _, b in m4.extract_mp4_frames(mp4)] == frames
    # the header triage tier reads mvhd through the same box walk, and
    # (r10) reports geometry + frame count from the stbl tables — still
    # without touching a sample byte
    hdr = mm.decode_video_header(mp4)
    assert hdr == {"fmt": "mp4", "brand": "isom", "duration_ms": 500,
                   "width": 8, "height": 8, "n_frames": 5}
    # malformed input: None, never raise
    assert m4.decode_mp4_sample_table(b"not a container") is None
    assert m4.decode_mp4_sample_table(mp4[:60]) is None  # truncated: moov gone
    assert m4.extract_mp4_frames(b"RIFF\x00\x00\x00\x00AVI ") is None
    # absent stss means every sample is sync, per spec
    no_stss = mp4.replace(b"stss", b"skip")
    st2 = m4.decode_mp4_sample_table(no_stss)
    assert st2["sync"] == [1, 2, 3, 4, 5]


def test_mp4_stsc_chunk_plan_exercised():
    """The writer's two-run stsc ([first 2 samples in chunk 1, then 1
    per chunk]) is what makes the reader's run-length expansion real:
    pin the chunk arithmetic — sample offsets are NOT uniform strides
    (sample 2 sits inside chunk 1; sample 3 starts chunk 2)."""
    from data_integration_system_spark.operators import mp4container as m4

    frames = [bytes([i]) * (10 + 3 * i) for i in range(4)]  # distinct sizes
    mp4 = m4.encode_mp4_mjpeg(frames, 8, 8)
    st = m4.decode_mp4_sample_table(mp4)
    offs = [o for o, _ in st["samples"]]
    sizes = [s for _, s in st["samples"]]
    assert sizes == [len(f) for f in frames]
    # chunk 1 holds samples 1-2 back to back; chunks 2,3 hold one each
    assert offs[1] == offs[0] + sizes[0]
    assert [mp4[o:o + s] for o, s in st["samples"]] == frames


def test_mp4_uniform_stsz_and_co64_branches():
    """The reader's two table variants the default writer path doesn't
    emit: equal-sized samples take the spec-preferred UNIFORM stsz
    (sample_size set, no table), and wide_offsets=True writes co64
    (64-bit chunk offsets — the >4 GB-file form real corpora contain).
    Both must roundtrip bit-exact through the same walk."""
    from data_integration_system_spark.operators import mp4container as m4

    frames = [bytes([i]) * 24 for i in range(4)]  # equal sizes -> uniform
    plain = m4.encode_mp4_mjpeg(frames, 8, 8)
    assert b"stco" in plain and plain.count(b"stsz") == 1
    # uniform stsz has an 8-byte body (version/flags + size + count)
    st = m4.decode_mp4_sample_table(plain)
    assert [plain[o:o + s] for o, s in st["samples"]] == frames

    wide = m4.encode_mp4_mjpeg(frames, 8, 8, wide_offsets=True)
    assert b"co64" in wide and b"stco" not in wide
    stw = m4.decode_mp4_sample_table(wide)
    assert [wide[o:o + s] for o, s in stw["samples"]] == frames
    assert stw["sync"] == st["sync"]
    # distinct sizes still take the per-sample table
    varied = m4.encode_mp4_mjpeg([b"a" * 9, b"b" * 30], 8, 8)
    stv = m4.decode_mp4_sample_table(varied)
    assert [s for _, s in stv["samples"]] == [9, 30]


def test_mp4_time_based_sampling_via_stts():
    """stts-driven time seeking (r10): the fixture writes 0.1 s/sample
    (delta 100 at timescale 1000).  Sampling every 0.25 s over five
    samples targets t=0,0.25,0.5 -> floor-seek to samples 0,2,4; with
    keyframe snap (stss = 1,3,5 -> 0-based 0,2,4) the picks land on
    sync samples unchanged; without snap, a 0.15 s cadence floor-seeks
    mid-GOP samples (1,3) too.  Returned bytes are the exact frames."""
    from data_integration_system_spark.operators import mp4container as m4

    frames = [bytes([i]) * (10 + i) for i in range(5)]
    mp4 = m4.encode_mp4_mjpeg(frames, 8, 8, sync_every=2)
    st = m4.decode_mp4_sample_table(mp4)
    assert st["times"] == [0, 100, 200, 300, 400]

    kf = m4.extract_mp4_frames_every(mp4, 0.25)
    assert [i for i, _ in kf] == [0, 2, 4]
    assert all(b == frames[i] for i, b in kf)
    # without snap: 0.15 s cadence hits t=0,.15,.3,.45 -> samples 0,1,3,4
    raw = m4.extract_mp4_frames_every(mp4, 0.15, snap_to_keyframe=False)
    assert [i for i, _ in raw] == [0, 1, 3, 4]
    # with snap the mid-GOP picks retreat to their preceding keyframe
    snapped = m4.extract_mp4_frames_every(mp4, 0.15)
    assert [i for i, _ in snapped] == [0, 2, 4]
    # a coarser-than-duration interval still yields frame 0
    assert [i for i, _ in m4.extract_mp4_frames_every(mp4, 60.0)] == [0]
    # corrupt / non-MP4 / zero interval: None, never raise
    assert m4.extract_mp4_frames_every(b"junk", 0.25) is None
    assert m4.extract_mp4_frames_every(mp4, 0.0) is None


def _make_mp4_with_codec(codec: str, n_frames: int = 4, w: int = 8, h: int = 8) -> bytes:
    """Same genuine frames as _make_mjpeg_mp4, but the VisualSampleEntry
    typed ``codec`` — the fixture for the import-gated native tier
    (pixels only an injected/native decoder is allowed to open)."""
    from data_integration_system_spark.operators.jpegcodec import encode_jpeg
    from data_integration_system_spark.operators.mp4container import (
        encode_mp4_mjpeg,
    )

    frames = [
        encode_jpeg(bytes([(37 * i) % 256]) * (w * h), w, h, 1, quant=1)
        for i in range(n_frames)
    ]
    return encode_mp4_mjpeg(frames, w, h, sync_every=2, codec=codec)


def test_video_decoder_injected_fake_decodes_only_keyframes():
    """The tiered video dispatch (VERDICT r10 #8) with an INJECTED fake
    decoder: an avc1-typed track resolves to the fake, which must see
    exactly the stss sync samples (one table walk + k decodes — never
    the inter-frame bulk), in order, with the located sample bytes."""
    from data_integration_system_spark.operators import mp4container as m4

    mp4 = _make_mp4_with_codec("avc1", n_frames=5)
    st = m4.decode_mp4_sample_table(mp4)
    assert st["codec"] == "avc1"
    seen = []

    def fake(sample: bytes):
        seen.append(sample)
        return 8, 8, 3, b"\x00" * (8 * 8 * 3)

    out = m4.extract_mp4_keyframe_pixels(mp4, decoder=fake)
    # sync_every=2 over 5 frames -> sync samples 1,3,5 (1-based)
    assert [i for i, *_ in out] == [0, 2, 4]
    assert all((w, h, ch) == (8, 8, 3) for _, w, h, ch, _b in out)
    # the fake received the exact located sample bytes, nothing more
    want = [mp4[off:off + size] for s in (1, 3, 5)
            for off, size in [st["samples"][s - 1]]]
    assert seen == want


def test_video_decoder_honest_none_without_native_tier():
    """An avc1 corpus on a container WITHOUT PyAV degrades to the
    honest None — the table walk still works (counts/offsets/sync
    available) but no tier may fabricate pixels."""
    import importlib.util

    from data_integration_system_spark.operators import mp4container as m4

    mp4 = _make_mp4_with_codec("avc1")
    if importlib.util.find_spec("av") is not None:
        pytest.skip("PyAV installed; the no-native-tier path not exercisable")
    assert m4.resolve_video_decoder("avc1", None) is None
    assert m4.extract_mp4_keyframe_pixels(mp4) is None
    st = m4.decode_mp4_sample_table(mp4)  # metadata stays available
    assert st is not None and len(st["samples"]) == 4


def test_video_decoder_jpeg_tier_is_stdlib_and_preferred():
    """'jpeg' samples decode on the deterministic stdlib tier with no
    injection and regardless of native availability; pixels match the
    direct jpegcodec decode."""
    from data_integration_system_spark.operators import mp4container as m4
    from data_integration_system_spark.operators.jpegcodec import (
        decode_jpeg_pixels,
    )

    mp4 = _make_mjpeg_mp4(4)
    out = m4.extract_mp4_keyframe_pixels(mp4)
    assert [i for i, *_ in out] == [0, 2]
    for i, w, h, ch, buf in out:
        frame = dict(m4.extract_mp4_frames(mp4))[i]
        assert (w, h, ch, buf) == decode_jpeg_pixels(frame)
    # injected decoder still wins even over the jpeg tier
    marker = lambda s: (1, 1, 1, b"\xff")  # noqa: E731
    assert m4.resolve_video_decoder("jpeg", None, marker) is marker


def test_video_decoder_throwing_or_refusing_decoder_is_data():
    """A decoder that raises or returns None for some samples degrades
    those FRAMES, never the job (errors-as-data): surviving frames are
    returned; all-refused returns None."""
    from data_integration_system_spark.operators import mp4container as m4

    mp4 = _make_mp4_with_codec("avc1", n_frames=5)

    calls = []

    def flaky(sample: bytes):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("hostile frame")
        if len(calls) == 3:
            return None
        return 8, 8, 1, b"\x00" * 64

    out = m4.extract_mp4_keyframe_pixels(mp4, decoder=flaky)
    assert [i for i, *_ in out] == [0]  # sync 3 raised, sync 5 refused
    assert m4.extract_mp4_keyframe_pixels(
        mp4, decoder=lambda s: None
    ) is None


def test_video_decoder_extradata_reaches_native_tier():
    """The stsd entry's avcC body must surface as ``extradata`` in the
    sample table (a native H.264 context is useless without SPS/PPS);
    absent config boxes leave None."""
    import struct as _struct

    from data_integration_system_spark.operators import mp4container as m4

    plain = _make_mp4_with_codec("avc1")
    assert m4.decode_mp4_sample_table(plain)["extradata"] is None

    # splice an avcC child into the VisualSampleEntry: rebuild the stsd
    # entry with a trailing config box, fixing every enclosing box size
    conf = b"\x01\x64\x00\x1f\xff\xe1"  # a plausible AVCDecoderConfig head
    raw = bytearray(plain)
    i = bytes(raw).find(b"avc1") - 4  # entry box header start
    (esize,) = _struct.unpack(">I", raw[i:i + 4])
    avcc = _struct.pack(">I", 8 + len(conf)) + b"avcC" + conf
    raw[i:i + 4] = _struct.pack(">I", esize + len(avcc))
    insert_at = i + esize
    raw[insert_at:insert_at] = avcc
    # grow every ancestor box (stsd, stbl, minf, mdia, trak, moov)
    for anc in (b"stsd", b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        j = bytes(raw).rfind(anc)
        hdr = j - 4
        (bsize,) = _struct.unpack(">I", raw[hdr:hdr + 4])
        raw[hdr:hdr + 4] = _struct.pack(">I", bsize + len(avcc))
    st = m4.decode_mp4_sample_table(bytes(raw))
    assert st is not None and st["extradata"] == conf

"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` feature extractors.

The Spark-side machinery here — schema contract, batch iteration,
partition-preserving mapInPandas, deterministic metadata features — is
real and tested. Four codecs are REAL and stdlib-only: ``audio/wav``
(RIFF parse + per-slice RMS, :func:`_wav_features`), ``image/ppm``
P6 (header+pixel parse, grid luminance features, vectorized
nearest-neighbor resize with re-encode — :func:`_ppm_features` /
:func:`_ppm_resize`), and — round 13 — ``image/png``, a genuinely
COMPRESSED format decoded with stdlib ``zlib`` alone: CRC-validated
chunk walk, IDAT inflate, all five scanline unfilters, gray/RGB/
palette/RGBA color normalization (:func:`_png_decode`), plus a real
encoder (:func:`_png_encode`, cycling filters so round-trips cover
the whole filter matrix) and resize. ``image/gif`` (also round 13) is
the ANIMATED compressed codec: a from-spec LZW decoder/encoder
(variable code width, CLEAR/EOI, table-full handling), multi-frame
compositing with transparency and disposal, and a container
block-walk (:func:`gif_frame_count`) that gives the frame-sampling
stage a REAL frame count at metadata cost. Remaining codecs (JPEG,
true video containers) need libraries this container does not ship
and stay stubbed behind :func:`decode_payload`
(``NotImplementedError`` or a deterministic fake). Swapping in
PIL/ffmpeg later changes only that function; the distributed plumbing
is already load-bearing.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling,
no driver round-trip); the extractor is stateless per batch so Spark is
free to split/retry partitions. Payload bytes stay columnar end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presto_rakam_kafka_spark.parallelism import ensure_min_parallelism

#: Output contract of the feature extractor.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature_dim", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)

#: Dimensionality the (stubbed) decoder would emit per item.
STUB_FEATURE_DIM = 16


def decode_payload(payload: bytes, mime: str) -> list[float]:
    """Decode an opaque payload into a feature vector.

    ``audio/wav`` decodes for real via the stdlib ``wave`` module
    (:func:`_wav_features` — header fields + per-slice RMS energy), and
    ``image/ppm`` (P6) via :func:`_ppm_features` (header dims + 4×3
    grid luminances). Other codecs (PIL for compressed image/*, ffmpeg
    for video/*) are not available in this container — this stays the
    single seam where they plug in.
    """
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return _wav_features(payload)
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return _ppm_features(payload)
    if mime == "image/png":
        return _png_features(payload)
    if mime == "image/gif":
        return _gif_features(payload)
    raise NotImplementedError(
        f"no codec available for {mime!r}; install an image/audio stack and "
        "replace decode_payload"
    )


# ---------------------------------------------------------------------
# Real image codec: PPM (P6), stdlib-only
# ---------------------------------------------------------------------


def _ppm_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) image: ``P6 <w> <h> <maxval>\\n`` header
    (whitespace/comment tolerant, per the netpbm spec) followed by
    w×h×3 raw RGB bytes. Returns (w, h, pixels). Malformed payloads
    raise ``ValueError`` → the corrupt-asset path, mirroring the WAV
    codec and the reference's drop-and-log decode contract
    (KafkaConnectorPageSource.java:300-308)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":  # comment
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError(f"bad PPM header field {payload[start:pos]!r}") from e
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace after maxval
    pixels = payload[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError(f"PPM pixel data truncated: want {w * h * 3}, got {len(pixels)}")
    return w, h, pixels


def _ppm_encode(w: int, h: int, pixels: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def _resize_rgb(w: int, h: int, rgb: bytes, dst_w: int, dst_h: int) -> bytes:
    """Nearest-neighbor resize of raw RGB bytes (numpy index gather —
    vectorized, no per-pixel Python loop). One resize for every image
    codec; the codecs own only decode/encode."""
    import numpy as np

    img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(dst_h) * h) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    return img[ys][:, xs].tobytes()


def _ppm_resize(payload: bytes, dst_w: int, dst_h: int) -> tuple[int, int, bytes]:
    """Real resize of a P6 image; returns (src_w, src_h, P6 bytes)."""
    w, h, pixels = _ppm_decode(payload)
    return w, h, _ppm_encode(dst_w, dst_h, _resize_rgb(w, h, pixels, dst_w, dst_h))


def _rgb_grid_features(w: int, h: int, pixels: bytes) -> list[float]:
    """Shared image-feature layout over decoded RGB bytes: 4 header
    features (w, h, aspect, mean luminance/255) + mean luminance of a
    4×3 cell grid — :data:`STUB_FEATURE_DIM` dims total, same contract
    as the WAV codec. One feature space for every image codec (PPM,
    PNG) so downstream consumers never branch on the container."""
    import numpy as np

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    lum = img @ np.array([0.299, 0.587, 0.114])
    head = [float(w), float(h), w / h, float(lum.mean() / 255.0)]
    cells = []
    for gy in range(3):
        for gx in range(4):
            cell = lum[
                gy * h // 3 : max(gy * h // 3 + 1, (gy + 1) * h // 3),
                gx * w // 4 : max(gx * w // 4 + 1, (gx + 1) * w // 4),
            ]
            cells.append(float(cell.mean() / 255.0))
    return head + cells


def _ppm_features(payload: bytes) -> list[float]:
    """Real image features over the P6 decode (layout:
    :func:`_rgb_grid_features`)."""
    w, h, pixels = _ppm_decode(payload)
    return _rgb_grid_features(w, h, pixels)


# ---------------------------------------------------------------------
# Real COMPRESSED image codec: PNG, stdlib-only (zlib) + numpy
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (type, data) for each PNG chunk, CRC-VALIDATED — a flipped
    bit anywhere raises ``ValueError`` → the corrupt-asset path (the
    same drop-and-log contract as the WAV/PPM codecs and the
    reference's decode loop, KafkaConnectorPageSource.java:300-308)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (None/Sub/Up/Average/Paeth
    — RFC 2083 §6). Sub/Average/Paeth reconstruct from the already-
    decoded left neighbor, so rows are inherently sequential; the
    byte loop is fine at asset scale (each asset decodes wholly inside
    its Arrow batch — the parallelism axis is assets, not pixels)."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        if pos + 1 + stride > len(raw):
            raise ValueError("PNG pixel data truncated")
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = row
    return bytes(out)


def _png_decode(payload: bytes) -> tuple[int, int, bytes]:
    """REAL compressed-image decode, stdlib+numpy: chunk walk with CRC
    checks, zlib inflate of the IDAT stream, scanline unfilter, color
    normalization to RGB. Supports the 8-bit non-interlaced color
    types: 0 (gray — replicated), 2 (RGB), 3 (palette via PLTE),
    6 (RGBA — alpha dropped; callers wanting compositing own it).
    Returns (w, h, rgb_bytes). This retires the round-12 'compressed
    image formats stay stubbed' gap for PNG."""
    import struct
    import zlib

    w = h = None
    bitdepth = ctype = interlace = None
    plte = b""
    idat = bytearray()
    for name, data in _png_chunks(payload):
        if name == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"PNG IHDR length {len(data)} != 13")
            w, h, bitdepth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if w <= 0 or h <= 0:
                raise ValueError(f"PNG dimensions {w}x{h} invalid")
        elif name == b"PLTE":
            plte = data
        elif name == b"IDAT":
            idat += data
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8 or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (bitdepth={bitdepth}, "
            f"interlace={interlace}); this codec handles 8-bit "
            f"non-interlaced images"
        )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * channels
    pix = _png_unfilter(raw, h, stride, channels)

    import numpy as np

    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, channels)
    if ctype == 0:
        rgb = np.repeat(arr, 3, axis=2)
    elif ctype == 2:
        rgb = arr
    elif ctype == 3:
        if len(plte) < 3:
            raise ValueError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[idx]
    else:  # 6: RGBA
        rgb = arr[:, :, :3]
    return w, h, rgb.tobytes()


def _png_encode(w: int, h: int, rgb: bytes, filters: str = "cycle") -> bytes:
    """Encode raw RGB as a real PNG (color type 2, 8-bit). ``filters``
    picks the per-row filter: ``"none"`` (type 0 everywhere) or
    ``"cycle"`` (row r uses type r % 5) — cycling makes every encoded
    image exercise ALL five unfilter paths on decode, so round-trip
    tests and the oracle-gated decode row cover the whole filter
    matrix, not just the trivial one."""
    import struct
    import zlib

    if len(rgb) != w * h * 3:
        raise ValueError(f"rgb length {len(rgb)} != {w}x{h}x3")
    stride = w * 3
    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        row = rgb[r * stride : (r + 1) * stride]
        ftype = (r % 5) if filters == "cycle" else 0
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:
            filt = bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:
            filt = bytes(
                (row[i] - (((row[i - 3] if i >= 3 else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # 4: Paeth
            filt = bytearray()
            for i in range(stride):
                a = row[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt.append((row[i] - pred) & 0xFF)
            filt = bytes(filt)
        out.append(ftype)
        out += filt
        prev = row

    def chunk(name: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + name
            + data
            + struct.pack(">I", zlib.crc32(name + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _png_resize(payload: bytes, dst_w: int, dst_h: int) -> tuple[int, int, bytes]:
    """Real resize of a PNG (shared :func:`_resize_rgb` gather),
    re-encoded as PNG. Returns (src_w, src_h, resized-PNG bytes)."""
    w, h, rgb = _png_decode(payload)
    return w, h, _png_encode(dst_w, dst_h, _resize_rgb(w, h, rgb, dst_w, dst_h))


def _png_features(payload: bytes) -> list[float]:
    """Same feature contract as :func:`_ppm_features`, over the REAL
    PNG decode."""
    w, h, rgb = _png_decode(payload)
    return _rgb_grid_features(w, h, rgb)


# ---------------------------------------------------------------------
# Real ANIMATED compressed codec: GIF (LZW), stdlib-only + numpy
# ---------------------------------------------------------------------


def _gif_lzw_decode(mcs: int, data: bytes) -> bytes:
    """GIF-variant LZW decompression (variable code width 3..12 bits,
    little-endian bit packing, CLEAR/EOI codes) — the compressed core
    of the format, implemented from the GIF89a spec appendix. Returns
    the palette-index stream. Malformed streams raise ValueError."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def reset():
        return {i: bytes([i]) for i in range(1 << mcs)}, mcs + 1

    table, width = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                # missing EOI: tolerate (many encoders in the wild do
                # this) — the index stream so far is the image
                return bytes(out)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"GIF LZW first code {code} not a literal")
        elif code in table:
            entry = table[code]
        elif code == len(table) + 2:  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None:
            nxt = len(table) + 2
            if nxt <= 0xFFF:  # table full at 4096: stop adding (the
                # deferred-clear convention; codes stay ≤ 12 bits)
                table[nxt] = prev + entry[:1]
                if nxt + 1 == (1 << width) and width < 12:
                    width += 1
        prev = entry


def _gif_lzw_encode(mcs: int, indices: bytes) -> bytes:
    """GIF-variant LZW compression — the exact inverse of
    :func:`_gif_lzw_decode`: emits CLEAR first, resets the dictionary
    when it fills at 12 bits (the spec's deflate-on-overflow rule),
    ends with EOI."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(1 << mcs)}
    nxt = eoi + 1
    width = mcs + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if nxt <= 0xFFF:
            # assign, then grow width when the JUST-ASSIGNED slot
            # equals 2^width — one assignment LATER than the decoder's
            # rule, because the decoder's additions lag the encoder's
            # by exactly one code (it adds nothing for the first code
            # after a clear): with this offset both sides switch
            # before the same code in the stream. (Deriving this the
            # wrong way round desyncs at every width boundary — the
            # round-trip test catches it immediately.)
            table[cand] = nxt
            nxt += 1
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        else:
            # table full: CLEAR and restart the dictionary
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            nxt = eoi + 1
            width = mcs + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_need(payload: bytes, pos: int, n: int, what: str) -> None:
    """Every fixed-size read goes through this guard so truncation is
    ALWAYS a ValueError (the corrupt-asset lane) — a bare struct.unpack
    on a short slice raises struct.error, which escapes the
    drop-and-log handlers (round-13 fourth review)."""
    if pos + n > len(payload):
        raise ValueError(f"truncated GIF: {what} needs {n} bytes at {pos}")


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        chunks.append(payload[pos : pos + n])
        pos += n


def gif_frame_count(payload: bytes) -> int:
    """REAL frame count from the container — a block walk over image
    descriptors (sub-block SKIPS, no LZW decode): exactly what a
    frame-sampling planner needs, at metadata cost."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _gif_need(payload, 6, 7, "logical screen descriptor")
    _w, _h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return frames
        if b == 0x21:  # extension: label + sub-blocks
            _gif_need(payload, pos, 1, "extension label")
            pos += 1
            _data, pos = _gif_subblocks(payload, pos)
        elif b == 0x2C:  # image descriptor
            _gif_need(payload, pos, 9, "image descriptor")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            _gif_need(payload, pos, 1, "LZW min code size")
            pos += 1
            _data, pos = _gif_subblocks(payload, pos)
            frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF stream ended without trailer")


def _gif_decode(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, list[bytes]]:
    """REAL animated-GIF decode: LZW per frame, frames composited onto
    the running canvas (disposal 'none/keep' draws over; 'restore to
    background' clears the frame's region to the GLOBAL background;
    transparency via the GCE index, whose scope per GIF89a is exactly
    ONE following image block). 8-bit palettes, non-interlaced.
    ``max_frames`` returns early after composing that many frames —
    the feature lane reads only frame 0 and must not pay the whole
    animation's LZW work. Returns (w, h, [HxWx3 RGB bytes per
    frame]); every malformation raises ValueError (the corrupt-asset
    lane — no struct.error/IndexError escapes, round-13 fourth
    review)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _gif_need(payload, 6, 7, "logical screen descriptor")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if w <= 0 or h <= 0:
        raise ValueError(f"GIF dimensions {w}x{h} invalid")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct)
        else np.zeros(3, np.uint8)
    )
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[bytes] = []
    transparent = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            return w, h, frames
        if b == 0x21:
            _gif_need(payload, pos, 1, "extension label")
            label = payload[pos]
            pos += 1
            data, pos = _gif_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        _gif_need(payload, pos, 9, "image descriptor")
        left, top, fw, fh, ipacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported by this codec")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
            if len(ct) != 3 * n:
                raise ValueError("truncated GIF local color table")
            ct = ct.reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        _gif_need(payload, pos, 1, "LZW min code size")
        mcs = payload[pos]
        pos += 1
        data, pos = _gif_subblocks(payload, pos)
        idx = _gif_lzw_decode(mcs, data)
        if len(idx) < fw * fh:
            raise ValueError(
                f"GIF frame pixel data short: {len(idx)} < {fw * fh}"
            )
        ia = np.frombuffer(idx[: fw * fh], np.uint8).reshape(fh, fw)
        if int(ia.max(initial=0)) >= len(ct):
            raise ValueError("GIF palette index out of range")
        region = canvas[top : top + fh, left : left + fw]
        if region.shape[:2] != (fh, fw):
            raise ValueError("GIF frame exceeds logical screen")
        rgb = ct[ia]
        if transparent is not None:
            mask = ia != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.tobytes())
        if max_frames is not None and len(frames) >= max_frames:
            return w, h, frames
        if disposal == 2:  # restore region to the GLOBAL background —
            # not the frame's local palette at the background INDEX,
            # which is a different (or out-of-range) color entirely
            region[:, :] = bg_rgb
        # GCE scope is exactly one image block (GIF89a §23): a frame
        # with no GCE of its own must not inherit the previous one's
        # transparency/disposal
        transparent = None
        disposal = 0
    raise ValueError("GIF stream ended without trailer")


def _gif_encode(w: int, h: int, frames: list[bytes]) -> bytes:
    """Encode full-frame RGB frames as an animated GIF (global palette
    built from the frames' distinct colors — ≤256 or ValueError; real
    LZW). The fixture/writer half that makes round-trip tests and the
    oracle-gated frame-sampling row possible without PIL."""
    import struct

    import numpy as np

    if not frames:
        raise ValueError("GIF needs at least one frame")
    stack = np.stack(
        [np.frombuffer(f, np.uint8).reshape(h, w, 3) for f in frames]
    )
    colors, inverse = np.unique(
        stack.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors > 256 (quantize first)")
    size_pow = max(1, (len(colors) - 1).bit_length())
    table = np.zeros((2 << (size_pow - 1), 3), np.uint8)
    table[: len(colors)] = colors
    idx_frames = inverse.astype(np.uint8).reshape(len(frames), h, w)
    mcs = max(2, size_pow)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_pow - 1), 0, 0)
    out += table.tobytes()
    for fr in idx_frames:
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        lzw = _gif_lzw_encode(mcs, fr.tobytes())
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _gif_features(payload: bytes) -> list[float]:
    """First-frame grid features (shared :func:`_rgb_grid_features`
    layout) — the still-image view of an animated asset. Decodes ONLY
    frame 0 (``max_frames=1``): the feature lane must not pay a
    100-frame animation's full LZW work per asset."""
    w, h, frames = _gif_decode(payload, max_frames=1)
    if not frames:
        raise ValueError("GIF has no frames")
    return _rgb_grid_features(w, h, frames[0])


def _wav_features(payload: bytes) -> list[float]:
    """Real audio feature extraction, stdlib-only: parse the RIFF/WAVE
    container with ``wave``, unpack PCM with ``struct``, and emit a
    :data:`STUB_FEATURE_DIM`-dim vector — 4 header features
    (channels, sample rate, frames, duration seconds) + 12 per-slice
    RMS energies (the payload split into 12 equal time slices),
    normalized to [0, 1] by the sample-width max. Malformed WAV bytes
    raise ``ValueError`` → the corrupt-asset path."""
    import io
    import math
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            rate = w.getframerate()
            n_frames = w.getnframes()
            width = w.getsampwidth()
            pcm = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"malformed WAV payload: {e}") from e
    if width == 1:  # unsigned 8-bit
        samples = [b - 128 for b in pcm]
        full = 128.0
    elif width == 2:  # signed little-endian 16-bit
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
        full = 32768.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    duration = n_frames / rate if rate else 0.0
    head = [float(n_channels), float(rate), float(n_frames), duration]
    n_slices = STUB_FEATURE_DIM - len(head)
    if not samples:
        return head + [0.0] * n_slices
    per = max(1, math.ceil(len(samples) / n_slices))
    energies = []
    for i in range(n_slices):
        chunk = samples[i * per : (i + 1) * per]
        if chunk:
            rms = math.sqrt(sum(s * s for s in chunk) / len(chunk)) / full
        else:
            rms = 0.0
        energies.append(rms)
    return head + energies


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model the fixture text as a binary asset: payload = UTF-8 bytes,
    metadata = typed struct — the shape a real (image, metadata) table
    has after ingestion.

    Parallelism is fixed *here*, before the bytes exist: a one-file
    test scan yields one partition, and repartitioning the small source
    rows is cheap, whereas repartitioning downstream would shuffle the
    payload bytes themselves. At scale the scan already has enough
    splits and this is a no-op."""
    df = ensure_min_parallelism(df)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("size_bytes"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata/feature extraction over (payload, meta).

    Computes deterministic byte-level features (size, md5) in Python —
    bit-identical to the SQL ``md5``/``octet_length`` the oracle uses —
    and runs :func:`decode_payload` per asset: mimes with a real codec
    (``audio/wav``) report ``decoded=True`` and the actual feature
    dimensionality; codec-less mimes report ``decoded=False`` with the
    stub dimensionality (the oracle's contract for text/plain).
    """

    # No repartition here, deliberately: at scale the parquet/Kafka scan
    # already yields one partition per split (maxPartitionBytes), and a
    # repartition would shuffle the binary payloads — the most expensive
    # bytes in the table — just to rearrange them. If a caller needs more
    # parallelism on a tiny input, lower maxPartitionBytes at read time.
    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            mimes = [m["mime"] for m in pdf["meta"]]
            dims, decoded = [], []
            for p, m in zip(payloads, mimes):
                try:
                    vec = decode_payload(bytes(p), m)
                    dims.append(len(vec))
                    decoded.append(True)
                except (NotImplementedError, ValueError):
                    # NotImplementedError: no codec for this mime.
                    # ValueError: a REAL codec judged the payload
                    # corrupt/unsupported — the A14 drop-and-log lane
                    # as a decoded=False row (round-13 third review:
                    # the uncaught ValueError failed the whole job,
                    # despite the codecs' documented contract)
                    dims.append(STUB_FEATURE_DIM)
                    decoded.append(False)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": mimes,
                    "size_bytes": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "feature_dim": dims,
                    "decoded": decoded,
                }
            )
            out["feature_dim"] = out["feature_dim"].astype("int32")
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


#: Output contract of the (stubbed) image-resize stage.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(assets: DataFrame, dst_w: int = 224, dst_h: int = 224) -> DataFrame:
    """Image-resize stage over (payload, meta) assets via mapInPandas.

    PPM (P6) assets resize for REAL — :func:`_ppm_resize` does a
    vectorized nearest-neighbor gather and re-encodes P6 bytes, so
    ``src_w``/``src_h`` are the decoded header dims and ``resized`` is a
    valid image. Mimes without a codec keep the deterministic fake
    (dims derived from payload length, replayable in SQL so the oracle
    can check the plumbing; ``resized`` = first 64 payload bytes).
    Either way the distributed contract is identical: narrow
    mapInPandas, no shuffle, payload bytes never leave their partition.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "src_w": [], "src_h": [], "dst_w": [], "dst_h": [], "resized": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                p = bytes(payload)
                try:
                    if meta["mime"] in ("image/x-portable-pixmap", "image/ppm"):
                        sw, sh, resized = _ppm_resize(p, dst_w, dst_h)
                    elif meta["mime"] == "image/png":
                        sw, sh, resized = _png_resize(p, dst_w, dst_h)
                    else:
                        sw, sh, resized = (
                            len(p) % 640 + 32, len(p) % 480 + 32, p[:64]
                        )
                except ValueError:
                    # corrupt image asset: DROP the row (the reference's
                    # A14 drop-and-log decode contract) instead of
                    # failing the whole stage on one bad payload
                    continue
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(sw)
                rows["src_h"].append(sh)
                rows["dst_w"].append(dst_w)
                rows["dst_h"].append(dst_h)
                rows["resized"].append(resized)
            out = pd.DataFrame(rows)
            for c in ("src_w", "src_h", "dst_w", "dst_h"):
                out[c] = out[c].astype("int32")
            yield out

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)


def resize_images_oracle(
    table: str, text_col: str, id_col: str, dst_w: int = 224, dst_h: int = 224
) -> str:
    """Deterministic-fake resize metadata replayed in SQL (the binary
    column is excluded — DuckDB and Spark render binaries differently,
    and the pixels are fake anyway)."""
    size = f"octet_length(encode({text_col}))"
    return f"""
    SELECT {id_col} AS doc_id,
           ({size} % 640 + 32)::INTEGER AS src_w,
           ({size} % 480 + 32)::INTEGER AS src_h,
           {dst_w}::INTEGER AS dst_w,
           {dst_h}::INTEGER AS dst_h
    FROM {table}
    """


#: Output contract of the (stubbed) video frame-sampling stage: one row
#: per sampled frame — the exploded shape downstream vision encoders eat.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling stage: emit every ``every_n``-th frame index per
    asset. For ``image/gif`` the frame count is REAL (round 13 —
    :func:`gif_frame_count`, a container block-walk with no LZW
    decode: exactly the metadata read a frame planner wants); other
    mimes keep the deterministic fake (payload bytes / 100 + 1,
    standing in for ffmpeg container parsing). Corrupt animated assets
    are DROPPED (the A14 lane).

    Note the fan-out shape: mapInPandas may emit more rows than it
    consumes — the contract a real frame extractor needs.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frames": []}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] == "image/gif":
                    try:
                        n_frames = gif_frame_count(bytes(payload))
                    except ValueError:
                        continue  # corrupt asset: drop, never fail
                else:
                    n_frames = len(payload) // 100 + 1
                for idx in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows, dtype="int64")

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


def sample_frames_oracle(table: str, text_col: str, id_col: str, every_n: int = 8) -> str:
    n_frames = f"(octet_length(encode({text_col})) // 100 + 1)"
    return f"""
    SELECT {id_col} AS doc_id,
           unnest(range(0, {n_frames}, {every_n}))::BIGINT AS frame_idx,
           {n_frames}::BIGINT AS n_frames
    FROM {table}
    """


def extract_features_oracle(table: str, text_col: str, id_col: str) -> str:
    """The extractor's deterministic features, replayed in SQL."""
    return f"""
    SELECT {id_col} AS doc_id,
           'text/plain' AS mime,
           octet_length(encode({text_col}))::BIGINT AS size_bytes,
           md5({text_col}) AS content_md5,
           {STUB_FEATURE_DIM}::INTEGER AS feature_dim,
           FALSE AS decoded
    FROM {table}
    """

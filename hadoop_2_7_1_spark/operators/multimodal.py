"""Multimodal column plumbing (north-star addition).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct, processed by REAL pure-stdlib codecs (``struct``/``zlib``):

- image metadata: PNG IHDR / GIF LSD / JPEG SOF marker walk / BMP DIB
  header parsing (``parse_image_header``) — works on any real image file;
- image pixels: full PNG decode (all five spec scanline filters),
  nearest-neighbor resize, re-encode (``png_decode``/``png_resize``);
- video: animated-GIF frame extraction via a complete LZW decoder
  (``gif_decode_frames``/``sample_video_frames``);
- audio: RIFF/WAVE PCM parsing + windowed RMS / zero-crossing features
  (``parse_wav``/``audio_features``).

JPEG entropy decode and MP4/H.264 stay out of scope (they need libjpeg/
ffmpeg, absent from this container) and are detected and skipped cleanly.

Scale notes: binary payloads ride in Arrow record batches (zero-copy to
pandas); keep ``spark.sql.files.maxPartitionBytes`` at the default 128 MB so
a partition of blobs fits executor memory, and repartition by a content hash
before decode so skewed sources don't pile onto one task.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
    ]
)

DECODE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fmt", StringType()),
    ]
)


def parse_image_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """(fmt, width, height) from real image magic bytes — pure stdlib.

    Handles PNG (IHDR, spec §11.2.2), GIF87a/89a (logical screen
    descriptor), JPEG (marker walk to the first SOFn frame header), and BMP
    (BITMAPINFOHEADER). Unknown/truncated payloads → (None, None, None).
    """
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    if n >= 4 and payload[:2] == b"\xff\xd8":
        # Walk segments; SOFn (C0-CF except C4/C8/CC) carries height/width.
        i = 2
        while i + 4 <= n:
            if payload[i] != 0xFF:
                break
            # ISO 10918 §B.1.1.2: any number of 0xFF fill bytes may precede
            # a marker — skip them instead of misreading one as a length
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI: no frame header found
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return "jpeg", w, h
                break
            i += 2 + seg_len
        return "jpeg", None, None
    if n >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return "bmp", w, abs(h)
    return None, None, None


def decode_image_meta(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Extract (n_bytes, width, height, fmt) per blob via Arrow-batched UDF.

    Real header decode (``parse_image_header``) over Arrow record batches:
    the reference has no media pipeline at all; this is the north-star
    extension, built the way a 100 TB decode stage should be — binary
    columns stay in Arrow, Python touches only the first ~tens of bytes of
    each blob, and the output is a narrow typed table.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[content_col]]
            metas = [parse_image_header(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.array([len(b) for b in blobs], dtype="Int64"),
                    "width": pd.array([m[1] for m in metas], dtype="Int64"),
                    "height": pd.array([m[2] for m in metas], dtype="Int64"),
                    "fmt": [m[0] for m in metas],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(run, DECODE_META_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic blob builders: real format-conformant byte streams (used by
# documents_as_media so the decode path exercises genuine parsing while
# remaining oracle-predictable; also handy as test fixtures).
# ---------------------------------------------------------------------------

def make_png(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG stream (signature + IHDR + IEND,
    correct CRCs). 45 bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    out = [b"\x89PNG\r\n\x1a\n"]
    for typ, data in ((b"IHDR", ihdr), (b"IEND", b"")):
        out.append(struct.pack(">I", len(data)))
        out.append(typ)
        out.append(data)
        out.append(struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    return b"".join(out)


def make_gif(width: int, height: int) -> bytes:
    """GIF87a header + logical screen descriptor + trailer. 14 bytes."""
    return b"GIF87a" + struct.pack("<HHBBB", width, height, 0, 0, 0) + b"\x3b"


def make_png_with_pixels(width: int, height: int, seed: int) -> bytes:
    """Complete valid PNG with a deterministic RGB gradient — the pixel
    fixture for the real decode/resize path (and for any external PNG
    reader; the stream is spec-conformant)."""
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px.append((x * 7 + seed) % 256)
            px.append((y * 11 + seed * 3) % 256)
            px.append((x + y + seed * 5) % 256)
    return png_encode(width, height, 3, bytes(px))


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + single-component SOF0 frame header + EOI. 17 bytes."""
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
    return (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof0))
        + sof0
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (zlib + struct): decode -> unfilter -> resize ->
# re-encode. Full pixel path for 8-bit gray/RGB/RGBA PNGs; enough for a real
# distributed resize stage without PIL in the container. JPEG/GIF pixel
# decode stays out of scope (entropy coders), detected and skipped cleanly.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit depth only)


def png_decode(payload: bytes):
    """(width, height, channels, bytearray pixels) from a real PNG stream.

    Implements the PNG spec's five scanline filters (None/Sub/Up/Average/
    Paeth, spec §9) over the zlib-inflated IDAT stream. Returns None for
    non-PNG input or unsupported bit depths / interlacing.
    """
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    # Crawl-data contract: corrupt streams (bad IDAT zlib, truncated pixel
    # data, short IHDR) are skipped (None), never task-fatal — matching
    # gif_decode_frames/parse_wav.
    try:
        pos, width = 8, None
        idat = bytearray()
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"IHDR":
                width, height = struct.unpack_from(">II", data, 0)
                depth, color, _, _, interlace = data[8:13]
                if depth != 8 or color not in _PNG_CHANNELS or interlace:
                    return None
                ch = _PNG_CHANNELS[color]
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen
        if width is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = width * ch
        if len(raw) < height * (1 + stride):
            return None
        out = bytearray(height * stride)
        prev = bytearray(stride)
        src = 0
        for y in range(height):
            ftype = raw[src]
            line = bytearray(raw[src + 1 : src + 1 + stride])
            src += 1 + stride
            if ftype == 1:  # Sub
                for i in range(ch, stride):
                    line[i] = (line[i] + line[i - ch]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            out[y * stride : (y + 1) * stride] = line
            prev = line
        return width, height, ch, out
    except (zlib.error, IndexError, ValueError, struct.error):
        return None


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG (filter 0 scanlines, one zlib IDAT)."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    out = [b"\x89PNG\r\n\x1a\n"]
    for typ, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(bytes(raw), 6)),
                      (b"IEND", b"")):
        out.append(struct.pack(">I", len(data)))
        out.append(typ)
        out.append(data)
        out.append(struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    return b"".join(out)


def png_resize(payload: bytes, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resize of a PNG payload; None if not decodable."""
    decoded = png_decode(payload)
    if decoded is None:
        return None
    sw, sh, ch, px = decoded
    sstride, dstride = sw * ch, width * ch
    dst = bytearray(height * dstride)
    for y in range(height):
        sy = min(sh - 1, y * sh // height)
        row = sy * sstride
        drow = y * dstride
        for x in range(width):
            sx = min(sw - 1, x * sw // width) * ch
            dst[drow + x * ch : drow + (x + 1) * ch] = px[row + sx : row + sx + ch]
    return png_encode(width, height, ch, bytes(dst))


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Distributed image resize: Arrow-batched ``mapInPandas`` over binary
    blobs, real PNG pixel path (decode → unfilter → nearest-neighbor →
    re-encode) in pure stdlib. Non-PNG payloads pass through with
    resized=false (pixel decode for JPEG/GIF needs entropy coders — out of
    scope without PIL/ffmpeg, declared)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, flags = [], [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                resized = png_resize(b, width, height)
                ids.append(int(media_id))
                blobs.append(resized if resized is not None else b)
                flags.append(resized is not None)
            yield pd.DataFrame(
                {"media_id": ids, "content": blobs, "resized": flags}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(run, "media_id long, content binary, resized boolean")


# ---------------------------------------------------------------------------
# Animated-GIF frame container (pure stdlib): LZW decode + a minimal
# clear-code-heavy encoder. GIF is the one motion format decodable without
# entropy-coder libraries, so it serves as the real "video" container for
# the frame-sampling stage; MP4/H.264 stays out of scope without ffmpeg.
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW (GIF89a spec appendix F): variable-width codes,
    CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = min_code_size + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    reset()
    acc = n_bits = 0
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n_bits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode_uncompressed(indices: bytes, min_code_size: int) -> bytes:
    """Valid LZW stream that never grows the table: emit each pixel as a
    literal code with a CLEAR before the table would expand past the code
    width (the classic 'uncompressed GIF' technique)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    acc = n_bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += code_size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    emit(clear)
    budget = (1 << code_size) - eoi - 2  # codes before width would grow
    count = 0
    for idx in indices:
        emit(idx)
        count += 1
        if count >= budget:
            emit(clear)
            count = 0
    emit(eoi)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gray_palette() -> bytes:
    return bytes(v for g in range(256) for v in (g, g, g))


def make_gif_animated(frames: list[bytes], width: int, height: int) -> bytes:
    """GIF89a with one 8-bit grayscale frame per entry of ``frames`` (each
    a width*height bytes index/intensity array). Spec-conformant; readable
    by any GIF decoder."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    out += _gray_palette()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fr in frames:
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # GCE: 2cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW min code size
        stream = _lzw_encode_uncompressed(fr, 8)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"
    return bytes(out)


def _gif_frames_raw(payload: bytes):
    """Yield (idx, width, height, min_code_size, lzw_bytes) per
    NON-interlaced frame without decoding — the cheap sub-block walk.
    Interlaced frames (fpacked & 0x40: 4-pass row order) are skipped, like
    png_decode skips interlaced PNGs. Truncated/corrupt streams raise
    (callers guard)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return
    packed = struct.unpack("<HHBBB", payload[6:13])[2]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))  # skip global color table
    idx = 0
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            break  # unknown block: bail cleanly
        _, _, fw, fh, fpacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))  # local color table
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            n = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        if not fpacked & 0x40:  # skip interlaced frames
            yield idx, fw, fh, bytes(lzw), mcs
        idx += 1


def gif_decode_frames(payload: bytes) -> list[tuple[int, int, bytearray]]:
    """All non-interlaced frames of a GIF as (width, height, gray/index
    bytes). Pure stdlib; handles GCT, extensions, sub-block framing,
    per-frame LZW. Truncated/corrupt payloads yield the frames parsed so
    far (never raise — crawl data contains cut-off files)."""
    frames = []
    try:
        for _, fw, fh, lzw, mcs in _gif_frames_raw(payload):
            frames.append((fw, fh, _lzw_decode(lzw, mcs, fw * fh)))
    except (struct.error, IndexError):
        pass
    return frames


def sample_video_frames(
    df: DataFrame, every_n: int, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Frame sampling over a motion container, for real: every ``every_n``-th
    frame of each animated GIF is LZW-decoded and re-encoded as a grayscale
    PNG row (media_id, frame_idx, width, height, frame_png). Arrow-batched;
    blobs that aren't GIFs yield no rows. MP4/H.264 would slot in here
    behind the same signature given ffmpeg — not present in this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, pngs = [], [], [], [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    # walk all frames cheaply; LZW-decode ONLY sampled ones
                    for i, fw, fh, lzw, mcs in _gif_frames_raw(bytes(blob)):
                        if i % every_n:
                            continue
                        px = _lzw_decode(lzw, mcs, fw * fh)
                        ids.append(int(media_id))
                        idxs.append(i)
                        ws.append(fw)
                        hs.append(fh)
                        pngs.append(png_encode(fw, fh, 1, bytes(px)))
                except (struct.error, IndexError):
                    continue  # truncated blob: keep frames gathered so far
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "width": ws,
                 "height": hs, "frame_png": pngs}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(
        run,
        "media_id long, frame_idx long, width long, height long, frame_png binary",
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: deterministic REAL image blobs.

    Each document becomes a genuine format-conformant byte stream (PNG, GIF,
    or JPEG cycling on doc_id % 3) whose declared dimensions derive from
    md5(text) — so ``decode_image_meta`` exercises real header parsing and
    the DuckDB oracle can still predict every output value. Blob synthesis
    runs in the same Arrow-batched form a real binary column would arrive in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = (make_png, make_gif, make_jpeg)
        for pdf in batches:
            blobs = []
            for doc_id, text in zip(pdf["media_id"], pdf["text"]):
                h = hashlib.md5(str(text).encode("utf-8")).hexdigest()
                w = 64 + int(h[:8], 16) % 512
                ht = 64 + int(h[8:16], 16) % 512
                blobs.append(makers[int(doc_id) % 3](w, ht))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": blobs,
                    "media_type": ["image"] * len(blobs),
                }
            )

    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"), F.col("text")
    ).mapInPandas(run, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality (pure stdlib): RIFF/WAVE PCM parsing + windowed features.
# The classic first stage of an audio data pipeline — format metadata, then
# frame-level energy/zero-crossing features over fixed windows.
# ---------------------------------------------------------------------------

def make_wav(samples: list[int], rate: int = 16000) -> bytes:
    """Canonical RIFF/WAVE, 16-bit PCM mono. Spec-conformant (fmt + data
    chunks); readable by any WAV tool."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_len = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def parse_wav(payload: bytes):
    """(rate, channels, bits, samples list) from RIFF/WAVE PCM bytes; walks
    chunks so extra chunks (LIST, fact, ...) and any fmt/data order are
    tolerated. None for anything that isn't 16-bit PCM WAVE — including
    truncated/corrupt streams (crawl data; never raises)."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos = 12
        rate = channels = bits = None
        data_body: bytes | None = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + clen]
            if cid == b"fmt ":
                audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if audio_fmt != 1:
                    return None  # compressed WAV needs codec libs
            elif cid == b"data":
                data_body = body  # decoded after the walk: order-independent
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if rate is None or bits != 16 or data_body is None:
            return None
        samples = [
            struct.unpack_from("<h", data_body, i)[0]
            for i in range(0, len(data_body) - 1, 2)
        ]
        return rate, channels, bits, samples
    except struct.error:
        return None


def make_avi(
    width: int, height: int, n_frames: int, us_per_frame: int = 33333
) -> bytes:
    """Minimal spec-conformant RIFF/AVI: RIFF('AVI ') containing
    LIST('hdrl') with the 56-byte 'avih' MainAVIHeader (public AVI RIFF
    spec / Windows avifmt.h layout). No stream data — the header is what a
    metadata-extraction stage reads."""
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, n_frames, 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    body = b"AVI " + lst
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_header(payload: bytes):
    """(width, height, n_frames, us_per_frame) from RIFF/AVI bytes: walk
    the top-level chunks, enter LIST('hdrl'), read 'avih'. None for
    non-AVI / truncated / corrupt streams (crawl contract — never raises)."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + clen]
            if cid == b"LIST" and body[:4] == b"hdrl":
                sub = 4
                while sub + 8 <= len(body):
                    scid = body[sub : sub + 4]
                    (slen,) = struct.unpack_from("<I", body, sub + 4)
                    if scid == b"avih" and slen >= 40 and sub + 8 + slen <= len(body):
                        # avifmt.h MainAVIHeader field order
                        vals = struct.unpack_from("<10I", body, sub + 8)
                        return vals[8], vals[9], vals[4], vals[0]
                    sub += 8 + slen + (slen & 1)
            pos += 8 + clen + (clen & 1)
        return None
    except struct.error:
        return None


def decode_video_meta(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Per-blob AVI container metadata (width, height, n_frames,
    us_per_frame) via Arrow-batched ``mapInPandas`` — same plumbing as
    :func:`decode_image_meta`; corrupt blobs are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "n_frames": [], "us_per_frame": []}
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_avi_header(bytes(blob))
                if parsed is None:
                    continue
                w, h, frames, us_pf = parsed
                out["media_id"].append(int(media_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(frames)
                out["us_per_frame"].append(us_pf)
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(
        run,
        "media_id long, width long, height long, n_frames long, us_per_frame long",
    )


def audio_features(
    df: DataFrame, window: int = 64, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Windowed RMS energy + zero-crossing count per full ``window`` of
    samples — the standard cheap audio featurization (VAD/energy gating in
    speech pipelines). Arrow-batched; non-WAV blobs yield no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rmss, zcs = [], [], [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                parsed = parse_wav(bytes(blob))
                if parsed is None:
                    continue
                _, channels, _, samples = parsed
                if channels and channels > 1:
                    # features are defined over ONE stream; take channel 0
                    # of the interleaved frames rather than mixing L/R
                    samples = samples[::channels]
                for w in range(len(samples) // window):
                    seg = samples[w * window : (w + 1) * window]
                    ids.append(int(media_id))
                    widx.append(w)
                    rmss.append((sum(s * s for s in seg) / window) ** 0.5)
                    zcs.append(
                        sum(
                            1
                            for j in range(1, window)
                            if (seg[j] >= 0) != (seg[j - 1] >= 0)
                        )
                    )
            yield pd.DataFrame(
                {"media_id": ids, "win_idx": widx, "rms": rmss, "zero_crossings": zcs}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(
        run, "media_id long, win_idx long, rms double, zero_crossings long"
    )


# ---------------------------------------------------------------------------
# Image augmentation (training-data variants): crop / horizontal flip /
# 90-degree rotation over the decoded PNG pixel path. Deterministic given
# parameters, so the full chain stays oracle-checkable.
# ---------------------------------------------------------------------------

def _px_crop(px, w, h, ch, x0, y0, cw, chh):
    out = bytearray()
    for y in range(y0, y0 + chh):
        row = y * w * ch
        out += px[row + x0 * ch : row + (x0 + cw) * ch]
    return bytes(out), cw, chh


def _px_flip_h(px, w, h, ch):
    out = bytearray()
    for y in range(h):
        row = y * w * ch
        for x in range(w - 1, -1, -1):
            out += px[row + x * ch : row + (x + 1) * ch]
    return bytes(out), w, h


def _px_rot90(px, w, h, ch):
    """Clockwise 90°: out(x, y) = in(y, h-1-x); result is h wide, w tall."""
    out = bytearray()
    for y in range(w):
        for x in range(h):
            sx, sy = y, h - 1 - x
            row = sy * w * ch
            out += px[row + sx * ch : row + (sx + 1) * ch]
    return bytes(out), h, w


def augment_images(
    df: DataFrame,
    crop: tuple[int, int, int, int] | None = None,
    flip_h: bool = False,
    rotate90: bool = False,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Apply a deterministic augmentation chain (crop → flip → rotate) to
    PNG blobs, Arrow-batched; output is re-encoded PNG plus final dims.
    Non-decodable blobs are dropped (same contract as the decode stages)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs = [], [], [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                decoded = png_decode(bytes(blob))
                if decoded is None:
                    continue
                w, h, ch, px = decoded
                if crop is not None:
                    x0, y0, cw, chh = crop
                    if x0 + cw > w or y0 + chh > h:
                        continue  # out-of-bounds crop: skip, don't pad
                    px, w, h = _px_crop(px, w, h, ch, x0, y0, cw, chh)
                if flip_h:
                    px, w, h = _px_flip_h(px, w, h, ch)
                if rotate90:
                    px, w, h = _px_rot90(px, w, h, ch)
                ids.append(int(media_id))
                ws.append(w)
                hs.append(h)
                blobs.append(png_encode(w, h, ch, bytes(px)))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "content": blobs}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(run, "media_id long, width long, height long, content binary")


# ---------------------------------------------------------------------------
# Perceptual hashing (dHash) for image near-dup detection
# ---------------------------------------------------------------------------

def dhash_bytes(payload: bytes) -> str | None:
    """64-bit difference hash of a decodable image, as 16 hex chars.

    Canonical dHash (public recipe): downsample the grayscale image to
    9x8 with nearest-neighbor, set bit x of row y when gray(x+1,y) >
    gray(x,y), pack each row into a byte. Perceptually-identical images
    collide; small edits flip few bits, so Hamming banding on the hex
    string finds near-dups. Returns None on undecodable payloads (crawl
    contract: skip, never crash)."""
    dec = png_decode(payload)
    if dec is None:
        return None
    w, h, ch, px = dec
    def gray(sx: int, sy: int) -> int:
        off = (sy * w + sx) * ch
        if ch >= 3:
            return (px[off] + px[off + 1] + px[off + 2]) // 3
        return px[off]
    rows = []
    for y in range(8):
        sy = min(h - 1, y * h // 8)
        byte = 0
        for x in range(8):
            sx0 = min(w - 1, x * w // 9)
            sx1 = min(w - 1, (x + 1) * w // 9)
            if gray(sx1, sy) > gray(sx0, sy):
                byte |= 1 << x
        rows.append(byte)
    return "".join(f"{b:02x}" for b in rows)


def dhash_images(df: DataFrame, id_col: str = "media_id",
                 content_col: str = "content") -> DataFrame:
    """(media_id, dhash) via the real decode path — Arrow-batched
    ``mapInPandas``, blobs never shuffled (the hash is 16 bytes; grouping
    happens on it, not on the image)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                hx = dhash_bytes(bytes(blob))
                if hx is None:
                    continue
                ids.append(int(media_id))
                hashes.append(hx)
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(run, "media_id long, dhash string")


def scene_cuts(
    df: DataFrame,
    threshold_mad1000: int = 60_000,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Scene-cut detection over motion containers: LZW-decode every frame of
    each animated GIF and score consecutive-frame change as the mean
    absolute pixel difference (MAD). A boundary is a cut when
    ``floor(1000 * Σ|Δpx| / n_pixels) > threshold_mad1000`` — integer
    arithmetic end-to-end, so the verdict is exact at any parallelism.

    Arrow-batched stdlib decode (same whitelisted Python boundary as the
    other mm_* codecs); one row per frame TRANSITION:
    (media_id, frame_idx, mad1000, is_cut). At scale each media blob is one
    task-local decode — no shuffle at all until a downstream rollup.
    """

    thr = int(threshold_mad1000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mads, cuts = [], [], [], []
            for media_id, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames = gif_decode_frames(bytes(blob))
                except (struct.error, IndexError):
                    continue
                for i in range(1, len(frames)):
                    fw, fh, px = frames[i]
                    _, _, prev = frames[i - 1]
                    n = min(len(px), len(prev))
                    sad = sum(abs(px[j] - prev[j]) for j in range(n))
                    mad1000 = (sad * 1000) // (fw * fh)
                    ids.append(int(media_id))
                    idxs.append(i)
                    mads.append(mad1000)
                    cuts.append(mad1000 > thr)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "mad1000": mads,
                 "is_cut": cuts}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(
        run, "media_id long, frame_idx long, mad1000 long, is_cut boolean"
    )

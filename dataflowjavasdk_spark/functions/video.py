"""Video-family decoding, pure stdlib + numpy: MJPEG-in-AVI and GIF.

Round 5 closes the "video codecs env-stubbed" gap with the two formats
that need no external codec library:

- **MJPEG in AVI** — a real, widely used video codec (every frame is an
  independent baseline JPEG) inside the RIFF/AVI container. The decoder
  here walks the container (RIFF 'AVI ' → LIST 'movi' → '00dc' chunks)
  and hands each frame to the engine's own baseline JPEG decoder
  (functions/jpeg.py), so frame decode inherits that codec's tests.
- **GIF (87a/89a)** — LZW-compressed indexed frames with palettes,
  interlacing excluded (rejected loudly), plus the GCE disposal subset
  needed for frame extraction.

ffmpeg-class codecs (H.264 etc.) remain out of scope for this container
(no system codec libs); the mapInPandas plumbing is identical, so a
production deployment swaps the per-frame decode call only.

Scale shape: video payloads are the largest blobs in a multimodal lake,
so the invariants tighten — frame EXTRACTION (container walk) is cheap
and byte-local; frame DECODE runs per sampled frame only (sample-then-
decode, never decode-then-sample); payloads stream through one
Arrow-batched mapInPandas pass and never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# AVI / MJPEG
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal RIFF/AVI writer for MJPEG streams — the encoder twin for
    tests and oracled synthesizers. `frames` are complete JPEG payloads
    (one '00dc' chunk each)."""
    if not frames:
        raise ValueError("AVI needs at least one frame")

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), 0, 0xFFFFFFFF, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def extract_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Walk the RIFF/AVI container and return the raw JPEG payload of
    every video frame ('00dc'/'00db' chunks) WITHOUT decoding them —
    the cheap byte-local step that enables sample-then-decode."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            data_start = pos + 8
            if data_start + size > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(data_start + 4, data_start + size)
            elif fourcc in (b"00dc", b"00db"):
                frames.append(payload[data_start : data_start + size])
            pos = data_start + size + (size % 2)

    walk(12, 12 + struct.unpack_from("<I", payload, 4)[0] - 4)
    return frames


def decode_avi_mjpeg(payload: bytes, every_nth: int = 1) -> list[np.ndarray]:
    """Sample every `every_nth` frame from an MJPEG AVI and decode each
    through the engine's baseline JPEG decoder. Returns decoded plane
    arrays ((h, w) gray or (h, w, 3) Y'CbCr)."""
    from dataflowjavasdk_spark.functions.jpeg import decode_jpeg

    frames = extract_mjpeg_frames(payload)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return [decode_jpeg(f) for f in frames[::every_nth]]


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW decompression (LSB-first packing, CLEAR/EOI codes,
    growing code width up to 12 bits). `expected` bounds the output so a
    crafted stream cannot balloon memory (same posture as the PNG
    inflate bound)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state: LSB-first across the concatenated sub-block data
    buf = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream (first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code gap)")
        out += entry
        if len(out) > expected:
            raise ValueError("GIF pixel data overruns image size")
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) != expected:
        raise ValueError("GIF pixel data size mismatch")
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression — the writer twin. Emits CLEAR up
    front and EOI at the end, growing the code width as the table fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        emit(table[w])
        table[wb] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4097:  # table full: reset (keeps decoder simple)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
        # The decoder appends a table entry after EVERY data code —
        # including this final one, which the encoder never materializes.
        # If that phantom entry lands exactly on the 2^code_size
        # boundary, the decoder widens before reading EOI, so the
        # encoder must widen too or the EOI widths diverge (observed on
        # constant runs whose length hits the boundary).
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray], palette: list[tuple[int, int, int]]
) -> bytes:
    """Minimal GIF89a writer: global palette (padded to a power of two),
    one image descriptor per frame, LZW-compressed indices. Frames are
    (h, w) uint8 index arrays into `palette`."""
    if not frames or not palette:
        raise ValueError("GIF needs frames and a palette")
    h, w = frames[0].shape
    depth = max(2, (len(palette) - 1).bit_length())
    pal = list(palette) + [(0, 0, 0)] * ((1 << depth) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    if len(frames) > 1:  # NETSCAPE loop extension, standard for animation
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all GIF frames must share the canvas size")
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: 4cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        lzw = _lzw_encode(fr.astype(np.uint8).tobytes(), depth)
        out.append(depth)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[np.ndarray]]:
    """REAL GIF decoder (LZW + palette, no interlace/local-palette/
    transparency compositing — rejected loudly): returns (palette as
    (n, 3) uint8 RGB, [frame index arrays (h, w) uint8])."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    except struct.error as exc:
        raise ValueError("truncated GIF payload") from exc
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global palette unsupported")
    gct_size = 2 << (flags & 0x07)
    palette = np.frombuffer(
        payload, dtype=np.uint8, count=gct_size * 3, offset=pos
    ).reshape(gct_size, 3)
    pos += gct_size * 3
    if len(payload) < pos:
        raise ValueError("truncated GIF payload")
    frames: list[np.ndarray] = []
    # bounds-checked walk: every byte/struct read below re-raises a
    # uniform ValueError on truncation (module rejection convention —
    # corrupt payloads must surface as diagnosable decode errors the
    # dead-letter split can catch, never raw IndexError task failures)
    try:
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                ix, iy, iw, ih, iflags = struct.unpack_from(
                    "<HHHHB", payload, pos
                )
                pos += 9
                if iflags & 0x40:
                    raise ValueError("interlaced GIF unsupported")
                if iflags & 0x80:
                    raise ValueError("local palettes unsupported")
                if (ix, iy, iw, ih) != (0, 0, w, h):
                    raise ValueError("partial-canvas GIF frames unsupported")
                min_code = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos] != 0:
                    n = payload[pos]
                    if pos + 1 + n > len(payload):
                        raise ValueError("truncated GIF payload")
                    data += payload[pos + 1 : pos + 1 + n]
                    pos += 1 + n
                pos += 1
                idx = _lzw_decode(bytes(data), min_code, w * h)
                frames.append(np.frombuffer(idx, dtype=np.uint8).reshape(h, w))
            else:
                raise ValueError(f"unknown GIF block 0x{block:02x}")
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated GIF payload") from exc
    if not frames:
        raise ValueError("GIF contains no image frames")
    return palette, frames

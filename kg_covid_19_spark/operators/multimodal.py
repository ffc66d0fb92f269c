"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container has no decode libraries (PIL/ffmpeg). Three REAL codecs
ship anyway — PNG (every profile the spec defines: all five color
types at all legal depths, PLTE palettes, Adam7 interlace), GIF (LZW
+ interlace + color tables) and baseline JPEG
(canonical Huffman + dequant/dezigzag + IDCT + chroma upsample +
YCbCr→RGB), dispatched by magic bytes via ``decode_image`` — while
compressed video stays behind a documented NotImplementedError seam
(uncompressed Y4M frames are real): those genuinely need codec
libraries. The
deterministic fake decoder remains the oracle-paired default so the
registered queries never depend on byte-level codec behavior. Everything
around the seam — the binary column handling, Arrow batch shape,
``mapInPandas`` signature, declared output schema, partition behavior —
is identical for fake and real decoders.

Scale notes: media bytes dominate row size, so the kernel runs via
``mapInPandas`` (per-partition batch iterator) — one Arrow transfer per
batch, no per-row overhead — and the output projects the bytes away so
downstream stages never reshuffle them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.corpus import ensure_min_parallelism, read_table

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("decoder", StringType(), False),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels: gray / RGB / palette-idx / gray+alpha / RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# every (color, depth) combination the PNG spec defines is supported
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec ordering
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: bytes, pos: int, width: int, height: int,
                  depth: int, ch: int) -> tuple[bytes, int]:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/
    Paeth) for one (sub-)image whose filtered rows start at
    ``raw[pos]``; returns (unfiltered rows, next stream position).
    Taking a stream position makes the same routine serve both the
    single whole-image pass and the seven Adam7 sub-images, which are
    filtered independently but share one zlib stream."""
    bpp = max(1, (depth * ch) // 8)  # filter distance, bytes
    stride = (width * depth * ch + 7) // 8  # row bytes (bit-packed rows pad)
    out = bytearray(height * stride)
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        prev = out[(y - 1) * stride:y * stride] if y else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
    return bytes(out), pos


def _png_unpack_row(row: bytes, width: int, depth: int, ch: int) -> list:
    """One unfiltered row -> per-sample ints at native depth. Depths
    below 8 are bit-packed most-significant-first; 16-bit samples are
    big-endian and stay 16-bit here (normalized by the caller)."""
    n = width * ch
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return [(row[2 * i] << 8) | row[2 * i + 1] for i in range(n)]
    per = 8 // depth
    mask = (1 << depth) - 1
    return [(row[x // per] >> (8 - depth * (x % per + 1))) & mask
            for x in range(n)]


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode -> (width, height, channels, raw pixels).

    Real decoding, no codec libraries: chunk walk, IHDR parse, IDAT
    concat + zlib inflate, per-scanline reversal of the five PNG
    filters, PLTE palette expansion, Adam7 de-interlacing, and sample
    normalization. Every profile the PNG spec defines is handled:
    gray at depths 1/2/4/8/16 (low depths scaled to the full 8-bit
    range, 16-bit truncated to the most-significant byte), RGB /
    gray+alpha / RGBA at 8/16, palette at 1/2/4/8, each with or
    without Adam7 interlace. Output is always 8-bit samples."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG byte stream")
    pos, width = 8, None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if (color not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[color]
                    or interlace not in (0, 1)):
                raise ValueError(
                    f"malformed PNG header (depth={depth}, color={color}, "
                    f"interlace={interlace}) — not a spec profile"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0 and depth == 8 and color != 3:
        # fast path (the dominant web profile): one byte per sample,
        # unfiltered rows ARE the output — no per-sample unpacking
        out, _ = _png_unfilter(raw, 0, width, height, depth, ch)
        return width, height, ch, out
    samples = [0] * (width * height * ch)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, width, height, depth, ch)
        stride = (width * depth * ch + 7) // 8
        for y in range(height):
            samples[y * width * ch:(y + 1) * width * ch] = _png_unpack_row(
                rows[y * stride:(y + 1) * stride], width, depth, ch)
    else:
        # Adam7: seven independently-filtered sub-images in one zlib
        # stream, scattered back onto the full-size sample grid
        spos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, spos = _png_unfilter(raw, spos, pw, ph, depth, ch)
            stride = (pw * depth * ch + 7) // 8
            for j in range(ph):
                vals = _png_unpack_row(
                    rows[j * stride:(j + 1) * stride], pw, depth, ch)
                base = ((y0 + j * dy) * width + x0) * ch
                for i in range(pw):
                    o = base + i * dx * ch
                    samples[o:o + ch] = vals[i * ch:(i + 1) * ch]
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = bytearray(width * height * 3)
        for o, k in enumerate(samples):
            if 3 * k + 3 > len(plte):
                raise ValueError(f"palette index {k} out of range")
            rgb[3 * o:3 * o + 3] = plte[3 * k:3 * k + 3]
        return width, height, 3, bytes(rgb)
    if depth == 16:
        # most-significant byte == the spec's 16->8 sample reduction
        return width, height, ch, bytes(v >> 8 for v in samples)
    if depth < 8:
        # scale low-depth gray onto the full 8-bit range (0..mask -> 0..255)
        mask = (1 << depth) - 1
        return width, height, ch, bytes(v * 255 // mask for v in samples)
    return width, height, ch, bytes(samples)


_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(stream: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF-variant LZW: variable-width codes packed LSB-first, CLEAR
    resets the table, widths grow to 12 bits. Standard published
    algorithm (CompuServe GIF89a spec appendix)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(stream) * 8
    while bitpos + code_size <= total_bits and len(out) < max_pixels:
        byte_i, bit_o = divmod(bitpos, 8)
        chunk = int.from_bytes(stream[byte_i:byte_i + 3], "little")
        code = (chunk >> bit_o) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:max_pixels])


def _gif_deinterlace(idx: bytes, w: int, h: int) -> bytes:
    """Reorder 4-pass GIF interlaced rows back to top-to-bottom."""
    rows = [idx[i * w:(i + 1) * w] for i in range(h)]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out: list[bytes | None] = [None] * h
    for row, y in zip(rows, order):
        out[y] = row
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib GIF decode (first frame) → (w, h, 3, RGB pixels).

    Real decoding: header + logical screen descriptor, global/local
    color tables, extension-block skip, sub-block reassembly, LZW
    decompress (variable-width codes, CLEAR handling), optional 4-pass
    de-interlace, palette expansion to RGB. Animated GIFs yield their
    FIRST frame — the common thumbnail/feature-extraction contract."""
    if data[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF byte stream")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: introducer + label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(data[pos + 5:pos + 7], "little")
            ih = int.from_bytes(data[pos + 7:pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = data[pos:pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(stream), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            if iflags & 0x40:
                idx = _gif_deinterlace(idx, iw, ih)
            rgb = bytearray(iw * ih * 3)
            for i, k in enumerate(idx):
                if 3 * k + 3 > len(ct):
                    raise ValueError(f"color index {k} out of range")
                rgb[3 * i:3 * i + 3] = ct[3 * k:3 * k + 3]
            return iw, ih, 3, bytes(rgb)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


# --- baseline JPEG (ITU-T T.81) -------------------------------------------

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_idct_basis = None  # lazy 8x8 DCT-III basis (numpy), built once


def _jpeg_huff_table(bits: bytes, vals: bytes) -> dict:
    """Canonical JPEG Huffman table (T.81 Annex C): BITS counts per code
    length 1..16 + the symbol list in code order → {(length, code): sym}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit cursor over a de-stuffed entropy-coded segment."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        byte_i, bit_o = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        self.pos += 1
        return (self.data[byte_i] >> (7 - bit_o)) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(br: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n received bits to a signed coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _jpeg_decode_block(br: _JpegBits, dc_tab: dict, ac_tab: dict,
                       pred: int) -> tuple[int, list]:
    """One 8x8 block: DC diff + run-length AC (EOB/ZRL), zigzag order."""
    s = _jpeg_huff_decode(br, dc_tab)
    dc = pred + _jpeg_extend(br.receive(s), s)
    coefs = [0] * 64
    coefs[0] = dc
    k = 1
    while k < 64:
        rs = _jpeg_huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coefs[k] = _jpeg_extend(br.receive(s), s)
        k += 1
    return dc, coefs


def _jpeg_idct_8x8(coefs: list, quant: list):
    """Dequantize (zigzag-ordered) coefficients and inverse-DCT one
    block → 8x8 float array, level-shifted to [0, 255]."""
    import numpy as np

    global _idct_basis
    if _idct_basis is None:
        import math

        m = np.zeros((8, 8))
        for u in range(8):
            cu = (1.0 / math.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        _idct_basis = m
    f = np.zeros(64)
    for i in range(64):
        f[_JPEG_ZIGZAG[i]] = coefs[i] * quant[i]
    f = f.reshape(8, 8)
    px = _idct_basis.T @ f @ _idct_basis + 128.0
    return np.clip(np.round(px), 0, 255)


def _jpeg_scan_segments(data: bytes, pos: int) -> list[bytes]:
    """Entropy-coded data from SOS end to the next true marker, split at
    restart markers (FFD0–FFD7) and byte-unstuffed (FF00 → FF)."""
    segments, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next real marker: scan is over
            break
    segments.append(bytes(cur))
    return segments


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-Python baseline JPEG decode → (w, h, channels, pixels).

    Real decoding, no codec libraries: marker walk (DQT 8/16-bit
    tables, DHT canonical Huffman, SOF0/SOF1, DRI, APPn/COM skip),
    entropy decode (byte unstuffing, restart-interval predictor
    resets, DC prediction + EXTEND, AC run-length with EOB/ZRL),
    dequantize + dezigzag, separable float IDCT (numpy, batch-side),
    replicated chroma upsampling for the standard integer sampling
    ratios (4:4:4 / 4:2:2 / 4:2:0), and JFIF YCbCr→RGB. Grayscale
    JPEGs yield channels=1, color channels=3. Progressive (SOF2),
    arithmetic-coded, and 12-bit streams raise NotImplementedError —
    that residue genuinely needs a full codec library."""
    import struct

    import numpy as np

    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG byte stream")
    quant: dict[int, list] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, h_i, v_i, tq)])
    pos = 2
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    quant[tq] = [
                        struct.unpack(">H", body[i + 2 * k:i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
                else:
                    quant[tq] = list(body[i:i + 64])
                    i += 64
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = body[i + 1:i + 17]
                nvals = sum(bits)
                vals = body[i + 17:i + 17 + nvals]
                (huff_ac if tc else huff_dc)[th] = _jpeg_huff_table(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("12-bit JPEG needs a codec library")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) needs a full codec library"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ncomp = body[0]
            scan = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                     body[2 + 2 * c] & 0x0F) for c in range(ncomp)]
            pos += 2 + seg_len
            break
        # APPn / COM / others: skip
        pos += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component pixel planes at native sampling resolution
    planes = {
        cid: np.zeros((mcus_y * v * 8, mcus_x * hh * 8))
        for cid, hh, v, _tq in comps
    }
    comp_info = {cid: (hh, v, tq) for cid, hh, v, tq in comps}
    scan_tabs = {cid: (huff_dc[dct], huff_ac[act]) for cid, dct, act in scan}
    segments = _jpeg_scan_segments(data, pos)
    seg_i = 0
    br = _JpegBits(segments[0])
    preds = {cid: 0 for cid, *_ in comps}
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1  # restart: next segment, fresh predictors
            if seg_i >= len(segments):
                raise ValueError("JPEG missing restart segment")
            br = _JpegBits(segments[seg_i])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(mcu, mcus_x)
        for cid, _dct, _act in scan:
            hh, v, tq = comp_info[cid]
            dc_tab, ac_tab = scan_tabs[cid]
            for by in range(v):
                for bx in range(hh):
                    preds[cid], coefs = _jpeg_decode_block(
                        br, dc_tab, ac_tab, preds[cid]
                    )
                    px = _jpeg_idct_8x8(coefs, quant[tq])
                    y0 = (my * v + by) * 8
                    x0 = (mx * hh + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = px
    # upsample to full resolution (replicate — integer ratios) + crop
    full = []
    for cid, hh, v, _tq in comps:
        p = planes[cid]
        if hh < hmax or v < vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // hh, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return w, h, 1, bytes(full[0].astype(np.uint8).tobytes())
    if len(full) != 3:
        raise NotImplementedError("CMYK/unusual JPEG needs a codec library")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return w, h, 3, bytes(rgb.astype(np.uint8).tobytes())


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Magic-byte dispatch over the shipped pure-stdlib codecs (PNG,
    GIF, baseline JPEG). Video remains the documented seam in
    ``decode_media`` — real Y4M frames ship there; compressed video
    codecs genuinely need libraries absent from this container."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:6] in _GIF_SIGS:
        return decode_gif(data)
    if data[:2] == b"\xFF\xD8":
        return decode_jpeg(data)
    raise NotImplementedError(
        "unrecognized image magic — shipped codecs: PNG, GIF, baseline "
        "JPEG; compressed video needs libraries not present in this "
        "container"
    )


# --- WAV audio (RIFF/WAVE, PCM) -------------------------------------------


def decode_wav(data: bytes) -> tuple[int, int, int, "object"]:
    """Pure-stdlib WAV decode → (n_channels, sample_rate, n_frames,
    samples) with samples a numpy int32 array of shape
    (n_frames, n_channels).

    Real decoding: RIFF/WAVE chunk walk, fmt parse (PCM format 1 at
    8/16/24/32-bit widths — 8-bit is unsigned per the spec, wider
    widths signed little-endian), data chunk de-interleave. Compressed
    formats (IEEE float, ADPCM, MP3-in-WAV) raise NotImplementedError
    — that residue genuinely needs an audio codec library."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE byte stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, n_ch, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {tag} (non-PCM) needs an audio codec "
                    "library"
                )
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"bad PCM bit width {bits}")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_ch, rate, bits = fmt
    width = bits // 8
    n_frames = len(pcm) // (width * n_ch)
    pcm = pcm[:n_frames * width * n_ch]
    if bits == 8:  # unsigned → centered
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    elif bits == 32:
        samples = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
    else:  # 24-bit: sign-extend 3-byte little-endian
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        samples = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        samples -= (samples >> 23) << 24  # two's-complement from bit 23
    return n_ch, rate, n_frames, samples.reshape(n_frames, n_ch)


def _wav_amp_hist_ppm(data: bytes) -> str:
    """REAL audio features: 8-bin amplitude histogram (ppm) over the
    decoded PCM samples, normalized by bit width — same output shape
    as the image/fake feature paths (8 comma-joined integers)."""
    import numpy as np

    _n_ch, _rate, n_frames, samples = decode_wav(data)
    if n_frames == 0:
        return ",".join(["0"] * 8)
    peak = int(np.abs(samples).max()) or 1
    norm = np.minimum((np.abs(samples) * 8) // (peak + 1), 7)
    bins = np.bincount(norm.ravel(), minlength=8)[:8]
    n = samples.size
    return ",".join(str(int(b) * 1_000_000 // n) for b in bins)


def decode_media(data: bytes, decoder: str = "fake-v1") -> tuple[int, int]:
    """Decode media bytes → (width, height).

    'fake-v1' is the deterministic stub the oracle-paired queries run
    on (no codecs assumed); 'png-v1' is a REAL pure-stdlib PNG decode
    (full pixel decode, not just header sniffing — errors in IDAT or
    filters surface here). Other formats (JPEG, video) still need
    libraries absent from this container.
    """
    if decoder == "fake-v1":
        n = len(data)
        return (n % 640) + 1, (n // 640) + 1
    if decoder == "png-v1":
        w, h, _ch, _px = decode_png(data)
        return w, h
    if decoder == "gif-v1":
        w, h, _ch, _px = decode_gif(data)
        return w, h
    if decoder == "jpeg-v1":
        w, h, _ch, _px = decode_jpeg(data)
        return w, h
    if decoder == "image-v1":
        w, h, _ch, _px = decode_image(data)
        return w, h
    raise NotImplementedError(
        f"decoder {decoder!r} requires media libraries not present in this "
        "container; 'fake-v1' (deterministic stub), 'png-v1' / 'gif-v1' / "
        "'jpeg-v1' (pure-stdlib codecs) and 'image-v1' (magic dispatch over "
        "all three) are available"
    )


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthetic binary media column (utf-8 text bytes) —
    the stand-in for (url, media binary) rows. Lifted to default
    parallelism (r7): every consumer is a per-media decode/feature
    kernel, and the under-split toy scan serialized them onto one task
    (guide §2.6); at scale the repartition is a no-op. The 4 MB gate is
    measured: below it the exchange costs more than the serial kernel
    (−1.8 s at 0.6 MB), above it the parallel kernels win (−6..10 s at
    12 MB)."""
    return ensure_min_parallelism(
        spark, sf_dir,
        read_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("media")
        ),
        min_bytes=4 << 20,
    )


def media_metadata(spark: SparkSession, sf_dir: str,
                   decoder: str = "fake-v1") -> DataFrame:
    """Per-media metadata via the decode kernel (mapInPandas)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["media"].map(len)
            dims = pdf["media"].map(lambda b: decode_media(bytes(b), decoder))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": sizes.astype("int32"),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "decoder": decoder,
                }
            )

    return media_frame(spark, sf_dir).mapInPandas(decode_batches, MEDIA_META_SCHEMA)


FEATURE_CHARS = "etaoinsr"  # 8-dim fake feature basis

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("dim", IntegerType(), False),
        StructField("f0", StringType(), False),
    ]
)


_REAL_DECODERS = ("png-v1", "gif-v1", "jpeg-v1", "image-v1")


def _png_luma_hist_ppm(data: bytes) -> str:
    """REAL pixel features: 8-bin luminance histogram (ppm) over the
    decoded image (PNG or GIF via magic dispatch) — same output shape
    as the fake path (8 comma-joined integers), so downstream plumbing
    is decoder-agnostic."""
    _w, _h, ch, px = decode_image(data)
    bins = [0] * 8
    if ch == 1:
        for v in px:
            bins[v >> 5] += 1
        n = len(px)
    else:
        n = len(px) // ch
        for i in range(0, len(px), ch):
            bins[((px[i] + px[i + 1] + px[i + 2]) // 3) >> 5] += 1
    return ",".join(str(b * 1_000_000 // max(n, 1)) for b in bins)


def media_features_frame(frame: DataFrame,
                         decoder: str = "fake-v1") -> DataFrame:
    """(doc_id, media) frame → 8-dim integer-ppm features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "wav-v1":
                feats = pdf["media"].map(
                    lambda b: _wav_amp_hist_ppm(bytes(b))
                )
            elif decoder in _REAL_DECODERS:
                feats = pdf["media"].map(
                    lambda b: _png_luma_hist_ppm(bytes(b))
                )
            else:
                texts = pdf["media"].map(lambda b: bytes(b).decode("utf-8"))
                feats = texts.map(
                    lambda t: ",".join(
                        str(t.count(c) * 1_000_000 // max(len(t), 1))
                        for c in FEATURE_CHARS
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dim": len(FEATURE_CHARS),
                    "f0": feats,
                }
            ).astype({"dim": "int32"})

    return frame.mapInPandas(extract, FEATURES_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction kernel shape: binary → fixed-dim vector.

    The registered (oracle-paired) path uses the fake extractor over
    utf-8 bytes — frequency of 8 marker characters in integer
    parts-per-million — deterministic, and exactly what a CLIP-style
    embedder's plumbing looks like (binary in, fixed-dim vector out,
    one Arrow batch per partition chunk). Integer ppm (not rounded
    floats) so the DuckDB oracle compares exactly. The SAME kernel
    runs a real luminance histogram when decoder='png-v1'
    (media_features_frame — pinned by the real-PNG pytest)."""
    return media_features_frame(media_frame(spark, sf_dir))


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("out_bytes", IntegerType(), False),
    ]
)


def png_resize_nearest(data: bytes, w: int, h: int) -> bytes:
    """Real nearest-neighbor resize of a decoded image (PNG or GIF via
    magic dispatch) → raw pixel buffer of w*h*channels bytes."""
    in_w, in_h, ch, px = decode_image(data)
    out = bytearray(w * h * ch)
    for y in range(h):
        sy = y * in_h // h
        for x in range(w):
            sx = x * in_w // w
            src = (sy * in_w + sx) * ch
            dst = (y * w + x) * ch
            out[dst:dst + ch] = px[src:src + ch]
    return bytes(out)


def media_resize_frame(frame: DataFrame, w: int, h: int,
                       decoder: str = "fake-v1") -> DataFrame:
    """(doc_id, media) frame → resized output dims + byte count."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = w * h
        for pdf in batches:
            if decoder in _REAL_DECODERS:
                out = pdf["media"].map(
                    lambda b: len(png_resize_nearest(bytes(b), w, h))
                )
            else:
                out = pdf["media"].map(
                    lambda b: len(bytes(b)[:target].ljust(target, b"\0"))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": w,
                    "out_h": h,
                    "out_bytes": out,
                }
            ).astype({"out_w": "int32", "out_h": "int32", "out_bytes": "int32"})

    return frame.mapInPandas(resize, RESIZE_SCHEMA)


def media_resize(spark: SparkSession, sf_dir: str, w: int = 64, h: int = 64
                 ) -> DataFrame:
    """Resize kernel shape: binary in → resized binary out (projected to
    its size here so the oracle stays exact). The registered path fakes
    the resize by cropping/padding the byte stream to w*h; the SAME
    kernel performs a real nearest-neighbor pixel resize when
    decoder='png-v1' (media_resize_frame — pinned by the real-PNG
    pytest). The plumbing (mapInPandas over the binary column, fixed
    output dims) is identical either way."""
    return media_resize_frame(media_frame(spark, sf_dir), w, h)


FRAME_BYTES = 4096
FRAME_STEP = 4  # sample every 4th frame

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_len", IntegerType(), False),
    ]
)


_Y4M_SIG = b"YUV4MPEG2 "


def y4m_frames(data: bytes, step: int = 1):
    """REAL video frame sampling: parse a YUV4MPEG2 stream and yield
    ``(frame_idx, width, height, y_plane_bytes)`` for every ``step``-th
    frame. Y4M is the standard uncompressed interchange container
    (mjpegtools/ffmpeg): one ASCII header line (W/H/C tokens), then
    ``FRAME\\n`` + planar YCbCr per frame. Supports C420*/C422/C444/
    Cmono chroma layouts; compressed codecs stay behind the
    NotImplementedError seam in ``decode_image``."""
    if not data.startswith(_Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = None
    cs = "C420jpeg"  # spec default when no C token is present
    for tok in data[len(_Y4M_SIG) - 1:nl].decode("ascii").split():
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            cs = tok
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("C420"):
        chroma = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cs.startswith("C422"):
        chroma = 2 * ((w + 1) // 2) * h
    elif cs.startswith("C444"):
        chroma = 2 * w * h
    elif cs.startswith("Cmono"):
        chroma = 0
    else:
        raise NotImplementedError(f"Y4M chroma layout {cs!r}")
    frame_size = w * h + chroma
    pos = nl + 1
    idx = 0
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad Y4M frame marker at {pos}")
        body = data[fnl + 1:fnl + 1 + frame_size]
        if len(body) < frame_size:
            raise ValueError("Y4M frame truncated")
        if idx % step == 0:
            yield idx, w, h, bytes(body[:w * h])
        pos = fnl + 1 + frame_size
        idx += 1


def media_frame_sample_frame(frame: DataFrame,
                             decoder: str = "fake-v1") -> DataFrame:
    """(doc_id, media) frame → every FRAME_STEP-th frame's index+length.

    'fake-v1' slices FRAME_BYTES windows out of the raw bytes (the
    oracle-paired contract); 'y4m-v1' parses a REAL YUV4MPEG2 stream
    and reports the sampled frames' luma-plane sizes. Row explosion
    (1 video → k frames) and Arrow batch shape are identical."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(media)
                if decoder == "y4m-v1":
                    for i, _w, _h, y_plane in y4m_frames(b, FRAME_STEP):
                        rows.append((doc_id, i, len(y_plane)))
                else:
                    n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                    for i in range(0, n_frames, FRAME_STEP):
                        fr = b[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                        rows.append((doc_id, i, len(fr)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len"]
            ).astype({"frame_idx": "int32", "frame_len": "int32"})

    return frame.mapInPandas(sample, FRAMES_SCHEMA)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel shape: a 'video' binary is a sequence of
    FRAME_BYTES-sized frames; every FRAME_STEP-th frame is cut out.
    The registered path slices real bytes and projects the slices to
    lengths so the row explosion (1 video → k frames) and batch shape
    are tested; the SAME kernel parses real YUV4MPEG2 video when
    decoder='y4m-v1' (media_frame_sample_frame — pinned by pytest)."""
    return media_frame_sample_frame(media_frame(spark, sf_dir))


FAKE_AUDIO_RATE = 16000  # fake contract: bytes are 8-bit mono PCM @ 16 kHz

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_ms", LongType(), False),
    ]
)


def media_audio_stats_frame(frame: DataFrame,
                            decoder: str = "fake-v1") -> DataFrame:
    """(doc_id, media) frame → per-clip audio stats.

    'fake-v1' treats the bytes as 8-bit mono PCM at FAKE_AUDIO_RATE
    (the oracle-paired contract — pure length arithmetic, so DuckDB
    compares exactly); 'wav-v1' runs the REAL RIFF/WAVE parse and
    reports the header's channel count / rate and the data chunk's
    true frame count. Identical schema and Arrow batch shape."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(media)
                if decoder == "wav-v1":
                    n_ch, rate, n_frames, _samples = decode_wav(b)
                else:
                    n_ch, rate, n_frames = 1, FAKE_AUDIO_RATE, len(b)
                rows.append(
                    (doc_id, n_ch, rate, n_frames,
                     n_frames * 1000 // rate)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_channels", "sample_rate",
                         "n_samples", "duration_ms"],
            ).astype({"n_channels": "int32", "sample_rate": "int32"})

    return frame.mapInPandas(stats, AUDIO_SCHEMA)


def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-stats kernel shape: opaque audio binary → typed clip
    metadata (channels, rate, frame count, duration). The registered
    path runs the deterministic fake contract; the SAME kernel parses
    real RIFF/WAVE PCM when decoder='wav-v1' (media_audio_stats_frame
    — pinned by a pytest that writes WAVs with the independent stdlib
    ``wave`` module)."""
    return media_audio_stats_frame(media_frame(spark, sf_dir))


def _feat_sql() -> str:
    parts = [
        "((length(text) - length(replace(text, '{c}', ''))) * 1000000)"
        " // greatest(length(text), 1)".format(c=c)
        for c in FEATURE_CHARS
    ]
    return " || ',' || ".join(f"CAST({p} AS VARCHAR)" for p in parts)


def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multimodal dedup: byte-identical media collapse on
    md5(binary) — the same hash-groupBy shape as text dedup
    (operators/dedup.exact_dup_clusters), run on the binary column so
    the plan never decodes. Uses the dedup corpus (planted copies) so
    the check is non-vacuous; min-doc_id survivor, deterministic."""
    from .dedup import dedup_corpus

    media = dedup_corpus(spark, sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    return (
        media.groupBy(F.md5("media").alias("media_hash"))
        .agg(F.count("*").alias("n_media"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_media") > 1)
    )



L1_MAX_PPM = 20_000      # total L1 bound for a near-dup pair
GRID_Q = L1_MAX_PPM // 2  # cell edge = thr/2 (the pigeonhole band bound)
_BANDS = ((0, 4), (4, 8))  # two bands of 4 dims (0-based slices)


def _band_key(band_ix: int, lo: int, hi: int,
              probe: bool = False) -> F.Column:
    """Packed-long grid-cell key over one band's dims; with ``probe``
    each index is shifted by the joined offset column o<j> (the ±1
    neighborhood). r7: the key was a '<band>|i1_i2_i3_i4' string —
    hashing, comparing and shuffling 20-char strings on the
    production-heavy candidate join; grid indices are bounded
    (ppm div GRID_Q ∈ [0, 10⁶/GRID_Q], ±1 probe shift), so 7 bits per
    dim packs the same key into one long (guide §2.3: narrower types
    on the exchange)."""
    code: F.Column = F.lit(band_ix).cast("long")
    for j, i in enumerate(range(lo, hi)):
        idx = F.expr(f"element_at(v, {i + 1}) div {GRID_Q}")
        if probe:
            idx = idx + F.col(f"o{j + 1}")
        code = code * 128 + (idx + 1)
    return code


def _offsets_df(spark: SparkSession, half: bool = False):
    """The 81 probe offsets (±1 per band dim) as a broadcastable frame —
    joined rather than unrolled into 81 key expressions, which blew the
    64 KB whole-stage-codegen limit and dropped the entire probe stage
    to interpreted evaluation (measured 12 s → this shape keeps one
    small arithmetic chain in codegen).

    ``half`` (r7): only the 41 offsets whose first nonzero component is
    +1 (plus the zero offset). Candidate pairs are undirected, and with
    the full 81-offset set every qualifying pair was produced twice —
    once per direction — then halved by a post-join filter; probing the
    lexicographically-nonnegative half produces each cross-cell pair
    exactly once (for cell delta d, exactly one of d/−d is in the set),
    cutting join production ~2× with the identical result set (the
    survivor emits least/greatest ids, and same-cell double hits fall
    to the final distinct)."""
    offs = spark.range(81).select(
        *[
            F.expr(f"id div {3 ** j} % 3 - 1").alias(f"o{j + 1}")
            for j in range(4)
        ]
    )
    if half:
        offs = offs.filter(
            "(o1 = 1) OR (o1 = 0 AND o2 = 1) "
            "OR (o1 = 0 AND o2 = 0 AND o3 = 1) "
            "OR (o1 = 0 AND o2 = 0 AND o3 = 0 AND o4 >= 0)"
        )
    return F.broadcast(offs)


def media_grid_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal NEAR-dup with GUARANTEED full recall: banded grid
    multiprobe over the deterministic 8-dim integer-ppm feature
    vectors. The 8 dims split into two 4-dim bands; by pigeonhole any
    pair with total L1 ≤ L1_MAX_PPM has some band with band-L1 ≤
    thr/2 = GRID_Q, hence per-dim diff ≤ GRID_Q, hence grid indices
    within ±1 per band dim — so an equi-join of own-cell keys against
    the probe side's 3⁴ = 81 shifted keys per band provably generates
    every qualifying pair (recall 1.0, pinned against brute force in
    tests/test_streaming_multimodal.py), unlike a plain same-cell grid
    whose boundary-straddling misses compound per dim. r4 also
    tightens the threshold to 20k ppm — at the old 100k ppm ~38% of
    ALL sf0.1 pairs qualified, which is not "near-duplicate" at all;
    at 20k the verify admits ~1e-4 of pairs and the candidate join
    prunes ~72% of the quadratic brute force at sf0.1 (measured; the
    letter-frequency feature family is low-dimensional and
    concentrated, so axis-grid pruning is bounded — the cosine-LSH
    near-dup is the operator for high-dim embeddings). Everything is
    integer ppm and the DuckDB oracle mirrors the construction, so the
    check stays value-hash exact."""
    f = media_features(spark, sf_dir)
    v = F.transform(F.split("f0", ","), lambda s: s.cast("long"))
    return grid_neardup_frame(spark, f.select("doc_id", v.alias("v")))


# Per-task join-production bound for the salted hot-cell split. A
# concentrated feature space puts tens of thousands of docs in one grid
# cell; the candidate join then produces |own|·|probe| rows for that ONE
# key in ONE task (measured at the sf10 replica set: 2.06e11 productions
# total, 1.36e10 on the hottest key — an hour-scale straggler). AQE's
# skew-join split cannot catch this: it triggers on shuffle-partition
# INPUT bytes, and a hot cell's inputs are small — the skew is join
# AMPLIFICATION. So the split is explicit: cells whose own·probe product
# exceeds the bound are salted into ceil(product/bound) sub-keys —
# own rows hash-assigned one salt, probe rows replicated across all
# salts of that cell — which caps any task's production count at
# GRID_SALT_TARGET while producing the identical match multiset.
GRID_SALT_TARGET = 200_000_000


def grid_neardup_frame(spark: SparkSession, g: DataFrame) -> DataFrame:
    """(doc_id, v: array<long>) frame → grid near-dup pairs (id_a,
    id_b, l1_ppm). Frame-parametrized for the salting pytest."""
    g = g.persist()  # 3 consumers: own, probe, and the cell-count probe
    own_parts = [
        g.select(
            F.col("doc_id").alias("id_a"), F.col("v").alias("va"),
            _band_key(bi, lo, hi).alias("k"),
        )
        for bi, (lo, hi) in enumerate(_BANDS)
    ]
    own = own_parts[0].unionAll(own_parts[1])
    offs = _offsets_df(spark, half=True)
    probe_parts = [
        g.crossJoin(offs).select(
            F.col("doc_id").alias("id_b"), F.col("v").alias("vb"),
            _band_key(bi, lo, hi, probe=True).alias("k"),
        )
        for bi, (lo, hi) in enumerate(_BANDS)
    ]
    probe = probe_parts[0].unionAll(probe_parts[1])
    # hot-cell salt map from ONE occupancy aggregation (map-side combine
    # reduces the doc stream to cell cardinality before the shuffle):
    # own-side count per key IS the cell occupancy, and the probe-side
    # count per key is the ±1 neighborhood sum — computed on the tiny
    # cell table via the 81-offset cross join, never on the 81×N probe
    # stream itself
    occ_parts = [
        g.select(
            F.lit(bi).alias("band"),
            *[
                F.expr(f"element_at(v, {i + 1}) div {GRID_Q}")
                .alias(f"i{j + 1}")
                for j, i in enumerate(range(lo, hi))
            ],
        )
        for bi, (lo, hi) in enumerate(_BANDS)
    ]
    occ = (
        occ_parts[0].unionAll(occ_parts[1])
        .groupBy("band", "i1", "i2", "i3", "i4")
        .agg(F.count("*").alias("n"))
        .persist()
    )

    def _occ_key(shift: bool) -> F.Column:
        code: F.Column = F.col("band").cast("long")
        for j in range(4):
            idx = F.col(f"i{j + 1}")
            if shift:
                idx = idx + F.col(f"o{j + 1}")
            code = code * 128 + (idx + 1)
        return code

    own_n = occ.select(_occ_key(False).alias("k"), F.col("n").alias("n_own"))
    probe_n = (
        occ.crossJoin(offs)
        .select(_occ_key(True).alias("k"), "n")
        .groupBy("k")
        .agg(F.sum("n").alias("n_probe"))
    )
    splits = (
        own_n.join(probe_n, "k")
        .select(
            "k",
            F.ceil(
                F.col("n_own") * F.col("n_probe") / F.lit(GRID_SALT_TARGET)
            ).cast("int").alias("s"),
        )
        .filter(F.col("s") > 1)
    )
    own_s = own.join(F.broadcast(splits), "k", "left").withColumn(
        "salt", F.coalesce(F.pmod(F.hash("id_a"), F.col("s")), F.lit(0))
    )
    probe_s = probe.join(F.broadcast(splits), "k", "left").withColumn(
        "salt",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("s"), F.lit(1)) - 1)
        ),
    )
    # explicit 8-term sum, NOT zip_with+aggregate: interpreted HOF
    # lambdas cost ~2µs/step and this runs on every candidate row
    # (measured 12.2s → codegen'd sum cuts the verify to JVM arithmetic)
    l1 = F.expr(
        " + ".join(
            f"abs(element_at(va, {i}) - element_at(vb, {i}))"
            for i in range(1, len(FEATURE_CHARS) + 1)
        )
    )
    return (
        own_s.join(probe_s, ["k", "salt"])
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("l1_ppm", l1)
        .filter(F.col("l1_ppm") <= L1_MAX_PPM)
        # half-offset probing produces each cross-cell pair in ONE
        # direction; canonicalize to id_a < id_b (L1 is symmetric) and
        # let the distinct absorb same-cell/second-band double hits —
        # the result multiset is identical to the two-direction form
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "l1_ppm",
        )
        .distinct()  # a pair may qualify through both bands
    )


def _dedup_corpus_cte() -> str:
    from .dedup import DEDUP_CORPUS_CTE

    return DEDUP_CORPUS_CTE


def _grid_neardup_sql() -> str:
    """Mirror of the banded multiprobe construction: own-cell keys vs
    81-offset probe keys per band, same verify, same distinct."""
    dims = range(1, len(FEATURE_CHARS) + 1)
    l1 = " + ".join(f"abs(a.v[{i}] - b.v[{i}])" for i in dims)

    def key(bi, lo, hi, probe=False):
        parts = [f"'{bi}|'"]
        for j, i in enumerate(range(lo + 1, hi + 1)):  # 1-based SQL
            if j:
                parts.append("'_'")
            off = f" + o{j + 1}" if probe else ""
            parts.append(f"CAST(v[{i}] // {GRID_Q}{off} AS VARCHAR)")
        return " || ".join(parts)

    own = " UNION ALL ".join(
        f"SELECT doc_id, v, {key(bi, lo, hi)} AS k FROM feats"
        for bi, (lo, hi) in enumerate(_BANDS)
    )
    probe = " UNION ALL ".join(
        f"SELECT doc_id, v, {key(bi, lo, hi, probe=True)} AS k "
        f"FROM feats, offs"
        for bi, (lo, hi) in enumerate(_BANDS)
    )
    return f"""feats AS (
  SELECT doc_id,
         list_transform(string_split({_feat_sql()}, ','),
                        x -> CAST(x AS BIGINT)) AS v
  FROM documents
),
offs AS (
  SELECT w.o AS o1, x.o AS o2, y.o AS o3, z.o AS o4
  FROM (SELECT unnest(range(-1, 2)) AS o) w,
       (SELECT unnest(range(-1, 2)) AS o) x,
       (SELECT unnest(range(-1, 2)) AS o) y,
       (SELECT unnest(range(-1, 2)) AS o) z
),
own AS ({own}),
probe AS ({probe})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, ({l1}) AS l1_ppm
FROM own a JOIN probe b ON a.k = b.k AND a.doc_id < b.doc_id
WHERE ({l1}) <= {L1_MAX_PPM}"""


MULTIMODAL_ORACLES = {
    # DuckDB md5 takes VARCHAR, not BLOB; the media bytes ARE the
    # UTF-8 encoding of text, so md5(text) hashes identical bytes to
    # Spark's md5 over the binary column
    "media_grid_neardup": f"""
WITH {_grid_neardup_sql()}
""",
    "media_dedup_exact": f"""
WITH {_dedup_corpus_cte()}
SELECT md5(text) AS media_hash, count(*) AS n_media,
       min(doc_id) AS keep_doc_id
FROM corpus GROUP BY 1 HAVING count(*) > 1
""",
    "media_metadata": """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) % 640) + 1 AS width,
       (octet_length(encode(text)) // 640) + 1 AS height,
       'fake-v1' AS decoder
FROM documents
""",
    "media_features": f"""
SELECT doc_id, {len(FEATURE_CHARS)} AS dim, {_feat_sql()} AS f0
FROM documents
""",
    "media_resize": """
SELECT doc_id, 64 AS out_w, 64 AS out_h, 64 * 64 AS out_bytes
FROM documents
""",
    "media_audio_stats": f"""
SELECT doc_id, 1 AS n_channels, {FAKE_AUDIO_RATE} AS sample_rate,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
       CAST(octet_length(encode(text)) AS BIGINT) * 1000
         // {FAKE_AUDIO_RATE} AS duration_ms
FROM documents
""",
    "media_frame_sample": f"""
WITH sized AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         (octet_length(encode(text)) + {FRAME_BYTES} - 1) // {FRAME_BYTES}
           AS n_frames
  FROM documents
)
, idx AS (
  SELECT doc_id, n_bytes,
         unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT),
                                {FRAME_STEP})) AS frame_idx
  FROM sized
)
SELECT doc_id, frame_idx,
       least({FRAME_BYTES}, n_bytes - frame_idx * {FRAME_BYTES}) AS frame_len
FROM idx
""",
}

MULTIMODAL_QUERIES = {
    "media_metadata": media_metadata,
    "media_features": media_features,
    "media_resize": media_resize,
    "media_frame_sample": media_frame_sample,
    "media_audio_stats": media_audio_stats,
    "media_dedup_exact": media_dedup_exact,
    "media_grid_neardup": media_grid_neardup,
}

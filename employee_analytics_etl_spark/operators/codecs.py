"""Pure-Python media codecs: PPM (P6), uncompressed 24-bit BMP, PCM WAV.

The container ships no PIL/ffmpeg, but these two formats are simple
enough to decode with numpy alone — which un-stubs the multimodal
``decode="real"`` path with true pixel math instead of byte statistics
(the remaining formats still raise at the marked codec call site).

All functions are plain ``bytes → numpy`` (and back) so they are unit-
testable without Spark and ride inside Arrow ``mapInPandas`` kernels
unchanged. Arrays are HxWx3 uint8 RGB.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- PPM (P6)

def _read_ppm_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read ``n_tokens`` whitespace-separated ASCII integers after the
    magic, skipping ``#`` comments; returns (values, offset just past
    the single whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = 2  # past 'P6'
    while len(vals) < n_tokens:
        # skip whitespace and comments
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (w, h, maxval), off = _read_ppm_tokens(data, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
    return px.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


# ------------------------------------------------------- BMP (24bpp BI_RGB)

def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte multiples
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(pix), 0, 0, 54,
        40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0,
    )
    return header + pix


# ----------------------------------------------------------- PNG (RFC 2083)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        yield ctype, data[i + 8 : i + 8 + length]
        if ctype == b"IEND":
            return
        i += 12 + length  # len + type + data + crc


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Dependency-free PNG decode: stdlib ``zlib`` inflates the IDAT
    stream; the five scanline filters (None/Sub/Up/Average/Paeth) are
    un-applied per the spec. Supports 8-bit depth, color types 0
    (grayscale, widened to RGB), 2 (RGB), 3 (palette via PLTE), 4
    (gray+alpha) and 6 (RGBA) — alpha is dropped (analytics features
    are over the color planes); returns HxWx3 uint8 RGB. 16-bit and
    Adam7-interlaced images raise at the marked boundary."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    w = h = None
    depth = ctype_code = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, depth, ctype_code, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG needs a real codec (PIL)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG needs a real codec (PIL)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_code)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype_code}")

    raw = zlib.decompress(bytes(idat))
    bpp = channels  # bytes per pixel (8-bit depth)
    stride = w * channels
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:
            recon = row.copy()
        elif ftype == 1:  # Sub
            recon = row.copy()
            for x in range(bpp, stride):
                recon[x] = (int(recon[x]) + int(recon[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            recon = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            recon = row.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                recon[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    px = out.reshape(h, w, channels)
    if ctype_code == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[..., 0]].copy()
    if channels == 1:
        return np.repeat(px, 3, axis=2).copy()
    if channels == 2:  # gray + alpha
        return np.repeat(px[..., :1], 3, axis=2).copy()
    return px[..., :3].copy()  # RGB / RGBA (alpha dropped)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal RGB PNG encoder (filter type 0 rows, one zlib stream) —
    the exact inverse of decode_png's color-type-2 path; used by tests
    and fixture generators so PNG round-trips stay dependency-free."""
    import zlib

    h, w, c = arr.shape
    assert c == 3
    body = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    body[:, 1:] = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * 3)
    raw = zlib.compress(body.tobytes(), 6)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- helpers

def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; raises at the codec call site for
    formats this container cannot decode (JPEG needs a real codec)."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    raise NotImplementedError(
        "only PPM(P6)/BMP/PNG decode ships in-container; JPEG needs PIL"
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — deterministic,
    pure index math (what a real resize kernel does before filtering)."""
    h, w, _ = arr.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


# ---------------------------------------------------------------- WAV (PCM)

def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode an uncompressed PCM WAV payload with the stdlib ``wave``
    module (no codec library needed): returns (sample_rate, samples)
    where samples is int16 shaped (n_frames, n_channels).

    8-bit PCM (unsigned) is widened to int16; 16-bit is native;
    other widths raise — the marked boundary where soundfile/ffmpeg
    would plug in.
    """
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(
            f"{8 * width}-bit PCM needs a real audio library (soundfile/ffmpeg)"
        )
    return rate, samples.reshape(-1, n_ch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Encode int16 samples shaped (n_frames, n_channels) as a 16-bit
    PCM WAV payload (stdlib wave; exact inverse of decode_wav)."""
    import io
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def resample_nearest_audio(
    rate: int, samples: np.ndarray, target_rate: int
) -> np.ndarray:
    """Nearest-neighbor sample-rate conversion (the audio analogue of
    resize_nearest): output frame i takes input frame
    round(i · rate / target_rate). No interpolation/anti-aliasing — the
    boundary where a real DSP library would plug in, but exact,
    deterministic, and correct for the integer-ratio cases pipelines
    normalize to (16 k→8 k picks every 2nd frame)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_out = max(1, int(round(samples.shape[0] * target_rate / rate)))
    idx = np.minimum(
        np.round(np.arange(n_out) * rate / target_rate).astype(np.int64),
        samples.shape[0] - 1,
    )
    return samples[idx]

"""Real, dependency-free media codecs for the multimodal stages.

PNG (``\\x89PNG``): pure-stdlib decoder/encoder — zlib inflate + per-row
unfiltering for all five PNG filter types (None/Sub/Up/Average/Paeth),
8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and 6 (RGBA),
non-interlaced.  WAV (``RIFF..WAVE``): stdlib ``wave`` module + numpy.

These replace the round-2 deterministic stub for the formats the Python
standard library can honestly handle; exotic formats (JPEG, video
containers) still fall back to the self-describing fake payload and stay
documented as stubs.  The decoders are used inside actor-pool
``map_batches`` stages, so any per-codec setup cost is once-per-actor.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes):
    """-> dict(width, height, channels, pixels: flat uint8 ndarray) or
    None if not a supported PNG."""
    if not data.startswith(PNG_MAGIC):
        return None
    pos = len(PNG_MAGIC)
    width = height = None
    channels = None
    idat = []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), \
            data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                return None
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        return None
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            cur = row.copy()
        elif ftype == 2:  # Up (vectorized)
            cur = row + prev
        else:  # Sub / Average / Paeth need left-neighbor recurrence
            cur = row.astype(np.int32)
            pv = prev.astype(np.int32)
            if ftype == 1:  # Sub
                for x in range(bpp, stride):
                    cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = cur[x - bpp] if x >= bpp else 0
                    cur[x] = (cur[x] + ((left + pv[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = pv[x]
                    c = pv[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa_ <= pb and pa_ <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[x] = (cur[x] + pred) & 0xFF
            else:
                return None
            cur = cur.astype(np.uint8)
        out[y] = cur
        prev = cur
    return {"width": int(width), "height": int(height),
            "channels": int(channels), "pixels": out.reshape(-1)}


def encode_png(pixels: np.ndarray, width: int, height: int,
               channels: int = 3, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced).  ``filter_type`` -1
    rotates through all five filters row by row — used by tests to
    exercise every unfilter path."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height,
                                                     width * channels)
    bpp = channels
    rows = []
    prev = np.zeros(width * channels, dtype=np.int32)
    for y in range(height):
        ft = (y % 5) if filter_type == -1 else filter_type
        cur = arr[y].astype(np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = cur - pred
        rows.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_wav(data: bytes):
    """-> dict(rate, channels, n_frames, samples: int16 ndarray) or None."""
    if not (data[:4] == b"RIFF" and data[8:12] == b"WAVE"):
        return None
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                return None
            frames = w.readframes(w.getnframes())
            return {"rate": w.getframerate(),
                    "channels": w.getnchannels(),
                    "n_frames": w.getnframes(),
                    "samples": np.frombuffer(frames, dtype=np.int16)}
    except (wave.Error, EOFError):
        return None


def encode_wav(samples: np.ndarray, rate: int = 16000,
               channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def jpeg_dimensions(data: bytes):
    """Header-only JPEG parse: scan segment markers for the first SOF0-15
    frame header and return (width, height, channels) — no pixel decode
    (that stays a documented stub; Huffman/DCT is out of honest scope
    for a stdlib codec)."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        # SOF0..SOF15 except DHT(C4)/DAC(CC)/restart markers
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(data):
                return None
            h, w = struct.unpack_from(">HH", data, pos + 5)
            return {"width": int(w), "height": int(h),
                    "channels": int(data[pos + 9])}
        pos += 2 + seglen
    return None


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Real scalar audio features from PCM samples: duration, RMS level,
    zero-crossing rate, peak amplitude — the stats an audio-quality
    filter in a training-data pipeline gates on."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr": 0.0, "peak": 0.0}
    return {
        "duration_s": n / float(rate),
        "rms": float(np.sqrt(np.mean(x * x))),
        "zcr": float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))),
        "peak": float(np.max(np.abs(x))),
    }

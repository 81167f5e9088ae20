"""Pure-stdlib media codecs: WAV (RIFF/PCM), PPM (P6), BMP (24-bit).

These make ``decode_image`` / ``decode_audio`` working operators
instead of hooks (reference parity note: streamz itself has no media
layer; this belongs to the training-data-pipeline superset). The
formats are chosen because their public specs are parseable with
``wave``/``struct`` alone — no image/audio libraries ship in this
container. Compressed codecs (JPEG/PNG/MP3/H.264) still need a real
library: ``sniff_image``/``sniff_audio`` raise NotImplementedError for
unknown magics, and the ``decode=`` hooks on the operators remain the
production extension point.

Everything here is executor-side pure-Python over in-memory blobs —
called from Arrow-batched ``mapInPandas``, never per-row UDFs.
"""

from __future__ import annotations

import io
import struct
import wave

__all__ = [
    "encode_wav",
    "decode_wav",
    "encode_ppm",
    "decode_ppm",
    "encode_bmp",
    "decode_bmp",
    "sniff_image",
    "sniff_audio",
]


# ------------------------------------------------------------------ WAV

def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """PCM16 mono/interleaved samples → RIFF/WAVE bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """RIFF/WAVE → metadata + PCM16 amplitude stats.

    Returns ``{n_channels, sample_rate, n_frames, duration_s,
    mean_abs_amplitude}``. Only PCM16 amplitude stats are computed
    (8/24/32-bit frames still report metadata, amplitude = None).
    """
    with wave.open(io.BytesIO(blob), "rb") as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    mean_abs = None
    if width == 2 and frames:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
        mean_abs = sum(abs(v) for v in vals) / len(vals)
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "mean_abs_amplitude": mean_abs,
    }


# ------------------------------------------------------------------ PPM

def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary PPM: pixels is height*width*3 RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} pixel bytes, got {len(pixels)}")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def decode_ppm(blob: bytes) -> dict:
    """P6 binary PPM → (height, width, n_channels, mean_pixel).

    Handles the header grammar per the public netpbm spec: tokens
    separated by whitespace, ``#`` comments to end-of-line, single
    whitespace byte before the raster.
    """
    if blob[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    # tokenize header: magic, width, height, maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace byte before raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit ppm not supported")
    raster = blob[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated ppm raster")
    return {
        "height": height,
        "width": width,
        "n_channels": 3,
        "mean_pixel": sum(raster) / len(raster) if raster else 0.0,
    }


# ------------------------------------------------------------------ BMP

def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER). ``pixels`` is
    height*width*3 BGR bytes, top-down row order; rows are padded to
    4-byte boundaries per the spec, and stored bottom-up."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} pixel bytes, got {len(pixels)}")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    raster = b"".join(
        pixels[r * row_bytes : (r + 1) * row_bytes] + b"\x00" * pad
        for r in range(height - 1, -1, -1)  # bottom-up storage
    )
    data_offset = 14 + 40
    file_size = data_offset + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    infoheader = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + infoheader + raster


def decode_bmp(blob: bytes) -> dict:
    """24-bit uncompressed BMP → (height, width, n_channels,
    mean_pixel). Row padding is excluded from the mean; negative
    biHeight (top-down) is handled."""
    if blob[:2] != b"BM":
        raise ValueError("not a bmp")
    (data_offset,) = struct.unpack_from("<I", blob, 10)
    size, width, height_raw, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit bmp supported (bpp={bpp})")
    height = abs(height_raw)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    total = 0
    for r in range(height):
        row = blob[data_offset + r * stride : data_offset + r * stride + row_bytes]
        if len(row) != row_bytes:
            raise ValueError("truncated bmp raster")
        total += sum(row)
    n = height * row_bytes
    return {
        "height": height,
        "width": width,
        "n_channels": 3,
        "mean_pixel": total / n if n else 0.0,
    }


# ----------------------------------------------------------- dispatch

def sniff_image(blob: bytes) -> dict:
    """Decode an image blob by magic bytes (P6 ppm / BM bmp).

    Unknown formats raise NotImplementedError naming the magic — the
    signal to pass a real codec via the ``decode=`` hook.
    """
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    raise NotImplementedError(
        f"no built-in codec for image magic {blob[:4]!r}; pass decode= hook"
    )


def sniff_audio(blob: bytes) -> dict:
    """Decode an audio blob by magic bytes (RIFF/WAVE)."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return decode_wav(blob)
    raise NotImplementedError(
        f"no built-in codec for audio magic {blob[:4]!r}; pass decode= hook"
    )

"""Pure-python/numpy media codecs for the multimodal column path (C12/C32).

The sandbox has no PIL/ffmpeg/torchaudio, but real decode does not need
them for simple container formats: 24-bit BMP is a fixed header + padded
BGR pixel rows (numpy + struct), WAV is stdlib ``wave``, and raw video
is a length-prefixed frame container (the moral equivalent of rawvideo
`.yuv` streams). These are REAL encoders/decoders — byte-exact round
trips, header validation, truncation errors — so the multimodal
operators decode actual bytes instead of stubbing.

Reference parity: the reference treats payloads as opaque values moved
through Greenplum (maxwell_gpdb.sql event payloads); media columns are
the training-pipeline extension the brief asks for on top.

Scale notes: all functions here are called from Arrow-batched
``mapInPandas`` bodies, so per-executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x max payload size,
independent of partition row count.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------- BMP ----
# 24-bit uncompressed BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
# (40 bytes) + bottom-up BGR rows, each padded to a 4-byte boundary.

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # bottom-up rows, RGB -> BGR
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(pixel_data), 0, 0, offset)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BMP into an (h, w, 3) uint8 RGB array.

    Validates the `BM` magic, header sizes, and that the pixel array is
    complete; raises ValueError on malformed input (the DLQ-able path).
    """
    if len(data) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        raise ValueError("BMP truncated before headers")
    magic, _file_size, _r1, _r2, offset = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: magic {magic!r}")
    (hdr_size, w, h, planes, bpp, compression, _img_size, _xp, _yp, _used,
     _important) = _BMP_INFO_HDR.unpack_from(data, _BMP_FILE_HDR.size)
    if hdr_size < _BMP_INFO_HDR.size or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size} planes={planes})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(data) < offset + stride * h:
        raise ValueError("BMP pixel array truncated")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array — the PIL-free
    real resize used by ``resize_media``."""
    h, w, _ = pixels.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return pixels[yi][:, xi]


# ---------------------------------------------------------------- WAV ----


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono PCM samples as a RIFF/WAVE file (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE file to (sample_rate, int16 samples array)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        rate = wf.getframerate()
        samples = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    return rate, samples


# ---------------------------------------------------------- raw video ----
# Container: b"RVID" + u32 frame count, then per frame u32 length + payload
# (each payload is itself a BMP). Length prefixes allow frame_sample to
# SEEK to sampled frames without decoding the rest — the property that
# makes every-k-th-frame sampling cheap on real video containers too.

_RVID_MAGIC = b"RVID"


def encode_rawvideo(frames: list[bytes]) -> bytes:
    parts = [_RVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def rawvideo_frame_count(data: bytes) -> int:
    if data[:4] != _RVID_MAGIC:
        raise ValueError("not an RVID container")
    return struct.unpack_from("<I", data, 4)[0]


def sample_rawvideo(data: bytes, every_k: int = 4) -> list[tuple[int, bytes]]:
    """Return [(frame_idx, frame_bytes)] for every k-th frame, seeking via
    length prefixes (unsampled frames are skipped, not read)."""
    n = rawvideo_frame_count(data)
    out = []
    pos = 8
    for idx in range(n):
        if pos + 4 > len(data):
            raise ValueError(f"RVID truncated at frame {idx}")
        (flen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + flen > len(data):
            raise ValueError(f"RVID frame {idx} payload truncated")
        if idx % every_k == 0:
            out.append((idx, data[pos : pos + flen]))
        pos += flen
    return out

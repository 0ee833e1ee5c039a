"""Pure-stdlib+numpy WAV (RIFF PCM) codec for the multimodal audio
kernels.

Built from the PUBLIC RIFF/WAVE specification (Microsoft/IBM 1991, as
mirrored by every audio tool): a 12-byte `RIFF…WAVE` header followed by
length-prefixed chunks; the `fmt ` chunk carries (audio_format, channels,
sample_rate, byte_rate, block_align, bits_per_sample) and the `data`
chunk the interleaved little-endian PCM frames. Supports 16-bit integer
PCM, mono or multi-channel — the shape a training pipeline's audio
pre-processing stage consumes. The container ships no audio libraries,
so this codec makes the X4 audio path REAL (tests cross-validate both
directions against Python's independent stdlib `wave` implementation).

The reference repo treats media as opaque object-store bytes next to the
lakehouse (README.md:169-178's "any engine" open-format story); this
module is the decode stage that turns those bytes into typed columns.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_RIFF = b"RIFF"
WAV_WAVE = b"WAVE"


def is_wav(blob: bytes) -> bool:
    """Cheap signature sniff, same role as ``png.PNG_SIG`` dispatch."""
    return len(blob) >= 12 and blob[:4] == WAV_RIFF and blob[8:12] == WAV_WAVE


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) interleaved —
    into a standard RIFF/WAVE byte stream."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n, ch = arr.shape
    data = arr.tobytes()  # row-major == interleaved frames
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        WAV_WAVE
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE byte stream to ((n, ch) int16 array,
    sample_rate). Walks the chunk list (skipping unknown chunks such as
    LIST/INFO metadata, honoring the spec's word-alignment padding) so
    files written by other tools parse too. Only uncompressed 16-bit PCM
    (audio_format 1) is supported — anything else fails loudly rather
    than returning garbage."""
    if not is_wav(blob):
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            # len(body) (not clen) is the real guard: a truncated stream
            # can declare 16 bytes but carry fewer
            if len(body) < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format (fmt={audio_format}, bits={bits})")
    n = len(data) // (2 * ch)
    arr = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return arr.astype(np.int16, copy=False), rate


def duration_ms(n_samples: int, sample_rate: int) -> int:
    """Whole-millisecond duration (floor) — matches the arithmetic the
    SQL oracle reproduces from the synth formula."""
    return n_samples * 1000 // sample_rate


def rms(samples: np.ndarray) -> float:
    """Root-mean-square amplitude over all channels (0.0 for empty)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.size == 0:
        return 0.0
    return float(np.sqrt(np.mean(arr * arr)))


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Sample-rate conversion by linear interpolation (np.interp per
    channel) — the standard cheap resampler for feature-extraction
    pipelines where a polyphase filter would be overkill. Output length
    is round(n * dst/src); endpoints are preserved."""
    arr = np.asarray(samples, dtype=np.float64)
    mono = arr.ndim == 1
    if mono:
        arr = arr[:, None]
    n, ch = arr.shape
    if n == 0 or src_rate == dst_rate:
        out = arr
    else:
        m = max(1, int(round(n * dst_rate / src_rate)))
        # endpoint-aligned sample positions in source index space
        x = np.linspace(0.0, n - 1, m)
        xp = np.arange(n, dtype=np.float64)
        out = np.stack([np.interp(x, xp, arr[:, c]) for c in range(ch)], axis=1)
    out = np.clip(np.round(out), -32768, 32767).astype(np.int16)
    return out[:, 0] if mono else out


def chunk_fixed(samples: np.ndarray, chunk_len: int) -> list[np.ndarray]:
    """Split into fixed-length training chunks, zero-padding the last —
    the audio twin of text sequence packing. ceil(n/chunk_len) chunks;
    empty input yields no chunks."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    out: list[np.ndarray] = []
    for start in range(0, n, chunk_len):
        piece = arr[start : start + chunk_len]
        if piece.shape[0] < chunk_len:
            pad = np.zeros((chunk_len - piece.shape[0], arr.shape[1]), dtype=np.int16)
            piece = np.concatenate([piece, pad])
        out.append(piece)
    return out

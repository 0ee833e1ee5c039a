"""WAV codec (multimodal/wav.py) and the audio pipeline: round-trips,
cross-validation against Python's independent stdlib `wave`
implementation, resample/chunk arithmetic, and the oracle contract of
the registered audio queries."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from minio_iceberg_polaris_lakehouse_spark.multimodal import wav
from minio_iceberg_polaris_lakehouse_spark.multimodal.audio import (
    CHUNK_LEN,
    SAMPLE_RATE,
    chunk_audio,
    decode_audio,
    doc_samples,
    resample_audio,
    wav_assets_from_documents,
)
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

rng = np.random.default_rng(7)


def test_roundtrip_mono():
    samples = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    got, rate = wav.decode_wav(wav.encode_wav(samples, 8000))
    assert rate == 8000
    assert got.shape == (1234, 1)
    np.testing.assert_array_equal(got[:, 0], samples)


def test_roundtrip_stereo():
    samples = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    got, rate = wav.decode_wav(wav.encode_wav(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(got, samples)


def test_stdlib_wave_reads_our_bytes():
    """Independent decoder cross-check: the stdlib `wave` module parses
    our encoder's output and recovers identical PCM."""
    samples = rng.integers(-32768, 32767, size=999, dtype=np.int16)
    blob = wav.encode_wav(samples, 16000)
    with stdlib_wave.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 16000)
        assert w.getnframes() == 999
        raw = w.readframes(999)
    np.testing.assert_array_equal(np.frombuffer(raw, dtype="<i2"), samples)


def test_we_read_stdlib_wave_bytes():
    """And the reverse: bytes written by the stdlib encoder parse with
    our chunk walker."""
    samples = rng.integers(-32768, 32767, size=(300, 2), dtype=np.int16)
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(samples.tobytes())
    got, rate = wav.decode_wav(buf.getvalue())
    assert rate == 22050
    np.testing.assert_array_equal(got, samples)


def test_unknown_chunks_skipped_and_alignment():
    """A LIST metadata chunk (odd-length, exercising the word-alignment
    pad) before `data` must be skipped per spec."""
    samples = np.arange(100, dtype=np.int16)
    blob = wav.encode_wav(samples, 8000)
    # splice LIST chunk right after the fmt chunk (12-byte header + 8+16 fmt)
    insert_at = 12 + 8 + 16
    meta = b"INFOx"  # 5 bytes — odd, so a pad byte follows
    extra = b"LIST" + struct.pack("<I", len(meta)) + meta + b"\x00"
    spliced = blob[:insert_at] + extra + blob[insert_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, rate = wav.decode_wav(spliced)
    np.testing.assert_array_equal(got[:, 0], samples)


def test_reject_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        wav.decode_wav(b"\x00" * 64)
    blob = bytearray(wav.encode_wav(np.zeros(10, dtype=np.int16), 8000))
    blob[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        wav.decode_wav(bytes(blob))


def test_resample_length_and_endpoints():
    ramp = np.linspace(-10000, 10000, 801).astype(np.int16)
    up = wav.resample_linear(ramp, 8000, 16000)
    assert len(up) == round(801 * 2)
    assert up[0] == ramp[0] and up[-1] == ramp[-1]
    # a constant signal resamples to the same constant
    const = np.full(500, 1234, dtype=np.int16)
    np.testing.assert_array_equal(wav.resample_linear(const, 8000, 3000), np.full(188, 1234))
    # linear interp of a ramp stays within the ramp's range
    down = wav.resample_linear(ramp, 8000, 5000)
    assert down.min() >= ramp.min() and down.max() <= ramp.max()


def test_chunking_pads_last():
    s = np.arange(950, dtype=np.int16)
    chunks = wav.chunk_fixed(s, 400)
    assert len(chunks) == 3
    assert all(c.shape == (400, 1) for c in chunks)
    np.testing.assert_array_equal(chunks[2][:150, 0], s[800:])
    assert not chunks[2][150:].any()  # zero padding
    assert wav.chunk_fixed(np.zeros(0, dtype=np.int16), 400) == []


def test_doc_samples_contract():
    """The synth formula the SQL oracle reproduces."""
    for payload in [b"", b"a", b"hello world" * 40, bytes(range(256)) * 12]:
        s = doc_samples(payload)
        assert len(s) == 800 + (len(payload) % 1600)
        assert s.dtype == np.int16
    # content-sensitivity: different bytes, different waveform
    assert not np.array_equal(doc_samples(b"aaaa"), doc_samples(b"aaab"))


def test_audio_pipeline_end_to_end(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(40)
    assets = wav_assets_from_documents(d)
    decoded = decode_audio(assets)
    rows = {r.doc_id: r for r in decoded.collect()}
    docs = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    assert rows.keys() == docs.keys()
    for did, text in docs.items():
        expect = doc_samples(text.encode("utf-8"))
        r = rows[did]
        assert r.sample_rate == SAMPLE_RATE
        assert r.n_samples == len(expect)
        assert r.audio_ms == len(expect) * 1000 // SAMPLE_RATE
        assert r.rms == int(round(wav.rms(expect)))
    # chunk fan-out matches ceil arithmetic
    n_chunks = chunk_audio(assets).count()
    assert n_chunks == sum(
        -(-(800 + (len(t.encode()) % 1600)) // CHUNK_LEN) for t in docs.values()
    )
    # resample doubles the sample count clip-by-clip
    up = decode_audio(resample_audio(assets, 16000))
    got = {r.doc_id: r.n_samples for r in up.collect()}
    assert got == {did: 2 * (800 + (len(t.encode()) % 1600)) for did, t in docs.items()}


# ---------------- property fuzz (hypothesis) ----------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=4000),
        ch=st.integers(min_value=1, max_value=4),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_wav_roundtrip_property(n, ch, rate, seed):
        """Any PCM16 payload round-trips bit-exactly through the codec."""
        r = np.random.default_rng(seed)
        samples = r.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
        got, got_rate = wav.decode_wav(wav.encode_wav(samples, rate))
        assert got_rate == rate
        np.testing.assert_array_equal(got, samples.reshape(n, ch))

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=2000),
        src=st.sampled_from([8000, 16000, 44100]),
        dst=st.sampled_from([4000, 8000, 16000, 48000]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_wav_resample_bounds_property(n, src, dst, seed):
        """Linear interpolation never exceeds the input's [min, max]
        envelope, and the length contract round(n*dst/src) holds."""
        r = np.random.default_rng(seed)
        s = r.integers(-32768, 32767, size=n, dtype=np.int16)
        out = wav.resample_linear(s, src, dst)
        assert len(out) == max(1, int(round(n * dst / src))) or (src == dst and len(out) == n)
        if n > 0:
            assert out.min() >= s.min() and out.max() <= s.max()

except ImportError:  # pragma: no cover — hypothesis is baked in, but be safe
    pass


def test_decode_never_crashes_on_corruption():
    """Truncations and byte flips of a valid stream either decode (flips
    landing in PCM payload) or raise ValueError — never an unhandled
    struct/index error. (Python's own wave module raises EOFError and
    struct.error on these; the engine's codec guarantees one exception
    type for the caller to catch.)"""
    r = np.random.default_rng(3)
    base = wav.encode_wav(r.integers(-1000, 1000, size=256, dtype=np.int16), 8000)
    for cut in range(0, len(base), 7):  # truncations
        try:
            wav.decode_wav(base[:cut])
        except ValueError:
            pass
    for i in range(0, 60):  # header-region byte flips
        blob = bytearray(base)
        blob[i] ^= 0xFF
        try:
            wav.decode_wav(bytes(blob))
        except ValueError:
            pass

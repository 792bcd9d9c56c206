"""audio_spectrogram operator: FFT correctness pinned against a naive
O(N²) DFT (the oracle only sees the integer-exact bins + Parseval; this
tier checks EVERY bin numerically), plus framing/guard edges."""

import numpy as np
import pytest

from pygdf_spark.sources.wav_lite import encode_wav


def _naive_dft_power(x: np.ndarray) -> np.ndarray:
    n = len(x)
    k = np.arange(n // 2 + 1)[:, None]
    m = np.arange(n)[None, :]
    re = (x * np.cos(2 * np.pi * k * m / n)).sum(axis=1)
    im = (x * np.sin(2 * np.pi * k * m / n)).sum(axis=1)
    return re**2 + im**2


def test_rfft_matches_naive_dft_and_parseval():
    rng = np.random.default_rng(3)
    for n in (8, 16, 32):
        x = rng.integers(-2000, 2000, size=n).astype(np.float64)
        power = np.abs(np.fft.rfft(x)) ** 2
        np.testing.assert_allclose(power, _naive_dft_power(x), rtol=1e-9)
        w = np.full(len(power), 2.0)
        w[0] = 1.0
        w[-1] = 1.0
        assert round(float(power @ w)) == round(float(n * (x**2).sum()))


def test_operator_frames_and_bins(spark):
    from pygdf_spark.operators.multimodal import audio_spectrogram

    x = np.array([100, -50, 30, 7, -100, 42, -9, 11,  # frame 0
                  1, 2, 3, 4, 5, 6, 7, 8,             # frame 1
                  99, 98, 97], dtype=np.int16)        # partial -> dropped
    buf = encode_wav(x, 16000)
    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, audio_wav binary")
    rows = {r["frame"]: r for r in audio_spectrogram(df).collect()}
    assert sorted(rows) == [0, 1]
    for f in (0, 1):
        fx = x[f * 8 : f * 8 + 8].astype(np.int64)
        assert rows[f]["pow_dc"] == int(fx.sum()) ** 2
        c2 = int((fx * np.array([1, 0, -1, 0, 1, 0, -1, 0])).sum())
        s2 = int((fx * np.array([0, 1, 0, -1, 0, 1, 0, -1])).sum())
        assert rows[f]["pow_quarter"] == c2 * c2 + s2 * s2
        assert rows[f]["pow_nyquist"] == int((fx * np.array([1, -1] * 4)).sum()) ** 2
        assert rows[f]["energy"] == 8 * int((fx.astype(np.int64) ** 2).sum())


def test_frame_len_guard(spark):
    from pygdf_spark.operators.multimodal import audio_spectrogram

    df = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, audio_wav binary")
    with pytest.raises(ValueError, match="multiple of 4"):
        audio_spectrogram(df, frame_len=6)

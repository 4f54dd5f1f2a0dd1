"""Frozen golden fixtures for the preprocessing cascade (VERDICT r1 item 7).

MNE and pywt cannot be installed here, so the cascade's numerics are pinned
two ways:

1. **Algorithmic assertions** that the FIR design follows MNE's published
   'firwin' rules exactly: auto transition bandwidths, hamming 3.3 length
   factor, odd (type-I) length, −6 dB gain at the half-amplitude cutoffs,
   unit passband / zero stopband gain.
2. **Implement-and-freeze**: filter taps, zero-phase filtered outputs of a
   committed chirp+line+noise fixture, and pywt-rule wavedec coefficients
   (symmetric padding, published db4/sym5/coif1 banks) are frozen in
   tests/data/preproc_golden.npz; any numerical drift in the cascade fails
   these tests.

Reference: preprocessing.py:581-599 (mne filter), :946-958 (notch bank),
:784-873 (pywt wavedec/Donoho denoise).
"""
import os

import numpy as np
import pytest

from mba_tpu.ops.filters import (design_bandpass_fir, design_notch_fir,
                                 bandpass_filter, notch_filter)
from mba_tpu.ops.wavelet import (wavedec, waverec, wavelet_denoise,
                                 wavelet_filters)

FIX = os.path.join(os.path.dirname(__file__), "data", "preproc_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIX)


def _freq_gain(h, f, fs):
    w = np.exp(-2j * np.pi * f / fs * np.arange(len(h)))
    return abs(np.sum(h * w))


class TestFirwinDesignRules:
    """MNE 'firwin' published rules, asserted analytically."""

    def test_study_band_lengths(self):
        # l_trans = min(max(0.25·l, 2), l); length = odd(3.3/min_trans·fs)
        eeg = design_bandpass_fir(2048.0, 0.1, 100.0)
        assert len(eeg) == 67585            # 3.3/0.1·2048 = 67584 → odd
        emg = design_bandpass_fir(2048.0, 20.0, 500.0)
        assert len(emg) == 1353             # min trans = 5 Hz
        ntc = design_notch_fir(2048.0, [50.0, 100.0])
        assert len(ntc) == 6759             # 1 Hz transitions

    def test_half_amplitude_at_documented_points(self):
        """MNE documents the half-amplitude (−6 dB) cutoffs at
        ``l_freq − l_trans/2`` and ``h_freq + h_trans/2``; the band edges
        themselves sit in the passband."""
        fs = 512.0
        h = design_bandpass_fir(fs, 8.0, 100.0)
        l_trans = min(max(0.25 * 8.0, 2.0), 8.0)        # = 2 Hz
        h_trans = min(max(0.25 * 100.0, 2.0), fs / 2 - 100.0)  # = 25 Hz
        assert _freq_gain(h, 8.0 - l_trans / 2, fs) == pytest.approx(
            0.5, abs=0.02)
        assert _freq_gain(h, 100.0 + h_trans / 2, fs) == pytest.approx(
            0.5, abs=0.02)
        assert _freq_gain(h, 8.0, fs) > 0.95
        assert _freq_gain(h, 100.0, fs) > 0.95

    def test_passband_and_stopband_gains(self):
        fs = 512.0
        h = design_bandpass_fir(fs, 8.0, 100.0)
        assert _freq_gain(h, 40.0, fs) == pytest.approx(1.0, abs=0.01)
        assert _freq_gain(h, 0.0, fs) < 1e-3           # DC rejected
        assert _freq_gain(h, 180.0, fs) < 1e-3
        ntc = design_notch_fir(fs, [50.0])
        assert _freq_gain(ntc, 50.0, fs) < 0.02
        assert _freq_gain(ntc, 45.0, fs) == pytest.approx(1.0, abs=0.02)
        assert _freq_gain(ntc, 55.0, fs) == pytest.approx(1.0, abs=0.02)

    def test_type_one_symmetry(self):
        h = design_bandpass_fir(512.0, 8.0, 100.0)
        assert len(h) % 2 == 1
        np.testing.assert_allclose(h, h[::-1], atol=1e-15)


class TestFrozenFilterOutputs:
    def test_taps_frozen(self, golden):
        np.testing.assert_allclose(
            design_bandpass_fir(2048.0, 0.1, 100.0), golden["eeg_taps"],
            rtol=0, atol=1e-15)
        np.testing.assert_allclose(
            design_bandpass_fir(2048.0, 20.0, 500.0), golden["emg_taps"],
            rtol=0, atol=1e-15)
        np.testing.assert_allclose(
            design_notch_fir(2048.0, [50.0 * i for i in range(1, 5)]),
            golden["notch_taps"], rtol=0, atol=1e-15)

    def test_filtered_chirp_frozen(self, golden):
        sig = golden["signal"]
        fs = float(golden["fs"])
        scale = np.abs(sig).max()
        for out_key, fn in (
                ("eeg_filtered", lambda x: bandpass_filter(x, fs, 0.1,
                                                           100.0)),
                ("emg_filtered", lambda x: bandpass_filter(x, fs, 20.0,
                                                           500.0)),
                ("notch_filtered",
                 lambda x: notch_filter(x, fs,
                                        [50.0 * i for i in range(1, 5)]))):
            got = np.asarray(fn(sig), np.float32)
            np.testing.assert_allclose(got, golden[out_key],
                                       atol=2e-4 * scale,
                                       err_msg=out_key)

    def test_notch_kills_line_component(self, golden):
        """Behavioral check on the fixture: the planted 50 Hz line power
        drops by > 100× while neighbour bands are preserved."""
        sig = golden["signal"][:, 0]
        out = golden["notch_filtered"][:, 0]
        fs = float(golden["fs"])
        f = np.fft.rfftfreq(len(sig), 1 / fs)
        p_in = np.abs(np.fft.rfft(sig)) ** 2
        p_out = np.abs(np.fft.rfft(out)) ** 2
        b50 = (f > 49.5) & (f < 50.5)
        keep = (f > 42) & (f < 47)
        assert p_out[b50].sum() < p_in[b50].sum() / 100
        assert p_out[keep].sum() == pytest.approx(p_in[keep].sum(),
                                                  rel=0.12)


class TestFrozenWavelets:
    def test_published_db4_constants(self):
        """The db4 decomposition filter IS the published Daubechies-4
        bank (cross-checkable against any pywt installation)."""
        dec_lo, dec_hi, _, _ = wavelet_filters("db4")
        assert dec_lo[-1] == pytest.approx(0.23037781330885523, abs=1e-15)
        assert dec_lo[-2] == pytest.approx(0.7148465705525415, abs=1e-15)
        np.testing.assert_allclose(np.sum(dec_lo ** 2), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.sum(dec_lo * dec_hi), 0.0,
                                   atol=1e-12)

    @pytest.mark.parametrize("w", ["db4", "sym5", "coif1"])
    def test_wavedec_coeffs_frozen(self, golden, w):
        sig = golden["signal"][:, 0]
        coeffs = wavedec(sig, wavelet=w, level=3)
        assert len(coeffs) == 4
        for i, c in enumerate(coeffs):
            np.testing.assert_allclose(
                np.asarray(c, np.float32), golden[f"{w}_c{i}"],
                atol=2e-4 * np.abs(golden[f"{w}_c{i}"]).max(),
                err_msg=f"{w} coeff {i}")

    @pytest.mark.parametrize("w", ["db4", "sym5", "coif1"])
    def test_denoised_frozen_and_reconstruction(self, golden, w):
        sig = golden["signal"][:, 0]
        den = np.asarray(wavelet_denoise(sig, wavelet=w, level=3),
                         np.float32)
        np.testing.assert_allclose(den, golden[f"{w}_denoised"],
                                   atol=3e-4, err_msg=w)
        # perfect reconstruction without thresholding
        from mba_tpu.ops.wavelet import wavedec_lengths
        coeffs = wavedec(sig, wavelet=w, level=3)
        rec = np.asarray(waverec(coeffs, wavelet=w,
                                 lengths=wavedec_lengths(len(sig), w, 3)))
        np.testing.assert_allclose(rec, sig, atol=2e-4)

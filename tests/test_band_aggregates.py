"""Band-aggregate lean feature store: exact agreement with the
full-grid aggregation paths it replaces.

The artifact stores per-(window, channel) {mean, max} over each named
band's inclusive frequency bins (signal_features.AGGREGATE_BANDS — the
same table aggregate_psd_spectrogram slices with, reference
signal_features.py:1374-1502).  Downstream consumers
(statistics_data_preparation_workflow.build_subject_frame hypothesis
aggregates; cbpa._extract_band_power) must therefore get identical
values from either artifact form.
"""
import numpy as np
import pytest

from mba_tpu.pipeline import signal_features as features
from mba_tpu.pipeline.signal_features import (
    AGGREGATE_BANDS, BandAggregates, band_aggregate_spectrogram,
    fetch_band_aggregates, save_band_aggregates)


@pytest.fixture()
def psd_like():
    rng = np.random.default_rng(0)
    freqs = np.linspace(0, 128, 129)
    spec = rng.normal(-8, 1, size=(40, 129, 16)).astype(np.float32)
    return spec, freqs


@pytest.fixture()
def cmc_like():
    """EMG-pooled CMC-style grid with zeroed off-task windows and one
    all-NaN window (partial coverage)."""
    rng = np.random.default_rng(1)
    freqs = np.linspace(0, 64, 65)
    spec = rng.uniform(0, 1, size=(30, 65, 11)).astype(np.float32)
    spec[:5] = 0.0
    spec[17] = np.nan
    return spec, freqs


def _bands_for(freqs):
    return {name: rng for name, rng in AGGREGATE_BANDS.items()
            if ((freqs >= rng[0]) & (freqs <= rng[1])).any()}


class TestAgainstFullGridAggregator:
    @pytest.mark.parametrize("band", ["all", "theta", "alpha", "beta",
                                      "gamma"])
    def test_psd_band_mean_matches(self, psd_like, band):
        spec, freqs = psd_like
        payload, names, _ = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names,
                             np.zeros((len(names), 2)))
        expected = features.aggregate_psd_spectrogram(
            spec, freqs, freq_slice=band, aggregation_ops=[('mean', 1)])
        np.testing.assert_allclose(agg.select(band, 'mean'), expected,
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("band", ["beta", "gamma"])
    def test_cmc_band_max_matches_with_nans(self, cmc_like, band):
        spec, freqs = cmc_like
        payload, names, _ = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names,
                             np.zeros((len(names), 2)))
        with np.errstate(all='ignore'):
            expected = features.aggregate_psd_spectrogram(
                spec, freqs, freq_slice=band,
                aggregation_ops=[('max', 1)])
        np.testing.assert_allclose(agg.select(band, 'max'), expected,
                                   rtol=1e-6, atol=1e-7)

    def test_channel_reduction_commutes(self, psd_like):
        """select + channel op == sequential [(mean,1),(op,1)] ops."""
        spec, freqs = psd_like
        payload, names, _ = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names,
                             np.zeros((len(names), 2)))
        subset = [2, 5, 7]
        for op_name, op in (("mean", np.nanmean), ("max", np.nanmax)):
            expected = features.aggregate_psd_spectrogram(
                spec, freqs, freq_slice='beta', channel_indices=subset,
                aggregation_ops=[('mean', 1), (op_name, 1)])
            got = op(agg.select('beta', 'mean', channel_indices=subset),
                     axis=1)
            np.testing.assert_allclose(got, expected, rtol=1e-6,
                                       atol=1e-7)

    def test_device_path_matches_host(self, psd_like):
        import jax.numpy as jnp
        spec, freqs = psd_like
        host_payload, names_h, _ = band_aggregate_spectrogram(spec, freqs)
        dev_payload, names_d, _ = band_aggregate_spectrogram(
            jnp.asarray(spec), freqs)
        assert names_h == names_d
        np.testing.assert_allclose(np.asarray(dev_payload), host_payload,
                                   rtol=1e-6, atol=1e-7)

    def test_device_path_nan_semantics(self, cmc_like):
        import jax.numpy as jnp
        spec, freqs = cmc_like
        host_payload, _, _ = band_aggregate_spectrogram(spec, freqs)
        dev_payload = np.asarray(band_aggregate_spectrogram(
            jnp.asarray(spec), freqs)[0])
        np.testing.assert_allclose(dev_payload, host_payload, rtol=1e-6,
                                   atol=1e-7, equal_nan=True)


class TestArtifactRoundtrip:
    def test_save_fetch(self, tmp_path, psd_like):
        spec, freqs = psd_like
        payload, names, edges = band_aggregate_spectrogram(spec, freqs)
        tc = np.arange(len(spec)) * 0.5
        save_band_aggregates(payload, tc, names, edges, "PSD", tmp_path,
                             identifier_suffix="eeg")
        agg = fetch_band_aggregates(tmp_path, "PSD",
                                    file_identifier="eeg")
        np.testing.assert_allclose(agg.payload, payload, rtol=1e-6)
        np.testing.assert_allclose(agg.time_centers, tc)
        assert agg.band_names == names
        assert agg.n_channels == 16

    def test_fetch_missing_raises(self, tmp_path):
        with pytest.raises((ValueError, FileNotFoundError)):
            fetch_band_aggregates(tmp_path, "PSD", file_identifier="eeg")

    def test_unknown_band_raises(self, psd_like):
        spec, freqs = psd_like
        payload, names, edges = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names, edges)
        with pytest.raises(ValueError, match="not stored"):
            agg.select("ripple", "mean")


class TestCbpaExtraction:
    def test_extract_band_power_equivalence_psd(self, psd_like):
        from mba_tpu.pipeline.cbpa import CBPAConfig, _extract_band_power
        spec, freqs = psd_like
        cfg = CBPAConfig(modality="PSD", freq_band="alpha")
        full = _extract_band_power(cfg, spec, freqs, channel_indices=None)
        payload, names, edges = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names, edges)
        lean = _extract_band_power(cfg, agg, None, channel_indices=None)
        np.testing.assert_allclose(lean, full, rtol=1e-6, atol=1e-7)

    def test_extract_band_power_equivalence_cmc(self, cmc_like):
        from mba_tpu.pipeline.cbpa import CBPAConfig, _extract_band_power
        spec, freqs = cmc_like
        cfg = CBPAConfig(modality="CMC", freq_band="beta")
        with np.errstate(all='ignore'):
            full = _extract_band_power(cfg, spec, freqs,
                                       channel_indices=None)
        payload, names, edges = band_aggregate_spectrogram(spec, freqs)
        agg = BandAggregates(payload, np.arange(len(spec)), names, edges)
        lean = _extract_band_power(cfg, agg, None, channel_indices=None)
        np.testing.assert_allclose(lean, full, rtol=1e-6, atol=1e-7,
                                   equal_nan=True)

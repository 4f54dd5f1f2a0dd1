"""Window algebra + phase-normalization golden tests (reference patterns)."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline.data_analysis import (
    apply_window_operator, interpolate_per_window, add_time_index,
    make_timezone_aware, create_trial_bins, phase_normalize_cycles,
    circular_smooth)


def _series(n=100, fs=10.0, start="2024-01-01 12:00:00"):
    idx = pd.date_range(start, periods=n, freq=pd.Timedelta(seconds=1 / fs))
    return pd.Series(np.arange(n, dtype=float), index=idx)


class TestApplyWindowOperator:
    def test_mean_in_fixed_windows(self):
        s = _series()
        centers = pd.date_range("2024-01-01 12:00:02", periods=3,
                                freq="2s")
        out = apply_window_operator(centers, s, window_size=1.0,
                                    is_time_center=True)
        # window at +2s covers samples 15..25 inclusive → mean 20
        np.testing.assert_allclose(out.astype(float), [20.0, 40.0, 60.0])

    def test_variable_windows_and_ops(self):
        s = _series()
        starts = pd.DatetimeIndex([s.index[10], s.index[50]])
        ends = pd.DatetimeIndex([s.index[19], s.index[59]])
        for op, expected in [('min', [10, 50]), ('max', [19, 59]),
                             ('median', [14.5, 54.5])]:
            out = apply_window_operator(starts, s, operation=op,
                                        window_timestamps_ends=ends)
            np.testing.assert_allclose(out.astype(float), expected)

    def test_out_of_range_raises(self):
        s = _series()
        far = pd.DatetimeIndex([s.index[-1] + pd.Timedelta(seconds=60)])
        with pytest.raises(ValueError, match="exceed target timestamp"):
            apply_window_operator(far, s, window_size=1.0,
                                  is_time_center=True)

    def test_requires_window_spec(self):
        s = _series()
        with pytest.raises(ValueError, match="window_size"):
            apply_window_operator(s.index[:2], s)

    def test_numeric_window_timestamps_rejected(self):
        s = _series()
        with pytest.raises(TypeError, match="numeric"):
            apply_window_operator(np.array([1.0, 2.0]), s,
                                  window_size=1.0, is_time_center=True)

    def test_2d_target_multichannel(self):
        s = _series()
        arr = np.stack([s.values, s.values * 2], axis=1)
        centers = pd.DatetimeIndex([s.index[50]])
        out = apply_window_operator(centers, arr,
                                    target_timestamps=s.index,
                                    window_size=1.0, is_time_center=True)
        np.testing.assert_allclose(out.astype(float), [[50.0, 100.0]])

    def test_mode_operation(self):
        idx = pd.date_range("2024-01-01", periods=6, freq="1s")
        s = pd.Series(["a", "a", "b", "c", "c", "c"], index=idx)
        out = apply_window_operator(pd.DatetimeIndex([idx[0], idx[3]]), s,
                                    window_timestamps_ends=pd.DatetimeIndex(
                                        [idx[2], idx[5]]),
                                    operation='mode')
        assert list(out) == ["a", "c"]

    @pytest.mark.parametrize("op", ["mean", "median", "min", "max", "std"])
    def test_vectorized_path_matches_naive_reference(self, op):
        """The padded-cube fast path must equal a per-window boolean-mask
        reference on NaN-laden, overlapping, partly-empty windows
        (last-window-wins overlap semantics, both-inclusive bounds)."""
        rng = np.random.default_rng(42)
        n, n_feat = 300, 3
        idx = pd.date_range("2024-01-01", periods=n, freq="100ms")
        data = rng.standard_normal((n, n_feat))
        data[rng.random((n, n_feat)) < 0.15] = np.nan      # scattered NaN
        data[40:60] = np.nan                               # all-NaN stretch
        # overlapping + disjoint + empty windows (starts not sorted)
        starts = pd.DatetimeIndex([idx[0], idx[10], idx[5], idx[40],
                                   idx[200], idx[250], idx[299]])
        ends = pd.DatetimeIndex([idx[8], idx[30], idx[20], idx[59],
                                 idx[230], idx[249], idx[299]])
        out = apply_window_operator(starts, data, target_timestamps=idx,
                                    window_timestamps_ends=ends,
                                    operation=op).astype(float)
        # naive reference with identical overlap semantics
        assign = np.full(n, -1)
        for w, (s, e) in enumerate(zip(starts, ends)):
            assign[(idx >= s) & (idx <= e)] = w
        fn = {"mean": np.nanmean, "median": np.nanmedian,
              "min": np.nanmin, "max": np.nanmax, "std": np.nanstd}[op]
        expected = np.full((len(starts), n_feat), np.nan)
        with np.errstate(invalid="ignore"):
            import warnings as _w
            with _w.catch_warnings():
                _w.simplefilter("ignore", RuntimeWarning)
                for w in range(len(starts)):
                    rows = data[assign == w]
                    if len(rows):
                        expected[w] = fn(rows, axis=0)
        np.testing.assert_allclose(out, expected, rtol=1e-12,
                                   equal_nan=True)

    def test_vectorized_path_integer_input(self):
        idx = pd.date_range("2024-01-01", periods=20, freq="1s")
        data = np.arange(20, dtype=np.int64)
        out = apply_window_operator(
            pd.DatetimeIndex([idx[0], idx[10]]), data,
            target_timestamps=idx,
            window_timestamps_ends=pd.DatetimeIndex([idx[9], idx[19]]),
            operation="median").astype(float)
        np.testing.assert_allclose(out, [4.5, 14.5])


class TestInterpolatePerWindow:
    def test_linear_full_range(self):
        s = _series(fs=1.0)
        out = interpolate_per_window(np.array([10.5, 20.25]), s)
        np.testing.assert_allclose(out, [10.5, 20.25])

    def test_nan_outside_without_extrapolate(self):
        s = _series(fs=1.0, n=10)
        with pytest.raises(ValueError):
            interpolate_per_window(np.array([50.0]), s)
        out = interpolate_per_window(np.array([50.0]), s, extrapolate=True)
        np.testing.assert_allclose(out, [50.0])  # linear extrapolation


class TestAddTimeIndex:
    def test_series_roundtrip(self):
        start, end = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")
        data = np.arange(5.0)
        s = add_time_index(start, end, target_array=data)
        assert s.index[0] == start and s.index[-1] == end
        assert len(s) == 5

    def test_validation(self):
        t0 = pd.Timestamp("2024-01-01")
        with pytest.raises(ValueError, match="strictly before"):
            add_time_index(t0, t0, n_timesteps=3)
        with pytest.raises(ValueError, match="timezone"):
            add_time_index(t0, pd.Timestamp("2024-01-02", tz="UTC"),
                           n_timesteps=3)
        with pytest.raises(TypeError):
            add_time_index(t0, pd.Timestamp("2024-01-02"),
                           n_timesteps=2.5)


class TestTimezone:
    def test_localize_and_passthrough(self):
        naive = pd.date_range("2024-01-01", periods=3)
        aware = make_timezone_aware(naive)
        assert aware.tz is not None
        # already-aware input passes through unchanged
        assert make_timezone_aware(aware).equals(aware)
        ts = make_timezone_aware(pd.Timestamp("2024-01-01"))
        assert ts.tz is not None


class TestCreateTrialBins:
    def test_intra_subject_percentile_bins(self):
        df = pd.DataFrame({
            "Subject ID": [0] * 10 + [1] * 10,
            "Trial ID": list(range(10)) * 2,
            "force": list(np.arange(10.0)) + list(np.arange(10.0) * 100),
        })
        out = create_trial_bins(df, ["force"], {"force": 5})
        assert "force_bin" in out.columns
        for subj in (0, 1):
            bins = out[out["Subject ID"] == subj]["force_bin"]
            assert set(bins.dropna().unique()) == {1, 2, 3, 4, 5}

    def test_few_unique_values_rank_binning(self):
        df = pd.DataFrame({
            "Subject ID": [0] * 6, "Trial ID": range(6),
            "level": [1.0, 1.0, 2.0, 2.0, 3.0, 3.0],
        })
        out = create_trial_bins(df, ["level"], {"level": 5})
        assert list(out["level_bin"]) == [1, 1, 2, 2, 3, 3]


class TestPhaseNormalizeCycles:
    def test_interpolates_cycle_local_positions(self):
        t_rel = np.arange(0.0, 3.0, 0.1)
        cycles = phase_normalize_cycles(
            signal=t_rel.copy(), t_rel=t_rel, task_freq=1.0,
            trial_dur_sec=3.0,
            phase_grid=np.array([0.0, 90.0, 180.0, 270.0, 360.0]),
            min_samples_per_cycle=2, min_cycle_coverage_ratio=0.0,
            use_interpolation=True, verbose=False)
        assert len(cycles) == 3
        mids = np.array([c[2] for c in cycles])
        np.testing.assert_allclose(mids, [0.5, 1.5, 2.5], atol=1e-6)

    def test_closed_grid_profile_closure(self):
        t_rel = np.arange(0.0, 3.0, 0.1)
        cycles = phase_normalize_cycles(
            signal=2.0 * t_rel + 3.0, t_rel=t_rel, task_freq=1.0,
            trial_dur_sec=3.0,
            phase_grid=np.array([0.0, 120.0, 240.0, 360.0]),
            min_samples_per_cycle=2, min_cycle_coverage_ratio=0.0,
            use_interpolation=True, verbose=False)
        assert len(cycles) == 3
        for c in cycles:
            assert c[0] == c[-1]

    def test_partial_cycle_keeps_nan_first_bin(self):
        # cycle 1 starts late → phase 0 unobserved → NaN, not invented
        t_rel = np.array([0.0, 0.2, 0.4, 0.6, 0.8, 1.2, 1.4, 1.6, 1.8])
        cycles = phase_normalize_cycles(
            signal=np.sin(2 * np.pi * t_rel), t_rel=t_rel, task_freq=1.0,
            trial_dur_sec=2.0,
            phase_grid=np.array([0.0, 90.0, 180.0, 270.0]),
            min_samples_per_cycle=2, min_cycle_coverage_ratio=0.0,
            use_interpolation=True, verbose=False)
        assert len(cycles) == 2
        assert np.isfinite(cycles[0][0])
        assert np.isnan(cycles[1][0])

    def test_2d_multichannel(self):
        t_rel = np.arange(0.0, 2.0, 0.05)
        sig = np.stack([t_rel, -t_rel], axis=1)
        cycles = phase_normalize_cycles(
            sig, t_rel, task_freq=1.0, trial_dur_sec=2.0,
            phase_grid=np.linspace(0, 360, 13),
            min_samples_per_cycle=2, min_cycle_coverage_ratio=0.0,
            verbose=False)
        assert len(cycles) == 2
        assert cycles[0].shape == (13, 2)
        np.testing.assert_allclose(cycles[0][:, 0], -cycles[0][:, 1])

    def test_min_coverage_skips_cycles(self):
        t_rel = np.array([0.0, 0.05, 0.1])  # only 10% of cycle covered
        cycles = phase_normalize_cycles(
            np.ones(3), t_rel, task_freq=1.0, trial_dur_sec=1.0,
            phase_grid=np.linspace(0, 360, 5), min_samples_per_cycle=2,
            min_cycle_coverage_ratio=0.8, verbose=False)
        assert cycles == []

    def test_nearest_bin_mode(self):
        t_rel = np.arange(0.0, 1.0, 0.01)
        cycles = phase_normalize_cycles(
            np.sin(2 * np.pi * t_rel), t_rel, task_freq=1.0,
            trial_dur_sec=1.0, phase_grid=np.array([0.0, 90.0, 180.0, 270.0]),
            min_samples_per_cycle=2, min_cycle_coverage_ratio=0.0,
            use_interpolation=False, verbose=False)
        assert len(cycles) == 1
        # bin at 90° averages sin over the ±45° arc: mean = 2·sin(45°)/(π/2)
        np.testing.assert_allclose(cycles[0][1], 0.9003, atol=0.02)


class TestCircularSmooth:
    def test_wraparound_and_shape(self):
        x = np.zeros(36)
        x[0] = 36.0
        sm = circular_smooth(x, kernel_bins=3)
        assert sm.shape == x.shape
        assert sm[-1] > 0  # mass leaked across the wrap boundary
        np.testing.assert_allclose(sm.sum(), x.sum(), rtol=0.2)


def test_window_operator_mixed_datetime64_units():
    """pandas ≥ 2 infers different datetime64 units from different
    sources (string parse → [us]; Timestamp+Timedelta arithmetic →
    [ns]).  The window assignment compares raw asi8 integers, so mixed
    units must be normalized or every sample lands in no window
    (regression: r5 anchored sampler stamps made the serial index [ns]
    while the log-derived segment spans stayed [us], silently NaN-ing
    every serial median in the statistics frame)."""
    import pandas as pd
    anchor = pd.Timestamp("2026-01-01 12:00:00", tz="UTC")
    # target: ns-unit index from timestamp arithmetic
    target_times = pd.DatetimeIndex(
        [anchor + pd.Timedelta(seconds=i * 0.1)
         for i in range(100)]).as_unit("ns")
    assert target_times.dtype == "datetime64[ns, UTC]"
    values = np.arange(100, dtype=np.float64)
    # windows: us-unit index from string parsing (the log path)
    starts = pd.DatetimeIndex(pd.to_datetime(
        ["2026-01-01 12:00:01", "2026-01-01 12:00:05"], utc=True))
    ends = pd.DatetimeIndex(pd.to_datetime(
        ["2026-01-01 12:00:03", "2026-01-01 12:00:08"], utc=True))
    if hasattr(starts, "as_unit"):
        starts, ends = starts.as_unit("us"), ends.as_unit("us")
    from mba_tpu.pipeline import data_analysis
    out = data_analysis.apply_window_operator(
        window_timestamps=starts, window_timestamps_ends=ends,
        target_array=values, target_timestamps=target_times,
        operation="mean", axis=0)
    np.testing.assert_allclose(out.astype(float),
                               [np.mean(values[10:31]),
                                np.mean(values[50:81])])

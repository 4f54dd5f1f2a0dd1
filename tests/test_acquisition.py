"""Acquisition subsystem tests, incl. the full headless experiment →
log-enrichment chain (the reference's fake-device pattern, end-to-end)."""
import time

import numpy as np
import pandas as pd
import pytest

from mba_tpu.acquisition.sampling import (read_serial_measurements,
                                          dynamometer_volt_to_force,
                                          dummy_sampling_process,
                                          accuracy_sampler)
from mba_tpu.acquisition.experiment import (ExperimentConfig,
                                            start_experiment_processes,
                                            calibrate_mvc)
from mba_tpu.pipeline.sensor_calibration import (fit_power_law,
                                                 calibration_rmse,
                                                 power_law)
from mba_tpu.utils.multiprocessing_tools import (RobustEventManager,
                                                 SharedString)


class TestLineParser:
    @pytest.mark.parametrize("use_native", [True, False])
    def test_protocol_and_smoothing(self, use_native):
        p = read_serial_measurements(ema_alpha=1.0,
                                     use_native=use_native)
        n = p.feed(b"FSR:1.5\nECG:0.3\nGSR:2.0\n")
        assert n == 1
        assert p.latest() == {"fsr": 1.5, "ecg": 0.3, "gsr": 2.0}
        # malformed value skipped; the next VALID FSR completes a sample
        p.feed(b"FSR:garbage\nECG:0.4\nGSR:2.1\nFSR:1.6\n")
        assert p.latest()["fsr"] == 1.6
        assert p.latest()["ecg"] == 0.4

    @pytest.mark.parametrize("use_native", [True, False])
    def test_split_feeds(self, use_native):
        p = read_serial_measurements(ema_alpha=1.0,
                                     use_native=use_native)
        p.feed(b"FSR:2.")
        p.feed(b"5\nECG:1.0\nGS")
        n = p.feed(b"R:3.0\n")
        assert p.latest()["fsr"] == 2.5
        assert p.latest()["gsr"] == 3.0

    def test_ema_smoothing(self):
        p = read_serial_measurements(ema_alpha=0.5, use_native=False)
        p.feed(b"FSR:0.0\nECG:0\nGSR:0\nFSR:2.0\nECG:0\nGSR:0\n")
        assert p.latest()["fsr"] == pytest.approx(1.0)


class TestDynamometer:
    def test_calibration_map(self):
        # F = 2.2 * V^4.1071 (reference :213-219)
        assert dynamometer_volt_to_force(1.0) == pytest.approx(2.2)
        assert dynamometer_volt_to_force(2.0) == pytest.approx(
            2.2 * 2 ** 4.1071)
        # %MVC conversion
        assert dynamometer_volt_to_force(1.0, mvc_kg=22.0) == \
            pytest.approx(10.0)

    def test_power_law_fit_roundtrip(self):
        volts = np.array([1.0, 1.3, 1.6, 1.9, 2.1])
        forces = power_law(volts, 2.8708, 4.1071)
        a, b = fit_power_law(volts, forces)
        assert a == pytest.approx(2.8708, rel=1e-3)
        assert b == pytest.approx(4.1071, rel=1e-3)
        assert calibration_rmse(volts, forces, a, b) < 1e-6


class TestIpcPrimitives:
    def test_robust_event_counts_triggers(self):
        import multiprocessing as mp
        manager = mp.Manager()
        ev = RobustEventManager(manager)
        assert not ev.is_set()
        ev.set()
        ev.set()
        assert ev.is_set()
        assert ev.consume()
        assert ev.consume()   # second trigger still observable
        assert not ev.consume()

    def test_shared_string(self):
        s = SharedString("hello")
        assert s.get() == "hello"
        s.value = "ünïcode ✓"
        assert s.value == "ünïcode ✓"
        s.set("x" * 5000)   # truncated at capacity, no crash
        assert len(s.get().encode()) <= 1024


class TestDummySampler:
    def test_produces_samples_and_final_save(self, tmp_path):
        import multiprocessing as mp
        manager = mp.Manager()
        shared = manager.dict()
        stop = manager.Event()
        dummy_sampling_process(shared, stop, tmp_path,
                               sampling_rate_hz=200.0, run_for_sec=0.5)
        assert shared["n_samples"] > 50
        assert {"fsr", "ecg", "gsr"} <= set(shared.keys())
        final = list(tmp_path.glob("*Final Save.csv"))
        assert final
        df = pd.read_csv(final[0])
        assert len(df) == shared["n_samples"]

    def test_accuracy_sampler_rmse(self, tmp_path):
        import multiprocessing as mp
        manager = mp.Manager()
        shared = manager.dict()
        stop = manager.Event()
        shared["fsr"] = 1.0   # constant force
        rmse, n = accuracy_sampler(
            shared, stop, tmp_path, target_frequency_hz=1.0,
            mvc_kg=22.0, sampling_rate_hz=100.0,
            start_offset_sec=0.05, run_for_sec=0.5)
        assert n > 20
        # constant 10 %MVC vs sine 7.5-22.5: RMSE ≈ rms of (10 - target)
        assert 3 < rmse < 12
        assert list(tmp_path.glob("*Trial Accuracy Results.csv"))


class TestExperimentChain:
    def test_headless_experiment_feeds_data_integration(self, tmp_path):
        """Full chain: phase machine (dummy sampler) → artifacts →
        fetch_experiment_log → prepare_log_frame → task spans."""
        cfg = ExperimentConfig(
            subject_id=3, output_dir=tmp_path,
            trial_duration_sec=40.0,  # scaled by time_scale below
            n_trials_per_category=1, categories=["Happy", "Sad"],
            n_silence_trials=1, task_frequencies_hz=[0.5],
            mvc_calibration_sec=10.0, dummy_mode=True)
        results = start_experiment_processes(cfg, time_scale=0.02)
        assert len(results["trials"]) == 3
        assert results["mvc_kg"] > 0

        subject_dir = tmp_path / "subject_03"
        # artifacts exist
        assert list(subject_dir.glob("*Subject Data.json"))
        assert list(subject_dir.glob("*Post-Study Feedback Data.json"))
        assert list((subject_dir / "experiment_logs").glob(
            "*Final Full Save.csv"))
        assert list((subject_dir / "serial_measurements").glob(
            "*Final Save.csv"))
        song_dirs = list(subject_dir.glob("song_*"))
        assert len(song_dirs) == 2
        for d in song_dirs:
            assert list(d.glob("*Familiarity Check.json"))
            assert list(d.glob("*Post-Trial Rating.json"))
            assert list(d.glob("*Trial Accuracy Results.csv"))

        # downstream integration consumes the artifacts unchanged
        from mba_tpu.pipeline import data_integration as di
        log = di.fetch_experiment_log(subject_dir)
        # time_scale shrinks trials below the reference's 6-s RMSE delay,
        # so the end adjustment must scale with it
        enriched = di.prepare_log_frame(log, set_time_index=False,
                                        avg_end_delay_seconds=0.1)
        assert enriched["Song ID"].max() == 1
        assert enriched["Silence ID"].max() == 0
        start, end = di.get_qtc_measurement_start_end(enriched,
                                                      verbose=False)
        assert start < end
        spans = di.get_all_task_start_ends(
            enriched, output_type='list',
            assumed_latency_sec=0.0,
            cut_off_sec_to_prevent_transients=0.0)
        assert len(spans) == 3
        personal = di.fetch_personal_data(subject_dir)
        assert personal["Listening habit [0-3]"] == 2

    def test_mvc_calibration(self):
        import multiprocessing as mp
        manager = mp.Manager()
        shared = manager.dict()
        shared["fsr"] = 1.5
        mvc = calibrate_mvc(shared, duration_sec=0.1)
        assert mvc == pytest.approx(dynamometer_volt_to_force(1.5))


class TestCrashResilience:
    """Triple-tier saving survives a hard kill (SURVEY.md §5 failure
    detection): the rolling Redundant Save loads through the serial
    fetch path when no Final Save was ever written."""

    def test_redundant_save_survives_sigkill(self, tmp_path):
        import multiprocessing as mp
        import time as _time
        from mba_tpu.acquisition.sampling import dummy_sampling_process
        from mba_tpu.pipeline.data_integration import (
            fetch_serial_measurements)

        subj = tmp_path / "subject_00"
        sdir = subj / "serial_measurements"
        sdir.mkdir(parents=True)
        mgr = mp.Manager()
        stop = mgr.Event()
        shared = mgr.dict()
        p = mp.Process(target=dummy_sampling_process,
                       kwargs=dict(shared_dict=shared, stop_event=stop,
                                   save_dir=sdir, run_for_sec=60.0))
        p.start()
        # wait until at least one rolling redundant save landed
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            if list(sdir.glob("*Redundant Save*.csv")):
                break
            _time.sleep(0.25)
        p.terminate()                       # hard kill — no final save
        p.join(timeout=10)
        assert not list(sdir.glob("*Final Save*.csv"))
        frame = fetch_serial_measurements(subj)
        assert len(frame) > 50
        assert {"fsr", "ecg", "gsr"} <= set(frame.columns)

    def test_interim_tier_same_layout(self, tmp_path):
        from mba_tpu.acquisition.sampling import (_interim_saver,
                                                  _tiered_saver)
        import pandas as pd
        rows = [{"Time": pd.Timestamp.now(), "fsr": 1.0, "ecg": 0.1,
                 "gsr": 2.0} for _ in range(5)]
        _interim_saver(tmp_path, rows)
        _tiered_saver(tmp_path, rows, final=True)
        interim = next(tmp_path.glob("*Interim Save WorkMem Full*.csv"))
        final = next(tmp_path.glob("*Final Save*.csv"))
        # identical header layout: unnamed time index + channel columns
        assert open(interim).readline() == open(final).readline()


class TestGuidedCalibrationSession:
    def test_headless_session_fits_power_law(self, capsys):
        from mba_tpu.pipeline.sensor_calibration import (
            run_calibration_session)
        a_true, b_true = 2.8708, 4.1071
        weights = [2.5, 5.0, 10.0, 20.0]
        volts = [(w / a_true) ** (1.0 / b_true) for w in weights]
        state = {"i": -1}

        class SharedDict(dict):
            # each prompt advances to the next held weight
            def get(self, key):
                return volts[state["i"]] if key == "fsr" else None

        def prompt(_msg):
            state["i"] += 1

        out = run_calibration_session(SharedDict(), weights_kg=weights,
                                      hold_sec=0.05, poll_hz=200.0,
                                      prompt=prompt)
        assert abs(out["a"] - a_true) < 0.05
        assert abs(out["b"] - b_true) < 0.05
        assert out["rmse_kg"] < 0.05
        assert "Fitted F" in capsys.readouterr().out

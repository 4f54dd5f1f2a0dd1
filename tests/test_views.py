"""Interactive-view layer: AnimationManager, forms, live input view,
master control view, performance view, heatmap animation, OTB4 viewer,
serial-testing workflow — all driven headless (Agg)."""
import numpy as np
import pandas as pd
import pytest
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from mba_tpu.acquisition.experiment import ExperimentLog
from mba_tpu.acquisition.views import (
    AnimationManager, onboarding_form, offboarding_form,
    familiarity_form, post_trial_rating_form, breakout_countdown,
    FormController, plot_input_view, QtcControlMasterView,
    plot_performance_view)
from mba_tpu.pipeline.visualizations import animate_electrode_heatmap
from mba_tpu.io.otb4 import show_graph
from mba_tpu.utils import file_management as filemgmt


class _Event:
    def __init__(self):
        self._set = False

    def set(self):
        self._set = True

    def is_set(self):
        return self._set


class TestAnimationManager:
    def test_step_counts_frames(self):
        fig = plt.figure()
        calls = []
        mgr = AnimationManager(fig, lambda f: calls.append(f))
        mgr.step(3)
        assert len(calls) == 3
        mgr.stop()

    def test_stop_event_halts_updates(self):
        fig = plt.figure()
        stop = _Event()
        calls = []
        mgr = AnimationManager(fig, lambda f: calls.append(f),
                               stop_event=stop)
        mgr.step(2)
        stop.set()
        mgr.step(3)          # must not call user update any more
        assert len(calls) == 2


class TestForms:
    def test_onboarding_defaults_match_default_controller(self):
        result = onboarding_form(interactive=False)
        assert result["Gender"] == "diverse"
        assert result["Dominant hand"] == "Right"
        assert result["Musical skill"] == 2

    def test_prefill_overrides(self):
        result = onboarding_form(interactive=False, prefill={
            "Gender": "female", "Musical skill": 6,
            "Name": "Test Subject"})
        assert result["Gender"] == "female"
        assert result["Musical skill"] == 6
        assert result["Name"] == "Test Subject"

    def test_other_forms(self):
        assert offboarding_form()["Total pleasure"] == 3
        assert familiarity_form("Song by Artist")["Familiarity"] == 3
        rating = post_trial_rating_form("song_000",
                                        prefill={"Liking": 7})
        assert rating["Liking"] == 7
        assert rating["Emotional State"] == 3

    def test_breakout_countdown_ticks(self):
        ticks = []
        n = breakout_countdown(2.4, tick_fn=ticks.append)
        assert n == 3
        assert ticks == [3, 2, 1]

    def test_form_controller_protocol(self):
        ctrl = FormController(prefills={"familiarity":
                                        {"Familiarity": 5}})
        assert ctrl.onboarding()["Listening habit"] == \
            "A small part of the day"
        assert ctrl.familiarity("x")["Familiarity"] == 5
        assert ctrl.post_trial_rating("song_000")["Liking"] == 3
        assert ctrl.offboarding()["Total fatigue"] == 2


class TestInputView:
    def test_trace_and_gauge_update(self):
        shared = {"fsr": 1.8, "accuracy": 0.25}
        mgr = plot_input_view(shared, mvc_kg=30.0, window_sec=2.0,
                              refresh_hz=10.0)
        artists = mgr.step(5)
        trace = artists[0].get_ydata()
        assert np.isfinite(trace[-5:]).all()      # 5 frames of force
        assert np.isnan(trace[0])                 # buffer not yet full
        assert "0.25" in artists[3].get_text()
        mgr.stop()

    def test_missing_force_gives_nan(self):
        mgr = plot_input_view({}, window_sec=1.0, refresh_hz=10.0)
        artists = mgr.step(2)
        assert np.isnan(artists[0].get_ydata()[-1])
        mgr.stop()


class TestMasterView:
    def test_buttons_drive_log_and_events(self, tmp_path):
        log = ExperimentLog(tmp_path / "logs")
        start, stop = _Event(), _Event()
        view = QtcControlMasterView(
            log, ["Familiar Happy", "Familiar Sad"],
            start_trigger_event=start, stop_trigger_event=stop,
            rng_seed=1)
        view.press("Start Trigger")
        assert start.is_set()
        assert log.rows[-1]["Event"] == "Start Trigger"
        cat = view.category_order[0]
        view.press(cat)
        assert cat in log.rows[-1]["Music"]
        view.press("Interim Save")
        assert list((tmp_path / "logs").glob(
            "*Interim Save*.csv"))
        view.press("WorkMem Save")
        assert log.rows == []                     # flushed
        view.press("Stop Trigger")
        assert stop.is_set()
        view.set_dc_offset(0.3)
        assert view.shared_dict["dc_offset"] == pytest.approx(0.3)
        view.close()

    def test_category_order_is_seeded_permutation(self, tmp_path):
        log = ExperimentLog(tmp_path / "logs")
        cats = ["A", "B", "C", "D"]
        v1 = QtcControlMasterView(log, cats, rng_seed=7)
        v2 = QtcControlMasterView(log, cats, rng_seed=7)
        assert v1.category_order == v2.category_order
        assert sorted(v1.category_order) == cats
        v1.close()
        v2.close()


class TestPerformanceView:
    def test_rmse_boxplots(self, tmp_path):
        for subj, rmse_scale in ((0, 1.0), (1, 2.0)):
            for trial in range(2):
                tdir = (tmp_path / f"subject_{subj:02}"
                        / f"song_{trial:03}")
                tdir.mkdir(parents=True)
                sq = np.full(10, rmse_scale ** 2)
                pd.DataFrame({"Time": pd.date_range(
                    "2026-01-01", periods=10, freq="100ms"),
                    "Squared Error": sq}).to_csv(
                    tdir / filemgmt.file_title(
                        "Trial Accuracy Results", ".csv"), index=False)
        fig, per_subject = plot_performance_view(tmp_path)
        assert per_subject[0] == pytest.approx([1.0, 1.0])
        assert per_subject[1] == pytest.approx([2.0, 2.0])
        plt.close(fig)


class TestHeatmapAnimation:
    def test_gif_saved(self, tmp_path):
        data = np.random.default_rng(0).standard_normal((64, 6))
        out = tmp_path / "anim.gif"
        fig, anim = animate_electrode_heatmap(
            data, max_frames=3, fps=5, save_path=out)
        assert out.exists() and out.stat().st_size > 0
        plt.close(fig)


class TestOtb4Viewer:
    def test_array_input(self, tmp_path):
        data = np.random.default_rng(0).standard_normal((8, 2000))
        fig, ax = show_graph(data, sampling_freq=100.0,
                             channels=[0, 2, 4], save_dir=tmp_path)
        assert len(ax.get_lines()) == 3
        assert list(tmp_path.glob("*OTB4 Signal Viewer*.png"))
        plt.close(fig)


class TestSerialTesting:
    def test_inspect_ecg_with_hr(self, tmp_path):
        from mba_tpu.workflows.serial_testing_workflow import (
            inspect_serial_modality)
        sdir = tmp_path / "serial_measurements"
        sdir.mkdir()
        fs, dur = 360.0, 30.0
        t = np.arange(int(fs * dur)) / fs
        beat = np.exp(-(((t * 70 / 60) % 1.0 - 0.5) / 0.03) ** 2)
        df = pd.DataFrame({
            "Time": pd.date_range("2026-01-01", periods=len(t),
                                  freq=pd.Timedelta(seconds=1 / fs)),
            "fsr": 1.5 + 0.5 * np.sin(2 * np.pi * 0.1 * t),
            "ecg": beat, "gsr": 2.0 + 0 * t})
        df.to_csv(sdir / filemgmt.file_title(
            "Serial Measurements Final Save", ".csv"))
        fig = inspect_serial_modality(tmp_path, "ecg",
                                      save_dir=tmp_path / "out")
        assert list((tmp_path / "out").glob("*Serial Testing ecg*.png"))
        plt.close(fig)

    def test_unknown_modality_raises(self, tmp_path):
        from mba_tpu.workflows.serial_testing_workflow import (
            inspect_serial_modality)
        sdir = tmp_path / "serial_measurements"
        sdir.mkdir()
        pd.DataFrame({"Time": pd.date_range("2026-01-01", periods=5,
                                            freq="10ms"),
                      "fsr": np.ones(5)}).to_csv(
            sdir / filemgmt.file_title(
                "Serial Measurements Final Save", ".csv"))
        with pytest.raises(ValueError, match="modality"):
            inspect_serial_modality(tmp_path, "nope")

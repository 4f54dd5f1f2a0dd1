"""Log enrichment + time-span API tests on a synthetic experiment log."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline import data_integration as di


def make_raw_log():
    """Synthetic raw log covering one song trial, one silence trial, a
    skipped song, triggers, questionnaires — the grammar of the reference's
    acquisition GUI status strings."""
    rows = []
    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def add(sec, music="No track playing currently.", quest="", event=""):
        rows.append({"Time": t0 + pd.Timedelta(seconds=sec),
                     "Music": music, "Questionnaire": quest,
                     "Event": event})

    add(0, event="Start Trigger")
    # --- song trial: category "Energizing (1/11)", song by artist ---
    song = "Energizing (1/11) | Thunder by Imagine Dragons | 10s / 180s"
    add(5, music=song)
    add(6, music=song, quest="Familiarity check result: 4")
    add(8, music=song, quest="Starting motor task with target frequency "
                             "0.50Hz")
    for s in range(9, 40):
        add(s, music=song.replace("10s", f"{s}s"))
    add(40, music=song.replace("10s", "40s"),
        quest="Achieved RMSE: 0.123")
    add(41, music=song.replace("10s", "41s"),
        quest="{'Liking': 5, 'Fitting Category': 4, 'Emotional State': 3}")
    # --- skipped song (no task started) ---
    skipped = "Relaxing (2/11) | Weightless by Marconi Union | 5s / 200s"
    add(45, music=skipped)
    add(47, music=skipped.replace("5s", "7s"))
    # --- silence trial ---
    add(50, quest="Starting motor task with target frequency 0.25Hz")
    for s in range(51, 80):
        add(s)
    add(80, quest="Achieved RMSE: 0.456")
    add(81, quest="{'Liking': 2, 'Emotional State': 4}")
    # --- test task (must NOT create a trial) ---
    add(85, quest="Starting test motor task with target frequency 0.50Hz")
    add(90, event="Stop Trigger")
    return pd.DataFrame(rows)


@pytest.fixture
def enriched():
    return di.prepare_log_frame(make_raw_log(), set_time_index=False)


class TestPrepareLogFrame:
    def test_music_parsing(self, enriched):
        song_rows = enriched[enriched["Song Title"] == "Thunder"]
        assert (song_rows["Music Category"] == "Energizing").all()
        assert (song_rows["Song Artist"] == "Imagine Dragons").all()
        assert (song_rows["Within Category Song Index"] == 1).all()
        assert song_rows["Song Runtime"].iloc[0] == 10.0

    def test_task_frequency_and_rmse(self, enriched):
        active = enriched[enriched["Task Frequency"].notna()]
        assert set(active["Task Frequency"].astype(float)) == {0.5, 0.25}
        rmse = enriched.loc[enriched["Song Title"] == "Thunder",
                            "Task RMSE"].dropna().astype(float)
        assert (rmse == 0.123).all()

    def test_test_task_creates_no_trial(self, enriched):
        # the "test motor task" row must have no Task Frequency
        test_rows = enriched[enriched["Questionnaire"].str.contains(
            "test motor", na=False)]
        assert test_rows["Task Frequency"].isna().all()

    def test_trial_song_silence_ids(self, enriched):
        assert enriched["Song ID"].max() == 1          # two songs (0, 1)
        assert enriched["Silence ID"].max() == 0       # one silence
        assert enriched["Trial ID"].max() == 2         # three trials
        # skipped song flagged
        skipped = enriched[enriched["Song Title"] == "Weightless"]
        assert skipped["Song Skipped"].all()
        played = enriched[enriched["Song Title"] == "Thunder"]
        assert not played["Song Skipped"].any()

    def test_phases(self, enriched):
        phases = set(enriched["Phase"].dropna().unique())
        assert "Energizing Task" in phases
        assert "Silence Task" in phases
        assert "Energizing Listening" in phases

    def test_questionnaire_propagation(self, enriched):
        thunder = enriched[enriched["Song Title"] == "Thunder"]
        assert (thunder["Familiarity"].dropna() == 4).all()
        assert (thunder["Liking"].dropna() == 5).all()
        silence = enriched[enriched["Silence ID"].notna()]
        assert (silence["Liking"].dropna() == 2).all()
        assert (silence["Emotional State"].dropna() == 4).all()


class TestTimeSpans:
    def test_trial_id_algebra(self, enriched):
        song_id, silence_id = di.turn_trial_id_into_song_or_silence_id(
            enriched, 0)
        assert song_id == 0 and silence_id is None
        assert di.turn_song_or_silence_id_into_trial_id(
            enriched, song_id=0) == 0
        assert di.turn_song_or_silence_id_into_trial_id(
            enriched, silence_id=0) == 2
        with pytest.raises(ValueError):
            di.turn_song_or_silence_id_into_trial_id(enriched)

    def test_task_start_end_latency_and_cutoff(self, enriched):
        start, end = di.get_task_start_end(enriched, song_id=0)
        # task rows span 8..40 s, but the 6-s RMSE-delay end adjustment
        # clears frequencies after 40−6=34 s; +3.25 s latency, −2 s cutoff
        t0 = pd.Timestamp("2024-01-01 12:00:00")
        assert start == t0 + pd.Timedelta(seconds=8 + 3.25)
        assert end == t0 + pd.Timedelta(seconds=34 + 3.25 - 2.0)

    def test_span_table_fast_path_matches_mask_path(self, enriched):
        """The memoized span-table fast path (r5, _span_table) must be
        indistinguishable from the verbose mask path — spans, trial-id
        algebra, and every raise."""
        for kwargs in (dict(song_id=0), dict(trial_id=0),
                       dict(silence_id=0), dict(trial_id=2),
                       dict(song_id=0, assumed_latency_sec=0.0,
                            cut_off_sec_to_prevent_transients=0.5)):
            fast = di.get_task_start_end(enriched, **kwargs)
            slow = di.get_task_start_end(enriched, verbose=True,
                                         **kwargs)
            assert fast == slow, kwargs
        # missing ids raise the same ValueError on both paths
        for kwargs in (dict(song_id=99), dict(silence_id=99)):
            with pytest.raises(ValueError, match="not found"):
                di.get_task_start_end(enriched, **kwargs)
            with pytest.raises(ValueError, match="not found"):
                di.get_task_start_end(enriched, verbose=True, **kwargs)
        # a mutated COPY must get a fresh table (pandas propagates
        # .attrs through copies — the token fingerprints the digested
        # columns, so the exclusion flip invalidates the parent table)
        marked = di.annotate_trial(enriched, "bad", exclude=True,
                                   song_id=0)
        with pytest.raises(ValueError, match="exclusion"):
            di.get_task_start_end(marked, song_id=0)
        # and the original keeps serving its own (no stale cross-talk)
        assert di.get_task_start_end(enriched, song_id=0) == \
            di.get_task_start_end(enriched, song_id=0, verbose=True)

    def test_all_task_start_ends_skips_invalid(self, enriched):
        spans = di.get_all_task_start_ends(enriched, output_type='dict')
        assert set(spans.keys()) == {0, 2}   # skipped song 1 absent
        for s, e in spans.values():
            assert s.tz is not None and s < e

    def test_excluded_trial_raises(self, enriched):
        marked = di.annotate_trial(enriched, "bad emg", exclude=True,
                                   song_id=0)
        with pytest.raises(ValueError, match="exclusion"):
            di.get_task_start_end(marked, song_id=0)
        assert di.fetch_excluded_trials(marked) == [0]
        spans = di.get_all_task_start_ends(marked, output_type='list')
        assert len(spans) == 1   # only the silence trial remains

    def test_qtc_measurement_span(self, enriched):
        start, end = di.get_qtc_measurement_start_end(enriched,
                                                      verbose=False)
        t0 = pd.Timestamp("2024-01-01 12:00:00", tz="UTC")
        assert start == t0 + pd.Timedelta(seconds=0.75)
        assert end == t0 + pd.Timedelta(seconds=90.75)

    def test_actual_start_trigger_override(self, enriched):
        df = enriched.copy()
        override_time = pd.Timestamp("2024-01-01 12:00:03")
        new_row = df.iloc[[0]].copy()
        new_row["Time"] = override_time
        new_row["Event"] = "Actual Start Trigger"
        df = pd.concat([df, new_row], ignore_index=True)
        start, _ = di.get_qtc_measurement_start_end(df, verbose=False)
        assert start == override_time.tz_localize("UTC")

    def test_duplicate_triggers_raise(self, enriched):
        df = pd.concat([enriched, enriched.iloc[[0]]], ignore_index=True)
        with pytest.raises(ValueError, match="Expected exactly one"):
            di.get_qtc_measurement_start_end(df, verbose=False)

    def test_song_start_end(self, enriched):
        s, e = di.get_song_start_end(enriched, song_id=0)
        assert s < e


class TestAccuracyAxis:
    def test_offset_and_endpoint_semantics(self):
        axis = di.build_accuracy_relative_time_axis(10, trial_dur_sec=45.0)
        assert len(axis) == 10
        assert axis[0] == pytest.approx(5.5)
        assert axis[-1] < 45.0       # endpoint=False
        # spacing = effective_dur / n
        assert np.diff(axis)[0] == pytest.approx((45.0 - 5.5) / 10)

    def test_degenerate_cases(self):
        assert len(di.build_accuracy_relative_time_axis(0, 45.0)) == 0
        assert len(di.build_accuracy_relative_time_axis(10, 3.0)) == 0
        with pytest.raises(ValueError):
            di.build_accuracy_relative_time_axis(5, np.inf)


class TestCuration:
    def test_remove_song_entries_roundtrip(self, enriched):
        raw = make_raw_log()
        cleaned = di.remove_song_entries(
            enriched, raw, [("Thunder", "Imagine Dragons", 0)])
        re_enriched = di.prepare_log_frame(cleaned, set_time_index=False)
        assert "Thunder" not in re_enriched["Song Title"].dropna().values

    def test_remove_silence_trial_roundtrip(self, enriched):
        raw = make_raw_log()
        cleaned = di.remove_silence_trial(enriched, raw, [0])
        re_enriched = di.prepare_log_frame(cleaned, set_time_index=False)
        assert re_enriched["Silence ID"].dropna().empty

    def test_remove_single_row(self):
        raw = make_raw_log()
        ts = raw["Time"].iloc[3]
        out = di.remove_single_row_by_timestamp(raw, ts)
        assert len(out) == len(raw) - 1


class TestLoaders:
    def test_fetch_experiment_log_tiers(self, tmp_path):
        log_dir = tmp_path / "experiment_logs"
        log_dir.mkdir()
        raw = make_raw_log()
        half = len(raw) // 2
        raw.iloc[:half].to_csv(
            log_dir / "2024-01-01 12_10_00 Working Memory Full Save.csv",
            index=False)
        raw.iloc[half:].to_csv(
            log_dir / "2024-01-01 12_20_00 Final Full Save.csv",
            index=False)
        log = di.fetch_experiment_log(tmp_path)
        assert len(log) == len(raw)
        assert log["Time"].is_monotonic_increasing

    def test_fetch_serial_measurements(self, tmp_path):
        sdir = tmp_path / "serial_measurements"
        sdir.mkdir()
        idx = pd.date_range("2024-01-01 12:00:00", periods=100, freq="1s")
        df = pd.DataFrame({"Unnamed: 0": range(100),
                           "Unnamed: 1": idx.astype(str),
                           "fsr": np.arange(100.0),
                           "ecg": np.zeros(100)})
        df.iloc[:60].to_csv(
            sdir / "2024-01-01 12_01_00 Interim Save WorkMem Full.csv",
            index=False)
        df.iloc[60:].to_csv(sdir / "2024-01-01 12_02_00 Final Save.csv",
                            index=False)
        out = di.fetch_serial_measurements(tmp_path)
        assert len(out) == 100
        assert out.index.tz is not None
        assert "fsr" in out.columns

    def test_fetch_personal_data(self, tmp_path):
        import json
        (tmp_path / "2024-01-01 10_00_00 Subject Data.json").write_text(
            json.dumps({"Name": "X", "Birthdate": "2000", "Gender": "d",
                        "Dominant hand": "Right",
                        "Listening habit": "Most of the day",
                        "Dancing habit": 1, "Athleticism": 2,
                        "Musical skill": 3}))
        (tmp_path / "2024-01-01 18_00_00 Post-Study Feedback Data.json"
         ).write_text(json.dumps({"Total fatigue": 2, "Total pleasure": 4}))
        data = di.fetch_personal_data(tmp_path)
        assert "Name" not in data
        assert data["Listening habit [0-3]"] == 3
        assert data["Total pleasure"] == 4

    def test_fetch_trial_questionnaire(self, tmp_path):
        import json
        trial = tmp_path / "song_000"
        trial.mkdir()
        (trial / "2024-01-01 12_00_30 Familiarity Check.json").write_text(
            json.dumps({"Familiarity": 4}))
        (trial / "2024-01-01 12_01_30 Post-Trial Rating.json").write_text(
            json.dumps({"Liking": 5}))
        out = di.fetch_trial_questionnaire(tmp_path, song_id=0)
        assert out == {"Familiarity": 4, "Liking": 5}
        # missing trial dir → empty dict in continue mode
        assert di.fetch_trial_questionnaire(tmp_path, song_id=7) == {}


class TestFetchAllAccuraciesAndQuestionnaires:
    def test_collects_songs_and_silences(self, tmp_path):
        import json
        import numpy as np
        from mba_tpu.pipeline import data_integration as di
        for name in ("song_000", "silence_000"):
            trial = tmp_path / name
            trial.mkdir()
            (trial / "2024-01-01 12_00_30 Familiarity Check.json"
             ).write_text(json.dumps({"Familiarity": 2}))
            (trial / "2024-01-01 12_00_40 Trial Accuracy Results.csv"
             ).write_text("time,accuracy\n0.0,0.1\n1.0,0.2\n")
        acc, quest = di.fetch_all_accuracies_and_questionnaires(
            tmp_path, max_song_ind=2, max_silence_ind=1)
        assert set(acc) == {"song_000", "song_001", "silence_000"}
        assert acc["song_000"] is not None
        assert acc["song_001"] is None          # missing → continue mode
        assert quest["song_000"] == {"Familiarity": 2}
        assert quest["song_001"] == {}

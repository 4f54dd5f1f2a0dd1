"""Replay of the study's subject-curation record (VERDICT r1 item 6).

The registry must carry the reference's full subject-0-11 amendment record
(data_integration_workflow.py:54-328), and applying a curation to a
synthetic log must reproduce the reference's operations: song rows blanked
and dropped on re-enrichment, trials annotated/excluded, idle-state tail
marked, and the delayed 'Actual Start Trigger' inserted.
"""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline import data_integration as di
from mba_tpu.workflows.study_curation import (STUDY_CURATION,
                                              SubjectCuration,
                                              apply_subject_curation)
from tests.test_pipeline_data_integration import make_raw_log


class TestRegistryRecord:
    """The committed record matches the reference's curation facts."""

    def test_all_twelve_subjects_present(self):
        assert sorted(STUDY_CURATION) == list(range(12))

    def test_reference_operation_counts(self):
        # song removals per subject (reference :60-66, :78-81, :122-125,
        # :134-136, :152-161, :186-199, :239-241, :262-267, :291-295)
        expect_songs = {0: 0, 1: 4, 2: 3, 3: 2, 4: 1, 5: 6, 6: 6, 7: 0,
                        8: 1, 9: 2, 10: 1, 11: 0}
        expect_rows = {0: 0, 1: 0, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0, 7: 2,
                       8: 1, 9: 1, 10: 0, 11: 3}
        expect_annot = {0: 0, 1: 2, 2: 5, 3: 0, 4: 2, 5: 4, 6: 2, 7: 3,
                        8: 2, 9: 4, 10: 3, 11: 1}
        for s, cur in STUDY_CURATION.items():
            assert len(cur.song_removals) == expect_songs[s], f"subj {s}"
            assert len(cur.row_removals) == expect_rows[s], f"subj {s}"
            assert len(cur.annotations) == expect_annot[s], f"subj {s}"

    def test_idle_state_marks(self):
        # every subject except 0 and 1 marks an idle-state tail
        for s, cur in STUDY_CURATION.items():
            if s in (0, 1):
                assert cur.idle_state_from is None
            else:
                assert cur.idle_state_from is not None, f"subj {s}"

    def test_only_subject_two_has_trigger_insertion(self):
        for s, cur in STUDY_CURATION.items():
            if s == 2:
                assert cur.actual_start_trigger_offset_min == 15.0
            else:
                assert cur.actual_start_trigger_offset_min is None

    def test_exclusion_flags_match_reference(self):
        # subject 4: song-8 comment kept (False), silence-1 excluded
        a4 = STUDY_CURATION[4].annotations
        assert a4[0][1] is False and a4[0][2] == "song_id"
        assert a4[1][1] is True and a4[1][2] == "silence_id"
        # subject 9 trial 12 and subject 11 trial 8 are kept (False)
        assert [a for a in STUDY_CURATION[9].annotations
                if a[3] == 12][0][1] is False
        assert STUDY_CURATION[11].annotations[0][1] is False


class TestApplyCuration:
    def test_song_removal_and_annotation_replay(self):
        raw = make_raw_log()
        cur = SubjectCuration(
            song_removals=(("Thunder", "Imagine Dragons", 0),),
            annotations=(("Talking during silence", True, "silence_id",
                          0),))
        curated_raw, enriched = apply_subject_curation(raw, cur)

        # the wrongly-executed song is blanked in the raw log...
        assert not curated_raw["Music"].str.contains("Thunder").any()
        # ...and gone from the re-enriched log (the remaining song entry
        # is the untouched skipped 'Weightless')
        titles = enriched.loc[enriched["Song Title"].notna(), "Song Title"]
        assert not titles.eq("Thunder").any()
        # the silence trial is annotated + excluded
        sil = enriched[enriched["Silence ID"] == 0]
        assert (sil["Trial Comment"] == "Talking during silence").all()
        assert sil["Trial Exclusion Bool"].all()
        assert 0 in di.fetch_excluded_trials(enriched)

    def test_row_removal_replay(self):
        raw = make_raw_log()
        victim = raw["Time"].iloc[3]
        cur = SubjectCuration(row_removals=(victim,))
        curated_raw, _ = apply_subject_curation(raw, cur)
        assert len(curated_raw) == len(raw) - 1
        assert not (curated_raw["Time"] == victim).any()

    def test_idle_state_mark_replay(self):
        raw = make_raw_log()
        t_idle = str(raw["Time"].iloc[-8])
        cur = SubjectCuration(idle_state_from=t_idle)
        _, enriched = apply_subject_curation(raw, cur)
        times = pd.to_datetime(enriched["Time"])
        tail = enriched[times >= pd.Timestamp(t_idle)]
        head = enriched[times < pd.Timestamp(t_idle)]
        assert (tail["Phase"] == "Idle State").all()
        assert not (head["Phase"] == "Idle State").any()

    def test_actual_start_trigger_insertion(self):
        raw = make_raw_log()
        cur = SubjectCuration(actual_start_trigger_offset_min=0.5)
        _, enriched = apply_subject_curation(raw, cur)
        hits = enriched[enriched["Event"] == "Actual Start Trigger"]
        assert len(hits) == 1
        # lands at the first row ≥ start-trigger + 30 s
        t_start = pd.to_datetime(
            enriched.loc[enriched["Event"] == "Start Trigger",
                         "Time"].iloc[0])
        t_hit = pd.to_datetime(hits["Time"].iloc[0])
        assert t_hit >= t_start + pd.Timedelta(seconds=30)
        assert (t_hit - (t_start + pd.Timedelta(seconds=30))
                <= pd.Timedelta(seconds=2))
        # the inserted trigger now anchors the measurement span
        start, _ = di.get_qtc_measurement_start_end(enriched,
                                                    verbose=False)
        start = pd.Timestamp(start)
        if start.tz is not None and t_hit.tz is None:
            start = start.tz_localize(None)
        assert start == t_hit

    def test_trigger_offset_beyond_log_raises(self):
        raw = make_raw_log()
        cur = SubjectCuration(actual_start_trigger_offset_min=9999.0)
        with pytest.raises(ValueError, match="beyond the log"):
            apply_subject_curation(raw, cur)

    def test_empty_curation_is_plain_enrichment(self):
        raw = make_raw_log()
        _, enriched = apply_subject_curation(raw, SubjectCuration())
        ref = di.prepare_log_frame(raw, set_time_index=False)
        pd.testing.assert_frame_equal(enriched, ref)

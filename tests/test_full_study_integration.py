"""Full synthetic study: acquisition → features → statistics → report.

Drives the COMPLETE framework chain with no hardware and no real data:
1. headless dummy-sampler experiments for 3 subjects (phase machine)
2. log enrichment (data_integration_workflow)
3. synthetic EEG/EMG with planted beta-band CMC during music trials
4. PSD + task-wise CMC + enriched serial frame (feature extraction)
5. Combined Statistics frame (data preparation workflow)
6. omnibus OLS/LME levels + FDR (RQ-A machinery)
7. Markdown report

This is the "multi-node without a real cluster" analog (SURVEY.md §4):
the dummy backend exercises every seam the real study uses.
"""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.acquisition.experiment import (ExperimentConfig,
                                            start_experiment_processes)
from mba_tpu.workflows.data_integration_workflow import integrate_subject
from mba_tpu.workflows.subject_feature_extraction_workflow import (
    extract_psd_features, extract_cmc_features,
    build_enriched_serial_frame)
from mba_tpu.workflows.statistics_data_preparation_workflow import (
    build_combined_statistics_frame)
from mba_tpu.workflows.statistics_RQ_A_omnibus_testing_workflow import (
    run_omnibus)
from mba_tpu.workflows.statistics_report_workflow import build_report
from mba_tpu.pipeline import data_integration as di
from mba_tpu.pipeline import data_analysis

FS = 128.0
TIME_SCALE = 0.05            # 45 s trials → 2.25 s
N_SUBJECTS = 6               # ≥4 so the heterogeneity clustering +
#                              MI paths run (VERDICT r4 #6); even/odd
#                              subjects get strong/weak planted gains
#                              so Ward clustering has real structure
STRONG_GAIN, WEAK_GAIN = 1.0, 0.35


def _synth_recording(log_df, seed,
                     cmc_boost_categories=("Familiar Happy",),
                     boost_gain=STRONG_GAIN):
    """EEG/EMG spanning the recording, with beta-band coupling during
    music trials of the boosted categories."""
    rng = np.random.default_rng(seed)
    log_df = log_df.copy()
    log_df.index = data_analysis.make_timezone_aware(
        pd.DatetimeIndex(pd.to_datetime(log_df["Time"])))
    start, end = di.get_qtc_measurement_start_end(log_df, verbose=False)
    n = int((end - start).total_seconds() * FS)
    t = np.arange(n) / FS

    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / FS)
    spec[(f < 18) | (f > 25)] = 0
    shared = np.fft.irfft(spec, n=n)
    shared /= shared.std() + 1e-12

    # coupling gain: 1 inside boosted-category trials, else 0.1
    gain = np.full(n, 0.1)
    spans = di.get_all_task_start_ends(log_df, 'list',
                                       assumed_latency_sec=0.0,
                                       cut_off_sec_to_prevent_transients
                                       =0.0)
    for (ts, te) in spans:
        cat = log_df.loc[ts:te, "Music Category"].dropna()
        cat = cat[cat != "No category"]
        label = cat.iloc[0] if len(cat) else "Silence"
        if label in cmc_boost_categories:
            i0 = max(int((ts - start).total_seconds() * FS), 0)
            i1 = min(int((te - start).total_seconds() * FS), n)
            gain[i0:i1] = boost_gain

    drive = shared * gain
    eeg = (0.8 * drive[:, None]
           + rng.standard_normal((n, 64))).astype(np.float32)
    emg1 = (0.8 * drive[:, None]
            + rng.standard_normal((n, 4))).astype(np.float32)
    emg2 = (0.2 * drive[:, None]
            + rng.standard_normal((n, 4))).astype(np.float32)
    return eeg, emg1, emg2


class _VariedController:
    """Questionnaire answers that VARY by subject, so the heterogeneity
    MI probes have non-degenerate personal attributes to score (the
    default controller's constant answers yield zero varying numeric
    columns and the MI path would be skipped)."""

    _HABITS = ["Seldom", "Every 2 or 3 days", "A small part of the day",
               "Most of the day"]

    def __init__(self, subject: int):
        self.s = subject

    def onboarding(self) -> dict:
        return {"Name": f"S{self.s}", "Birthdate": "2000-01-01",
                "Gender": "Male" if self.s % 2 else "Female",
                "Dominant hand": "Left" if self.s % 3 == 0 else "Right",
                "Listening habit": self._HABITS[self.s % 4],
                "Dancing habit": self.s % 4,
                "Athleticism": (self.s * 2) % 5,
                "Musical skill": self.s % 7}

    def offboarding(self) -> dict:
        return {"Total fatigue": 1 + self.s % 3,
                "Total pleasure": 2 + self.s % 3}

    def familiarity(self, song_info: str) -> dict:
        return {"Familiarity": 1 + self.s % 4}

    def post_trial_rating(self, trial_label: str) -> dict:
        return {"Liking": 1 + self.s % 5, "Fitting Category": 3,
                "Emotional State": 3}


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    """Run the full chain once for the module."""
    # the 5.5-s accuracy warm-up scales with the compressed trials
    orig_offset = di.TRIAL_ACCURACY_START_OFFSET_SEC
    di.TRIAL_ACCURACY_START_OFFSET_SEC = 5.5 * TIME_SCALE
    root = tmp_path_factory.mktemp("study")
    exp_data = root / "data" / "experiment_results"
    feat_data = root / "data" / "precomputed_features"
    out_dir = root / "output"
    feat_data.mkdir(parents=True)

    for subject in range(N_SUBJECTS):
        # 1. headless experiment
        cfg = ExperimentConfig(
            subject_id=subject, output_dir=exp_data,
            trial_duration_sec=45.0, n_trials_per_category=1,
            categories=["Familiar Happy", "Familiar Sad"],
            n_silence_trials=1,
            task_frequencies_hz=[0.5], mvc_calibration_sec=6.0,
            dummy_mode=True)
        start_experiment_processes(
            cfg, controller=_VariedController(subject),
            time_scale=TIME_SCALE)

        # 2. log enrichment (scaled end-delay for the tiny trials)
        enriched = integrate_subject(subject, exp_data, validate=False,
                                     avg_end_delay_seconds=0.05)

        # 3.+4. synthetic signals → features
        subject_feat = feat_data / f"subject_{subject:02}"
        subject_feat.mkdir()
        eeg, emg1, emg2 = _synth_recording(
            enriched, seed=subject,
            boost_gain=STRONG_GAIN if subject % 2 == 0 else WEAK_GAIN)
        extract_psd_features(subject_feat, eeg, emg1, emg2, FS,
                             window_length_sec=0.25)
        log_indexed = di.fetch_enriched_log_frame(
            exp_data / f"subject_{subject:02}", verbose=False)
        extract_cmc_features(
            subject_feat, eeg, emg1, emg2, FS, log_frame=log_indexed,
            window_size_sec=0.5, buffer_sec=0.2,
            task_latency_assumption_sec=0.1, task_end_cutoff_sec=0.05)
        build_enriched_serial_frame(
            exp_data / f"subject_{subject:02}")

    # 5. combined statistics (1 segment per trial; tiny-trial timings)
    combined = build_combined_statistics_frame(
        list(range(N_SUBJECTS)), exp_data, feat_data,
        n_within_trial_segments=1,
        psd_time_window_size_sec=0.25, cmc_time_window_size_sec=0.5,
        n_onset_seconds_to_discard=0.2,
        task_latency_assumption_sec=0.1,
        task_end_transient_cutoff_sec=0.05)
    di.TRIAL_ACCURACY_START_OFFSET_SEC = orig_offset
    return {"root": root, "exp_data": exp_data, "feat_data": feat_data,
            "out_dir": out_dir, "combined": combined}


class TestFullStudy:
    def test_input_cache_equivalence(self, study):
        """A shared input_cache must not change a single frame value
        across segment resolutions (the study workflow reuses one cache
        for all four n_seg builds)."""
        kw = dict(psd_time_window_size_sec=0.25,
                  cmc_time_window_size_sec=0.5,
                  n_onset_seconds_to_discard=0.2,
                  task_latency_assumption_sec=0.1,
                  task_end_transient_cutoff_sec=0.05, save=False)
        cache: dict = {}
        for n_seg in (1, 2):
            plain = build_combined_statistics_frame(
                list(range(N_SUBJECTS)), study["exp_data"],
                study["feat_data"], n_seg, **kw)
            cached = build_combined_statistics_frame(
                list(range(N_SUBJECTS)), study["exp_data"],
                study["feat_data"], n_seg, input_cache=cache, **kw)
            pd.testing.assert_frame_equal(plain, cached)
        # the cache was actually populated and reused
        assert any(k[1] == 'frames' for k in cache
                   if isinstance(k, tuple) and len(k) > 1)

    def test_combined_frame_schema(self, study):
        df = study["combined"]
        assert df["Subject ID"].nunique() == N_SUBJECTS
        # 3 trials × 1 segment per subject
        assert len(df) == N_SUBJECTS * 3
        for col in ["CMC_Flexor_max_beta", "PSD_eeg_F_C_beta",
                    "Category or Silence", "Median_Heart_Rate",
                    "RMS_Accuracy", "Musical skill [0-7]",
                    "Liking_centered_squared", "Segment ID"]:
            assert col in df.columns, col
        assert set(df["Category or Silence"].dropna()) <= \
            {"Happy", "Sad", "Silence"}
        # accuracy was measured for every trial
        assert df["RMS_Accuracy"].notna().all()

    def test_planted_cmc_effect_visible(self, study):
        df = study["combined"]
        cmc = pd.to_numeric(df["CMC_Flexor_max_beta"], errors="coerce")
        happy = cmc[df["Category or Silence"] == "Happy"]
        silence = cmc[df["Category or Silence"] == "Silence"]
        assert happy.mean() > silence.mean()  # the planted coupling

    def test_omnibus_and_report(self, study):
        stats_dir = study["out_dir"] / "rq_a"
        # small custom level set suited to the 3-condition toy study
        def levels(multi):
            return [{
                'df_filter': None,
                'condition_vars': {'Category or Silence': 'categorical'},
                'reference_categories': {'Category or Silence':
                                         'Silence'},
                'explanatory_vars': [], 'moderation_pairs': None}]
        combined = run_omnibus(
            study["feat_data"], stats_dir,
            n_within_trial_segments_list=[1],
            hypotheses=[('H1: Flexor Beta Peak CMC',
                         'CMC_Flexor_max_beta')],
            level_definitions_factory=levels,
            fdr_levels=[], make_forest_mosaics=True)
        assert not combined.empty
        happy = combined[
            (combined["Parameter"].str.contains("T.Happy"))
            & (combined["Model_Type"] == "LME")]
        assert len(happy) == 1
        assert happy["Coefficient"].iloc[0] > 0   # planted direction

        report_path = build_report(stats_dir, stats_dir,
                                   study["out_dir"] / "reports",
                                   "RQ_A_toy")
        text = report_path.read_text()
        assert "H1: Flexor Beta Peak CMC" in text
        assert "Category or Silence: Happy" in text

    def test_descriptive_statistics_workflow(self, study):
        from mba_tpu.workflows.descriptive_statistics_workflow import (
            run_descriptives)
        out = study["out_dir"] / "descriptives"
        res = run_descriptives(
            study["exp_data"], study["feat_data"], out,
            subject_ids=range(N_SUBJECTS),
            dep_vars=["CMC_Flexor_max_beta", "RMS_Accuracy",
                      "Median_Heart_Rate"])
        assert len(res["demographics"]) == N_SUBJECTS
        assert not res["summary"].empty
        assert list(out.glob("*Descriptive DV Summary*.csv"))
        assert list(out.glob("*Cohort Descriptives*.png"))

    def test_rqb_omnibus(self, study):
        from mba_tpu.workflows.statistics_RQ_B_omnibus_testing_workflow \
            import run_rqb_omnibus
        out = study["out_dir"] / "rq_b"

        # toy-sized level set (9 rows can't support the full 7-predictor
        # production levels)
        def levels(multi):
            return [{'df_filter': None, 'condition_vars': {},
                     'explanatory_vars': ["CMC_Flexor_max_beta"],
                     'moderation_pairs': None}]
        combined = run_rqb_omnibus(study["feat_data"], out,
                                   n_within_trial_segments_list=[1],
                                   level_definitions_factory=levels)
        assert not combined.empty
        cmc = combined[combined["Parameter"].str.contains(
            "CMC_Flexor_max_beta", na=False)]
        assert len(cmc) >= 1          # the predictor was actually fit
        assert list(out.glob("*All Time Resolutions Results*.csv"))

    def test_mediation_workflow(self, study):
        from mba_tpu.workflows.\
            statistics_RQ_A_mediation_analysis_workflow import (
                run_mediation_analysis)
        out = study["out_dir"] / "mediation"
        hyps = [{"x_var": "Category or Silence",
                 "x_contrasts": [("Happy", "Silence")],
                 "m_var": "Median_Heart_Rate",
                 "y_vars": ["CMC_Flexor_max_beta"]}]
        res = run_mediation_analysis(
            study["feat_data"], None, out, n_bootstrap=25,
            n_segments=1, hypotheses=hyps,
            fit_kwargs={"min_obs": 6, "min_subjects": 3})
        assert len(res) == 1
        for col in ("indirect_effect", "ci_lower", "ci_upper",
                    "mediation_type", "significant_fdr"):
            assert col in res.columns, col
        assert list(out.glob("*Mediation Analysis Raw Results*.csv"))

    def test_post_hoc_cbpa_batch(self, study):
        from mba_tpu.pipeline.cbpa import CBPAConfig, run_batch
        from mba_tpu.workflows.\
            statistics_RQ_A_post_hoc_testing_workflow import (
                build_cbpa_configs)
        # the production batch is 2 bands x 2 muscles x 4 contrasts
        assert len(build_cbpa_configs(study["root"],
                                      study["out_dir"])) == 16
        out = study["out_dir"] / "cbpa"
        cfg = CBPAConfig(
            modality="CMC", modality_file_id="Flexor", freq_band="beta",
            condition_column="Category or Silence",
            condition_A="Happy", condition_B="Silence",
            n_permutations=100, tail=1, use_phase_normalization=False,
            data_root=study["root"], output_dir=out,
            cmc_time_window_sec=0.5,
            task_latency_assumption_sec=0.1, task_end_cutoff_sec=0.05,
            hypothesis_label="toy_Happy_vs_Silence",
            save_plots=False, show_plots=False)
        run_batch([cfg])
        assert list(out.glob("*CBPA Results*.npz")) or \
            list(out.glob("*toy_Happy_vs_Silence*"))

    def test_phase_average_figures(self, study):
        """The CMC-accuracy + EMG-PSD phase-average figures render from
        the study's real artifact store (reference post-hoc workflow
        :472-485)."""
        from unittest.mock import patch
        from mba_tpu.pipeline.cbpa import CBPAConfig
        from mba_tpu.workflows.\
            statistics_RQ_A_post_hoc_testing_workflow import (
                make_phase_average_figures)

        out = study["out_dir"] / "phase_figures"
        # compressed synthetic trials: shorten the assumed latencies the
        # same way the CBPA test does
        orig_init = CBPAConfig.__init__

        def fast_init(self, *a, **kw):
            kw.setdefault("cmc_time_window_sec", 0.5)
            kw.setdefault("psd_time_window_sec", 0.25)
            kw.setdefault("task_latency_assumption_sec", 0.1)
            kw.setdefault("task_end_cutoff_sec", 0.05)
            orig_init(self, *a, **kw)

        with patch.object(CBPAConfig, "__init__", fast_init):
            res = make_phase_average_figures(
                study["root"], out, study["exp_data"],
                subject_ids=list(range(N_SUBJECTS)),
                use_phase_normalization=False)
        assert list(out.glob("*CMC Accuracy Phase Average*.png"))
        assert len(res["cmc_map_shape"]) == 2

    def test_influence_effects_and_heterogeneity(self, study):
        """LOSO influence + subject-effect summary + the heterogeneity
        pipeline on the toy study's real artifacts."""
        import mba_tpu.pipeline.statistical_modelling as sm
        from mba_tpu.pipeline.heterogeneity_modelling import (
            run_heterogeneity_modelling)

        from mba_tpu.workflows.statistics_RQ_A_omnibus_testing_workflow \
            import run_omnibus
        stats_dir = study["out_dir"] / "rq_a_influence"

        def levels(multi):
            return [{
                'df_filter': None,
                'condition_vars': {'Category or Silence': 'categorical'},
                'reference_categories': {'Category or Silence':
                                         'Silence'},
                'explanatory_vars': [], 'moderation_pairs': None}]

        combined = run_omnibus(
            study["feat_data"], stats_dir,
            n_within_trial_segments_list=[1],
            hypotheses=[('H1: Flexor Beta Peak CMC',
                         'CMC_Flexor_max_beta')],
            level_definitions_factory=levels, fdr_levels=[],
            make_forest_mosaics=False)

        influence = sm.run_influence_analysis(
            [("CMC_Flexor_max_beta", 0, 1)], combined,
            study["feat_data"], stats_dir, levels)
        assert not influence.empty
        assert set(influence["Subject_ID"].astype(int)) == \
            set(range(N_SUBJECTS))
        assert {"DFBETA", "CooksD"} <= set(influence.columns)

        base_df = pd.read_csv(
            __import__("mba_tpu.utils.file_management",
                       fromlist=["most_recent_file"]).most_recent_file(
                study["feat_data"], ".csv",
                ["Combined Statistics 1seg"]))
        summary = sm.create_subject_effect_summary(
            combined.to_dict("records"), base_df, stats_dir, levels(False))
        assert not summary.empty

        # heterogeneity must EXERCISE the Ward/silhouette machinery on
        # this study (VERDICT r4 #6 — the old 3-subject frame tripped
        # the insufficient-data skip), and assignments must be stable
        # across repeat runs
        import warnings as _w
        het_kwargs = dict(
            dep_vars=["CMC_Flexor_max_beta"],
            conditions_to_evaluate={
                "lvl_0": ("Category or Silence", ["Happy", "Sad"])},
            clustering_measures=["contrast"],
            plot_mi_categories=[], top_n_moderators=2,
            min_cluster_size=1,
            omnibus_results_dir=stats_dir,
            experiment_results_dir=study["exp_data"])
        het_out = study["out_dir"] / "heterogeneity"
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            run_heterogeneity_modelling(output_dir=het_out, **het_kwargs)
        skips = [str(w.message) for w in caught
                 if "skipped" in str(w.message)
                 or "No MI scores" in str(w.message)]
        assert not skips, f"heterogeneity paths skipped: {skips}"
        cluster_csvs = list(het_out.glob("*Subject Clusters*.csv"))
        assert cluster_csvs, "clustering produced no assignment CSV"
        clusters = pd.read_csv(cluster_csvs[0])
        assert set(clusters["Subject_ID"].astype(int)) == \
            set(range(N_SUBJECTS))
        assert clusters["Cluster"].nunique() >= 2
        assert list(het_out.glob("*Silhouette Scores*.csv"))

        # determinism: a second run partitions the subjects identically
        het_out2 = study["out_dir"] / "heterogeneity_rerun"
        run_heterogeneity_modelling(output_dir=het_out2, **het_kwargs)
        clusters2 = pd.read_csv(
            list(het_out2.glob("*Subject Clusters*.csv"))[0])

        def partition(df):
            groups = df.groupby("Cluster")["Subject_ID"].apply(
                lambda s: tuple(sorted(s.astype(int))))
            return set(groups)

        assert partition(clusters) == partition(clusters2)
        produced = list(het_out.glob("*.csv")) + list(
            het_out.glob("*.png"))
        assert produced, "heterogeneity produced no artifacts"


class TestEmgPsdLoader:
    def test_load_emg_psd_both_muscles(self, study):
        """Parity loader (reference time_alignment_validation_workflow
        .py:342-454): artifact keyword lookup, QTC-stretched absolute
        time index, band-mean power, force-column search."""
        from mba_tpu.workflows.time_alignment_validation_workflow import (
            load_emg_psd_both_muscles)
        res = load_emg_psd_both_muscles(
            0, study["feat_data"], study["exp_data"],
            emg_frequency_band=(10, 60),
            psd_time_window_size_sec=0.25)
        assert set(res) == {"force_series", "flexor", "extensor"}
        assert res["force_series"].notna().any()
        for muscle in ("flexor", "extensor"):
            power, times = res[muscle]
            assert power.ndim == 1 and len(power) == len(times)
            assert np.isfinite(power).all()
            assert isinstance(times, pd.DatetimeIndex)
        # flexor carries the planted drive; extensor is quieter overall
        assert res["flexor"][0].mean() != res["extensor"][0].mean()

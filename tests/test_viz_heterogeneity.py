"""Visualization smoke tests + heterogeneity pipeline tests."""
import numpy as np
import pandas as pd
import pytest

from mba_tpu.pipeline import visualizations as viz
from mba_tpu.pipeline import heterogeneity_modelling as het


class TestVisualizations:
    def test_spectrogram_and_freq_domain(self, tmp_path):
        spec = np.random.default_rng(0).random((50, 30))
        viz.plot_spectrogram(spec, np.arange(50) * 0.5,
                             np.linspace(0, 60, 30), save_dir=tmp_path)
        viz.plot_freq_domain(np.random.rand(30, 2),
                             np.linspace(0, 60, 30), save_dir=tmp_path)
        assert len(list(tmp_path.glob("*.png"))) == 2

    def test_electrode_heatmap(self, tmp_path):
        viz.initialise_electrode_heatmap(
            np.random.default_rng(1).random(64), save_dir=tmp_path)
        assert list(tmp_path.glob("*Electrode Heatmap.png"))

    def test_forest_plot_and_mosaic(self, tmp_path):
        df = pd.DataFrame({
            "Parameter": ["Intercept", "A", "B", "__re_std__"] * 2,
            "Coefficient": np.random.randn(8),
            "SE": np.abs(np.random.randn(8)) * 0.2 + 0.05,
            "p_value_for_plot": [0.5, 0.01, 0.2, np.nan] * 2,
            "Model_Type": ["LME"] * 8,
            "Dependent_Variable": ["DV1"] * 4 + ["DV2"] * 4})
        fig, ax = viz.draw_forest_plot(df[df.Dependent_Variable == "DV1"],
                                       save_dir=tmp_path)
        assert fig is not None
        # sentinels/intercept excluded → 2 labels
        assert len(ax.get_yticklabels()) == 2
        viz.draw_forest_mosaic(df, save_dir=tmp_path)
        assert len(list(tmp_path.glob("*.png"))) >= 2

    def test_ci_plot_and_phase_average(self, tmp_path):
        x = np.linspace(0, 10, 50)
        v = np.sin(x)
        viz.plot_array_with_ci(v, v - 0.2, v + 0.2, x_axis=x,
                               hline=0.5, save_dir=tmp_path)
        grid = np.linspace(0, 360, 36, endpoint=False)
        profiles = {"Happy": [np.sin(np.deg2rad(grid))] * 4,
                    "Silence": [np.cos(np.deg2rad(grid))] * 4}
        viz.plot_phase_average(profiles, grid, show_target_sine=True,
                               save_dir=tmp_path)
        assert len(list(tmp_path.glob("*.png"))) == 2

    def test_sankey_flow_counts(self, tmp_path):
        src = ["Happy", "Happy", "Sad", "Sad", "Sad"]
        tgt = ["Happy", "Groovy", "Sad", "Sad", "Happy"]
        fig, flows = viz.plot_category_sankey(src, tgt,
                                              save_dir=tmp_path)
        assert flows.loc["Happy", "Happy"] == 1
        assert flows.loc["Sad", "Sad"] == 2
        assert flows.values.sum() == 5

    def test_cbpa_plot(self, tmp_path):
        t_obs = np.random.default_rng(2).standard_normal((20, 5))
        mask = np.zeros((20, 5), bool)
        mask[5:10, 1:3] = True
        results = {"t_obs": t_obs, "time_grid": np.arange(20.0),
                   "ch_names": ["a", "b", "c", "d", "e"],
                   "good_cluster_inds": np.array([0]),
                   "clusters": [mask],
                   "cluster_pv": np.array([0.01]), "t_thresh": 2.0,
                   "cfg": None, "n_valid_subjects": 10}
        viz.plot_cbpa_results(results, save_dir=tmp_path)
        assert list(tmp_path.glob("*CBPA*.png"))

    def test_descriptive_mosaic_and_cross_resolution(self, tmp_path):
        frames = {"Age": pd.Series([25, 30, 35, 40]),
                  "Skill": pd.Series([1, 2, 3, 4.0])}
        viz.plot_combined_descriptive_mosaic(frames, save_dir=tmp_path)
        df = pd.DataFrame({
            "Parameter": ["A"] * 4, "Dependent_Variable": ["DV"] * 4,
            "Model_Type": ["LME"] * 4, "N. Segments": [1, 2, 5, 10],
            "Coefficient": [1, 1.1, 0.9, 1.0],
            "SE": [0.2, 0.2, 0.3, 0.4]})
        viz.plot_cross_resolution_results(df, "A", "DV",
                                          save_dir=tmp_path)
        assert len(list(tmp_path.glob("*.png"))) == 2


def _contrast_frame(n_subj=8):
    rng = np.random.default_rng(0)
    rows = []
    for s in range(n_subj):
        for cond in ["Happy", "Sad"]:
            rows.append({
                "Subject_ID": s, "Dependent_Variable": "CMC_Flexor",
                "Condition_Variable": "Category or Silence",
                "Condition": cond,
                "Responder_Flag": bool(rng.random() > (0.3 if cond ==
                                                       "Happy" else 0.7)),
                "Normalised_Contrast": rng.normal(
                    0.5 if cond == "Happy" else -0.2, 0.3)})
    return pd.DataFrame(rows)


class TestHeterogeneity:
    def test_responder_summary(self):
        frame = _contrast_frame()
        out = het.compute_responder_summary(
            frame, ["CMC_Flexor"],
            {"lvl_1": ("Category or Silence", ["Happy", "Sad"])})
        assert len(out) == 2
        assert (out["N_Subjects"] == 8).all()
        assert (out["Responder_Rate"] <= 1).all()

    def test_mi_and_summary(self):
        rng = np.random.default_rng(1)
        n = 10
        personal = pd.DataFrame({
            "Subject_ID": range(n),
            "Musical skill": rng.integers(0, 7, n).astype(float),
            "Age": rng.integers(20, 60, n).astype(float)})
        influence = pd.DataFrame({
            "Subject_ID": list(range(n)) * 2,
            "Dependent_Variable": ["CMC_Flexor"] * 2 * n,
            "Parameter": ["A"] * n + ["B"] * n,
            "CooksD": rng.random(2 * n),
            "DFBETA": rng.standard_normal(2 * n)})
        contrast = _contrast_frame(n)
        coef = pd.DataFrame({
            "Dependent_Variable": ["CMC_Flexor"],
            "Model_Type": ["LME"], "Parameter": ["A"],
            "p_value_adjusted": [0.01]})
        mi = het.compute_mi_results(
            ["CMC_Flexor"], influence, contrast, coef, personal,
            ["Musical skill", "Age"],
            {"lvl_1": ("Category or Silence", ["Happy", "Sad"])}, [])
        assert not mi.empty
        assert {"CooksD", "DFBETA"} <= set(mi["Target"])
        summary = het.build_mi_summary(mi, min_mi_score=0.0)
        assert "Moderating_Candidates" in summary.columns

    def test_clustering_with_min_size(self, tmp_path):
        rng = np.random.default_rng(2)
        # two clear groups of subjects
        X = np.concatenate([rng.normal(0, 0.3, (5, 4)),
                            rng.normal(3, 0.3, (5, 4))])
        pivot = pd.DataFrame(
            X, index=pd.Index(range(10), name="Subject_ID"),
            columns=[f"Contrast│F│c{i}" for i in range(4)])
        personal = pd.DataFrame({"Subject_ID": range(10),
                                 "Age": range(20, 30)})
        cluster_df, sil = het.run_clustering(
            pivot, personal, ["contrast"], ["CMC_Flexor"],
            min_cluster_size=2, output_dir=tmp_path)
        assert cluster_df["Cluster"].nunique() == 2
        # groups separated correctly
        g0 = set(cluster_df[cluster_df["Cluster"] == 0]["Subject_ID"])
        assert g0 in ({0, 1, 2, 3, 4}, {5, 6, 7, 8, 9})
        assert list(tmp_path.glob("*Subject Clusters.csv"))
        assert list(tmp_path.glob("*Silhouette Scores.csv"))
        assert list(tmp_path.glob("*Combined Clustering.png"))

    def test_select_best_k_constraint(self):
        rng = np.random.default_rng(3)
        X = np.concatenate([rng.normal(0, 0.2, (6, 3)),
                            rng.normal(5, 0.2, (6, 3))])
        best_k, scores = het.select_best_k(X, range(2, 5),
                                           min_cluster_size=3)
        assert best_k == 2
        # k=3,4 would split a tight group below min size → excluded
        assert all(k not in scores or scores[k] <= scores[2]
                   for k in (3, 4))

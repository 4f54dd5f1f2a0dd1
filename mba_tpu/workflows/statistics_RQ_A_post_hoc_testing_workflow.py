"""RQ-A post-hoc: CBPA contrast batch + phase-average figures +
heterogeneity modelling.

Parity target: reference
``src/statistics_RQ_A_post_hoc_testing_workflow.py`` (519 LoC): the CBPA
config batch (phase-normalised, 1000 permutations, tail=1; :136-465),
CMC-accuracy / EMG-PSD phase-average figures (:472-485), and the
heterogeneity-modelling call (:492-519).
"""
from __future__ import annotations

from pathlib import Path

from mba_tpu.pipeline.cbpa import CBPAConfig, run_batch
from mba_tpu.pipeline.heterogeneity_modelling import \
    run_heterogeneity_modelling


def build_cbpa_configs(data_root: Path, output_dir: Path,
                       n_permutations: int = 1000,
                       use_phase_normalization: bool = True,
                       tail: int = 1) -> list[CBPAConfig]:
    """The study's CBPA contrast batch (reference :136-465)."""
    contrasts = [("Happy", "Silence"), ("Groovy", "Silence"),
                 ("Sad", "Silence"), ("Classic", "Silence")]
    configs = []
    for band in ("beta", "gamma"):
        for muscle in ("Flexor", "Extensor"):
            for cond_a, cond_b in contrasts:
                configs.append(CBPAConfig(
                    modality="CMC", modality_file_id=muscle,
                    freq_band=band,
                    condition_column="Category or Silence",
                    condition_A=cond_a, condition_B=cond_b,
                    n_permutations=n_permutations, tail=tail,
                    use_phase_normalization=use_phase_normalization,
                    data_root=data_root, output_dir=output_dir,
                    hypothesis_label=f"CMC_{muscle}_{band}_"
                                     f"{cond_a}_vs_{cond_b}",
                    save_plots=True, show_plots=False))
    return configs


def run_post_hoc(data_root: Path, output_dir: Path,
                 omnibus_results_dir: Path,
                 experiment_results_dir: Path,
                 n_permutations: int = 1000,
                 run_cbpa_batch: bool = True,
                 run_heterogeneity: bool = True,
                 heterogeneity_dep_vars=None) -> None:
    if run_cbpa_batch:
        configs = build_cbpa_configs(data_root, output_dir,
                                     n_permutations)
        run_batch(configs)

    if run_heterogeneity:
        run_heterogeneity_modelling(
            dep_vars=heterogeneity_dep_vars or [
                "CMC_Flexor_max_beta", "CMC_Flexor_mean_beta",
                "CMC_Extensor_max_beta"],
            conditions_to_evaluate={
                "lvl_0": ("Music Listening", [True]),
                "lvl_1": ("Category or Silence",
                          ["Happy", "Groovy", "Sad", "Classic"])},
            clustering_measures=["contrast", "cooks_d"],
            plot_mi_categories=[], top_n_moderators=3,
            min_cluster_size=2, output_dir=output_dir,
            omnibus_results_dir=omnibus_results_dir,
            experiment_results_dir=experiment_results_dir)


if __name__ == "__main__":
    from mba_tpu.workflows.paths import StudyPaths

    paths = StudyPaths().ensure()
    run_post_hoc(paths.root, paths.statistics_rq_a_post_hoc,
                 paths.statistics_rq_a, paths.experiment_data)

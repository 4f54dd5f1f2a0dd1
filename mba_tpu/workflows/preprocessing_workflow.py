"""Per-subject preprocessing: eeg + both EMG grids.

Parity target: reference ``src/preprocessing_workflow.py`` (217 LoC):
load npy/csv (:58-80), build/restore ``BiosignalPreprocessor``
(:90-105), optional IC inspection with manual exclusion (:132-143),
optional validation (:203-209), save 'Preprocessed …' npy + config
(:212-214).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from mba_tpu.pipeline.preprocessing import BiosignalPreprocessor
from mba_tpu.utils import file_management as filemgmt


def preprocess_subject_modality(subject: int, modality_key: str,
                                feature_dir: Path,
                                sampling_freq: int = 2048,
                                config_path: Path | None = None,
                                run_validation: bool = False,
                                manual_ics_to_exclude=None,
                                **preprocessor_kwargs):
    """Load raw npy → run the cascade → save results + config."""
    feature_dir = Path(feature_dir)
    raw_path = filemgmt.most_recent_file(feature_dir, ".npy",
                                         ["Raw", modality_key])
    data = np.load(raw_path)
    modality = 'eeg' if 'eeg' in modality_key else 'emg'

    if config_path is not None:
        prepper = BiosignalPreprocessor.init_from_config(config_path,
                                                         data)
    else:
        kwargs = dict(n_ica_components=(25 if modality == 'eeg'
                                        else None))
        kwargs.update(preprocessor_kwargs)      # caller wins
        prepper = BiosignalPreprocessor(
            np_input_data=data, sampling_freq=sampling_freq,
            modality=modality, **kwargs)
    if manual_ics_to_exclude is not None:
        prepper.manual_ics_to_exclude = manual_ics_to_exclude

    _ = prepper.np_output_data
    if run_validation:
        prepper.validate_filtering()
        if modality == 'eeg':
            prepper.validate_referencing()
        prepper.validate_amplitude_thresholding(n_runs=3)
        if prepper.wavelet_type is not None:
            prepper.validate_wavelet_denoising()
    prepper.export_results(feature_dir, identifier=modality_key)
    return prepper


if __name__ == "__main__":
    from mba_tpu.workflows.paths import StudyPaths

    subjects = list(range(12))
    modalities = ["eeg", "emg_1_flexor", "emg_2_extensor"]
    run_validation = False

    paths = StudyPaths().ensure()
    for subject in subjects:
        for modality_key in modalities:
            preprocess_subject_modality(
                subject, modality_key,
                paths.subject_feature_dir(subject),
                run_validation=run_validation)

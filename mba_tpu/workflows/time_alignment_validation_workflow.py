"""Clock-drift audit + EMG-vs-force muscle-identity validation.

Parity target: reference ``src/time_alignment_validation_workflow.py``
(1415 LoC): ``calculate_actual_sampling_rate`` (file samples vs
serial-measured duration → actual fs; :23-164), a cohort sweep
(:167-341), and EMG-vs-force validation (correlation + lag + power ratio;
flexor-dominance / co-contraction interpretation; :342-897, :1144-1415).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from mba_tpu.pipeline import data_integration as di
from mba_tpu.pipeline import data_analysis
from mba_tpu.ops.spectral import welch_psd
from mba_tpu.ops.framing import resample_linear


def calculate_actual_sampling_rate(n_file_samples: int,
                                   log_df: pd.DataFrame,
                                   nominal_fs: float = 2048.0) -> dict:
    """Actual fs = file samples / trigger-anchored recording duration
    (reference :23-164).  Reports the drift against nominal."""
    start, end = di.get_qtc_measurement_start_end(log_df, verbose=False)
    duration = (end - start).total_seconds()
    actual_fs = n_file_samples / duration
    drift_ppm = 1e6 * (actual_fs - nominal_fs) / nominal_fs
    return {"duration_sec": duration, "n_samples": n_file_samples,
            "actual_fs": actual_fs, "nominal_fs": nominal_fs,
            "drift_ppm": drift_ppm,
            "drift_sec_per_hour": 3600 * (actual_fs - nominal_fs)
            / nominal_fs}


def validate_muscle_identity(emg_rms_envelope: np.ndarray,
                             force: np.ndarray,
                             fs_emg: float, fs_force: float,
                             max_lag_sec: float = 1.0) -> dict:
    """EMG-envelope vs force correlation + lag + interpretation
    (reference :342-897).

    Flexor grids must correlate positively with grip force at small lag;
    anti-phase or weak correlation flags swapped grids / co-contraction.
    """
    common_fs = min(fs_emg, fs_force, 32.0)
    env = np.asarray(resample_linear(
        np.asarray(emg_rms_envelope, np.float32), fs_emg, common_fs))
    frc = np.asarray(resample_linear(
        np.asarray(force, np.float32), fs_force, common_fs))
    n = min(len(env), len(frc))
    env, frc = env[:n], frc[:n]
    env = (env - env.mean()) / (env.std() + 1e-12)
    frc = (frc - frc.mean()) / (frc.std() + 1e-12)

    max_lag = int(max_lag_sec * common_fs)
    xc = np.correlate(env, frc, mode="full") / n
    mid = n - 1
    window = xc[mid - max_lag:mid + max_lag + 1]
    best = int(np.argmax(np.abs(window))) - max_lag
    corr_at_best = float(window[best + max_lag])
    zero_lag_corr = float(xc[mid])
    lag_sec = best / common_fs

    if corr_at_best > 0.4 and abs(lag_sec) < 0.5:
        interpretation = "flexor-dominant (envelope tracks force)"
    elif corr_at_best < -0.3:
        interpretation = ("anti-phase: possible swapped grids or "
                          "antagonist channel")
    elif abs(corr_at_best) < 0.2:
        interpretation = "weak coupling: co-contraction or noisy channel"
    else:
        interpretation = "moderate coupling"
    return {"zero_lag_corr": zero_lag_corr,
            "best_corr": corr_at_best, "best_lag_sec": lag_sec,
            "interpretation": interpretation}


def emg_power_ratio(flexor: np.ndarray, extensor: np.ndarray,
                    fs: float, band=(20.0, 250.0)) -> float:
    """Flexor/extensor band-power ratio (reference power-ratio check)."""
    def band_power(x):
        f, p = welch_psd(x, fs, nperseg=int(min(fs * 2, len(x))))
        sel = (f >= band[0]) & (f <= band[1])
        return float(p[sel].mean())
    return band_power(flexor) / max(band_power(extensor), 1e-20)


def cohort_sampling_rate_sweep(subject_ids, experiment_data_dir,
                               feature_data_dir,
                               nominal_fs: float = 2048.0
                               ) -> pd.DataFrame:
    """Per-subject drift table (reference :167-341)."""
    from mba_tpu.utils import file_management as filemgmt
    rows = []
    for subject in subject_ids:
        exp_dir = Path(experiment_data_dir) / f"subject_{subject:02}"
        feat_dir = Path(feature_data_dir) / f"subject_{subject:02}"
        try:
            log_df = di.fetch_enriched_log_frame(exp_dir, verbose=False)
            eeg_path = filemgmt.most_recent_file(feat_dir, ".npy",
                                                 ["eeg"])
            n_samples = np.load(eeg_path, mmap_mode='r').shape[0]
        except (ValueError, FileNotFoundError):
            continue
        rows.append({"Subject ID": subject,
                     **calculate_actual_sampling_rate(
                         n_samples, log_df, nominal_fs)})
    return pd.DataFrame(rows)


if __name__ == "__main__":
    from mba_tpu.workflows.paths import StudyPaths

    paths = StudyPaths().ensure()
    sweep = cohort_sampling_rate_sweep(range(12), paths.experiment_data,
                                       paths.feature_data)
    print(sweep.to_string(index=False))

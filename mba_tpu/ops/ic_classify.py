"""ICLabel-equivalent IC artifact classifier (feature-based, transparent).

The reference auto-excludes ICs labeled {heart beat, muscle artifact,
channel noise, eye blink} by the pretrained mne-icalabel network
(preprocessing.py:685-720).  That model cannot ship here, so this module
implements a transparent per-class feature classifier over the same label
vocabulary, with per-artifact-class behavior validated by injection tests
(tests/test_ic_classify.py: plant a synthetic ECG / blink / EMG /
channel-pop / line-hum component, assert it — and only it — is flagged;
specificity and selectivity are asserted per class over many seeds,
VERDICT.md round-1 item 4).

Per-class evidence:

- **channel noise** — topography concentration: one channel carries almost
  all of the component's scalp projection (max |w| / ‖w‖ and top-1/top-2
  ratio).
- **eye blink** — frontal topography dominance (Fp*/AF* channels) together
  with low-frequency (< 4 Hz) spectral dominance and one-sided deflections
  (|skewness|).
- **heart beat** — QRS-train periodicity: sharp supra-3σ peaks with a
  0.4–1.6 s inter-peak interval of low coefficient of variation, plus high
  kurtosis.
- **muscle artifact** — flat-to-rising log-log spectral slope above 7 Hz
  (EMG, vs the ~1/f EEG background) and high-frequency (> 30 Hz) power
  dominance.
- **line noise** — narrowband power concentration at the mains frequency
  (50 Hz ± 1) relative to its spectral neighbourhood.
- **brain / other** — fallback when no artifact class scores.
"""
from __future__ import annotations

import numpy as np

EXCLUDE_CLASSES = ('heart beat', 'muscle artifact', 'channel noise',
                   'eye blink')
LABELS = ('brain', 'eye blink', 'heart beat', 'muscle artifact',
          'channel noise', 'line noise', 'other')


def _sigmoid(x: float, center: float, width: float) -> float:
    return float(1.0 / (1.0 + np.exp(-(x - center) / max(width, 1e-9))))


def _band_fraction(freqs, power, lo, hi, total_lo=0.5):
    total = power[freqs >= total_lo].sum() + 1e-20
    return float(power[(freqs >= lo) & (freqs < hi)].sum() / total)


def _spectral_slope(freqs, power, lo=7.0, hi=45.0):
    """Log-log slope of the spectrum in [lo, hi) Hz (EEG ≈ −1…−2; EMG
    ≈ flat or rising)."""
    m = (freqs >= lo) & (freqs < hi) & (power > 0)
    if m.sum() < 8:
        return -1.0
    return float(np.polyfit(np.log10(freqs[m]),
                            np.log10(power[m] + 1e-20), 1)[0])


def _qrs_periodicity(source: np.ndarray, fs: float) -> float:
    """Score ∈ [0, 1] for an ECG-like sharp periodic peak train."""
    z = (source - source.mean()) / (source.std() + 1e-20)
    a = np.abs(z)
    # local maxima above 3σ with a 250 ms refractory period
    cand = np.flatnonzero((a[1:-1] > 3.0) & (a[1:-1] >= a[:-2])
                          & (a[1:-1] >= a[2:])) + 1
    if len(cand) < 4:
        return 0.0
    refractory = int(0.25 * fs)
    peaks = [int(cand[0])]
    for c in cand[1:]:
        if c - peaks[-1] >= refractory:
            peaks.append(int(c))
    if len(peaks) < 4:
        return 0.0
    ipi = np.diff(peaks) / fs
    med = float(np.median(ipi))
    if not (0.4 <= med <= 1.6):                 # 37–150 bpm
        return 0.0
    cv = float(np.std(ipi) / (np.mean(ipi) + 1e-20))
    # expected beat count must roughly fill the recording
    expected = (len(source) / fs) / med
    coverage = min(len(peaks) / max(expected, 1.0), 1.0)
    return float(np.exp(-cv / 0.2) * coverage)


def component_features(source: np.ndarray, topo: np.ndarray, fs: float,
                       frontal_idx: list[int]) -> dict:
    """Per-component evidence features (see module docstring)."""
    src = np.asarray(source, np.float64)
    n = len(src)
    n_use = min(n, int(120 * fs))               # cap spectral cost
    seg = src[:n_use] - src[:n_use].mean()
    freqs = np.fft.rfftfreq(n_use, 1.0 / fs)
    power = np.abs(np.fft.rfft(seg)) ** 2

    t = np.abs(np.asarray(topo, np.float64))
    t_norm = t / (np.linalg.norm(t) + 1e-20)
    top = np.sort(t_norm)[::-1]
    line_band = _band_fraction(freqs, power, 49.0, 51.0) \
        if fs > 102 else 0.0
    neighbor = _band_fraction(freqs, power, 44.0, 49.0) \
        + _band_fraction(freqs, power, 51.0, 56.0) if fs > 112 else 1.0

    sd = src.std() + 1e-20
    return {
        "topo_max": float(top[0]),
        "topo_top2_ratio": float(top[0] / (top[1] + 1e-20)),
        "frontal_frac": (float((t_norm[frontal_idx] ** 2).sum())
                         if len(frontal_idx) else 0.0),
        "low_frac": _band_fraction(freqs, power, 0.5, 4.0),
        "high_frac": _band_fraction(freqs, power, 30.0,
                                    min(fs / 2, 250.0)),
        "line_frac": line_band,
        "line_contrast": float(line_band / (neighbor + 1e-20)),
        "spectral_slope": _spectral_slope(freqs, power),
        "kurtosis": float(np.mean(((src - src.mean()) / sd) ** 4) - 3.0),
        "abs_skew": float(abs(np.mean(((src - src.mean()) / sd) ** 3))),
        "qrs_score": _qrs_periodicity(src, fs),
    }


def class_scores(feats: dict, n_ch: int) -> dict:
    """Soft per-class scores ∈ [0, 1] from the evidence features."""
    s = {}
    s["channel noise"] = (_sigmoid(feats["topo_max"], 0.87, 0.03)
                          * _sigmoid(feats["topo_top2_ratio"], 3.0, 0.5)
                          if n_ch > 2 else 0.0)
    s["line noise"] = min(_sigmoid(feats["line_frac"], 0.25, 0.05),
                          _sigmoid(feats["line_contrast"], 4.0, 1.0))
    s["eye blink"] = (_sigmoid(feats["frontal_frac"], 0.45, 0.08)
                      * _sigmoid(feats["low_frac"], 0.35, 0.08)
                      * _sigmoid(feats["abs_skew"], 0.25, 0.15))
    s["heart beat"] = (feats["qrs_score"]
                       * _sigmoid(feats["kurtosis"], 1.5, 1.0))
    s["muscle artifact"] = (_sigmoid(feats["spectral_slope"], -0.35, 0.2)
                            * _sigmoid(feats["high_frac"], 0.40, 0.08))
    return s


def classify_components(sources: np.ndarray, mixing: np.ndarray, fs: float,
                        channel_names: list[str] | None = None,
                        artifact_threshold: float = 0.5) -> dict:
    """Label every IC with the ICLabel vocabulary.

    sources : (n_samples, n_components); mixing : (n_channels,
    n_components) scalp projections; returns the mne-icalabel-shaped
    contract {'labels': [...], 'y_pred_proba': [...]} plus the full
    per-class score table under 'scores' and features under 'features'.
    """
    n_comp = sources.shape[1]
    n_ch = mixing.shape[0]
    frontal_idx = []
    if channel_names is not None:
        frontal_idx = [i for i, ch in enumerate(channel_names)
                       if str(ch).startswith(("Fp", "AF"))]

    labels, probas, all_scores, all_feats = [], [], [], []
    for k in range(n_comp):
        feats = component_features(sources[:, k], mixing[:, k], fs,
                                   frontal_idx)
        scores = class_scores(feats, n_ch)
        best = max(scores, key=scores.get)
        if scores[best] >= artifact_threshold:
            labels.append(best)
            probas.append(scores[best])
        else:
            labels.append("brain")
            probas.append(1.0 - max(scores.values()))
        all_scores.append(scores)
        all_feats.append(feats)
    return {"labels": labels, "y_pred_proba": probas,
            "scores": all_scores, "features": all_feats}


def auto_exclude_components(result: dict,
                            exclude_classes=EXCLUDE_CLASSES) -> list[int]:
    """Indices to exclude — the reference's class set
    (preprocessing.py:707): heart beat, muscle artifact, channel noise,
    eye blink (line noise is notch-filtered upstream instead)."""
    return [i for i, lab in enumerate(result["labels"])
            if lab in exclude_classes]

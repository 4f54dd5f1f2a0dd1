"""Per-class injection tests for the ICLabel-equivalent classifier.

VERDICT.md round-1 item 4: plant a synthetic ECG / blink / EMG /
channel-pop / line-hum component among brain-like components, assert it —
and only it — is flagged, and report validate_amplitude-style specificity
and selectivity per class over many seeds.
"""
import numpy as np
import pytest

from mba_tpu.ops.ic_classify import (classify_components,
                                     auto_exclude_components,
                                     EXCLUDE_CLASSES)

FS = 256.0
DUR = 90.0
N = int(FS * DUR)
CH_NAMES = ["Fp1", "Fp2", "AF3", "AF4", "F3", "F4", "C3", "C4",
            "P3", "P4", "O1", "O2", "T7", "T8", "Cz", "Pz"]
N_CH = len(CH_NAMES)


# --------------------------------------------------------------------------
# synthetic source + topography generators
# --------------------------------------------------------------------------
def brain_source(rng):
    """1/f ('pink') source with an alpha bump — EEG-like."""
    spec = np.fft.rfft(rng.standard_normal(N))
    f = np.fft.rfftfreq(N, 1 / FS)
    shape = 1.0 / np.maximum(f, 0.5)
    shape += 0.5 * np.exp(-0.5 * ((f - 10.0) / 1.5) ** 2)
    x = np.fft.irfft(spec * shape, n=N)
    return x / x.std()


def ecg_source(rng, bpm=None):
    """QRS spike train with T-wave-ish bumps at a realistic rate."""
    bpm = bpm or rng.uniform(55, 95)
    period = 60.0 / bpm
    t = np.arange(N) / FS
    x = np.zeros(N)
    beat = rng.uniform(0, period)
    while beat < DUR:
        i = int(beat * FS)
        qrs = int(0.04 * FS)
        for d in range(-qrs, qrs + 1):
            if 0 <= i + d < N:
                x[i + d] += 8.0 * np.exp(-0.5 * (d / (0.012 * FS)) ** 2)
        tw = int(0.22 * FS)
        for d in range(0, int(0.14 * FS)):
            if 0 <= i + tw + d < N:
                x[i + tw + d] += 1.2 * np.sin(np.pi * d / (0.14 * FS))
        beat += period * rng.uniform(0.97, 1.03)    # mild HRV
    x += 0.15 * rng.standard_normal(N)
    return x / x.std()


def blink_source(rng):
    """One-sided slow frontal deflections every ~2-6 s."""
    x = 0.1 * rng.standard_normal(N)
    t = rng.uniform(0.5, 3.0)
    while t < DUR - 0.5:
        i = int(t * FS)
        w = int(rng.uniform(0.2, 0.35) * FS)
        prof = np.hanning(2 * w)
        x[i - w:i + w][:len(prof)] += rng.uniform(4, 7) * prof[:len(
            x[i - w:i + w])]
        t += rng.uniform(2.0, 6.0)
    return x / x.std()


def emg_source(rng):
    """Broadband high-frequency activity with burst modulation."""
    white = rng.standard_normal(N)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(N, 1 / FS)
    spec[f < 25.0] *= 0.05                      # high-pass-ish EMG spectrum
    x = np.fft.irfft(spec, n=N)
    env = 0.4 + 0.6 * (rng.random(N) < 0.5)
    env = np.convolve(env, np.ones(int(FS)) / FS, mode="same")
    x = x * env
    return x / x.std()


def channel_pop_source(rng):
    """Intermittent large steps/spikes (electrode artifact)."""
    x = 0.2 * rng.standard_normal(N)
    for _ in range(25):
        i = rng.integers(0, N - int(FS))
        x[i:i + int(rng.uniform(0.1, 0.8) * FS)] += rng.choice([-1, 1]) \
            * rng.uniform(4, 9)
    return x / x.std()


def line_source(rng):
    t = np.arange(N) / FS
    x = np.sin(2 * np.pi * 50.0 * t + rng.uniform(0, 2 * np.pi))
    return x + 0.05 * rng.standard_normal(N)


def topo(rng, kind):
    """Scalp projection per component kind."""
    w = rng.uniform(0.1, 0.3, N_CH) * rng.choice([-1, 1], N_CH)
    if kind == "brain":
        focus = rng.integers(0, N_CH)
        w[focus] += rng.choice([-1, 1]) * rng.uniform(0.8, 1.2)
        # neighbors get a gradient
        w += rng.normal(0, 0.15, N_CH)
    elif kind == "blink":
        for i, ch in enumerate(CH_NAMES):
            if ch.startswith(("Fp", "AF")):
                w[i] = rng.uniform(0.9, 1.3)
            elif ch.startswith("F"):
                w[i] = rng.uniform(0.25, 0.45)
            else:
                w[i] = rng.normal(0, 0.05)
    elif kind == "ecg":
        # diffuse left-right gradient, low amplitude everywhere
        w = np.linspace(-0.6, 0.6, N_CH) + rng.normal(0, 0.15, N_CH)
    elif kind == "emg":
        # temporal/edge-dominant
        w = rng.normal(0, 0.08, N_CH)
        for i, ch in enumerate(CH_NAMES):
            if ch in ("T7", "T8", "F3", "F4"):
                w[i] = rng.uniform(0.5, 1.0) * rng.choice([-1, 1])
    elif kind == "pop":
        w = rng.normal(0, 0.02, N_CH)
        w[rng.integers(0, N_CH)] = rng.uniform(1.5, 2.5)
    elif kind == "line":
        w = rng.normal(0.3, 0.2, N_CH)
    return w


def build_components(rng, artifact_kinds):
    """(sources (N, n_comp), mixing (N_CH, n_comp), truth labels)."""
    gen = {"ecg": ecg_source, "blink": blink_source, "emg": emg_source,
           "pop": channel_pop_source, "line": line_source}
    truth_label = {"ecg": "heart beat", "blink": "eye blink",
                   "emg": "muscle artifact", "pop": "channel noise",
                   "line": "line noise"}
    sources, topos, truth = [], [], []
    for kind in artifact_kinds:
        sources.append(gen[kind](rng))
        topos.append(topo(rng, kind))
        truth.append(truth_label[kind])
    for _ in range(5):                        # 5 brain components
        sources.append(brain_source(rng))
        topos.append(topo(rng, "brain"))
        truth.append("brain")
    return (np.stack(sources, axis=1), np.stack(topos, axis=1), truth)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------
class TestPerClassInjection:
    @pytest.mark.parametrize("kind,label", [
        ("ecg", "heart beat"), ("blink", "eye blink"),
        ("emg", "muscle artifact"), ("pop", "channel noise"),
        ("line", "line noise")])
    def test_planted_artifact_flagged_and_only_it(self, kind, label):
        hits, false_flags = 0, 0
        n_seeds = 6
        for seed in range(n_seeds):
            rng = np.random.default_rng(100 + seed)
            sources, mixing, truth = build_components(rng, [kind])
            res = classify_components(sources, mixing, FS, CH_NAMES)
            if res["labels"][0] == label:
                hits += 1
            false_flags += sum(1 for i, lab in enumerate(res["labels"])
                               if truth[i] == "brain"
                               and lab in EXCLUDE_CLASSES)
        selectivity = hits / n_seeds
        specificity = 1 - false_flags / (n_seeds * 5)
        print(f"\n[{label}] selectivity={selectivity:.2f} "
              f"specificity={specificity:.2f}")
        assert selectivity >= 0.9, f"{label}: {selectivity}"
        assert specificity >= 0.9, f"{label}: {specificity}"

    def test_all_artifacts_together(self):
        """One of each artifact + 5 brain → exactly the artifact set is
        excluded (the reference's auto-exclusion class set)."""
        rng = np.random.default_rng(7)
        sources, mixing, truth = build_components(
            rng, ["ecg", "blink", "emg", "pop"])
        res = classify_components(sources, mixing, FS, CH_NAMES)
        excl = auto_exclude_components(res)
        assert sorted(excl) == [0, 1, 2, 3], \
            f"labels={res['labels']}"

    def test_line_noise_not_auto_excluded(self):
        """Line hum is labeled but NOT in the reference's exclusion set
        (it is notch-filtered upstream, preprocessing.py:946-958)."""
        rng = np.random.default_rng(8)
        sources, mixing, truth = build_components(rng, ["line"])
        res = classify_components(sources, mixing, FS, CH_NAMES)
        assert res["labels"][0] == "line noise"
        assert 0 not in auto_exclude_components(res)

    def test_clean_data_specificity(self):
        """All-brain decompositions must stay untouched (false-positive
        rate per class ≈ 0)."""
        flags = 0
        n_seeds, n_comp = 8, 8
        for seed in range(n_seeds):
            rng = np.random.default_rng(200 + seed)
            sources = np.stack([brain_source(rng) for _ in range(n_comp)],
                               axis=1)
            mixing = np.stack([topo(rng, "brain") for _ in range(n_comp)],
                              axis=1)
            res = classify_components(sources, mixing, FS, CH_NAMES)
            flags += len(auto_exclude_components(res))
        specificity = 1 - flags / (n_seeds * n_comp)
        print(f"\n[clean-data] specificity={specificity:.3f}")
        assert specificity >= 0.95


class TestEndToEndThroughICA:
    def test_ica_pipeline_removes_planted_ecg_and_blink(self):
        """Full path: mix artifacts into channels → extended-Infomax ICA →
        label_components → auto-exclusion → artifact power removed."""
        from mba_tpu.ops.ica import InfomaxICA, label_components

        rng = np.random.default_rng(11)
        sources, mixing, truth = build_components(rng, ["ecg", "blink"])
        data = sources @ mixing.T            # (N, N_CH)
        data += 0.05 * rng.standard_normal(data.shape)

        ica = InfomaxICA(n_components=7, random_state=42).fit(data)
        result = label_components(ica, data, FS, CH_NAMES)
        flagged = [i for i, lab in enumerate(result["labels"])
                   if lab in ("heart beat", "eye blink")]
        assert flagged, f"nothing flagged: {result['labels']}"
        cleaned = ica.apply(data, exclude=flagged)

        # the frontal blink power (< 4 Hz on Fp1) must collapse
        def lowpow(x):
            f = np.fft.rfftfreq(len(x), 1 / FS)
            p = np.abs(np.fft.rfft(x - x.mean())) ** 2
            return p[(f > 0.3) & (f < 4.0)].sum()

        fp1 = CH_NAMES.index("Fp1")
        assert lowpow(cleaned[:, fp1]) < 0.55 * lowpow(data[:, fp1])

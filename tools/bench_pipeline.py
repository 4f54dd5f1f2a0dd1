"""End-to-end five-stage pipeline benchmark at study scale (VERDICT r2 #2).

The reference is a *pipeline* (reference src/README.md:95-126):
otb4 import → preprocessing → feature extraction → statistics frame →
omnibus + CBPA + report — and its #1 preprocessing hot spot is the ICA
fit ("n_components × 20-30 s of data", reference pipeline/
preprocessing.py:654-682).  This tool drives the repo's REAL pipeline
modules on one synthetic subject at the study's true per-subject scale
(30 × 45-s trials + 12-s silences @ 2048 Hz — ≈22.5 min of task signal
inside a ≈28-min recording; statistics_data_preparation_workflow.py:24,
126), then the cohort-level statistics stages at 12-subject scale, and
records per-stage wall clock against reference-style numpy/scipy
denominators for the array stages.

Writes ``BENCH_PIPELINE.json`` next to the repo root; ``bench.py``
embeds it in the driver JSON extras.  Run time ≈ 10-20 min (dominated
by host generation + the tunneled upload); rerun any time:

    python tools/bench_pipeline.py
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FS = 2048.0
N_TRIALS = 30
TRIAL_SEC = 45.0
SILENCE_SEC = 12.0
N_EEG = 64
N_EMG = 64
N_ICA = 25
WINDOW_SEC = 2.0
PSD_WINDOW_SEC = 1.0
BETA = (13.0, 30.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ── stage 0: synthesis ────────────────────────────────────────────────
def synth_subject(seed=0):
    """EEG with planted blink/ECG/line/muscle artifacts + beta drive
    during trials; two EMG montages sharing the drive."""
    rng = np.random.default_rng(seed)
    rec_sec = N_TRIALS * (TRIAL_SEC + SILENCE_SEC) - SILENCE_SEC
    n = int(FS * rec_sec)
    t = np.arange(n) / FS

    # beta-band shared drive, gated to trials
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / FS)
    spec[(f < 16) | (f > 28)] = 0
    drive = np.fft.irfft(spec, n=n).astype(np.float32)
    drive /= drive.std() + 1e-12
    gate = np.zeros(n, np.float32)
    trial_spans = []
    for i in range(N_TRIALS):
        i0 = int(i * (TRIAL_SEC + SILENCE_SEC) * FS)
        i1 = i0 + int(TRIAL_SEC * FS)
        gate[i0:i1] = 1.0
        trial_spans.append((i0 / FS, i1 / FS))
    drive *= gate

    # artifacts
    blink = np.zeros(n, np.float32)
    for onset in rng.integers(0, n - int(FS), 150):
        w = int(0.3 * FS)
        blink[onset:onset + w] += np.hanning(w)[:len(blink[onset:onset + w])]
    ecg = np.zeros(n, np.float32)
    for beat in np.arange(0, n, int(0.85 * FS)):
        w = int(0.05 * FS)
        ecg[beat:beat + w] += np.hanning(w)[:len(ecg[beat:beat + w])] * 3
    line = np.sin(2 * np.pi * 50.0 * t).astype(np.float32)

    # mV-scale EEG (tens of µV = 1e-2 mV) — the reference pipeline's
    # working unit: its otb4 CSVs are mV and feed MNE/PSD unscaled
    # (reference preprocessing_workflow.py:61-76, signal_features.py:437).
    # In volts the log-PSD would sit on the parity 1e-10 epsilon and the
    # saved spectrogram artifact would carry no information.
    eeg = rng.standard_normal((n, N_EEG), dtype=np.float32) * 1e-2
    eeg += 4e-3 * drive[:, None] * rng.uniform(0.3, 1.0, N_EEG)[None, :]
    front = np.zeros(N_EEG, np.float32)
    front[:4] = [5e-2, 5e-2, 3e-2, 3e-2]            # Fp1/Fpz/Fp2/AF7 zone
    eeg += blink[:, None] * front[None, :]
    eeg += ecg[:, None] * rng.uniform(1e-3, 4e-3, N_EEG)[None, :]
    eeg += 2e-3 * line[:, None] * rng.uniform(0.5, 1.5, N_EEG)[None, :]

    def emg_like(gain):
        x = rng.standard_normal((n, N_EMG), dtype=np.float32) * 0.05
        x += gain * drive[:, None] * rng.uniform(0.3, 1.0, N_EMG)[None, :]
        x += 0.01 * line[:, None]
        return x

    return eeg, emg_like(0.03), emg_like(0.008), trial_spans, rec_sec


# ── CPU denominators (reference-style numpy/scipy) ────────────────────
def cpu_filter_denominator(x_slice, fs):
    """MNE-style FIR (firwin + zero-phase fftconvolve), timed on a slice
    and extrapolated linearly in samples."""
    import scipy.signal

    taps_bp = scipy.signal.firwin(8193, [1.0, 100.0], fs=fs,
                                  pass_zero=False, window="hamming")
    t0 = time.perf_counter()
    y = scipy.signal.fftconvolve(x_slice, taps_bp[:, None], mode="same",
                                 axes=0)
    for f0 in (50.0, 100.0, 150.0, 200.0):
        b, a = scipy.signal.iirnotch(f0, 30.0, fs=fs)
        y = scipy.signal.filtfilt(b, a, y, axis=0)
    return time.perf_counter() - t0


def cpu_ica_epoch_denominator(x_white, block, n_comp, rng):
    """One numpy epoch of the identical extended-infomax batch loop."""
    n = x_white.shape[0]
    n_blocks = n // block
    w = np.eye(n_comp, dtype=np.float32)
    signs = np.ones(n_comp, np.float32)
    # tiny rate: this loop exists for TIMING (flops identical); the
    # production schedule lives in ops/ica.py — a big rate on unwhitened
    # blocks just overflows to NaN without changing the cost
    lrate = np.float32(1e-7)
    eye = np.eye(n_comp, dtype=np.float32)
    perm = rng.permutation(n)[:n_blocks * block]
    data = x_white[perm].reshape(n_blocks, block, n_comp)
    t0 = time.perf_counter()
    for xb in data:
        u = xb @ w
        y = np.tanh(u)
        w = w + lrate * (w @ (block * eye - signs[None, :] * (u.T @ y)
                              - u.T @ u))
    return time.perf_counter() - t0


def main():
    import jax
    from mba_tpu.io.otb4 import write_otb4, read_otb4
    from mba_tpu.utils.profiling import hard_sync
    from mba_tpu.utils.transfer import (download_quantized, upload_counts,
                                        upload_quantized)
    from mba_tpu.pipeline.preprocessing import BiosignalPreprocessor
    from mba_tpu.pipeline import signal_features as features
    from mba_tpu.pipeline.cbpa import CMC_EEG_CHANNEL_SUBSET

    stages = {}
    denominators = {}
    platform = jax.devices()[0].platform
    # warm the readback channel: the first device->host transfer in a
    # process pays a ~20 s one-time setup that would otherwise land in
    # whichever stage reads back first
    hard_sync(jax.device_put(np.float32(1.0)))

    log("[synth] generating subject at study scale …")
    t0 = time.perf_counter()
    eeg, emg1, emg2, trial_spans, rec_sec = synth_subject()
    stages["synthesis_sec_host"] = round(time.perf_counter() - t0, 2)
    n = eeg.shape[0]
    log(f"[synth] {rec_sec/60:.1f} min recording, "
        f"{N_TRIALS * TRIAL_SEC/60:.1f} min task signal "
        f"({stages['synthesis_sec_host']}s)")

    work = Path(tempfile.mkdtemp(prefix="bench_pipeline_"))
    try:
        # ── stage 1: OTB4 import (the real archive reader) ────────────
        p1 = work / "emg_flexor.otb4"
        p2 = work / "emg_extensor.otb4"
        write_otb4(p1, emg1.T, FS)          # ADC-quantized int16 archive
        write_otb4(p2, emg2.T, FS)
        t0 = time.perf_counter()
        # TPU-first import: zero-copy int16 ADC counts (raw_counts=True)
        # — no host float materialization; the counts→mV scaling is
        # fused into the on-device dequant at upload time
        # (upload_counts), so the values the cascade sees are EXACT (no
        # re-quantization of a host float copy)
        r1 = read_otb4(p1, raw_counts=True)
        r2 = read_otb4(p2, raw_counts=True)
        emg1_counts = r1["signals"][0][1].T       # (n, C) zero-copy view
        emg2_counts = r2["signals"][0][1].T
        emg1_vpc = r1["mv_per_count"][0]          # mV/count (the
        emg2_vpc = r2["mv_per_count"][0]          # pipeline unit)
        stages["s1_otb4_import_sec"] = round(time.perf_counter() - t0, 2)
        log(f"[s1] otb4 import 2×{N_EMG}ch×{rec_sec/60:.0f}min: "
            f"{stages['s1_otb4_import_sec']}s")

        # ── stage 2: preprocessing (full cascade incl. ICA) ───────────
        # device_resident: ONE upload per modality; stages stay on the
        # chip (the host-staged default round-trips ~0.9 GB per stage
        # over the link — measured 178 s filter / 384 s ICA-apply on
        # this tunnel before the mode existed)
        # int16 per-channel quantized upload (utils/transfer.py): half
        # the link bytes; error ≤ 2^-16 of each channel's peak (mV
        # here) — orders of magnitude below the 3 mV amplitude threshold
        t0 = time.perf_counter()
        eeg_d, up_bytes, up_err = upload_quantized(eeg, np.int16)
        hard_sync(eeg_d)
        stages["s2_eeg_upload_sec"] = round(time.perf_counter() - t0, 2)
        detail = {"s2_eeg_upload_bytes": int(up_bytes),
                  "s2_eeg_upload_quant_err_mv": float(f"{up_err:.2e}")}
        prep = BiosignalPreprocessor(
            eeg_d, int(FS), "eeg", n_ica_components=N_ICA,
            automatic_ic_labelling=True, wavelet_type=None,
            amplitude_rejection_threshold=3.0,    # 3 mV in mV units
            device_resident=True)
        t0 = time.perf_counter()
        hard_sync(prep.np_filtered_data)
        t_filter = time.perf_counter() - t0
        log(f"[s2] … filter {t_filter:.1f}s")
        t0 = time.perf_counter()
        hard_sync(prep.np_amplitude_compliant_data)
        t_refamp = time.perf_counter() - t0
        log(f"[s2] … ref+amplitude {t_refamp:.1f}s")
        t0 = time.perf_counter()
        ica = prep.ica_result
        t_ica = time.perf_counter() - t0
        log(f"[s2] … ICA fit {t_ica:.1f}s ({ica.n_iter_} iters)")
        t0 = time.perf_counter()
        hard_sync(prep.np_artefact_free_data)
        t_ica_apply = time.perf_counter() - t0
        n_excluded = len(ica.exclude)
        t0 = time.perf_counter()
        eeg_clean = prep.np_output_data
        hard_sync(eeg_clean)
        t_spatial = time.perf_counter() - t0
        stages["s2_eeg_filter_sec"] = round(t_filter, 2)
        stages["s2_eeg_reference_amplitude_sec"] = round(t_refamp, 2)
        stages["s2_eeg_ica_fit_sec"] = round(t_ica, 2)
        stages["s2_eeg_ica_label_apply_sec"] = round(t_ica_apply, 2)
        stages["s2_eeg_spatial_sec"] = round(t_spatial, 2)
        stages["s2_eeg_ica_n_iter"] = int(ica.n_iter_)
        stages["s2_eeg_ica_n_excluded"] = int(n_excluded)
        log(f"[s2] EEG cascade: filter {t_filter:.1f}s, ref+amp "
            f"{t_refamp:.1f}s, ICA fit {t_ica:.1f}s "
            f"({ica.n_iter_} iters, {n_excluded} ICs excluded), "
            f"apply {t_ica_apply:.1f}s, spatial {t_spatial:.1f}s")

        # CPU denominators for stage 2 (needs `eeg` and `ica`, so they
        # run before the EEG cascade's caches are released below)
        slice_n = int(30 * FS)
        d = cpu_filter_denominator(eeg[:slice_n], FS)
        denominators["s2_filter_cpu_sec_extrapolated"] = round(
            d * (n / slice_n) * 3, 1)     # 3 arrays (EEG + 2 EMG)
        x_white = ica.get_sources(eeg[:int(60 * FS)])[:, :N_ICA].astype(
            np.float32)
        block = max(8, int(np.sqrt(n / 3.0)))
        epoch_slice = cpu_ica_epoch_denominator(
            x_white, block, N_ICA, np.random.default_rng(0))
        # one numpy epoch over the full recording, × the iterations the
        # TPU fit actually needed
        epoch_full = epoch_slice * (n // block) / max(
            len(x_white) // block, 1)
        denominators["s2_ica_cpu_sec_extrapolated_live"] = round(
            epoch_full * max(ica.n_iter_, 1), 1)
        # prefer the PINNED epoch rate (BENCH_CPU_PINNED.json, median of
        # 5): the live 1-core timing swings ~2x with host load, which
        # made ica_speedup_vs_cpu uninterpretable across rounds
        pinned_rate = {}
        ppin = REPO / "BENCH_CPU_PINNED.json"
        if ppin.exists():
            pinned_rate = json.loads(ppin.read_text())
        per_ms = pinned_rate.get("ica_cpu_sec_per_epoch_per_msample")
        if per_ms is not None:
            denominators["s2_ica_cpu_sec_extrapolated"] = round(
                per_ms * (n / 1e6) * max(ica.n_iter_, 1), 1)
        else:
            denominators["s2_ica_cpu_sec_extrapolated"] = \
                denominators["s2_ica_cpu_sec_extrapolated_live"]
        log(f"[s2] CPU denominators: filters "
            f"{denominators['s2_filter_cpu_sec_extrapolated']}s, ICA "
            f"{denominators['s2_ica_cpu_sec_extrapolated']}s")
        del eeg
        # the cascade caches every stage on-device in device_resident
        # mode (~0.9 GB each at this scale, ~6 stages); release them
        # BEFORE the two EMG cascades run — with them still pinned the
        # EMG cascade OOMs a 16 GB chip (observed: ResourceExhausted in
        # the EMG amplitude annotation)
        prep.free_intermediate_stages()
        del prep, ica

        t0 = time.perf_counter()
        # exact upload: the archive's int16 counts ride the link
        # verbatim (same bytes as the quantized leg, zero error)
        emg1_d, nb1 = upload_counts(emg1_counts, emg1_vpc[None, :])
        emg1_clean = BiosignalPreprocessor(
            emg1_d, int(FS), "emg",
            n_ica_components=None, automatic_ic_labelling=False,
            wavelet_type=None, laplacian_filter_neighbor_radius=None,
            amplitude_rejection_threshold=3.0, device_resident=True,
            ).np_output_data
        emg2_d, nb2 = upload_counts(emg2_counts, emg2_vpc[None, :])
        emg2_clean = BiosignalPreprocessor(
            emg2_d, int(FS), "emg",
            n_ica_components=None, automatic_ic_labelling=False,
            wavelet_type=None, laplacian_filter_neighbor_radius=None,
            amplitude_rejection_threshold=3.0, device_resident=True,
            ).np_output_data
        hard_sync(emg1_clean, emg2_clean)
        detail["s2_emg_upload_bytes"] = int(nb1 + nb2)
        stages["s2_emg_cascade_sec"] = round(time.perf_counter() - t0, 2)
        log(f"[s2] EMG cascades: {stages['s2_emg_cascade_sec']}s")
        del emg1, emg2, emg1_counts, emg2_counts

        # ── stage 3: feature extraction ───────────────────────────────
        # compute stays device-resident; the host download of the big
        # result tensors (the dominant cost on this tunneled link) and
        # the disk save are timed separately so the JSON attributes
        # link-bandwidth weather vs actual TPU compute
        feat_dir = work / "features"
        feat_dir.mkdir()
        # one modality at a time: a study-scale device spectrogram is
        # ~0.9 GB; keeping all three resident alongside the cleaned
        # recordings exhausts HBM
        t_psd_comp = t_psd_down = 0.0
        psd_mb = 0.0
        # The three costs of this stage live on three different
        # resources: TPU compute (chip), int8 download (tunneled link),
        # f16 artifact write (host disk).  Run the disk saves on a
        # single worker thread so modality k's save overlaps modality
        # k+1's download — numpy file writes release the GIL, and the
        # link and the disk are independent.  Serial r3 measurement:
        # 8.3 s compute + 83.5 s download + 59.2 s save = 151 s; the
        # pipelined wall is ≈ compute + download + the LAST save.
        save_busy = [0.0]

        def _save_worker(s_host, tc_, fr_, modality):
            t0 = time.perf_counter()
            # f16 on disk: halves the write bytes; abs error ≤ ~0.005
            # log10 units at these magnitudes — same order as the int8
            # link quantization already accepted below
            features.save_spectrograms(s_host, tc_, fr_, "PSD",
                                       save_dir=feat_dir,
                                       identifier_suffix=modality,
                                       save_dtype=np.float16)
            save_busy[0] += time.perf_counter() - t0

        t_stage0 = time.perf_counter()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=1) as saver:
            save_futs = []
            for modality, arr in (("eeg", eeg_clean),
                                  ("emg_1_flexor", emg1_clean),
                                  ("emg_2_extensor", emg2_clean)):
                t0 = time.perf_counter()
                s_dev, tc_, fr_ = features.multitaper_psd(
                    arr, FS, nw=3, window_length_sec=PSD_WINDOW_SEC,
                    overlap_frac=0.5, axis=0, apply_log_scale=True,
                    device_output=True)
                hard_sync(s_dev)
                t_psd_comp += time.perf_counter() - t0
                t0 = time.perf_counter()
                # int8 payload with per-(freq, channel) scales
                # (lane_ndim=2): quarter the f32 link bytes; the
                # per-lane span over windows is ~1-3 log10 units, so
                # the worst-case element error is ≤ ~0.006 log10 units
                # (~1.5 % linear power) — recorded below, and far below
                # inter-window variance.  The tunneled link
                # (~4-25 MB/s) is the stage's bottleneck, not the TPU.
                s_host, n_bytes, q_err = download_quantized(
                    s_dev, np.int8, lane_ndim=2)
                t_psd_down += time.perf_counter() - t0
                psd_mb += n_bytes / 1e6
                detail[f"s3_psd_{modality}_quant_err_log10"] = float(
                    f"{q_err:.2e}")
                del s_dev
                save_futs.append(
                    saver.submit(_save_worker, s_host, tc_, fr_,
                                 modality))
                del s_host
            for fut in save_futs:
                fut.result()
        t_psd = time.perf_counter() - t_stage0
        stages["s3_psd_sec"] = round(t_psd, 2)
        detail["s3_psd_compute"] = round(t_psd_comp, 2)
        detail["s3_psd_download"] = round(t_psd_down, 2)
        detail["s3_psd_download_mb"] = round(psd_mb, 0)
        detail["s3_psd_save_busy"] = round(save_busy[0], 2)
        detail["s3_psd_overlap_saved_sec"] = round(
            t_psd_comp + t_psd_down + save_busy[0] - t_psd, 2)

        ws = int(WINDOW_SEC * FS)
        hop = ws // 2
        n_windows = (n - ws) // hop + 1
        centers = (np.arange(n_windows) * hop + ws / 2) / FS
        window_mask = np.zeros(n_windows, bool)
        for ts, te in trial_spans:
            window_mask |= (centers >= ts + WINDOW_SEC / 2) \
                & (centers <= te - WINDOW_SEC / 2)
        t0 = time.perf_counter()
        cmc_results = {}
        for muscle, arr in (("flexor", emg1_clean),
                            ("extensor", emg2_clean)):
            tm = {}
            # int8 + adaptive per-(F, E, M) lanes: ≤ ~2e-3 absolute
            # coherence error — ~0.5 % of the typical jackknife CI
            # width (median ~0.4) — for half the int16 link bytes
            cmc_results[muscle] = features.compute_task_wise_aggregated_cmc(
                eeg_clean, arr, int(FS), muscle_group=muscle,
                eeg_channel_subset=CMC_EEG_CHANNEL_SUBSET,
                window_size_sec=WINDOW_SEC, window_overlap_ratio=0.5,
                use_jackknife=True, save_dir=feat_dir,
                window_mask=window_mask, timings_out=tm,
                transfer_dtype=np.int8)
            for k, v in tm.items():
                detail[f"s3_cmc_{muscle}_{k}"] = v
        t_cmc = time.perf_counter() - t0
        stages["s3_cmc_sec"] = round(t_cmc, 2)
        n_active = int(window_mask.sum())
        pinned = {}
        pp = REPO / "BENCH_CPU_PINNED.json"
        if pp.exists():
            pinned = json.loads(pp.read_text())
        cpu_rate = pinned.get("cmc_spectra_per_sec_cpu", 958.0)
        denominators["s3_cmc_cpu_sec_pinned_rate"] = round(
            n_active * len(CMC_EEG_CHANNEL_SUBSET) * N_EMG * 2 / cpu_rate,
            1)
        log(f"[s3] PSD {t_psd:.1f}s; task CMC ({n_active} task windows, "
            f"{len(CMC_EEG_CHANNEL_SUBSET)}×{N_EMG}×2 muscles) "
            f"{t_cmc:.1f}s (CPU-pinned equivalent "
            f"{denominators['s3_cmc_cpu_sec_pinned_rate']}s)")
        del eeg_clean, emg1_clean, emg2_clean

        # ── stage 4: statistics frame at cohort scale ─────────────────
        import pandas as pd
        t0 = time.perf_counter()
        coh, lo_ci, up_ci, tc, fr = cmc_results["flexor"]
        beta_sel = (fr >= BETA[0]) & (fr <= BETA[1])
        rows = []
        rng = np.random.default_rng(1)
        for subj in range(12):
            jitter = rng.normal(0, 0.01, size=N_TRIALS)
            for i, (ts, te) in enumerate(trial_spans):
                sel = (tc >= ts) & (tc <= te)
                if not sel.any():
                    continue
                cmc_beta = float(coh[np.ix_(sel, beta_sel)].max())
                rows.append({
                    "Subject ID": subj,
                    "Trial ID": i,
                    "Segment ID": 0,
                    "Category or Silence":
                        ["Happy", "Sad", "Silence"][i % 3],
                    "CMC_Flexor_max_beta":
                        np.clip(cmc_beta + jitter[i], 0, 1),
                    "Liking": rng.integers(1, 8),
                })
        combined = pd.DataFrame(rows)
        from mba_tpu.utils import file_management as filemgmt
        combined.to_csv(
            feat_dir / filemgmt.file_title("Combined Statistics 1seg",
                                           ".csv"),
            index=False)
        stages["s4_stats_frame_sec"] = round(time.perf_counter() - t0, 2)
        log(f"[s4] combined frame ({len(combined)} rows): "
            f"{stages['s4_stats_frame_sec']}s")

        # ── stage 5: omnibus + CBPA + report ──────────────────────────
        from mba_tpu.workflows.statistics_RQ_A_omnibus_testing_workflow \
            import run_omnibus
        from mba_tpu.workflows.statistics_report_workflow import \
            build_report
        from mba_tpu.ops.permutation import (
            cluster_permutation_1samp_test, delaunay_channel_adjacency,
            combine_adjacency)

        def levels(multi):
            return [{
                'df_filter': None,
                'condition_vars': {'Category or Silence': 'categorical'},
                'reference_categories': {'Category or Silence': 'Silence'},
                'explanatory_vars': [], 'moderation_pairs': None}]

        out_dir = work / "stats_out"
        t0 = time.perf_counter()
        run_omnibus(feat_dir, out_dir, n_within_trial_segments_list=[1],
                    hypotheses=[('H1: Flexor Beta Peak CMC',
                                 'CMC_Flexor_max_beta')],
                    level_definitions_factory=levels, fdr_levels=[],
                    make_forest_mosaics=False)
        t_omni = time.perf_counter() - t0
        stages["s5_omnibus_sec"] = round(t_omni, 2)

        # CBPA: cohort contrast over (subjects, windows-in-beta, channels)
        t0 = time.perf_counter()
        n_t = 40
        ch = CMC_EEG_CHANNEL_SUBSET
        X = (0.2 + rng.standard_normal((12, n_t, len(ch)))
             ).astype(np.float32)
        adj = combine_adjacency(n_t, delaunay_channel_adjacency(ch))
        cbpa_res = cluster_permutation_1samp_test(
            X, adj, n_permutations=1024, tail=1)
        t_cbpa = time.perf_counter() - t0
        stages["s5_cbpa_sec"] = round(t_cbpa, 2)

        t0 = time.perf_counter()
        report = build_report(out_dir, out_dir, work / "reports",
                              "pipeline_bench")
        t_report = time.perf_counter() - t0
        stages["s5_report_sec"] = round(t_report, 2)
        assert report.exists()
        log(f"[s5] omnibus {t_omni:.1f}s, CBPA {t_cbpa:.1f}s, report "
            f"{t_report:.1f}s")

        total = sum(v for k, v in stages.items()
                    if k.endswith("_sec") and not k.startswith("synth"))
        stages["total_pipeline_sec"] = round(total, 2)
        result = {
            "description": "five-stage end-to-end pipeline at study "
                           "scale (1 subject heavy stages, 12-subject "
                           "statistics stages)",
            "platform": platform,
            "recording_min": round(rec_sec / 60, 1),
            "task_signal_min": round(N_TRIALS * TRIAL_SEC / 60, 1),
            "n_eeg": N_EEG, "n_emg": N_EMG, "n_ica_components": N_ICA,
            "stages": stages,
            "stage_detail": detail,
            "cpu_denominators": denominators,
            "ica_speedup_vs_cpu": round(
                denominators["s2_ica_cpu_sec_extrapolated"]
                / max(stages["s2_eeg_ica_fit_sec"], 1e-9), 1),
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        out_path = REPO / "BENCH_PIPELINE.json"
        out_path.write_text(json.dumps(result, indent=2) + "\n")
        log(f"[done] total pipeline {total:.1f}s → {out_path}")
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

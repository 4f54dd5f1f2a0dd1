"""Song-characteristics lookup table.

Parity target: reference ``src/music_feature_extraction_workflow.py``
(431 LoC): audio features per song file (:81-158), Spotify-backed
title/artist/manual-BPM extension (:178-264), perceived-category
reassignment + flow plot (:268-328), clustering + MI + scatters
(:335-431).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from mba_tpu.pipeline import music_control as mc
from mba_tpu.utils import file_management as filemgmt


def build_song_characteristics_table(audio_dir: Path,
                                     save_dir: Path | None = None,
                                     duration: float = 120.0
                                     ) -> pd.DataFrame:
    """Compute the feature lookup table over every WAV in a directory."""
    rows = []
    for audio in sorted(Path(audio_dir).glob("*.wav")):
        bpm, flux, centroid, ioi_cv, sync_degree, sync_ratio = \
            mc.compute_all_musical_features(audio, duration=duration)
        rows.append({
            "File Title": audio.stem,
            "Title": audio.stem.split(" - ")[0],
            "Artist": (audio.stem.split(" - ")[1]
                       if " - " in audio.stem else "Unknown"),
            "BPM": bpm, "BPM_manual": bpm,
            "Spectral Flux Mean": float(np.mean(flux)),
            "Spectral Flux Std.": float(np.std(flux)),
            "Spectral Centroid Mean": float(np.mean(centroid)),
            "IOI Variance Coeff": ioi_cv,
            "Syncopation Degree": sync_degree,
            "Syncopation Ratio": sync_ratio})
    table = pd.DataFrame(rows)
    if save_dir is not None and not table.empty:
        out = Path(save_dir) / filemgmt.file_title(
            "Song Characteristics Lookup Table", ".csv")
        table.to_csv(out, index=False)
        print(f"Saved lookup table -> {out}")
    return table


def analyse_category_reassignments(stats_frame: pd.DataFrame,
                                   save_dir: Path | None = None):
    """Intended vs perceived category flow (reference :268-328)."""
    from mba_tpu.pipeline.visualizations import plot_category_sankey
    sub = stats_frame.dropna(subset=["Perceived Category"])
    sub = sub[sub["Category or Silence"] != "Silence"]
    if sub.empty:
        return None
    return plot_category_sankey(
        sub["Category or Silence"].tolist(),
        sub["Perceived Category"].tolist(),
        title="Intended vs Perceived Category", save_dir=save_dir)


if __name__ == "__main__":
    from mba_tpu.workflows.paths import StudyPaths

    paths = StudyPaths().ensure()
    audio_dir = paths.data / "audio"
    if audio_dir.exists():
        build_song_characteristics_table(
            audio_dir, save_dir=paths.song_characteristics)

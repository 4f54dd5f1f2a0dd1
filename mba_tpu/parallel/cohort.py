"""Cohort-scale sharded CMC and surrogate-null computation.

The reference loops subjects sequentially
(subject_feature_extraction_workflow.py:37) and permutations via joblib
(cbpa.py:1027-1042).  Here the cohort is a leading array axis sharded over
the ``subjects`` mesh axis and windows are sharded over the ``windows`` mesh
axis; XLA inserts the collectives for the cohort reductions.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mba_tpu.ops.coherence import _msc_chunk_kernel
from mba_tpu.ops.surrogate import phase_randomize, _msc_spectrum_mean
from mba_tpu.ops.framing import frame_signal


def sharded_cohort_cmc(mesh: Mesh,
                       eeg_frames: jnp.ndarray,
                       emg_frames: jnp.ndarray,
                       tapers: np.ndarray,
                       inv_fs_n: float,
                       t_crit: float,
                       use_jackknife: bool = True,
                       aggregate_emg_max: bool = True):
    """Per-subject CMC + cohort-mean coherence on a device mesh.

    eeg_frames: (n_subjects, n_windows, window_samples, n_eeg)
    emg_frames: (n_subjects, n_windows, window_samples, n_emg)

    Sharded over ('subjects', 'windows'); the per-window kernel needs no
    halo (windows are pre-framed), so the only collective is the cohort-mean
    ``psum`` XLA derives from the output sharding.
    """
    shard = NamedSharding(mesh, P("subjects", "windows"))
    eeg_frames = jax.device_put(eeg_frames, shard)
    emg_frames = jax.device_put(emg_frames, shard)
    tapers_j = jnp.asarray(tapers, jnp.float32)

    @functools.partial(jax.jit,
                       out_shardings=(shard, NamedSharding(mesh, P())))
    def step(ef, mf):
        per_subject = jax.vmap(
            lambda e, m: _msc_chunk_kernel(
                e, m, tapers_j, jnp.float32(inv_fs_n), jnp.float32(t_crit),
                use_jackknife, aggregate_emg_max))(ef, mf)
        coh = per_subject["coherence"]
        cohort_mean = coh.mean(axis=0)      # cross-subject reduction (psum)
        return coh, cohort_mean

    return step(eeg_frames, emg_frames)


def sharded_surrogate_null(mesh: Mesh,
                           eeg: jnp.ndarray,
                           emg: jnp.ndarray,
                           tapers: np.ndarray,
                           inv_fs_n: float,
                           window_starts: np.ndarray,
                           window_samples: int,
                           n_surrogates: int,
                           seed: int = 0):
    """Phase-randomised MSC null sharded over all mesh devices.

    Surrogates are split evenly over every device in the mesh (the null
    axis is embarrassingly parallel); returns the per-surrogate global max
    statistic (n_surrogates,).
    """
    n_dev = mesh.devices.size
    n_per = -(-n_surrogates // n_dev)
    total = n_per * n_dev

    flat_mesh = Mesh(mesh.devices.reshape(-1), ("surrogates",))
    shard = NamedSharding(flat_mesh, P("surrogates"))
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(seed), total), shard)

    starts_j = jnp.asarray(window_starts, jnp.int32)
    tapers_j = jnp.asarray(tapers, jnp.float32)
    eeg_frames = frame_signal(jnp.asarray(eeg), starts_j, window_samples)
    emg_j = jnp.asarray(emg)

    @functools.partial(jax.jit, out_shardings=shard,
                       static_argnames=("ws",))
    def step(ks, ef, m, ws):
        def one(k):
            s = phase_randomize(k, m, 1)[0]
            mf = frame_signal(s, starts_j, ws)
            spec = _msc_spectrum_mean(ef, mf, tapers_j,
                                      jnp.float32(inv_fs_n))
            return spec.max()
        return jax.lax.map(one, ks)

    out = step(keys, eeg_frames, emg_j, window_samples)
    return np.asarray(out)[:n_surrogates]

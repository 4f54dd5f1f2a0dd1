"""Multi-chip sharding layer on the 8-device virtual CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.stats import t as t_dist

from mba_tpu.parallel.mesh import make_mesh, cohort_sharding
from mba_tpu.parallel.cohort import (sharded_cohort_cmc,
                                     sharded_surrogate_null)
from mba_tpu.ops.coherence import _msc_chunk_kernel
from mba_tpu.ops.dpss import filtered_tapers

FS, WS = 256.0, 256


def _cohort_frames(n_subjects=4, n_windows=8, n_eeg=4, n_emg=2, seed=0):
    rng = np.random.default_rng(seed)
    eeg = rng.standard_normal((n_subjects, n_windows, WS, n_eeg)
                              ).astype(np.float32)
    emg = rng.standard_normal((n_subjects, n_windows, WS, n_emg)
                              ).astype(np.float32)
    return eeg, emg


class TestMesh:
    def test_default_8_device_layout(self):
        mesh = make_mesh(8)
        assert mesh.axis_names == ("subjects", "windows")
        assert mesh.devices.shape == (2, 4)

    def test_explicit_axis_shapes(self):
        mesh = make_mesh(8, axis_shapes={"subjects": 4, "windows": 2})
        assert mesh.devices.shape == (4, 2)

    def test_cohort_sharding_spec(self):
        mesh = make_mesh(8)
        shard = cohort_sharding(mesh)
        assert shard.spec == jax.sharding.PartitionSpec("subjects",
                                                        "windows")


class TestShardedCohortCmc:
    def test_matches_unsharded_kernel(self):
        mesh = make_mesh(8)
        eeg, emg = _cohort_frames()
        tapers = np.asarray(filtered_tapers(WS, 3, 0.9), np.float32)
        K = tapers.shape[0]
        t_crit = float(t_dist.ppf(0.975, K - 1))
        inv = float(1.0 / (FS * WS))

        coh, cohort_mean = sharded_cohort_cmc(
            mesh, eeg, emg, tapers, inv, t_crit)
        assert coh.shape == (4, 8, WS // 2 + 1, 4)
        assert cohort_mean.shape == (8, WS // 2 + 1, 4)
        # the per-subject sharded result equals the single-device kernel
        ref = _msc_chunk_kernel(
            jnp.asarray(eeg[1]), jnp.asarray(emg[1]),
            jnp.asarray(tapers), np.float32(inv), np.float32(t_crit),
            use_jackknife=True, aggregate_emg_max=True)["coherence"]
        np.testing.assert_allclose(np.asarray(coh)[1], np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(cohort_mean),
                                   np.asarray(coh).mean(axis=0),
                                   atol=1e-6)

    def test_output_actually_sharded(self):
        mesh = make_mesh(8)
        eeg, emg = _cohort_frames()
        tapers = np.asarray(filtered_tapers(WS, 3, 0.9), np.float32)
        coh, cohort_mean = sharded_cohort_cmc(
            mesh, eeg, emg, tapers, 1.0 / (FS * WS), 2.0)
        # per-subject output spans all 8 devices; the cohort mean is
        # fully replicated
        assert len(coh.sharding.device_set) == 8
        assert cohort_mean.sharding.is_fully_replicated


class TestShardedSurrogateNull:
    def _signals(self, couple=False, seed=0):
        rng = np.random.default_rng(seed)
        n = WS * 12
        white = rng.standard_normal(n)
        spec = np.fft.rfft(white)
        f = np.fft.rfftfreq(n, 1 / FS)
        spec[(f < 15) | (f > 30)] = 0
        shared = np.fft.irfft(spec, n=n)
        shared /= shared.std() + 1e-12
        g = 0.8 if couple else 0.0
        eeg = (g * shared[:, None]
               + rng.standard_normal((n, 1))).astype(np.float32)
        emg = (g * shared[:, None]
               + rng.standard_normal((n, 1))).astype(np.float32)
        return eeg, emg

    def test_null_shape_and_range(self):
        mesh = make_mesh(8)
        eeg, emg = self._signals()
        tapers = np.asarray(filtered_tapers(WS, 3, 0.9), np.float32)
        starts = np.arange(0, eeg.shape[0] - WS + 1, WS // 2)
        null = sharded_surrogate_null(
            mesh, eeg, emg, tapers, 1.0 / (FS * WS), starts, WS,
            n_surrogates=50, seed=1)
        assert null.shape == (50,)
        assert np.all((null >= 0) & (null <= 1))
        # deterministic per seed
        null2 = sharded_surrogate_null(
            mesh, eeg, emg, tapers, 1.0 / (FS * WS), starts, WS,
            n_surrogates=50, seed=1)
        np.testing.assert_allclose(null, null2)

    def test_null_below_planted_coupling(self):
        from mba_tpu.ops.surrogate import _msc_spectrum_mean
        from mba_tpu.ops.framing import frame_signal
        mesh = make_mesh(8)
        eeg, emg = self._signals(couple=True, seed=2)
        tapers = np.asarray(filtered_tapers(WS, 3, 0.9), np.float32)
        starts = np.arange(0, eeg.shape[0] - WS + 1, WS // 2)
        inv = 1.0 / (FS * WS)
        null = sharded_surrogate_null(mesh, eeg, emg, tapers, inv,
                                      starts, WS, n_surrogates=64,
                                      seed=3)
        ef = frame_signal(jnp.asarray(eeg), jnp.asarray(starts,
                                                        jnp.int32), WS)
        mf = frame_signal(jnp.asarray(emg), jnp.asarray(starts,
                                                        jnp.int32), WS)
        observed = float(np.asarray(_msc_spectrum_mean(
            ef, mf, jnp.asarray(tapers), jnp.float32(inv))).max())
        assert observed > np.quantile(null, 0.99)

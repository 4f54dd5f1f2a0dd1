"""Fused Pallas rotation-null chunk: parity with the XLA core.

Runs in Pallas interpreter mode (the CPU backend has no Mosaic
lowering); the real-TPU path is numerically checked against the XLA
lowering on hardware and gated with an automatic fallback in
``cohort_null.cohort_msc_rotation_null``.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mba_tpu.ops.cohort_null import _null_chunk_core, phase_features
from mba_tpu.ops.pallas_null import (prepare_null_coeffs,
                                     null_chunk_pallas,
                                     _null_chunk_pallas_jit)


def _toy(J=3, nF=4, N=512, K=3, seed=0):
    rng = np.random.default_rng(seed)
    P = K * (K - 1)
    coef = jnp.asarray(rng.standard_normal((J, nF, N, P))
                       .astype(np.float32) * 0.05)
    base = jnp.asarray(rng.uniform(0.1, 0.3, (nF, N)).astype(np.float32))
    obs = jnp.asarray(np.asarray(base)
                      + rng.uniform(-0.05, 0.2, (nF, N))
                      .astype(np.float32))
    return coef, base, obs, P


class TestPallasNullParity:
    def test_matches_xla_core(self):
        J, nF, N, K, S = 3, 4, 512, 3, 20
        coef, base, obs, P = _toy(J, nF, N, K)
        key = jax.random.PRNGKey(7)
        ms_ref, counts_ref = _null_chunk_core(
            key, coef, base, obs, jnp.zeros((nF, N), jnp.int32), S, K,
            jnp.float32)
        coefT = prepare_null_coeffs(coef, jnp.float32)
        ms_p, counts_p = null_chunk_pallas(
            key, coefT, base, obs, S, K, J, P, jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(ms_ref), np.asarray(ms_p),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(counts_ref),
                                      np.asarray(counts_p))

    def test_unaligned_surrogate_count(self):
        # S not a multiple of the sublane tile: padded rows must not
        # leak into the counts
        J, nF, N, K, S = 2, 3, 256, 3, 13
        coef, base, obs, P = _toy(J, nF, N, K, seed=1)
        key = jax.random.PRNGKey(3)
        ms_ref, counts_ref = _null_chunk_core(
            key, coef, base, obs, jnp.zeros((nF, N), jnp.int32), S, K,
            jnp.float32)
        coefT = prepare_null_coeffs(coef, jnp.float32)
        ms_p, counts_p = null_chunk_pallas(
            key, coefT, base, obs, S, K, J, P, jnp.float32,
            interpret=True)
        assert ms_p.shape == (S,)
        np.testing.assert_allclose(np.asarray(ms_ref), np.asarray(ms_p),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(counts_ref),
                                      np.asarray(counts_p))

    def test_rejects_untileable_cells(self):
        J, nF, N, K = 2, 3, 700, 3      # 700 % 512 != 0
        coef, base, obs, P = _toy(J, nF, N, K, seed=2)
        coefT = prepare_null_coeffs(coef, jnp.float32)
        with pytest.raises(ValueError):
            _null_chunk_pallas_jit(
                jnp.zeros((nF, 8, coefT.shape[1]), jnp.float32), coefT,
                base, obs, S=8, J=J, P=P, interpret=True)

    def test_coeff_relayout_roundtrip(self):
        J, nF, N, K = 3, 4, 512, 3
        coef, _, _, P = _toy(J, nF, N, K, seed=4)
        coefT = prepare_null_coeffs(coef, jnp.float32)
        JP_pad = coefT.shape[1]
        assert JP_pad % 128 == 0
        # padding rows are zero → contribute nothing to the contraction
        assert float(jnp.abs(coefT[:, J * P:, :]).max()) == 0.0
        # the (j, p) flattening matches phase_features' feature order:
        # stat from the relayout equals the core's dot_general
        S = 6
        key = jax.random.PRNGKey(9)
        phi = jax.random.uniform(key, (J, S, K, nF),
                                 minval=0.0, maxval=2 * np.pi)
        G = phase_features(phi)
        stat_core = jax.lax.dot_general(
            G, coef, dimension_numbers=(((0, 3), (0, 3)), ((2,), (1,))),
            preferred_element_type=jnp.float32)           # (nF, S, N)
        Gt = jnp.transpose(G, (2, 1, 0, 3)).reshape(nF, S, J * P)
        Gt = jnp.pad(Gt, [(0, 0), (0, 0), (0, JP_pad - J * P)])
        stat_tiled = jnp.einsum("fsk,fkn->fsn", Gt, coefT)
        np.testing.assert_allclose(np.asarray(stat_core),
                                   np.asarray(stat_tiled), atol=1e-4)


class TestShardedPallas:
    def test_sharded_pallas_matches_sharded_xla(self):
        # the fused kernel inside shard_map (interpret mode over all 8
        # virtual CPU devices) must reproduce the XLA per-device core
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec
        from mba_tpu.ops.cohort_null import _make_sharded_chunk
        from mba_tpu.ops.pallas_null import prepare_null_coeffs

        J, nF, N, K, S = 3, 4, 512, 3, 8
        coef, base, obs, P = _toy(J, nF, N, K, seed=6)
        n_dev = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()), ("surr",))
        rep = NamedSharding(mesh, Pspec())
        key_shard = NamedSharding(mesh, Pspec("surr"))
        keys = jax.device_put(
            jax.random.split(jax.random.PRNGKey(11), n_dev), key_shard)
        counts0 = jax.device_put(jnp.zeros((nF, N), jnp.int32), rep)

        step_x, _, _ = _make_sharded_chunk(mesh, S, K, jnp.float32)
        ms_x, c_x = step_x(keys, jax.device_put(coef, rep),
                           jax.device_put(base, rep),
                           jax.device_put(obs, rep), counts0)

        coefT = prepare_null_coeffs(coef, jnp.float32)
        step_p, _, _ = _make_sharded_chunk(
            mesh, S, K, jnp.float32, pallas=True, J=J, P_feats=P,
            pallas_interpret=True)
        ms_p, c_p = step_p(keys, jax.device_put(coefT, rep),
                           jax.device_put(base, rep),
                           jax.device_put(obs, rep), counts0)

        np.testing.assert_allclose(np.asarray(ms_x), np.asarray(ms_p),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(c_x), np.asarray(c_p))

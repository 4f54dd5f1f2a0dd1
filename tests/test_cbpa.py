"""Cluster-permutation engine + CBPA pipeline tests."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse

from mba_tpu.ops.permutation import (cluster_permutation_1samp_test,
                                     delaunay_channel_adjacency,
                                     combine_adjacency,
                                     add_phase_wraparound)
from mba_tpu.pipeline.cbpa import (CBPAConfig, run_cbpa, run_batch,
                                   CMC_EEG_CHANNEL_SUBSET)


def _contrast_with_cluster(n_subj=14, n_times=20, n_ch=8, amp=1.2,
                           seed=0):
    """Subject contrasts with a genuine effect in a contiguous block."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_subj, n_times, n_ch))
    X[:, 5:12, 2:5] += amp        # real cluster: times 5-11, channels 2-4
    return X


class TestAdjacency:
    def test_delaunay_properties(self):
        adj = delaunay_channel_adjacency(CMC_EEG_CHANNEL_SUBSET)
        assert adj.shape == (11, 11)
        assert (adj != adj.T).nnz == 0          # symmetric
        assert adj.diagonal().sum() == 0        # no self loops
        assert adj.nnz > 0
        # C3's neighbors include adjacent motor channels
        i_c3 = CMC_EEG_CHANNEL_SUBSET.index("C3")
        neigh = set(np.nonzero(adj[i_c3].toarray()[0])[0])
        assert len(neigh) >= 2

    def test_combine_adjacency_lattice(self):
        spatial = scipy.sparse.csr_matrix(
            np.array([[0, 1], [1, 0]], bool))
        combined = combine_adjacency(3, spatial)
        assert combined.shape == (6, 6)
        dense = combined.toarray()
        # node (t=0, ch=0)=0 connects to (t=1, ch=0)=2 and (t=0, ch=1)=1
        assert dense[0, 2] and dense[0, 1]
        assert not dense[0, 3]  # no diagonal space-time hops
        assert not dense[0, 4]  # no 2-step temporal hops

    def test_phase_wraparound(self):
        spatial = scipy.sparse.csr_matrix((2, 2), dtype=bool)
        combined = combine_adjacency(4, spatial)
        wrapped = add_phase_wraparound(combined, 4, 2)
        dense = wrapped.toarray()
        assert dense[0, 6] and dense[1, 7]   # first bin ↔ last bin per ch


class TestClusterPermutation:
    def test_detects_real_cluster(self):
        X = _contrast_with_cluster()
        adj = combine_adjacency(
            20, scipy.sparse.csr_matrix(np.eye(8, k=1, dtype=bool)
                                        + np.eye(8, k=-1, dtype=bool)))
        t_obs, clusters, pv, H0 = cluster_permutation_1samp_test(
            X, adj, n_permutations=512, tail=0, seed=1)
        assert t_obs.shape == (20, 8)
        assert len(clusters) > 0
        best = int(np.argmin(pv))
        assert pv[best] < 0.01
        mask = clusters[best]
        # detected cluster overlaps the planted block
        planted = np.zeros((20, 8), bool)
        planted[5:12, 2:5] = True
        overlap = (mask & planted).sum() / planted.sum()
        assert overlap > 0.7
        assert len(H0) == 513   # observed stat included

    def test_null_data_no_significant_clusters(self):
        rng = np.random.default_rng(3)
        X = rng.standard_normal((12, 15, 6))
        adj = combine_adjacency(
            15, scipy.sparse.csr_matrix(np.eye(6, k=1, dtype=bool)
                                        + np.eye(6, k=-1, dtype=bool)))
        _, clusters, pv, _ = cluster_permutation_1samp_test(
            X, adj, n_permutations=256, tail=0, seed=2)
        if len(pv):
            assert pv.min() > 0.05

    def test_one_tailed(self):
        X = _contrast_with_cluster(amp=1.5)
        adj = combine_adjacency(
            20, scipy.sparse.csr_matrix(np.eye(8, k=1, dtype=bool)
                                        + np.eye(8, k=-1, dtype=bool)))
        _, clusters, pv, _ = cluster_permutation_1samp_test(
            X, adj, n_permutations=256, tail=1, seed=4)
        assert pv.min() < 0.05
        # negative-tail finds nothing for a positive effect
        _, neg_clusters, neg_pv, _ = cluster_permutation_1samp_test(
            X, adj, n_permutations=256, tail=-1, seed=4)
        assert len(neg_clusters) == 0 or neg_pv.min() > 0.05

    def test_shape_validation(self):
        X = np.zeros((5, 4, 3))
        bad_adj = scipy.sparse.csr_matrix((5, 5), dtype=bool)
        with pytest.raises(ValueError, match="adjacency shape"):
            cluster_permutation_1samp_test(X, bad_adj)


class TestRunCbpa:
    def _cfg(self, tmp_path, **kw):
        defaults = dict(modality="CMC", freq_band="beta",
                        channels=None, n_permutations=128,
                        tail=0, output_dir=tmp_path, save_plots=False,
                        hypothesis_label="unit_test_run",
                        data_root=tmp_path)
        defaults.update(kw)
        return CBPAConfig(**defaults)

    def test_run_cbpa_with_direct_contrast(self, tmp_path):
        X = _contrast_with_cluster(n_ch=11)
        cfg = self._cfg(tmp_path)
        time_grid = np.arange(20) * 1.0
        res = run_cbpa(cfg, X=X, ch_names=CMC_EEG_CHANNEL_SUBSET,
                       time_grid=time_grid)
        assert res["t_obs"].shape == (20, 11)
        assert len(res["good_cluster_inds"]) >= 1
        # artifacts written
        assert list(tmp_path.glob("*unit_test_run.npz"))
        assert list(tmp_path.glob("*unit_test_run_t_obs.csv"))
        assert list(tmp_path.glob("*unit_test_run_cluster_summary.csv"))
        summary = pd.read_csv(
            next(tmp_path.glob("*unit_test_run_cluster_summary.csv")))
        assert summary["significant"].any()
        assert (summary["n_valid_subjects"] == 14).all()

    def test_phase_wraparound_mode(self, tmp_path):
        rng = np.random.default_rng(5)
        X = rng.standard_normal((12, 36, 11)) * 0.5
        # effect spanning the phase wrap (last 4 + first 4 bins)
        X[:, -4:, 3:6] += 1.5
        X[:, :4, 3:6] += 1.5
        cfg = self._cfg(tmp_path, use_phase_normalization=True,
                        n_phase_bins=36,
                        hypothesis_label="phase_run")
        res = run_cbpa(cfg, X=X, ch_names=CMC_EEG_CHANNEL_SUBSET,
                       time_grid=np.linspace(0, 360, 36, endpoint=False))
        # the wrapped effect must form ONE significant cluster
        sig = res["good_cluster_inds"]
        assert len(sig) >= 1
        best = res["clusters"][int(sig[0])]
        t_in = np.where(best.any(axis=1))[0]
        assert 0 in t_in and 35 in t_in  # spans the wrap boundary
        summary = pd.read_csv(
            next(tmp_path.glob("*phase_run_cluster_summary.csv")))
        assert "phase_deg_start" in summary.columns

    def test_run_batch_combined_summary(self, tmp_path):
        X = _contrast_with_cluster(n_ch=11)
        cfgs = [self._cfg(tmp_path, hypothesis_label=f"run_{i}",
                          n_permutations=64) for i in range(2)]
        # run via direct X injection through run_cbpa inside batch loop
        rows = []
        for cfg in cfgs:
            run_cbpa(cfg, cluster_rows_accumulator=rows, X=X,
                     ch_names=CMC_EEG_CHANNEL_SUBSET,
                     time_grid=np.arange(20) * 1.0)
        combined = pd.DataFrame(rows)
        assert set(combined["hypothesis"]) == {"run_0", "run_1"}


class TestLabelPropagation:
    """The device cluster search (pointer-jumping label propagation)
    must match scipy connected components exactly — including on a path
    graph, the worst case for propagation depth."""

    def _device_max_mass(self, tvals, edges, n_nodes, threshold):
        import jax
        from mba_tpu.ops.permutation import (_max_cluster_mass,
                                             _neighbor_table)
        tab = _neighbor_table(np.asarray(edges, np.int32), n_nodes)
        return float(jax.jit(
            lambda t: _max_cluster_mass(t, tab, threshold, 1, n_nodes)
        )(tvals.astype(np.float32)))

    def _scipy_max_mass(self, tvals, edges, n_nodes, threshold):
        import scipy.sparse
        from scipy.sparse.csgraph import connected_components
        supra = tvals > threshold
        idx = np.flatnonzero(supra)
        if len(idx) == 0:
            return 0.0
        adj = scipy.sparse.coo_matrix(
            (np.ones(len(edges)), (edges[:, 0], edges[:, 1])),
            shape=(n_nodes, n_nodes))
        adj = adj + adj.T
        sub = adj.tocsr()[idx][:, idx]
        n_comp, labels = connected_components(sub, directed=False)
        return max(abs(tvals[idx[labels == c]].sum())
                   for c in range(n_comp))

    def test_path_graph_single_cluster(self):
        # all 440 nodes supra on a chain: one cluster spanning the graph
        n = 440
        edges = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
        tvals = np.ones(n) * 2.5
        dev = self._device_max_mass(tvals, edges, n, 2.0)
        assert dev == pytest.approx(n * 2.5, rel=1e-6)

    def test_random_masks_match_scipy(self):
        rng = np.random.default_rng(0)
        n = 200
        # random sparse graph + a chain to create long components
        chain = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
        extra = rng.integers(0, n, size=(80, 2))
        edges = np.concatenate([chain, extra])
        edges = edges[edges[:, 0] != edges[:, 1]]
        for trial in range(5):
            tvals = rng.standard_normal(n) * 2.0
            dev = self._device_max_mass(tvals, edges, n, 1.5)
            ref = self._scipy_max_mass(tvals, edges, n, 1.5)
            assert dev == pytest.approx(ref, rel=1e-5), trial

"""Loop-closing building blocks: Sim3 RANSAC, pose-graph optimization,
retrieval signatures."""

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.geometry.sim3 import sim3_compose, sim3_inverse
from send_slam_tpu.models.pose_graph import (
    PoseGraphEdges, build_sequential_edges, concat_edges,
    optimize_pose_graph,
)
from send_slam_tpu.models.retrieval import frame_signature, retrieval_scores
from send_slam_tpu.models.sim3_solver import sim3_ransac, umeyama_sim3

RNG = np.random.default_rng(9)


class TestSim3Ransac:
    def test_recovers_known_sim3_with_outliers(self):
        from scipy.spatial.transform import Rotation
        n = 120
        src = RNG.normal(size=(n, 3)).astype(np.float32) * 2.0
        R = Rotation.from_rotvec([0.2, -0.3, 0.1]).as_matrix()
        s, t = 1.35, np.array([0.5, -1.0, 2.0])
        dst = (s * src @ R.T + t).astype(np.float32)
        dst += RNG.normal(0, 0.005, dst.shape)
        dst[:30] += RNG.uniform(1, 3, (30, 3))          # 25% outliers
        res = sim3_ransac(jnp.asarray(src), jnp.asarray(dst),
                          jnp.ones(n, bool), jax.random.PRNGKey(0))
        assert bool(res.ok)
        assert abs(float(res.s) - s) < 0.02
        np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)
        assert int(res.n_inliers) >= 80
        assert np.asarray(res.inlier)[:30].sum() < 5

    def test_umeyama_weighted_ignores_masked(self):
        src = RNG.normal(size=(50, 3))
        dst = 2.0 * src + 1.0
        src_bad = src.copy()
        src_bad[40:] = 999.0
        w = np.ones(50)
        w[40:] = 0.0
        s, R, t = umeyama_sim3(jnp.asarray(src_bad, jnp.float32),
                               jnp.asarray(dst, jnp.float32),
                               jnp.asarray(w, jnp.float32))
        assert abs(float(s) - 2.0) < 1e-3


class TestPoseGraph:
    def _chain(self, n=8, drift=0.0):
        """Poses T_iw along +x; optional accumulated drift."""
        Rs, ts = [], []
        for i in range(n):
            Rs.append(np.eye(3, dtype=np.float32))
            x = i * 1.0 + drift * i * i / n
            ts.append(np.array([-x, 0, 0], np.float32))  # T_iw: t = -R c
        return np.stack(Rs), np.stack(ts)

    def test_noop_when_consistent(self):
        MK = 8
        Rs, ts = self._chain(MK)
        valid = jnp.ones(MK, bool)
        edges = build_sequential_edges(
            jnp.asarray(Rs), jnp.asarray(ts), valid, jnp.asarray(MK))
        s, R, t = optimize_pose_graph(
            jnp.asarray(Rs), jnp.asarray(ts), valid, edges, iters=5)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), ts, atol=1e-3)

    def test_loop_edge_corrects_drift(self):
        # Ground truth: a loop where KF7 coincides with KF0, but the
        # estimated chain drifted (KF7 translated 1.0 away from truth).
        MK = 8
        Rs, ts = self._chain(MK)
        ts_drift = ts.copy()
        for i in range(MK):
            ts_drift[i, 0] -= 0.15 * i      # accumulated drift in x
        valid = jnp.ones(MK, bool)
        edges_seq = build_sequential_edges(
            jnp.asarray(Rs), jnp.asarray(ts_drift), valid, jnp.asarray(MK))
        # Loop edge: measured TRUE relative pose between KF0 and KF7.
        R7 = jnp.eye(3)
        # S_ji with i=7, j=0: T_0 ∘ T_7^-1 (true poses).
        t_ji = jnp.asarray(ts[0] - ts[7])
        loop = PoseGraphEdges(
            i=jnp.asarray([7], jnp.int32), j=jnp.asarray([0], jnp.int32),
            s=jnp.ones(1), R=R7[None], t=t_ji[None],
            valid=jnp.asarray([True]), weight=jnp.asarray([5.0]))
        edges = concat_edges(edges_seq, loop)
        s, R, t = optimize_pose_graph(
            jnp.asarray(Rs), jnp.asarray(ts_drift), valid, edges, iters=25)
        # End of chain must be pulled (mostly) back to the truth.
        drift_before = abs(ts_drift[7, 0] - ts[7, 0])
        drift_after = abs(float(t[7, 0] / s[7]) - ts[7, 0])
        assert drift_after < 0.35 * drift_before, (drift_before, drift_after)


class TestRetrieval:
    def test_same_frame_high_score(self):
        d1 = RNG.integers(0, 2**32, (200, 8), dtype=np.uint32)
        d2 = RNG.integers(0, 2**32, (200, 8), dtype=np.uint32)
        v = jnp.ones(200, bool)
        s1 = frame_signature(jnp.asarray(d1), v)
        s1b = frame_signature(jnp.asarray(d1), v)
        s2 = frame_signature(jnp.asarray(d2), v)
        sigs = jnp.stack([s1, s2])
        scores = np.asarray(retrieval_scores(sigs, s1b))
        assert scores[0] > 0.999
        assert scores[0] > scores[1] + 0.3

    def test_overlapping_sets_score_between(self):
        base = RNG.integers(0, 2**32, (200, 8), dtype=np.uint32)
        half = base.copy()
        half[:100] = RNG.integers(0, 2**32, (100, 8), dtype=np.uint32)
        v = jnp.ones(200, bool)
        s_base = frame_signature(jnp.asarray(base), v)
        s_half = frame_signature(jnp.asarray(half), v)
        score = float(s_base @ s_half)
        assert 0.2 < score < 0.9, score

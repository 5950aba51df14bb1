"""ops/icp.py: dense projective point-to-plane polish (docs/TRANSLATION.md)."""

import jax.numpy as jnp
import numpy as np

from relativepose_tpu.core.rotation import angular_distance
from relativepose_tpu.data import synthetic
from relativepose_tpu.ops import icp


def rot_err(T1, T2):
    return float(angular_distance(jnp.asarray(np.asarray(T1)[:3, :3]),
                                  jnp.asarray(np.asarray(T2)[:3, :3])))


def trans_err(T1, T2):
    return float(np.linalg.norm(np.asarray(T1)[:3, 3]
                                - np.asarray(T2)[:3, 3]))


def perturb(T_gt, rng, rot_deg, trans_m):
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    th = np.deg2rad(rot_deg)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                  [-ax[1], ax[0], 0]])
    Rd = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    dt = rng.randn(3)
    dt *= trans_m / np.linalg.norm(dt)
    T = np.array(T_gt, dtype=np.float64).copy()
    T[:3, :3] = Rd @ T[:3, :3]
    T[:3, 3] = Rd @ T[:3, 3] + dt
    return T


class TestProjectToPano:
    def test_lift_project_roundtrip(self):
        """Projecting each pixel's own lifted point must return that
        pixel's flat index (the gather dual of splat_to_pano)."""
        ds, _, _ = synthetic.make_pair(7, "suncg")
        depth = jnp.asarray(ds["depth"])
        pts, valid = icp.pano_points_image(depth, "suncg")
        flat, ok = icp.project_to_pano(
            pts.reshape(-1, 3), valid.reshape(-1), "suncg")
        flat, ok = np.asarray(flat), np.asarray(ok)
        own = np.arange(160 * 640)
        # first row/column of each face sits exactly on the |x|=1 / |y|=1
        # face boundary and fails the strict perspective test: 1.25%
        assert ok.mean() > 0.98
        assert (flat[ok] == own[ok]).all()


class TestIcpPolish:
    def test_recovers_perturbed_pose_6dof(self):
        ds, dt, T_gt = synthetic.make_pair(11, "suncg", max_baseline=0.3)
        rng = np.random.RandomState(0)
        T0 = perturb(T_gt, rng, rot_deg=1.5, trans_m=0.15)
        T1 = np.asarray(icp.icp_polish(
            jnp.asarray(T0.astype(np.float32)),
            jnp.asarray(ds["depth"]), jnp.asarray(ds["norm"]),
            jnp.asarray(dt["depth"]), jnp.asarray(dt["norm"]),
            "suncg", iters=10))
        assert rot_err(T1, T_gt) < 0.5 * rot_err(T0, T_gt)
        assert trans_err(T1, T_gt) < 0.5 * trans_err(T0, T_gt)
        assert trans_err(T1, T_gt) < 0.05

    def test_trans_only_polish_keeps_rotation(self):
        ds, dt, T_gt = synthetic.make_pair(13, "suncg", max_baseline=0.3)
        rng = np.random.RandomState(1)
        T0 = perturb(T_gt, rng, rot_deg=0.0, trans_m=0.2)
        T1 = np.asarray(icp.icp_polish(
            jnp.asarray(T0.astype(np.float32)),
            jnp.asarray(ds["depth"]), jnp.asarray(ds["norm"]),
            jnp.asarray(dt["depth"]), jnp.asarray(dt["norm"]),
            "suncg", iters=10, dof=3))
        assert rot_err(T1, T0) < 1e-4
        assert trans_err(T1, T_gt) < 0.5 * trans_err(T0, T_gt)

    def test_guard_leaves_pose_on_garbage(self):
        """With all-invalid target geometry the support-set guard must
        leave the input pose bit-unchanged (no NaN, no drift)."""
        ds, dt, T_gt = synthetic.make_pair(17, "suncg", max_baseline=0.3)
        T0 = jnp.asarray(np.asarray(T_gt, dtype=np.float32))
        zero_d = jnp.zeros_like(jnp.asarray(dt["depth"]))
        zero_n = jnp.zeros_like(jnp.asarray(dt["norm"]))
        T1 = icp.icp_polish(
            T0, jnp.asarray(ds["depth"]), jnp.asarray(ds["norm"]),
            zero_d, zero_n, "suncg", iters=5)
        np.testing.assert_array_equal(np.asarray(T1), np.asarray(T0))

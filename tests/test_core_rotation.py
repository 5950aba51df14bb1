import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from relativepose_tpu.core import quaternion as Q
from relativepose_tpu.core import rotation as rot
from relativepose_tpu.ops.eig4x4 import eigh4x4, max_eigvec4x4


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=rng).as_matrix().astype(np.float32)


class TestQuaternion:
    def test_qmul_matches_rotation_composition(self, rng):
        Ra = random_rotations(rng, 16)
        Rb = random_rotations(rng, 16)
        qa = Q.rot_to_quaternion(jnp.asarray(Ra))
        qb = Q.rot_to_quaternion(jnp.asarray(Rb))
        Rab = Q.quaternion_to_rot(Q.qmul(qa, qb))
        np.testing.assert_allclose(np.asarray(Rab), Ra @ Rb, atol=1e-5)

    def test_rot_quaternion_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        q = Q.rot_to_quaternion(jnp.asarray(R))
        R2 = Q.quaternion_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
        # w >= 0 canonicalization
        assert np.all(np.asarray(q)[:, 0] >= 0)

    def test_qrot_matches_matrix(self, rng):
        R = random_rotations(rng, 8)
        v = rng.randn(8, 3).astype(np.float32)
        q = Q.rot_to_quaternion(jnp.asarray(R))
        out = Q.qrot(q, jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(out), np.einsum("nij,nj->ni", R, v), atol=1e-5
        )

    def test_qconj_inverts(self, rng):
        R = random_rotations(rng, 8)
        q = Q.rot_to_quaternion(jnp.asarray(R))
        ident = Q.qmul(q, Q.qconj(q))
        np.testing.assert_allclose(
            np.asarray(ident), np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5
        )

    def test_expmap(self, rng):
        e = rng.randn(32, 3).astype(np.float32)
        q = Q.expmap_to_quaternion(jnp.asarray(e))
        R_scipy = ScipyRot.from_rotvec(e).as_matrix()
        np.testing.assert_allclose(
            np.asarray(Q.quaternion_to_rot(q)), R_scipy, atol=1e-5
        )

    def test_euler_roundtrip(self, rng):
        e = (rng.rand(16, 3).astype(np.float32) - 0.5) * 2.0
        q = Q.euler_to_quaternion(jnp.asarray(e), "zyx")
        e2 = Q.qeuler(q, "zyx")
        q2 = Q.euler_to_quaternion(e2, "zyx")
        # angles may alias; rotations must agree
        np.testing.assert_allclose(
            np.asarray(Q.quaternion_to_rot(q)),
            np.asarray(Q.quaternion_to_rot(q2)),
            atol=1e-5,
        )

    def test_qfix_continuity(self, rng):
        R = random_rotations(rng, 10)
        q = np.array(Q.rot_to_quaternion(jnp.asarray(R)))
        q[::2] *= -1
        fixed = np.asarray(Q.qfix(jnp.asarray(q)))
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert np.all(dots >= 0)


class TestElementaryRotations:
    def test_rx_ry_rz(self):
        th = 0.3
        np.testing.assert_allclose(
            np.asarray(rot.rx(th)),
            ScipyRot.from_euler("x", th).as_matrix(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rot.ry(th)),
            ScipyRot.from_euler("y", th).as_matrix(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rot.rz(th)),
            ScipyRot.from_euler("z", th).as_matrix(), atol=1e-6)

    def test_angular_distance(self, rng):
        R = random_rotations(rng, 8)
        d0 = rot.angular_distance(jnp.asarray(R), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-2)
        Rz90 = ScipyRot.from_euler("z", 90, degrees=True).as_matrix()
        d = rot.angular_distance(
            jnp.asarray((R @ Rz90).astype(np.float32)), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(d), 90.0, atol=1e-2)

    def test_random_rotation_magnitude(self):
        key = jax.random.PRNGKey(0)
        R = rot.random_rotation(key, 0.1, (256,))
        d = np.asarray(rot.angular_distance(
            R, jnp.broadcast_to(jnp.eye(3), (256, 3, 3))))
        # |N(0,1)| * pi * 0.1 rad -> mean ~ 14.4 deg
        assert 5.0 < d.mean() < 25.0

    def test_se3_inverse(self, rng):
        R = random_rotations(rng, 4)
        t = rng.randn(4, 3).astype(np.float32)
        T = rot.make_se3(jnp.asarray(R), jnp.asarray(t))
        TT = np.asarray(T @ rot.inverse_se3(T))
        np.testing.assert_allclose(TT, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


class TestEig4x4:
    def test_matches_numpy_eigh(self, rng):
        A = rng.randn(64, 4, 4).astype(np.float32)
        A = A + A.transpose(0, 2, 1)
        w, V = eigh4x4(jnp.asarray(A))
        w = np.asarray(w)
        V = np.asarray(V)
        # A V = V diag(w)
        res = np.einsum("bij,bjk->bik", A, V) - V * w[:, None, :]
        assert np.abs(res).max() < 1e-3
        w_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(w, -1), w_ref, atol=1e-3)

    def test_max_eigvec(self, rng):
        A = rng.randn(32, 4, 4).astype(np.float32)
        A = A + A.transpose(0, 2, 1)
        v = np.asarray(max_eigvec4x4(jnp.asarray(A)))
        w_ref, V_ref = np.linalg.eigh(A)
        v_ref = V_ref[:, :, -1]
        dots = np.abs(np.sum(v * v_ref, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)

    @pytest.mark.parametrize("scale", [1e-6, 1.0, 1e4])
    def test_scale_invariance(self, rng, scale):
        A = rng.randn(8, 4, 4).astype(np.float32) * scale
        A = A + A.transpose(0, 2, 1)
        v = np.asarray(max_eigvec4x4(jnp.asarray(A)))
        w_ref, V_ref = np.linalg.eigh(A)
        dots = np.abs(np.sum(v * V_ref[:, :, -1], axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)

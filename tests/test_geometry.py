import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import camera, se3, sim3, triangulation


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(se3.from_quaternion(jnp.asarray(q, jnp.float32)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 6)) * 1.5, jnp.float32)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        T2 = se3.exp(xi2)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-5)

    def test_exp_small_angle(self):
        xi = jnp.asarray([[1e-9, 0, 0, 0.5, -0.25, 1.0]], jnp.float32)
        T = se3.exp(xi)
        np.testing.assert_allclose(
            np.asarray(se3.translation(T))[0], [0.5, -0.25, 1.0], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(se3.rotation(T))[0], np.eye(3), atol=1e-6
        )

    def test_inverse_compose(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)), jnp.float32)
        T = se3.exp(xi)
        eye = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(
            np.asarray(eye), np.broadcast_to(np.eye(4), (32, 4, 4)), atol=1e-5
        )

    def test_log_near_pi(self, rng):
        # rotations with angle near pi around random axes
        axes = rng.normal(size=(16, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        angle = np.pi - 1e-5
        w = jnp.asarray(axes * angle, jnp.float32)
        R = se3.exp_so3(w)
        w2 = se3.log_so3(R)
        R2 = se3.exp_so3(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_quaternion_roundtrip(self, rng):
        R = random_rotations(rng, 50)
        q = se3.to_quaternion(jnp.asarray(R))
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(R, np.asarray(R2), atol=1e-5)

    def test_transform_matches_matmul(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        T = se3.exp(xi)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        got = se3.transform(T, p)
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        want = jnp.einsum("nij,nj->ni", T, ph)[:, :3]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [rng.normal(size=(32, 6)), rng.normal(size=(32, 1)) * 0.3], axis=-1
        )
        xi = jnp.asarray(xi, jnp.float32)
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        S2 = sim3.exp(xi2)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S2.R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S2.t), atol=1e-3)
        np.testing.assert_allclose(np.asarray(S.s), np.asarray(S2.s), atol=1e-4)

    def test_scale_one_matches_se3(self, rng):
        xi6 = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
        S = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(se3.rotation(T)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(se3.translation(T)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(
            np.concatenate([rng.normal(size=(8, 6)), rng.normal(size=(8, 1)) * 0.2], -1),
            jnp.float32,
        )
        S = sim3.exp(xi)
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)

    def test_apply(self, rng):
        S = sim3.Sim3(
            R=jnp.asarray(random_rotations(rng, 1)[0]),
            t=jnp.asarray([1.0, 2.0, 3.0]),
            s=jnp.asarray(2.0),
        )
        p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        got = sim3.apply(S, p)
        want = 2.0 * (np.asarray(S.R) @ np.asarray(p).T).T + np.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestCamera:
    def _cam(self):
        return camera.make_camera(458.654, 457.296, 367.215, 248.375, bf=47.906)

    def test_project_unproject(self, rng):
        cam = self._cam()
        pts = rng.uniform(low=[-2, -2, 1], high=[2, 2, 20], size=(100, 3))
        pts = jnp.asarray(pts, jnp.float32)
        uvr = camera.project_stereo(cam, pts)
        depth = pts[:, 2]
        back = camera.unproject_stereo(cam, uvr[:, 0], uvr[:, 1], depth)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-4, atol=1e-3)

    def test_stereo_disparity_positive(self, rng):
        cam = self._cam()
        pts = jnp.asarray(rng.uniform(low=[-1, -1, 2], high=[1, 1, 30], size=(50, 3)), jnp.float32)
        uvr = camera.project_stereo(cam, pts)
        disp = uvr[:, 0] - uvr[:, 2]
        np.testing.assert_array_less(0.0, np.asarray(disp))

    def test_frustum(self, rng):
        cam = self._cam()
        Tcw = se3.identity()
        pw = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0], [100.0, 0.0, 5.0]], jnp.float32)
        normal = jnp.asarray([[0.0, 0.0, 1.0]] * 3, jnp.float32)
        visible, uv, ur, dist, vcos = camera.is_in_frustum(
            cam, Tcw, pw, normal, jnp.asarray(0.1), jnp.asarray(100.0)
        )
        assert np.asarray(visible).tolist() == [True, False, False]


class TestTriangulation:
    def test_triangulate_known_points(self, rng):
        # Two cameras looking at points; verify recovery.
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.0, 0.05, 0.0, -0.3, 0.0, 0.02], jnp.float32))
        pts = jnp.asarray(rng.uniform(low=[-1, -1, 4], high=[1, 1, 15], size=(200, 3)), jnp.float32)

        def normalized(T, p):
            pc = se3.transform(T, p)
            return pc[..., :2] / pc[..., 2:3]

        xn1 = normalized(T1, pts)
        xn2 = normalized(T2, pts)
        P1 = jnp.broadcast_to(T1[:3, :], (200, 3, 4))
        P2 = jnp.broadcast_to(T2[:3, :], (200, 3, 4))
        X, ok = triangulation.triangulate_dlt(P1, P2, xn1, xn2)
        assert bool(np.all(np.asarray(ok)))
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), rtol=1e-3, atol=2e-3)

    def test_parallax(self):
        O1 = jnp.asarray([0.0, 0.0, 0.0])
        O2 = jnp.asarray([1.0, 0.0, 0.0])
        X = jnp.asarray([0.5, 0.0, 10.0])
        c = triangulation.rays_parallax_cos(O1, O2, X)
        assert 0.99 < float(c) < 1.0

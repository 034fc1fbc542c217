import jax.numpy as jnp
import numpy as np

from icp_tpu import geometry
from icp_tpu.geometry import RigidTransform


def random_transform(rng, dim, batch=()):
    if dim == 2:
        angle = rng.uniform(-np.pi, np.pi, size=batch)
        t = rng.normal(size=(*batch, 2))
        return geometry.from_angle_2d(jnp.asarray(angle), jnp.asarray(t))
    # random 3D rotation via QR
    m = rng.normal(size=(*batch, 3, 3))
    q, r = np.linalg.qr(m)
    q = q * np.sign(np.diagonal(r, axis1=-2, axis2=-1))[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[..., None]
    t = rng.normal(size=(*batch, 3))
    return RigidTransform(jnp.asarray(q), jnp.asarray(t))


def test_compose_matches_homogeneous(rng):
    for dim in (2, 3):
        t1 = random_transform(rng, dim)
        t2 = random_transform(rng, dim)
        composed = geometry.compose(t1, t2)
        h1 = np.eye(dim + 1)
        h1[:dim, :dim] = t1.rotation
        h1[:dim, dim] = t1.translation
        h2 = np.eye(dim + 1)
        h2[:dim, :dim] = t2.rotation
        h2[:dim, dim] = t2.translation
        h = h1 @ h2
        np.testing.assert_allclose(composed.rotation, h[:dim, :dim], atol=1e-12)
        np.testing.assert_allclose(composed.translation, h[:dim, dim], atol=1e-12)


def test_apply_and_inverse(rng):
    for dim in (2, 3):
        t = random_transform(rng, dim)
        pts = jnp.asarray(rng.normal(size=(7, dim)))
        out = geometry.apply(t, pts)
        back = geometry.apply(geometry.inverse(t), out)
        np.testing.assert_allclose(back, pts, atol=1e-10)
        ident = geometry.compose(t, geometry.inverse(t))
        np.testing.assert_allclose(ident.rotation, np.eye(dim), atol=1e-12)
        np.testing.assert_allclose(ident.translation, 0, atol=1e-12)


def test_rotation_angle_2d():
    for angle in [-3.0, -0.5, 0.0, 0.7, 3.1]:
        t = geometry.from_angle_2d(jnp.asarray(angle))
        np.testing.assert_allclose(geometry.rotation_angle_2d(t.rotation), angle, atol=1e-12)


def test_rotation_angle_3d(rng):
    # axis-angle magnitude recovered
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    for angle in [0.0, 0.3, 1.5, 3.0]:
        k = np.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
        np.testing.assert_allclose(
            geometry.rotation_angle_3d(jnp.asarray(r)), angle, atol=1e-9
        )


def test_masked_centroid():
    pts = jnp.asarray([[1.0, 0.0], [3.0, 0.0], [99.0, 99.0]])
    mask = jnp.asarray([True, True, False])
    np.testing.assert_allclose(geometry.masked_centroid(pts, mask), [2.0, 0.0])


def test_batched_transforms(rng):
    t = random_transform(rng, 2, batch=(5,))
    pts = jnp.asarray(rng.normal(size=(5, 11, 2)))
    out = geometry.apply(t, pts)
    for i in range(5):
        expected = np.asarray(pts[i]) @ np.asarray(t.rotation[i]).T + np.asarray(
            t.translation[i]
        )
        np.testing.assert_allclose(out[i], expected, atol=1e-12)


def test_bucket_capacity_series():
    from icp_tpu.cloud import bucket_capacity

    assert bucket_capacity(0) == 64
    assert bucket_capacity(1) == 64
    assert bucket_capacity(64) == 64
    assert bucket_capacity(65) == 128
    assert bucket_capacity(562) == 1024
    assert bucket_capacity(953) == 1024
    assert bucket_capacity(1024) == 1024
    assert bucket_capacity(1025) == 2048


def test_from_points_bucket_capacity(rng):
    import icp_tpu as icp

    cloud = icp.from_points(rng.normal(size=(700, 2)), capacity="bucket")
    assert cloud.capacity == 1024
    assert int(cloud.count) == 700


def test_capacity_invariance(rng):
    """Padding capacity must not change registration results (the masking
    contract behind capacity bucketing): the same pair registered at tight
    vs bucketed capacity agrees to fp64 roundoff."""
    import icp_tpu as icp

    pts = rng.uniform(-10.0, 10.0, (300, 2))
    ang = 0.15
    rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    tgt = pts @ rot.T + np.array([0.4, -0.2])
    cfg = icp.DriverConfig(
        max_iterations=30, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    results = []
    for cap in (304, "bucket", 2048):
        src_c = icp.from_points(pts, capacity=cap, dtype=np.float64)
        tgt_c = icp.from_points(tgt, capacity=cap, dtype=np.float64)
        method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
        result, _ = icp.converge(
            method, src_c, tgt_c, icp.identity(2, dtype=np.float64), cfg
        )
        results.append(result)
    base = results[0]
    for other in results[1:]:
        assert int(other.iteration_count) == int(base.iteration_count)
        np.testing.assert_allclose(
            np.asarray(other.transform.translation),
            np.asarray(base.transform.translation),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(other.transform.rotation),
            np.asarray(base.transform.rotation),
            atol=1e-9,
        )

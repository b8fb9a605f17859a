"""Closed-form symmetric 3x3 eigensolver vs numpy oracle."""
import numpy as np
import jax.numpy as jnp

from planarslam_tpu.ops.eig3 import eigh_sym3x3


def _check(A, atol_val=1e-4, atol_vec=1e-3):
    evals, evecs = eigh_sym3x3(jnp.asarray(A))
    evals = np.asarray(evals)
    evecs = np.asarray(evecs)
    ref_vals, ref_vecs = np.linalg.eigh(A)
    scale = np.maximum(np.abs(ref_vals).max(axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(evals / scale, ref_vals / scale, atol=atol_val)
    # eigenvector check: A v = lambda v (sign-free) + orthonormal columns
    Av = np.einsum("...ij,...jk->...ik", A, evecs)
    lv = evals[..., None, :] * evecs
    err = np.abs(Av - lv).max(axis=(-2, -1)) / scale[..., 0]
    assert err.max() < atol_vec, err.max()
    VtV = np.einsum("...ji,...jk->...ik", evecs, evecs)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                               atol=1e-3)


def test_random_batch():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(512, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1)
    _check(A)


def test_scaled_matrices():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(64, 3, 3)).astype(np.float32)
    for s in (1e-6, 1e3):
        A = (B @ B.transpose(0, 2, 1)) * s
        _check(A)


def test_near_degenerate():
    rng = np.random.default_rng(2)
    # plane-like scatter: two large eigenvalues, one tiny (the plane-fit case)
    out = []
    for _ in range(64):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        d = np.diag([1e-6 * rng.uniform(0.5, 2), rng.uniform(0.9, 1.1),
                     rng.uniform(0.9, 1.1)])
        out.append(q @ d @ q.T)
    A = np.asarray(out, np.float32)
    evals, evecs = eigh_sym3x3(jnp.asarray(A))
    evals = np.asarray(evals)
    evecs = np.asarray(evecs)
    ref_vals, _ = np.linalg.eigh(A)
    np.testing.assert_allclose(evals, ref_vals, atol=1e-3)
    # the well-separated smallest eigenvector (plane normal) must match
    Av = np.einsum("bij,bj->bi", A, evecs[..., 0])
    res = np.abs(Av - evals[:, :1] * evecs[..., 0]).max()
    assert res < 1e-3


def test_diagonal_and_isotropic():
    A = np.stack([np.diag([3.0, 1.0, 2.0]).astype(np.float32),
                  np.eye(3, dtype=np.float32) * 2.0,
                  np.zeros((3, 3), np.float32)])
    evals, evecs = eigh_sym3x3(jnp.asarray(A))
    evals = np.asarray(evals)
    np.testing.assert_allclose(evals[0], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(evals[1], [2.0, 2.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(evals[2], [0.0, 0.0, 0.0], atol=1e-7)
    # columns orthonormal even in the fully degenerate cases
    for i in range(3):
        VtV = np.asarray(evecs[i]).T @ np.asarray(evecs[i])
        np.testing.assert_allclose(VtV, np.eye(3), atol=1e-4)

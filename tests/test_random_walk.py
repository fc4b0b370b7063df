"""The CG-based on-device random walk must solve the same linear system the
reference builds (utils/random_walk.py, seg_refinement.py:175-203), checked
against a dense numpy solve of the reduced system."""

import numpy as np

from samcarriestheburden_tpu.ops.random_walk import (
    apply_laplacian, edge_weights, random_walk, random_walk_probs)


def _dense_laplacian(img, sigma=10.0, lam=1.0, eps=1e-5):
    h, w = img.shape
    n = h * w
    A = np.zeros((n, n))
    idx = np.arange(n).reshape(h, w)
    wgt = lambda a, b: np.exp(-((img.flat[a] - img.flat[b]) ** 2) / sigma ** 2)
    for y in range(h):
        for x in range(w):
            if x + 1 < w:
                i, j = idx[y, x], idx[y, x + 1]
                A[i, j] = A[j, i] = wgt(i, j)
            if y + 1 < h:
                i, j = idx[y, x], idx[y + 1, x]
                A[i, j] = A[j, i] = wgt(i, j)
    D = A.sum(0)
    return np.diag(eps + lam * D) - lam * A


def test_apply_laplacian_matches_dense(rng):
    img = rng.uniform(0, 255, (6, 5)).astype(np.float32)
    L = _dense_laplacian(img)
    x = rng.standard_normal((6, 5)).astype(np.float32)
    ours = np.asarray(apply_laplacian(x, *edge_weights(img, 10.0)))
    np.testing.assert_allclose(ours.reshape(-1), L @ x.reshape(-1), rtol=1e-4, atol=1e-4)


def test_random_walk_matches_dense_solve(rng):
    img = rng.uniform(0, 255, (10, 8)).astype(np.float32)
    seeds = np.zeros((2, 10, 8), np.float32)
    seeds[0, 0, :] = 1.0      # class 0 seeded along top row
    seeds[1, -1, :] = 1.0     # class 1 along bottom row
    probs = np.asarray(random_walk_probs(img, seeds, sigma=10.0, tol=1e-8,
                                         maxiter=2000))

    L = _dense_laplacian(img)
    seeded = seeds.any(0).reshape(-1)
    u_idx, s_idx = np.flatnonzero(~seeded), np.flatnonzero(seeded)
    L_u = L[np.ix_(u_idx, u_idx)]
    B = L[np.ix_(u_idx, s_idx)]
    for k in range(2):
        u_s = seeds[k].reshape(-1)[s_idx]
        u_u = np.linalg.solve(L_u, -B @ u_s)
        np.testing.assert_allclose(probs[k].reshape(-1)[u_idx], u_u,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(probs[k].reshape(-1)[s_idx], u_s)


def test_probabilities_sum_to_one(rng):
    """Random-walk probabilities over a full seed partition sum to ~1.
    (Needs a smooth image: with σ=10, uniform-noise gradients of ~100 grey
    levels give edge weights exp(-100) — a disconnected graph.)"""
    img = np.tile(np.linspace(0, 30, 12, dtype=np.float32)[:, None], (1, 12))
    img = img + rng.uniform(0, 2, (12, 12)).astype(np.float32)
    seeds = np.zeros((2, 12, 12), np.float32)
    seeds[0, :2, :] = 1.0
    seeds[1, -2:, :] = 1.0
    probs = np.asarray(random_walk_probs(img, seeds, tol=1e-6, maxiter=1000))
    interior = ~seeds.any(0).astype(bool)
    np.testing.assert_allclose(probs.sum(0)[interior], 1.0, atol=1e-2)


def test_reference_random_walk_wrapper(rng):
    img = rng.integers(0, 255, (32, 32)).astype(np.uint8)
    seg = np.zeros((2, 32, 32), bool)
    seg[0, 10:15, 10:15] = True
    seg[1, 20:25, 20:25] = True
    probs = np.asarray(random_walk(img, seg, background_erosion_radius=3))
    assert probs.shape == (2, 32, 32)
    # solver tolerance + the reference's 1e-5 diagonal regularisation allow
    # small overshoot beyond [0, 1] (pyamg tol=1e-3 behaves alike)
    assert probs.min() >= -1e-2 and probs.max() <= 1 + 1e-2
    assert probs[0, 12, 12] == 1.0  # seeded pixel keeps its label

"""Seeded random-walker segmentation, fully on device
(reference utils/random_walk.py + utils/seg_refinement.py:119-203).

The reference assembles a sparse graph Laplacian with exp(-ΔI²/σ²) edge
weights and solves the seeded/unseeded split with pyamg's Ruge-Stüben
algebraic multigrid on the *host* (random_walk.py:40-52).  A TPU has no sparse
AMG — but the Laplacian of an image grid is a 5-point stencil, so the system
is solved here with Jacobi-preconditioned conjugate gradients where every
iteration is a fused stencil application on the VPU, vmapped over classes.
pyamg solves to tol=1e-3; CG reaches the same residual in a few hundred cheap
iterations at 384×224 and stays entirely on device (no host round-trip, no
sparse assembly).

System (reference laplace_matrix, seg_refinement.py:175-203):
  L = diag(1e-5 + λ·D) − λ·A,  A = 4-neighbour adjacency with
  w_ij = exp(−(I_i − I_j)²/σ²),  D = Σ_j A_ij.
Split into seeded (Dirichlet) and unseeded nodes:  L_u u_u = −Bᵀ u_s.
The reduced operator is applied on the full grid via masking:
  matvec(x) = M ⊙ L(M ⊙ x),  rhs = −(M ⊙ L(S ⊙ u_s)),  M = unseeded mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.ops.morphology import erode_mask_with_disc_struct


def edge_weights(img: jnp.ndarray, sigma: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizontal (H, W-1) and vertical (H-1, W) edge weights."""
    img = img.astype(jnp.float32)
    wh = jnp.exp(-((img[:, 1:] - img[:, :-1]) ** 2) / sigma ** 2)
    wv = jnp.exp(-((img[1:, :] - img[:-1, :]) ** 2) / sigma ** 2)
    return wh, wv


def apply_laplacian(x: jnp.ndarray, wh: jnp.ndarray, wv: jnp.ndarray,
                    lam: float = 1.0, eps: float = 1e-5) -> jnp.ndarray:
    """y = (diag(eps + λ·D) − λ·A) x for (H, W) x — one fused stencil."""
    deg = jnp.zeros_like(x)
    deg = deg.at[:, 1:].add(wh).at[:, :-1].add(wh)
    deg = deg.at[1:, :].add(wv).at[:-1, :].add(wv)
    ax = jnp.zeros_like(x)
    ax = ax.at[:, 1:].add(wh * x[:, :-1]).at[:, :-1].add(wh * x[:, 1:])
    ax = ax.at[1:, :].add(wv * x[:-1, :]).at[:-1, :].add(wv * x[1:, :])
    return (eps + lam * deg) * x - lam * ax


@partial(jax.jit, static_argnames=("lam", "sigma", "maxiter", "tol"))
def random_walk_probs(img: jnp.ndarray, initial_segmentation: jnp.ndarray,
                      *, sigma: float = 10.0, lam: float = 1.0,
                      tol: float = 1e-3, maxiter: int = 600) -> jnp.ndarray:
    """Solve the seeded random walk for (K, H, W) one-hot seed maps.

    ``initial_segmentation`` marks seeds (any class True ⇒ pixel is seeded
    with that class's indicator).  Returns (K, H, W) probabilities with seeded
    pixels at their seed values (reference random_walk.py:112-126).
    """
    img = img.astype(jnp.float32)
    seeds = initial_segmentation.astype(jnp.float32)
    seeded = jnp.any(initial_segmentation, axis=0)
    unseeded = ~seeded
    wh, wv = edge_weights(img, sigma)

    m = unseeded.astype(jnp.float32)

    def matvec(x):
        return m * apply_laplacian(m * x, wh, wv, lam)

    def solve_one(u_s):
        b = -(m * apply_laplacian(u_s * seeded, wh, wv, lam))
        # Jacobi preconditioner: inverse diagonal of L restricted to unseeded.
        deg = jnp.zeros_like(img)
        deg = deg.at[:, 1:].add(wh).at[:, :-1].add(wh)
        deg = deg.at[1:, :].add(wv).at[:-1, :].add(wv)
        diag = 1e-5 + lam * deg
        pre = lambda r: m * r / diag
        x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=tol, maxiter=maxiter, M=pre)
        return x

    u_u = jax.vmap(solve_one)(seeds)
    return jnp.where(seeded[None], seeds, u_u)


def random_walk(img: jnp.ndarray, initial_segmentation: jnp.ndarray,
                *, background_erosion_radius: int = 12, sigma: float = 10.0,
                lam: float = 1.0, tol: float = 1e-3,
                maxiter: int = 600) -> jnp.ndarray:
    """Reference ``random_walk`` (utils/random_walk.py:90-126): add an eroded
    background class, solve, drop background.  img: (H, W) uint8;
    initial_segmentation: (C, H, W) bool.  Returns (C, H, W) probabilities."""
    assert img.ndim == 2, "img should be 2D"
    seg = jnp.asarray(initial_segmentation).astype(bool)
    background = ~jnp.any(seg, axis=0)
    if background_erosion_radius > 1:
        background = erode_mask_with_disc_struct(
            background[None], radius=background_erosion_radius)[0]
    full = jnp.concatenate([background[None], seg], axis=0)
    probs = random_walk_probs(jnp.asarray(img), full, sigma=sigma, lam=lam,
                              tol=tol, maxiter=maxiter)
    return probs[1:]

"""Connected-component labelling and component selection, fully on device.

The reference uses kornia's iterative CCL plus a Python loop over components
(utils/segmentation_preprocessing.py:7-52).  Here:

* :func:`connected_components` — the same max-label-propagation scheme kornia
  uses (8-connectivity via a 3×3 max-pool), expressed as ``lax.fori_loop`` so
  the whole thing is one fused XLA while-loop.
* :func:`remove_all_but_one_connected_component` — the winner component is
  found with ``segment_sum`` over label ids instead of ``unique()`` + Python
  loop, which keeps shapes static and lets the op vmap over classes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _seg_cummax(vals: jnp.ndarray, bg: jnp.ndarray, axis: int,
                reverse: bool) -> jnp.ndarray:
    """Segmented running max of ``vals`` along ``axis``; background pixels
    (``bg``) block propagation (and keep their own value, which is 0)."""

    def op(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb, vb, jnp.maximum(va, vb)), ra | rb

    out, _ = jax.lax.associative_scan(op, (vals, bg), axis=axis % vals.ndim,
                                      reverse=reverse)
    return out


@partial(jax.jit, static_argnames=("num_iterations", "check_every", "method",
                                   "return_converged"))
def connected_components(mask: jnp.ndarray, num_iterations: int,
                         check_every: int = 16,
                         method: str = "pool",
                         return_converged: bool = False) -> jnp.ndarray:
    """Label 8-connected components of (..., H, W) binary masks.

    Returns int32 labels; 0 = background, foreground labels are arbitrary
    distinct positive ids (linear index + 1 of some member pixel), matching
    kornia.contrib.connected_components' convention the reference relies on.
    At the fixpoint every pixel carries the max initial index of its
    component under either method, so both agree exactly once converged.

    method='pool' (default): the reference's literal scheme —
    ``num_iterations`` (max(H, W), seg_refinement.py:66) iterations of 3x3
    max-pool propagation, early-exited at the fixpoint (checked every
    ``check_every`` steps, step count capped at exactly ``num_iterations``
    so results are bit-identical to kornia's even when not converged).

    method='scan': segmented running-max scans along rows and columns plus
    one 3x3 pool per round — converges in O(geometric turns) rounds instead
    of O(diameter) iterations, but measured 2.5x SLOWER on v5e (the
    associative_scan log-steps round-trip HBM: 21.6 vs 8.8 ms/img at the
    batched 384x224x17 production shape), so it is not the default.
    """
    h, w = mask.shape[-2:]
    fg = mask > 0.5
    init = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1) * fg

    def propagate(_, labels):
        # 3x3 max as an explicit 9-way shifted max: XLA fuses the pad,
        # slices, max chain and fg gating into ONE pass over the array,
        # where reduce_window emits its own pass plus a separate gating
        # pass (~2.4x the HBM traffic of the fused form)
        padded = jnp.pad(labels, [(0, 0)] * (labels.ndim - 2)
                         + [(1, 1), (1, 1)])
        grown = labels
        for dy in range(3):
            for dx in range(3):
                if dy == dx == 1:
                    continue
                grown = jnp.maximum(
                    grown, jax.lax.slice_in_dim(
                        jax.lax.slice_in_dim(padded, dy, dy + h, axis=-2),
                        dx, dx + w, axis=-1))
        return grown * fg

    if method == "scan":
        bg = ~fg

        def round_(labels):
            labels = _seg_cummax(labels, bg, -1, False)
            labels = _seg_cummax(labels, bg, -1, True)
            labels = _seg_cummax(labels, bg, -2, False)
            labels = _seg_cummax(labels, bg, -2, True)
            return propagate(0, labels)

        def cond(state):
            i, _, done = state
            return (i < num_iterations) & ~done

        def body(state):
            i, labels, _ = state
            new = round_(labels)
            return i + 1, new, jnp.array_equal(new, labels)

        _, labels, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init, jnp.asarray(False)))
        return (labels, done) if return_converged else labels

    def cond(state):
        i, _, done = state
        return (i < num_iterations) & ~done

    def body(state):
        i, labels, _ = state
        n = jnp.minimum(check_every, num_iterations - i)
        new = jax.lax.fori_loop(0, n, propagate, labels)
        return i + n, new, jnp.array_equal(new, labels)

    _, labels, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init, jnp.asarray(False)))
    # ``done`` records a DETECTED fixpoint; hitting the iteration cap without
    # one means the labelling may be stale (spiral/elongated shapes whose
    # geodesic diameter exceeds num_iterations) — exactly like kornia's
    return (labels, done) if return_converged else labels


@partial(jax.jit, static_argnames=("selection", "num_iter", "max_components"))
def remove_all_but_one_connected_component(prob_mask: jnp.ndarray, selection: str,
                                           num_iter: int,
                                           max_components: int = 128) -> jnp.ndarray:
    """Keep one connected component per class of a (C, H, W) probability mask.

    ``selection``: 'largest' (by pixel area) or 'highest_probability' (by mean
    probability).  Returns the probability mask zeroed outside the winning
    component, like the reference (segmentation_preprocessing.py:50-51
    ``refined_mask *= prob_mask``).  Empty classes stay empty.

    Winner selection is scatter-free (TPU scatters serialise: a per-pixel-id
    ``segment_sum`` histogram costs 2x12.7 ms per image on v5e): propagation
    runs to its fixpoint (early-exit loop; see inline note on the deliberate
    divergence from kornia's num_iter truncation), where a pixel is its
    component's ROOT iff its label equals its own initial index; ``top_k``
    collects up to ``max_components`` candidate roots and the per-candidate
    area/probability-mass reduce is one broadcast compare + matmul.  Classes
    with more than ``max_components`` true components (bone prob-masks carry
    a handful of specks; raise the bound if ever needed) would silently
    ignore the lowest-indexed ones.
    """
    assert prob_mask.ndim == 3, "segmentation_mask should be 3D tensor of shape (C, H, W)"
    if selection not in ("largest", "highest_probability"):
        raise NotImplementedError(f"Invalid selection: {selection}")
    c, h, w = prob_mask.shape
    # Run propagation TO CONVERGENCE (bound h·w is the absolute worst case;
    # the while-loop early-exits at the fixpoint, so real masks pay exactly
    # the reference's iteration count).  kornia truncates at num_iter and can
    # SPLIT a true component into stale fragments on adversarial spirals —
    # converged labels are strictly more correct, and the downstream contract
    # (zero all but one component) only consumes component IDENTITY.  With
    # convergence guaranteed, fixpoint-root detection below is always exact
    # (round-2 ADVICE; the sort+segmented-scan and lax.cond alternatives both
    # measured slower on v5e — scans log-pass HBM, vmapped cond runs both
    # branches).
    labels = connected_components(prob_mask.astype(jnp.float32),
                                  max(num_iter, h * w))
    k = min(max_components, h * w)

    def per_class(lbl, prob):
        flat_lbl = lbl.reshape(-1)
        flat_prob = prob.reshape(-1)
        init = jnp.arange(h * w, dtype=jnp.int32) + 1
        roots = jnp.where(flat_lbl == init, flat_lbl, 0)     # 0 = not a root
        cand, _ = jax.lax.top_k(roots, k)                     # (K,) labels
        hit = (flat_lbl[None, :] == cand[:, None]) & (cand[:, None] > 0)
        hit = hit.astype(jnp.float32)                         # (K, HW)
        areas = jnp.sum(hit, axis=1)
        if selection == "largest":
            metric = areas
        else:
            sums = hit @ flat_prob
            metric = sums / jnp.maximum(areas, 1.0)
        metric = jnp.where((cand > 0) & (areas > 0), metric, -jnp.inf)
        winner = cand[jnp.argmax(metric)]
        keep = (lbl == winner) & (lbl > 0)
        return keep.astype(prob.dtype) * prob

    return jax.vmap(per_class)(labels, prob_mask)

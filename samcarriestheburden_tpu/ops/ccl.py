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
    ``max_components`` is retained for API compatibility and ignored — the
    selection below is exact for any component count.

    Winner selection is scatter-free (TPU scatters serialise: a per-pixel-id
    ``segment_sum`` histogram costs 2x12.7 ms per image on v5e) and
    branch-free: sort pixels by final label (one 2-operand ``lax.sort``),
    then per-component area/probability-mass are segmented
    ``associative_scan``s over the label-contiguous runs.  This is literally
    a histogram over the FINAL label map, so it matches the reference's
    (kornia + torch.unique) semantics even when propagation hit the
    iteration cap unconverged (spiral shapes with geodesic diameter >
    num_iter — kornia truncates identically).
    """
    assert prob_mask.ndim == 3, "segmentation_mask should be 3D tensor of shape (C, H, W)"
    if selection not in ("largest", "highest_probability"):
        raise NotImplementedError(f"Invalid selection: {selection}")
    c, h, w = prob_mask.shape
    labels = connected_components(prob_mask.astype(jnp.float32), num_iter)

    # Per-component statistics by SORT + SEGMENTED SCAN (one 2-operand sort
    # keyed by label, then associative scans over the label-contiguous runs).
    # Exact for ANY component count and for truncated (unconverged) label
    # maps — it is literally a histogram over the final labels, the
    # reference's (kornia + torch.unique) semantics.  Replaces the former
    # top_k-candidates + (K, HW) membership-matmul selection, whose K-bound
    # silently dropped components and whose (K, HW) hit matrix moved ~170 MB
    # of HBM per class (round-2 ADVICE + round-3 trace).
    flat_lbl = labels.reshape(c, -1)
    flat_prob = prob_mask.astype(jnp.float32).reshape(c, -1)
    s_lbl, s_prob = jax.lax.sort((flat_lbl, flat_prob), dimension=-1,
                                 num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((c, 1), bool), s_lbl[:, 1:] != s_lbl[:, :-1]], axis=1)

    def seg_cumsum(vals):
        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av + bv), af | bf

        out, _ = jax.lax.associative_scan(op, (vals, first), axis=1)
        return out

    def run_total(prefix):
        # within-run prefix values are non-decreasing (non-negative terms),
        # so a REVERSED segmented cummax propagates each run's total (its
        # last prefix value) back to every member position
        rev = prefix[:, ::-1]
        rev_first = jnp.concatenate(
            [jnp.ones((c, 1), bool), first[:, :0:-1]], axis=1)

        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf

        out, _ = jax.lax.associative_scan(op, (rev, rev_first), axis=1)
        return out[:, ::-1]

    areas = run_total(seg_cumsum(jnp.ones_like(s_prob)))
    if selection == "largest":
        metric = areas
    else:
        sums = run_total(seg_cumsum(s_prob))
        metric = sums / jnp.maximum(areas, 1.0)
    metric = jnp.where(s_lbl > 0, metric, -jnp.inf)
    win_pos = jnp.argmax(metric, axis=1)
    winner = jnp.take_along_axis(s_lbl, win_pos[:, None], axis=1)  # (C, 1)
    keep = (flat_lbl == winner) & (flat_lbl > 0)
    return (keep.astype(prob_mask.dtype) * prob_mask.reshape(c, -1)
            ).reshape(c, h, w)

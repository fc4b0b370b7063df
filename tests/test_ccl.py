import numpy as np
from scipy import ndimage

from samcarriestheburden_tpu.ops.ccl import connected_components, remove_all_but_one_connected_component


def test_component_count_matches_scipy(rng):
    mask = (rng.random((48, 48)) > 0.7).astype(np.float32)
    labels = np.asarray(connected_components(mask, num_iterations=48))
    _, n_scipy = ndimage.label(mask > 0.5, structure=np.ones((3, 3)))  # 8-connectivity
    n_ours = len(np.unique(labels[labels > 0]))
    assert n_ours == n_scipy
    # members of one scipy component share one of our labels
    scipy_lbl, _ = ndimage.label(mask > 0.5, structure=np.ones((3, 3)))
    for comp in range(1, n_scipy + 1):
        ours = labels[scipy_lbl == comp]
        assert len(np.unique(ours)) == 1 and ours[0] > 0


def test_background_is_zero():
    mask = np.zeros((8, 8), np.float32)
    labels = np.asarray(connected_components(mask, 8))
    assert (labels == 0).all()


def test_select_largest():
    prob = np.zeros((1, 32, 32), np.float32)
    prob[0, 2:6, 2:6] = 0.9      # 16 px
    prob[0, 20:30, 20:30] = 0.6  # 100 px (largest)
    out = np.asarray(remove_all_but_one_connected_component(prob, "largest", 32))
    assert out[0, 25, 25] > 0 and out[0, 3, 3] == 0
    np.testing.assert_allclose(out[0, 20:30, 20:30], 0.6)


def test_select_highest_probability():
    prob = np.zeros((1, 32, 32), np.float32)
    prob[0, 2:6, 2:6] = 0.9
    prob[0, 20:30, 20:30] = 0.6
    out = np.asarray(remove_all_but_one_connected_component(prob, "highest_probability", 32))
    assert out[0, 3, 3] > 0 and out[0, 25, 25] == 0


def test_empty_class_stays_empty():
    prob = np.zeros((2, 16, 16), np.float32)
    prob[1, 4:8, 4:8] = 0.8
    out = np.asarray(remove_all_but_one_connected_component(prob, "largest", 16))
    assert out[0].sum() == 0 and out[1].sum() > 0


def test_preserves_probabilities():
    """Output is (winner mask) * prob, reference :50-51."""
    prob = np.zeros((1, 16, 16), np.float32)
    prob[0, 2:6, 2:6] = np.linspace(0.55, 0.95, 16).reshape(4, 4)
    out = np.asarray(remove_all_but_one_connected_component(prob, "largest", 16))
    np.testing.assert_allclose(out[0, 2:6, 2:6], prob[0, 2:6, 2:6])


def test_scan_and_pool_methods_agree(rng):
    """Both propagation schemes reach the same fixpoint (same label VALUES:
    the component max initial index) on random speckle masks."""
    for shape in [(32, 48), (3, 40, 40)]:
        mask = (rng.random(shape) > 0.6).astype(np.float32)
        # num_iterations = H*W guarantees the pool method also converges —
        # at max(H, W) (the reference's setting) snake-shaped speckle
        # components can exceed the propagation budget, where the truncated
        # pool result is deliberately kornia-faithful instead
        n = shape[-1] * shape[-2]
        scan = np.asarray(connected_components(mask, n, method="scan"))
        pool = np.asarray(connected_components(mask, n, method="pool"))
        np.testing.assert_array_equal(scan, pool)


def test_truncation_unconverged_selection_uses_true_components():
    """A spiral whose geodesic diameter exceeds num_iter leaves the pool
    propagation unconverged; selection must then match the reference's
    TRUE component structure: selection propagates to the fixpoint instead
    of inheriting kornia's truncation, which splits one true component into
    stale fragments (round-2 ADVICE; divergence documented in ops/ccl.py).
    Oracle: numpy histogram over fully-converged labels."""
    import numpy as np

    from samcarriestheburden_tpu.ops.ccl import (
        connected_components, remove_all_but_one_connected_component)

    h = w = 33
    mask = np.zeros((h, w), np.float32)
    # rectangular spiral: one long 1-px path
    top, bot, left, right = 0, h - 1, 0, w - 1
    while left <= right and top <= bot:
        mask[top, left:right + 1] = 1
        mask[top:bot + 1, right] = 1
        mask[bot, left:right + 1] = 1
        mask[top + 2:bot + 1, left] = 1
        top += 2; bot -= 2; left += 2; right -= 2
    # a small separate blob with high probability
    prob = mask * 0.6  # above the 0.5 fg threshold
    prob[14:17, 14:17] = 0.0
    mask[14:17, 14:17] = 0.0
    prob[15, 15] = 0.95
    mask[15, 15] = 1.0

    num_iter = 8  # far below the spiral's geodesic diameter
    labels, converged = connected_components(prob[None], num_iter,
                                             return_converged=True)
    assert not bool(converged)  # kornia WOULD truncate here (stale labels)

    # selection runs propagation to the fixpoint (deliberate divergence from
    # kornia's truncation — truncation SPLITS the spiral into stale fragments;
    # see ops/ccl.py note), so the oracle is selection over TRUE components:
    # the 0.95-probability blob beats the 0.6 spiral on mean probability
    full, conv2 = connected_components(prob[None], h * w,
                                       return_converged=True)
    assert bool(conv2)
    lab = np.asarray(full[0])
    best_mean, best_lbl = -1.0, 0
    for v in np.unique(lab):
        if v == 0:
            continue
        sel = lab == v
        m = prob[sel].mean()
        if m > best_mean:
            best_mean, best_lbl = m, v
    expect = prob * (lab == best_lbl)
    assert expect.sum() == prob[15, 15]  # the blob, not a spiral fragment

    got = np.asarray(remove_all_but_one_connected_component(
        prob[None], "highest_probability", num_iter))[0]
    np.testing.assert_allclose(got, expect)


def test_pallas_propagation_matches_pool(rng):
    """connected_components_pallas (VMEM-resident per-map loop, the TPU
    serving path) == the XLA pool method, converged AND truncated (the step
    function is bit-identical; tools/exp_ccl.py measured ~3-4x on v5e)."""
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu.ops.ccl import connected_components_pallas

    m = (rng.random((3, 40, 56)) < 0.45).astype(np.float32)
    ref = np.asarray(connected_components(jnp.asarray(m), 40 * 56))
    new, conv = connected_components_pallas(jnp.asarray(m), 40 * 56,
                                            return_converged=True,
                                            interpret=True)
    assert bool(conv)
    np.testing.assert_array_equal(np.asarray(new), ref)
    # truncated: same stale labels as kornia/pool at the same cap
    ref_t = np.asarray(connected_components(jnp.asarray(m), 7))
    new_t = np.asarray(connected_components_pallas(jnp.asarray(m), 7,
                                                   interpret=True))
    np.testing.assert_array_equal(np.asarray(new_t), ref_t)
    # vmapped (the batched-sweep integration shape)
    batched = jax.vmap(lambda s: connected_components_pallas(
        s, 64, interpret=True))(jnp.stack([jnp.asarray(m)] * 2))
    assert batched.shape == (2,) + m.shape


def test_auto_method_gate():
    """method='auto' picks the VMEM-resident kernel only on TPU and only when
    the map fits the kernel's VMEM budget with margin; everything else falls
    back to the HBM-streaming XLA loop."""
    from unittest import mock

    from samcarriestheburden_tpu.ops import ccl

    with mock.patch.object(ccl.jax, "default_backend", return_value="tpu"):
        assert ccl._resolve_ccl_method(384, 224) == "pallas"
        assert ccl._resolve_ccl_method(4096, 4096) == "pool"   # > VMEM budget
    with mock.patch.object(ccl.jax, "default_backend", return_value="cpu"):
        assert ccl._resolve_ccl_method(384, 224) == "pool"


def test_many_components_selection_exact_within_cap():
    """~200 components with the true winner in the top-left corner (the
    candidates top_k drops the LOWEST root indices on overflow — exactly the
    top-left components): the default cap must still select it.  Would fail
    at max_components=128 (winner's root falls outside the 128 largest
    label values); guards the 256 default."""
    h, w = 96, 96
    prob = np.zeros((1, h, w), np.float32)
    prob[0, 2:10, 2:10] = 0.8          # 64-px winner, top-left (lowest root)
    k = 0
    for r in range(12, 92, 4):         # 20 x 10 = 200 single-pixel specks
        for c in range(12, 52, 4):
            prob[0, r, c] = 0.6
            k += 1
    out = np.asarray(remove_all_but_one_connected_component(
        prob, "largest", h * w))
    assert out[0, 5, 5] > 0            # winner kept
    assert (out[0, 12:, 12:] == 0).all()  # all specks removed


def test_selection_exact_beyond_cap():
    """More components than max_components, true winner top-left (the first
    root the candidate top_k would drop): the scalar-cond fallback to the
    exact segment_sum histogram must still select it, for both selection
    modes (reference segmentation_preprocessing.py:24-44 is always exact)."""
    h, w = 96, 96
    prob = np.zeros((1, h, w), np.float32)
    prob[0, 2:10, 2:10] = 0.9          # 64-px winner, lowest root index
    n_specks = 0
    for r in range(12, 92, 4):         # 20 x 20 = 400 single-pixel specks
        for c in range(12, 92, 4):
            prob[0, r, c] = 0.6
            n_specks += 1
    assert n_specks > 64               # exceeds the test cap below
    for selection in ("largest", "highest_probability"):
        out = np.asarray(remove_all_but_one_connected_component(
            prob, selection, h * w, max_components=64))
        assert out[0, 5, 5] > 0, selection           # winner kept
        assert (out[0, 12:, 12:] == 0).all(), selection


def test_batched_input_matches_per_image():
    """(N, C, H, W) batched call == stacked (C, H, W) calls — the batched
    form exists so production sweeps don't vmap over the exactness cond
    (ops/ccl.py docstring)."""
    rng = np.random.default_rng(3)
    probs = (rng.random((4, 3, 40, 48)) > 0.6).astype(np.float32) \
        * rng.random((4, 3, 40, 48)).astype(np.float32)
    for selection in ("largest", "highest_probability"):
        batched = np.asarray(remove_all_but_one_connected_component(
            probs, selection, 48))
        single = np.stack([np.asarray(remove_all_but_one_connected_component(
            p, selection, 48)) for p in probs])
        np.testing.assert_array_equal(batched, single)


def test_tie_breaks_to_smallest_root_in_both_branches():
    """Equal-metric components must resolve identically in the top-k fast
    path and the exact segment_sum fallback: smallest root id wins, matching
    the reference's ascending unique + argmax-first (round-3 ADVICE — top_k
    orders candidates descending, which used to flip ties)."""
    h, w = 24, 32
    prob = np.zeros((2, h, w), np.float32)
    # class 0: two equal-area equal-probability blobs; the top-left one has
    # the smaller root id (root = max linear index of the component)
    prob[0, 2:4, 2:4] = 0.7
    prob[0, 18:20, 24:26] = 0.7
    # class 1: enough single-pixel specks to trip a small candidate cap
    for c in range(2, 26, 4):
        prob[1, 10, c] = 0.6
    expect = np.zeros_like(prob[0])
    expect[2:4, 2:4] = 0.7

    for selection in ("largest", "highest_probability"):
        fast = np.asarray(remove_all_but_one_connected_component(
            prob, selection, h * w, max_components=256))  # top-k path
        exact = np.asarray(remove_all_but_one_connected_component(
            prob, selection, h * w, max_components=4))    # forced fallback
        np.testing.assert_array_equal(fast[0], expect, err_msg=selection)
        np.testing.assert_array_equal(fast, exact, err_msg=selection)


def test_topk_two_phase_matches_lax_topk():
    """The two-phase candidate selection returns exactly lax.top_k's VALUE
    set, including when all k survivors cluster in one row (the phase-1
    worst case) and when zero-padding to the row multiple kicks in."""
    import jax
    import jax.numpy as jnp

    from samcarriestheburden_tpu.ops.ccl import _topk_two_phase

    rng = np.random.default_rng(7)
    n, k, row = 86016, 256, 2048
    cases = []
    sparse = np.zeros(n, np.int32)                       # production-like
    idx = rng.choice(n, 300, replace=False)
    sparse[idx] = idx + 1
    cases.append(sparse)
    clustered = np.zeros(n, np.int32)                    # all in one row
    clustered[:400] = np.arange(1, 401)
    cases.append(clustered)
    cases.append(rng.integers(0, 5, n).astype(np.int32))  # heavy duplicates
    odd = rng.integers(0, n, n - 1000).astype(np.int32)   # padding path
    for v in cases + [odd]:
        got = np.sort(np.asarray(_topk_two_phase(jnp.asarray(v), k, row)))
        ref = np.sort(np.asarray(jax.lax.top_k(jnp.asarray(v), k)[0]))
        np.testing.assert_array_equal(got, ref)

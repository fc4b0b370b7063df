import numpy as np

from samcarriestheburden_tpu.engine.prompts import (
    PromptExtractor, SAMSelectingPromptExtractor, compute_logits_from_mask,
    extract_prompt_arrays, neg_seed_table)


def _mask_with_classes():
    m = np.zeros((4, 60, 40), bool)
    m[0, 5:15, 5:15] = True
    m[1, 20:30, 10:25] = True
    m[2, 5:15, 10:20] = True  # overlaps class 0 in columns 10-14
    # class 3 empty
    return m


def test_extract_arrays_centroids_and_boxes():
    m = _mask_with_classes()
    a = {k: np.asarray(v) for k, v in extract_prompt_arrays(m).items()}
    # class 1 has no overlap: centroid of full block
    np.testing.assert_array_equal(a["pos_seeds"][1], [17, 24])  # x=(10+24)/2=17, y=24.5->24 (banker's)
    assert a["pos_valid"].tolist() == [True, True, True, False]
    np.testing.assert_array_equal(a["boxes"][1], [10, 20, 24, 29])
    assert not a["box_valid"][3]


def test_overlap_excluded_from_seeds():
    m = _mask_with_classes()
    a = {k: np.asarray(v) for k, v in extract_prompt_arrays(m).items()}
    # class 0 seed restricted to non-overlapping columns 5-9
    assert a["pos_seeds"][0][0] < 10
    # but box still covers the full class extent
    np.testing.assert_array_equal(a["boxes"][0], [5, 5, 14, 14])


def test_neg_seed_table():
    m = _mask_with_classes()
    a = extract_prompt_arrays(m)
    table, valid = neg_seed_table(np.asarray(a["pos_seeds"]), np.asarray(a["pos_valid"]))
    valid = np.asarray(valid)
    assert valid.shape == (4, 3)
    # row 0 covers classes [1, 2, 3]: 1, 2 valid; 3 empty
    assert valid[0].tolist() == [True, True, False]
    np.testing.assert_array_equal(np.asarray(table)[0, 0], np.asarray(a["pos_seeds"])[1])


def test_prompt_extractor_api_matches_reference_semantics():
    m = _mask_with_classes()
    pe = PromptExtractor(m)
    prompts = pe.extract(seeds=True, boxes=True)
    assert [p.class_idx for p in prompts] == [0, 1, 2]  # empty class skipped
    p0 = prompts[0]
    assert p0.pos_seeds.shape == (1, 2)
    assert p0.neg_seeds.shape == (2, 2)  # seeds of classes 1 and 2
    assert p0.box.tolist() == [5, 5, 14, 14]


def test_logits_from_mask_shape_and_sign():
    m = np.zeros((384, 224), bool)
    m[100:200, 50:150] = True
    logits = np.asarray(compute_logits_from_mask(m))
    assert logits.shape == (1, 256, 256)
    # inside the (scaled) mask logits are strongly positive, outside negative
    assert logits[0, 100, 50] > 3
    assert logits[0, 10, 10] < -3
    # padded right region (224*256/384 = 149 cols used) is zero
    assert np.allclose(logits[0, :, 200:], 0)


def test_selecting_extractor():
    probs = np.zeros((2, 32, 32), np.float32)
    probs[0, 5, 7] = 0.9
    probs[0, 20, 20] = 0.2
    prompts = SAMSelectingPromptExtractor(probs).extract(mask=False)
    assert len(prompts) == 1  # class 1 all-zero -> skipped
    np.testing.assert_array_equal(prompts[0].pos_seeds, [[7, 5]])  # xy of max

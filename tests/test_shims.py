"""Reference-layout import shims: user code written against the reference's
module paths ports by swapping only the root package."""


def test_utils_shims_importable():
    from samcarriestheburden_tpu.utils.cvat_parser import CVATParser, Mask
    from samcarriestheburden_tpu.utils.dice_coefficient import (
        multiclass_dice, multilabel_dice)
    from samcarriestheburden_tpu.utils.random_walk import random_walk
    from samcarriestheburden_tpu.utils.seg_refinement import (
        RndWalkSegRefiner, SAMSegRefiner, SegEnhance, SegRefiner)
    from samcarriestheburden_tpu.utils.segmentation_preprocessing import (
        disk, erosion, opening_with_connected_component,
        remove_all_but_one_connected_component, square)

    assert SAMSegRefiner is not None and CVATParser is not None


def test_top_level_reference_api():
    import samcarriestheburden_tpu as sct

    assert callable(sct.sam_model_registry["vit_h"])
    assert sct.SAMMaskDecoderHead is sct.SamMaskDecoderHead
    for name in ["SamPredictor", "SamAutomaticMaskGenerator",
                 "build_sam_vit_b", "build_sam_vit_l", "build_sam_vit_h"]:
        assert getattr(sct, name) is not None

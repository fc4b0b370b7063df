"""Configuration dataclasses for every subsystem.

The reference scatters configuration across an argparse parser shared by all
training entry points (unet_training/hyper_params.py:3-19), literal dicts in
drivers (scripts/save_refined_segmentations.py:25-31) and class attributes on
datasets (scripts/seg_grazpedwri_dataset.py:22-49).  Here a single typed config
layer feeds the CLI, the HPO search spaces and the library API.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _ConfigBase:
    """JSON round-tripping shared by all config dataclasses."""

    def to_json(self) -> str:
        return json.dumps(_asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, payload: str):
        return cls(**json.loads(payload))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# SAM model family
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ImageEncoderConfig(_ConfigBase):
    """ViTDet-style image encoder (reference: segment_anything/modeling/image_encoder.py:17).

    ``window_size=14`` with four global-attention layers is the reference's
    only sequence-scaling mechanism; it maps naturally onto block-local TPU
    attention (the 4096-token global layers fit comfortably per chip).
    """

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    layer_norm_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclass(frozen=True)
class PromptEncoderConfig(_ConfigBase):
    """Reference: segment_anything/modeling/prompt_encoder.py:16."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16


@dataclass(frozen=True)
class MaskDecoderConfig(_ConfigBase):
    """Reference: segment_anything/modeling/mask_decoder.py:16 + transformer.py:16."""

    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


@dataclass(frozen=True)
class SamConfig(_ConfigBase):
    """Composite SAM (reference: segment_anything/modeling/sam.py:18, build_sam.py:55-101)."""

    image_encoder: ImageEncoderConfig = field(default_factory=ImageEncoderConfig)
    prompt_encoder: PromptEncoderConfig = field(default_factory=PromptEncoderConfig)
    mask_decoder: MaskDecoderConfig = field(default_factory=MaskDecoderConfig)
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    mask_threshold: float = 0.0
    image_format: str = "RGB"

    @classmethod
    def from_json(cls, payload: str) -> "SamConfig":
        raw = json.loads(payload)
        raw["image_encoder"] = ImageEncoderConfig(**{
            **raw["image_encoder"],
            "global_attn_indexes": tuple(raw["image_encoder"]["global_attn_indexes"]),
        })
        pe = raw["prompt_encoder"]
        raw["prompt_encoder"] = PromptEncoderConfig(**{
            **pe,
            "image_embedding_size": tuple(pe["image_embedding_size"]),
            "input_image_size": tuple(pe["input_image_size"]),
        })
        raw["mask_decoder"] = MaskDecoderConfig(**raw["mask_decoder"])
        raw["pixel_mean"] = tuple(raw["pixel_mean"])
        raw["pixel_std"] = tuple(raw["pixel_std"])
        return cls(**raw)


def sam_vit_h_config() -> SamConfig:
    """ViT-H preset (reference build_sam.py:14-21)."""
    return SamConfig(image_encoder=ImageEncoderConfig(
        embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)))


def sam_vit_l_config() -> SamConfig:
    """ViT-L preset (reference build_sam.py:27-34)."""
    return SamConfig(image_encoder=ImageEncoderConfig(
        embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)))


def sam_vit_b_config() -> SamConfig:
    """ViT-B preset (reference build_sam.py:37-44)."""
    return SamConfig(image_encoder=ImageEncoderConfig(
        embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)))


def sam_vit_t_config(img_size: int = 128) -> SamConfig:
    """Tiny config used by the test-suite (no reference analogue): full
    architecture, toy widths, so parity/shape tests run in milliseconds."""
    grid = img_size // 16
    return SamConfig(
        image_encoder=ImageEncoderConfig(
            img_size=img_size, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=5, out_chans=16),
        prompt_encoder=PromptEncoderConfig(
            embed_dim=16, image_embedding_size=(grid, grid),
            input_image_size=(img_size, img_size), mask_in_chans=4),
        mask_decoder=MaskDecoderConfig(
            transformer_dim=16, transformer_mlp_dim=32, transformer_num_heads=2,
            iou_head_hidden_dim=16),
    )


# ---------------------------------------------------------------------------
# U-Net
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UNetConfig(_ConfigBase):
    """Classic 4-down/4-up U-Net (reference custom_arcitecture/classic_u_net.py:81-106)."""

    n_channels: int = 1
    n_classes: int = 17
    bilinear: bool = False
    n_last_channel: int = 64
    base_channels: int = 64


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig(_ConfigBase):
    """Mirrors the shared argparse flags (reference unet_training/hyper_params.py:3-19
    and training.py:14-19)."""

    seed: int = 42
    lr: float = 1e-3
    batch_size: int = 16
    infer_batch_size: int = 16
    weight_decay: float = 0.0
    epochs: int = 350
    data_aug: float = 0.03
    lr_scheduler: bool = True
    n_last_channel: int = 64
    data_sample_per_epoch: int = 48
    num_train_samples: int = -1  # -1 == all
    #: 'bootstrap' = sample with replacement (initial training, training.py:41-42);
    #: 'shuffle' = shuffled full epochs with drop_last (pseudo-label training,
    #: training_on_pseudo_labels.py:65-66)
    sample_mode: str = "bootstrap"
    #: forward-pass compute precision: 'float32' (reference parity) or
    #: 'bfloat16' (TPU mixed precision; params/optimizer/loss stay fp32)
    compute_dtype: str = "float32"
    #: roll each epoch into one jitted lax.scan (one dispatch/sync per epoch).
    #: None = auto: on for TPU (per-step dispatch latency dominates there),
    #: off for CPU (scan triples XLA-CPU compile time for the full U-Net)
    epoch_scan: Optional[bool] = None
    #: augmentation warp implementation: None = auto ('matmul' on TPU — the
    #: gather-free MXU formulation, train/augment.py — 'gather' elsewhere);
    #: explicit 'matmul' / 'gather' to force
    aug_method: Optional[str] = None
    #: dataset residency: 'replicated' copies the whole split to every device
    #: (right for GrazPedWri's 64/500-image splits — zero gather collectives);
    #: 'sharded' partitions the split on the data axis (scales past
    #: per-device HBM; per-step batch gathers become XLA collectives)
    data_placement: str = "replicated"
    # TPU-native additions (absent in reference): data-parallel device count.
    num_devices: int = 1


# ---------------------------------------------------------------------------
# Refinement engine
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RefineConfig(_ConfigBase):
    """The authors' HPO-selected refinement knobs
    (reference scripts/save_refined_segmentations.py:25-31)."""

    prompts_first: Tuple[str, ...] = ("box",)
    prompts_second: Optional[Tuple[str, ...]] = ("pos_points", "neg_points")
    ccl_selection: Optional[str] = "highest_probability"  # 'largest' | 'highest_probability' | None
    morph_op: str = "dilation"  # 'erosion' | 'dilation'
    struct_element: str = "square"  # 'square' | 'disk' | 'diamond' | 'star'
    radius: int = 8
    max_neg_seeds: int = 16  # static padded capacity for vmapped prompts (N_CLASSES-1)

    @classmethod
    def from_json(cls, payload: str) -> "RefineConfig":
        raw = json.loads(payload)
        raw["prompts_first"] = tuple(raw["prompts_first"])
        if raw.get("prompts_second") is not None:
            raw["prompts_second"] = tuple(raw["prompts_second"])
        return cls(**raw)


# ---------------------------------------------------------------------------
# Automatic mask generation
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AMGConfig(_ConfigBase):
    """SamAutomaticMaskGenerator knobs (reference automatic_mask_generator.py:36-52)."""

    points_per_side: Optional[int] = 32
    points_per_batch: int = 64
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.95
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    crop_n_layers: int = 0
    crop_nms_thresh: float = 0.7
    crop_overlap_ratio: float = 512 / 1500
    crop_n_points_downscale_factor: int = 1
    min_mask_region_area: int = 0
    output_mode: str = "binary_mask"


# ---------------------------------------------------------------------------
# Dataset constants
# ---------------------------------------------------------------------------

#: Per-channel normalisation over the GrazPedWri training split
#: (reference scripts/seg_grazpedwri_dataset.py:22-23).
GRAZ_IMG_MEAN = 0.3505533917353781
GRAZ_IMG_STD = 0.22763733675869177

#: The 17 wrist-bone classes, sorted (reference seg_grazpedwri_dataset.py:26-43).
BONE_LABEL: Tuple[str, ...] = tuple(sorted([
    "Radius",
    "Ulna",
    "Os scaphoideum",
    "Os lunatum",
    "Os triquetrum",
    "Os pisiforme",
    "Os trapezium",
    "Os trapezoideum",
    "Os capitatum",
    "Os hamatum",
    "Ossa metacarpalia I",
    "Ossa metacarpalia II",
    "Ossa metacarpalia III",
    "Ossa metacarpalia IV",
    "Ossa metacarpalia V",
    "Epiphyse Radius",
    "Epiphyse Ulna",
]))
BONE_LABEL_MAPPING = {k: v for v, k in enumerate(BONE_LABEL)}
N_CLASSES = len(BONE_LABEL)

#: Per-class positive BCE weights (reference seg_grazpedwri_dataset.py:47-49).
POS_CLASS_WEIGHT: Tuple[float, ...] = (
    108.1348, 349.1551, 69.6342, 96.0886, 167.7897, 364.5914, 131.5362,
    176.2591, 240.9182, 169.5408, 60.1363, 46.6512, 51.6916, 58.6216,
    52.5956, 11.2623, 17.9409,
)

#: U-Net input resolution (H, W) (reference seg_grazpedwri_dataset.py:51).
UNET_INPUT_HW = (384, 224)

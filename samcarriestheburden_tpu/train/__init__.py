"""Training: U-Net loops (optax AdamW + cosine), affine augmentation, losses,
local experiment logging."""

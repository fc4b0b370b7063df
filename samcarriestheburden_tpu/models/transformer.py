"""TwoWayTransformer, functional (reference segment_anything/modeling/transformer.py).

Small token counts (≤ a dozen sparse prompts vs 4096 image tokens) make this
decoder bandwidth-bound rather than FLOP-bound; everything fuses under XLA and
vmaps cleanly over a class axis for the refinement engine."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from samcarriestheburden_tpu.config import MaskDecoderConfig
from samcarriestheburden_tpu.models.common import (
    layer_norm, layer_norm_init, linear, linear_init, mlp_block, mlp_block_init)


# ---------------------------------------------------------------------------
# Attention with optional internal-dim downsampling (reference transformer.py:185-240)
# ---------------------------------------------------------------------------


def attention_init(key, embedding_dim: int, num_heads: int,
                   downsample_rate: int = 1) -> dict:
    internal = embedding_dim // downsample_rate
    assert internal % num_heads == 0, "num_heads must divide embedding_dim."
    ks = jax.random.split(key, 4)
    return {
        "q_proj": linear_init(ks[0], embedding_dim, internal),
        "k_proj": linear_init(ks[1], embedding_dim, internal),
        "v_proj": linear_init(ks[2], embedding_dim, internal),
        "out_proj": linear_init(ks[3], internal, embedding_dim),
    }


def attention(p: dict, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              num_heads: int) -> jnp.ndarray:
    """(B, Nq, C) x (B, Nk, C) x (B, Nk, C) -> (B, Nq, C)."""
    nh = num_heads
    q = linear(p["q_proj"], q)
    k = linear(p["k_proj"], k)
    v = linear(p["v_proj"], v)
    b, nq, c = q.shape
    hd = c // nh

    def split(x):
        return jnp.transpose(x.reshape(b, -1, nh, hd), (0, 2, 1, 3))

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, nq, c)
    return linear(p["out_proj"], out)


# ---------------------------------------------------------------------------
# TwoWayAttentionBlock (reference transformer.py:109-182)
# ---------------------------------------------------------------------------


def block_init(key, cfg: MaskDecoderConfig) -> dict:
    ks = jax.random.split(key, 5)
    ed, nh = cfg.transformer_dim, cfg.transformer_num_heads
    dr = cfg.attention_downsample_rate
    return {
        "self_attn": attention_init(ks[0], ed, nh),
        "norm1": layer_norm_init(ed),
        "cross_attn_token_to_image": attention_init(ks[1], ed, nh, dr),
        "norm2": layer_norm_init(ed),
        "mlp": mlp_block_init(ks[2], ed, cfg.transformer_mlp_dim),
        "norm3": layer_norm_init(ed),
        "norm4": layer_norm_init(ed),
        "cross_attn_image_to_token": attention_init(ks[3], ed, nh, dr),
    }


def block_apply(p: dict, queries, keys, query_pe, key_pe, num_heads: int,
                skip_first_layer_pe: bool):
    if skip_first_layer_pe:
        queries = attention(p["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + attention(p["self_attn"], q, q, queries, num_heads)
    queries = layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + attention(p["cross_attn_token_to_image"], q, k, keys, num_heads)
    queries = layer_norm(p["norm2"], queries)

    queries = queries + mlp_block(p["mlp"], queries, act=jax.nn.relu)
    queries = layer_norm(p["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + attention(p["cross_attn_image_to_token"], k, q, queries, num_heads)
    keys = layer_norm(p["norm4"], keys)
    return queries, keys


def _split_heads(x: jnp.ndarray, nh: int) -> jnp.ndarray:
    b, n, c = x.shape
    return jnp.transpose(x.reshape(b, n, nh, c // nh), (0, 2, 1, 3))


def block_apply_image_shared(p: dict, queries, keys1, query_pe, key_pe1,
                             num_heads: int):
    """Layer-0 ``block_apply`` for a batch whose IMAGE side is identical
    across the batch axis (the refinement round-1 case: one image's
    embedding + the no-mask dense embedding, decoded against 17 per-class
    prompt sets — reference sam_mask_decoder_head.py:85-96 runs these as 17
    sequential calls over the *same* image tensor).

    ``queries``: (B, Nq, C) per-class tokens; ``keys1``/``key_pe1``:
    (1, HW, C) shared image rows.  Same math as ``block_apply`` with
    ``skip_first_layer_pe=True`` on a batch of identical image rows, but:

    * the image-side projections (token→image k/v, image→token q) run once
      instead of B times;
    * token→image attention folds the class axis into the query axis — one
      (B·Nq, HW) attention instead of B small (Nq, HW) ones (shared k/v make
      them equivalent), turning B skinny MXU dots into one wide one.

    Returns (queries (B, Nq, C), keys (B, HW, C)) — keys pick up the
    per-class image→token update exactly as the standard path does.
    """
    b, nq, c = queries.shape
    nh = num_heads

    # token self-attention (layer 0 => skip_first_layer_pe)
    queries = attention(p["self_attn"], queries, queries, queries, nh)
    queries = layer_norm(p["norm1"], queries)

    # token -> image cross-attention: classes fold into the query axis
    k_img = keys1 + key_pe1                                   # (1, HW, C)
    q = (queries + query_pe).reshape(1, b * nq, c)
    out = attention(p["cross_attn_token_to_image"], q, k_img, keys1, nh)
    queries = queries + out.reshape(b, nq, c)
    queries = layer_norm(p["norm2"], queries)

    queries = queries + mlp_block(p["mlp"], queries, act=jax.nn.relu)
    queries = layer_norm(p["norm3"], queries)

    # image -> token cross-attention: image-side q projection is shared
    att = p["cross_attn_image_to_token"]
    qi = _split_heads(linear(att["q_proj"], k_img), nh)       # (1, nh, HW, hd)
    kt = _split_heads(linear(att["k_proj"], queries + query_pe), nh)
    vt = _split_heads(linear(att["v_proj"], queries), nh)     # (B, nh, Nq, hd)
    hd = qi.shape[-1]
    logits = jnp.einsum("ohqd,bhkd->bhqk", qi, kt,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vt.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vt)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, qi.shape[2], -1)
    keys = keys1 + linear(att["out_proj"], out)               # bcast (B, HW, C)
    keys = layer_norm(p["norm4"], keys)
    return queries, keys


# ---------------------------------------------------------------------------
# TwoWayTransformer (reference transformer.py:16-106)
# ---------------------------------------------------------------------------


def init(key, cfg: MaskDecoderConfig) -> dict:
    ks = jax.random.split(key, cfg.transformer_depth + 1)
    return {
        "layers": [block_init(ks[i], cfg) for i in range(cfg.transformer_depth)],
        "final_attn_token_to_image": attention_init(
            ks[-1], cfg.transformer_dim, cfg.transformer_num_heads,
            cfg.attention_downsample_rate),
        "norm_final_attn": layer_norm_init(cfg.transformer_dim),
    }


def apply(params: dict, cfg: MaskDecoderConfig, image_embedding: jnp.ndarray,
          image_pe: jnp.ndarray, point_embedding: jnp.ndarray,
          image_shared: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embedding/image_pe: (B, C, H, W) NCHW (API parity);
    point_embedding: (B, N, C).  Returns (queries (B, N, C), keys (B, HW, C)).

    ``image_shared``: static promise that the image rows are identical across
    the point batch (refinement round 1 / AMG: one image, no per-item mask
    embedding).  ``image_embedding`` must then have batch 1; layer 0 runs the
    shared-image block (see :func:`block_apply_image_shared`) — same math,
    image-side projections computed once."""
    b, c, h, w = image_embedding.shape
    keys = jnp.transpose(image_embedding.reshape(b, c, h * w), (0, 2, 1))
    key_pe = jnp.transpose(image_pe.reshape(image_pe.shape[0], c, h * w), (0, 2, 1))

    nh = cfg.transformer_num_heads
    queries = point_embedding
    layers = params["layers"]
    if image_shared:
        assert b == 1, "image_shared requires a batch-1 image embedding"
        queries, keys = block_apply_image_shared(
            layers[0], queries, keys, point_embedding, key_pe[:1], nh)
        layers = layers[1:]
    else:
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
    for i, layer in enumerate(layers):
        queries, keys = block_apply(layer, queries, keys, point_embedding, key_pe,
                                    nh, skip_first_layer_pe=(i == 0 and not image_shared))

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + attention(params["final_attn_token_to_image"], q, k, keys, nh)
    queries = layer_norm(params["norm_final_attn"], queries)
    return queries, keys

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
          image_pe: jnp.ndarray,
          point_embedding: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embedding/image_pe: (B, C, H, W) NCHW (API parity);
    point_embedding: (B, N, C).  Returns (queries (B, N, C), keys (B, HW, C))."""
    b, c, h, w = image_embedding.shape
    keys = jnp.transpose(image_embedding.reshape(b, c, h * w), (0, 2, 1))
    key_pe = jnp.transpose(image_pe.reshape(image_pe.shape[0], c, h * w), (0, 2, 1))
    key_pe = jnp.broadcast_to(key_pe, keys.shape)

    nh = cfg.transformer_num_heads
    queries = point_embedding
    for i, layer in enumerate(params["layers"]):
        queries, keys = block_apply(layer, queries, keys, point_embedding, key_pe,
                                    nh, skip_first_layer_pe=(i == 0))

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + attention(params["final_attn_token_to_image"], q, k, keys, nh)
    queries = layer_norm(params["norm_final_attn"], queries)
    return queries, keys

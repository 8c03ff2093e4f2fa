"""Backend-independent model math.

The reference splits the model into layer classes that each own weights and
call CUDA kernel pipelines (include/layers.h:9-156, src/layers.cpp). The TPU
build instead factors the *math* here once, parameterized over how a backend
stores K/V context (contiguous cache vs paged pool vs fused Pallas kernel):
backends supply ``write_kv``/``attend`` callbacks and get identical
semantics, which is what makes token-exact cross-backend parity tests
(reference tests/inferencer_test.cpp:76-164) possible.

Architecture (ModelConfig):
  * reference-parity mode (n_layers=1, ffn_dim=0, no residual/proj/LN):
    embedding -> single-head attention -> weight-tied argmax decoder,
    exactly /root/reference/src/inference_model.cpp:14-39.
  * general mode: N pre-LN transformer blocks with residuals, multi-head
    attention, optional output projection and FFN — the "multi-layer stack"
    extension where the reference's unused FeedForward becomes real.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.reference import (
    feed_forward,
    greedy_next_token,
    masked_attention,
    masked_softmax,
    tied_logits,
    token_pos_embed,
)


def _maybe_layernorm(x, gain, cfg: ModelConfig):
    if gain is None:
        return x
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gain.astype(jnp.float32)).astype(x.dtype)


def _use_residual(cfg: ModelConfig) -> bool:
    # Reference-parity (single bare attention block) has no residual path;
    # any richer architecture uses standard residual connections.
    return cfg.n_layers > 1 or cfg.ffn_dim > 0 or cfg.use_output_proj or cfg.use_layernorm


def layer_post(layer, cfg: ModelConfig, h_in, attn_out):
    """Combine attention output with the residual stream + optional FFN."""
    if cfg.use_output_proj:
        attn_out = feed_forward(attn_out, layer["wo"])
    if not _use_residual(cfg):
        return attn_out
    h = h_in + attn_out
    if cfg.ffn_dim > 0:
        h_norm = _maybe_layernorm(h, layer.get("ln2_g"), cfg)
        ffn = feed_forward(
            feed_forward(h_norm, layer["w_up"], activation=jax.nn.gelu),
            layer["w_down"],
        )
        h = h + ffn
    return h


def layer_attn_input(layer, cfg: ModelConfig, h):
    return _maybe_layernorm(h, layer.get("ln1_g"), cfg) if cfg.use_layernorm else h


def decode_round_tokens(
    params,
    cfg: ModelConfig,
    lengths,
    last_tokens,
    write_kv: Callable,
    attend: Callable,
):
    """One greedy decode round for every live batch slot.

    lengths:     [B] int32 (0 = empty slot); the new token sits at
                 position lengths-1's successor... precisely: the latest
                 *existing* token is at position lengths-1 and is the one
                 being fed through the model this round (reference
                 get_latest_kt_q_v, self_attention_inference_optimized.cu:100-143).
    last_tokens: [B] int32 — token id at position lengths-1.
    write_kv(layer_idx, pos, k, v, live) -> None  (backend-side KV append)
    attend(layer_idx, q, lengths) -> [B, D]      (backend-side attention)

    Returns (next_tokens [B], new_lengths [B]).
    """
    pos = jnp.maximum(lengths - 1, 0)
    h = token_pos_embed(last_tokens, pos, params["wte"], params["wpe"])
    live = lengths > 0
    D = h.shape[-1]
    for li, layer in enumerate(params["layers"]):
        x = layer_attn_input(layer, cfg, h)
        if "wqkv" in layer:
            qkv = feed_forward(x, layer["wqkv"])
            q, k, v = qkv[:, :D], qkv[:, D : 2 * D], qkv[:, 2 * D :]
        else:
            q = feed_forward(x, layer["wq"])
            k = feed_forward(x, layer["wk"])
            v = feed_forward(x, layer["wv"])
        write_kv(li, pos, k, v, live)
        attn_out = attend(li, q, lengths)
        h = layer_post(layer, cfg, h, attn_out)
    logits = tied_logits(h, params["wte"])
    return greedy_next_token(logits, lengths, cfg.n_seq, cfg.eof_token_id)


def causal_masked_attention(q, k, v, lengths, n_heads: int):
    """Full causal attention over a prompt block, length-masked.

    q,k,v: [B, S, D]; lengths: [B]. Position i attends to j <= i, j < len.
    Rows at positions >= lengths produce garbage — callers must mask
    downstream use (they do: KV writes are position-masked).
    """
    B, S, D = q.shape
    dh = D // n_heads
    qh = q.reshape(B, S, n_heads, dh).astype(jnp.float32)
    kh = k.reshape(B, S, n_heads, dh).astype(jnp.float32)
    vh = v.reshape(B, S, n_heads, dh).astype(jnp.float32)
    scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) * (1.0 / jnp.sqrt(dh))
    row = jnp.arange(S)[None, None, :, None]
    col = jnp.arange(S)[None, None, None, :]
    mask = (col <= row) & (col < lengths[:, None, None, None])
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhij,bjhd->bihd", probs, vh)
    return out.reshape(B, S, D).astype(q.dtype)


def prefill_write_kv(
    params,
    cfg: ModelConfig,
    prompts,
    prompt_lengths,
    write_kv_block: Callable,
):
    """Prefill: run the prompt block through all layers, writing each
    layer's K/V context via the backend callback.

    prompts: [M, S] int32 (padded; rows with prompt_lengths == 0 inert).
    write_kv_block(layer_idx, k [M,S,D], v [M,S,D]) -> None
    (the backend masks positions >= prompt_lengths itself).

    For the single-layer reference model this is projections only — no
    attention — matching fill_new_kt_v_cache
    (self_attention_inference_optimized.cu:27-85). Deeper stacks need the
    inter-layer causal attention to produce hidden states for later layers'
    K/V; the attention of the *last* layer during prefill is skipped (the
    first generated token comes from the decode step).
    """
    M, S = prompts.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (M, S))
    h = token_pos_embed(prompts, positions, params["wte"], params["wpe"])
    n_layers = len(params["layers"])
    D = h.shape[-1]
    for li, layer in enumerate(params["layers"]):
        x = layer_attn_input(layer, cfg, h)
        if "wkv" in layer:
            kv = feed_forward(x, layer["wkv"])
            k, v = kv[..., :D], kv[..., D:]
        else:
            k = feed_forward(x, layer["wk"])
            v = feed_forward(x, layer["wv"])
        write_kv_block(li, k, v)
        if li + 1 < n_layers:
            q = feed_forward(x, layer["wq"])
            attn_out = causal_masked_attention(q, k, v, prompt_lengths, cfg.n_heads)
            h = layer_post(layer, cfg, h, attn_out)

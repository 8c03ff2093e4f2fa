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


class SingleChipCtx:
    """Parallel context: the seams where tensor-parallel execution differs
    from single-chip. The model math below is written once against this
    interface; the tp variant (parallel/sharded.TpShardCtx) overrides the
    four seams with ICI collectives (all_gather / psum / pmax) and local
    head counts, so sharded and single-chip execution share ALL layer math
    (no forked implementations — the reference's parity-chain discipline,
    tests/inferencer_test.cpp:151-163, extended to the mesh)."""

    tp = 1

    def psum(self, x):
        """Reduce a row-parallel partial product (wo / w_down / logits)."""
        return x

    def pmax(self, x):
        """Max-reduce feature-sharded absmax (int8 per-page scales)."""
        return x

    def embed(self, params, tokens, positions):
        return token_pos_embed(tokens, positions, params["wte"], params["wpe"])

    def logits(self, h, wte):
        return tied_logits(h, wte)

    def local_heads(self, cfg: "ModelConfig") -> int:
        return cfg.n_heads


DEFAULT_CTX = SingleChipCtx()


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


def layer_post(layer, cfg: ModelConfig, h_in, attn_out, ctx=DEFAULT_CTX):
    """Combine attention output with the residual stream + optional FFN.
    Under tp, wo and w_down are row-parallel: their products are partial
    sums reduced by ctx.psum (Megatron-style)."""
    if cfg.use_output_proj:
        attn_out = ctx.psum(feed_forward(attn_out, layer["wo"]))
    if not _use_residual(cfg):
        return attn_out
    h = h_in + attn_out
    if cfg.ffn_dim > 0:
        h_norm = _maybe_layernorm(h, layer.get("ln2_g"), cfg)
        ffn = ctx.psum(
            feed_forward(
                feed_forward(h_norm, layer["w_up"], activation=jax.nn.gelu),
                layer["w_down"],
            )
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
    ctx=DEFAULT_CTX,
    next_token_fn: Callable | None = None,
    ablate: frozenset = frozenset(),
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
    next_token_fn(logits, lengths) -> (tok, new_lengths) overrides the
    greedy decoder (sampling — see ops/reference.sample_next_token).

    ablate: profiling-only phase knockouts ({"embed","qkv","attend",
    "logits","argmax"}); each skipped phase is replaced by a cheap
    data-dependent stand-in (so XLA cannot dead-code the rest of the
    round) with the SAME shapes/liveness schedule. Never set in
    production paths — it exists for in-burst A/B timing, the only
    reliable microbench on this transport (tools/burst_ablate.py).

    Returns (next_tokens [B], new_lengths [B]).
    """
    pos = jnp.maximum(lengths - 1, 0)
    with jax.named_scope("embed"):
        if "embed" in ablate:
            wte = params["wte"]
            h = jnp.broadcast_to(
                last_tokens[:, None], (last_tokens.shape[0], wte.shape[1])
            ).astype(wte.dtype)
        else:
            h = ctx.embed(params, last_tokens, pos)
    live = lengths > 0
    for li, layer in enumerate(params["layers"]):
        x = layer_attn_input(layer, cfg, h)
        with jax.named_scope(f"l{li}.qkv_proj"):
            if "qkv" in ablate:
                q = k = v = x
            elif "wqkv" in layer:
                # fused projection; under tp the local block is [q_l|k_l|v_l]
                # (fuse_qkv_params interleaves per rank) so thirds of the
                # LOCAL width split it on every topology
                qkv = feed_forward(x, layer["wqkv"])
                dl = qkv.shape[-1] // 3
                q, k, v = qkv[:, :dl], qkv[:, dl : 2 * dl], qkv[:, 2 * dl :]
            else:
                q = feed_forward(x, layer["wq"])
                k = feed_forward(x, layer["wk"])
                v = feed_forward(x, layer["wv"])
        with jax.named_scope(f"l{li}.write_kv"):
            write_kv(li, pos, k, v, live)
        with jax.named_scope(f"l{li}.attend"):
            attn_out = q if "attend" in ablate else attend(li, q, lengths)
        with jax.named_scope(f"l{li}.post"):
            h = layer_post(layer, cfg, h, attn_out, ctx)

    def _fabricated(tok_src):
        # stand-in decode: data-dependent token, greedy length rule
        tok = jnp.where(live, tok_src % cfg.eof_token_id, 0)
        new_lengths = jnp.where(live & (lengths + 1 < cfg.n_seq),
                                lengths + 1, 0)
        return tok, new_lengths

    with jax.named_scope("logits_argmax"):
        if "logits" in ablate:
            return _fabricated(last_tokens + 1)
        logits = ctx.logits(h, params["wte"])
        if "argmax" in ablate:
            return _fabricated(logits[:, 0].astype(jnp.int32))
        if next_token_fn is not None:
            return next_token_fn(logits, lengths)
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
    ctx=DEFAULT_CTX,
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
    with jax.named_scope("prefill.embed"):
        h = ctx.embed(params, prompts, positions)
    n_layers = len(params["layers"])
    for li, layer in enumerate(params["layers"]):
        x = layer_attn_input(layer, cfg, h)
        with jax.named_scope(f"prefill.l{li}.kv_proj"):
            if "wkv" in layer:
                # fused K|V projection; local block is [k_l|v_l] under tp
                kv = feed_forward(x, layer["wkv"])
                dl = kv.shape[-1] // 2
                k, v = kv[..., :dl], kv[..., dl:]
            else:
                k = feed_forward(x, layer["wk"])
                v = feed_forward(x, layer["wv"])
        with jax.named_scope(f"prefill.l{li}.write_kv"):
            write_kv_block(li, k, v)
        if li + 1 < n_layers:
            with jax.named_scope(f"prefill.l{li}.attn"):
                q = feed_forward(x, layer["wq"])
                attn_out = causal_masked_attention(
                    q, k, v, prompt_lengths, ctx.local_heads(cfg)
                )
                h = layer_post(layer, cfg, h, attn_out, ctx)

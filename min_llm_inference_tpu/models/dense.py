"""Dense (contiguous-KV) backend.

TPU-native analogue of the reference's contiguous backend
(SelfAttentionLayer + InferenceModel, src/layers.cpp:54-67,
src/inference_model.cpp:14-39): per-slot contiguous K/V caches
``[n_layers, n_slots, n_seq, emb]``. The reference stores K transposed
``[emb, n_seq]`` for coalesced GPU loads (self_attention_inference_optimized
.cu:19,82) — irrelevant on TPU, XLA picks layouts, so K is kept natural.

Two jitted entry points per config (the whole per-step device work is inside
jit — only token ids/lengths cross the host boundary, mirroring the
reference's 4-phase loop around kernel launches, src/inferencer.cpp:31-40):

  * ``prefill``: masked full-batch projection of new slots' prompts into the
    caches (analogue of inference_optimized_encoder + fill_new_kt_v_cache).
  * ``decode_rounds``: ``n_forward_rounds`` greedy decode steps under one
    ``lax.scan`` (analogue of the n_forward_rounds loop in
    inference_model.cpp:56-81, amortizing host round-trips).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..ops.reference import masked_attention
from .model import decode_round_tokens, prefill_write_kv


class DenseKVState(NamedTuple):
    k_cache: jax.Array  # [n_layers, n_slots, n_seq, emb]
    v_cache: jax.Array  # [n_layers, n_slots, n_seq, emb]


def init_dense_state(model_cfg: ModelConfig, engine_cfg: EngineConfig) -> DenseKVState:
    shape = (model_cfg.n_layers, engine_cfg.n_slots, model_cfg.n_seq, model_cfg.emb_dim)
    dtype = engine_cfg.kv_jax_dtype
    return DenseKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _prefill(model_cfg: ModelConfig, params, state: DenseKVState, prompts, prompt_lengths, slot_ids):
    """Compact prefill: write K/V for all prompt positions of the given
    slots. prompts: [M, S] int32; prompt_lengths: [M]; slot_ids: [M] int32
    (padding rows carry prompt_length 0 and slot_id n_slots => dropped).

    Deliberately the same compact [M, S] shape as the paged backend's
    prefill so both run bit-identical projection matmuls — a prerequisite
    for token-exact cross-backend parity (reference golden test,
    tests/inferencer_test.cpp:151-163).
    """
    S = prompts.shape[1]
    kc, vc = state
    pos_valid = jnp.arange(S, dtype=jnp.int32)[None, :] < prompt_lengths[:, None]
    upd = pos_valid[:, :, None]

    def write_kv_block(li, k, v):
        nonlocal kc, vc
        old_k = kc[li][slot_ids]  # padding slot_ids clamp; merged rows dropped
        old_v = vc[li][slot_ids]
        k = jnp.where(upd, k.astype(kc.dtype), old_k)
        v = jnp.where(upd, v.astype(vc.dtype), old_v)
        kc = kc.at[li, slot_ids].set(k, mode="drop")
        vc = vc.at[li, slot_ids].set(v, mode="drop")

    prefill_write_kv(params, model_cfg, prompts, prompt_lengths, write_kv_block)
    return DenseKVState(kc, vc)


def _decode_rounds(
    model_cfg: ModelConfig,
    n_rounds: int,
    params,
    state: DenseKVState,
    lengths,
    last_tokens,
):
    """n_rounds greedy decode steps; returns updated state + per-round
    results [B, n_rounds] (EMPTY_ROW_TOKEN_ID in dead rows)."""
    B = lengths.shape[0]
    batch_ix = jnp.arange(B)

    def round_fn(carry, _):
        kc, vc, lengths, last = carry

        def write_kv(li, pos, k, v, live):
            nonlocal kc, vc
            # Dead slots (pos clamped to 0) overwrite their own stale row 0:
            # harmless — reads are length-masked and re-prefill overwrites.
            kc = kc.at[li, batch_ix, pos].set(k.astype(kc.dtype))
            vc = vc.at[li, batch_ix, pos].set(v.astype(vc.dtype))

        def attend(li, q, lens):
            return masked_attention(q, kc[li], vc[li], lens, model_cfg.n_heads)

        tok, new_lengths = decode_round_tokens(
            params, model_cfg, lengths, last, write_kv, attend
        )
        new_last = jnp.where(lengths > 0, tok, last)
        return (kc, vc, new_lengths, new_last), tok

    (kc, vc, lengths, last), toks = jax.lax.scan(
        round_fn, (state.k_cache, state.v_cache, lengths, last_tokens), None,
        length=n_rounds,
    )
    return DenseKVState(kc, vc), lengths, last, toks.T  # [B, n_rounds]


@functools.lru_cache(maxsize=None)
def make_dense_fns(model_cfg: ModelConfig, engine_cfg: EngineConfig):
    """Build the two jitted step functions for a config pair."""
    prefill = jax.jit(
        functools.partial(_prefill, model_cfg), donate_argnums=(1,)
    )
    decode_rounds = jax.jit(
        functools.partial(_decode_rounds, model_cfg, engine_cfg.n_forward_rounds),
        donate_argnums=(1,),
    )
    return prefill, decode_rounds

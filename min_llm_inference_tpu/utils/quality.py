"""Quantization quality harness: teacher-forced perplexity deltas.

The north star bounds quantization damage as ΔPPL <= 0.1 with INT8 paged
KV (BASELINE.json). The reference has no tokenizer/dataset (synthetic
random weights throughout), so the harness measures perplexity the way the
framework is used: teacher-forcing token sequences through the *paged
decode machinery itself* — every K/V write goes through the same
(optionally quantized) page pipeline the engine uses — and comparing
average NLL/PPL between KV configurations on the same sequences.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models.model import layer_attn_input, layer_post
from ..models.paged import (
    PagedKVState,
    _flat_scatter_indices,
    _write_kv_tokens,
    decode_fresh_pid,
    init_paged_state,
    jnp_paged_attend,
)
from ..ops.reference import feed_forward, tied_logits, token_pos_embed


def teacher_forced_nll(
    params,
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    tokens: np.ndarray,   # [B, T] int32 (padded)
    lengths: np.ndarray,  # [B] int32 actual sequence lengths (>= 2)
):
    """Per-sequence summed negative log-likelihood of tokens[1:] given the
    prefix, computed step-by-step through the paged KV pipeline (so int8
    page quantization affects the result exactly as in serving).

    Returns (nll_sum [B], n_predicted [B])."""
    B, T = tokens.shape
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    W = engine_cfg.pages_per_slot(model_cfg.n_seq)
    assert NP >= B * W, "quality harness grants full pages per sequence"
    assert T <= model_cfg.n_seq

    page_table = jnp.asarray(
        np.arange(B * W, dtype=np.int32).reshape(B, W)
    )
    state = init_paged_state(model_cfg, engine_cfg)
    tokens_d = jnp.asarray(tokens)
    lengths_d = jnp.asarray(lengths)

    def step(carry, t):
        kv, nll = carry
        kv_pages = list(kv.kv_pages)
        k_scales, v_scales = list(kv.k_scales), list(kv.v_scales)
        tok_t = tokens_d[:, t]
        valid = t < lengths_d  # position t exists
        pos = jnp.full((B,), t, jnp.int32)
        h = token_pos_embed(tok_t, pos, params["wte"], params["wpe"])
        ctx_len = jnp.where(valid, t + 1, 0)
        flat_idx = _flat_scatter_indices(page_table, pos, valid, P, NP)
        fresh_pid = decode_fresh_pid(page_table, pos, valid, P, NP)

        for li, layer in enumerate(params["layers"]):
            x = layer_attn_input(layer, model_cfg, h)
            q = feed_forward(x, layer["wq"])
            k = feed_forward(x, layer["wk"])
            v = feed_forward(x, layer["wv"])
            kv_pages[li], k_scales[li], v_scales[li] = _write_kv_tokens(
                kv_pages[li], k_scales[li], v_scales[li],
                flat_idx, k, v, fresh_pid, n_heads=model_cfg.n_heads,
            )
            attn = jnp_paged_attend(
                kv_pages[li], k_scales[li], v_scales[li], q, ctx_len,
                page_table, P, model_cfg.n_heads,
            )
            h = layer_post(layer, model_cfg, h, attn)

        logits = tied_logits(h, params["wte"])  # [B, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        next_tok = tokens_d[:, jnp.minimum(t + 1, T - 1)]
        predict_valid = (t + 1) < lengths_d
        step_nll = -jnp.take_along_axis(logp, next_tok[:, None], axis=1)[:, 0]
        nll = nll + jnp.where(predict_valid, step_nll, 0.0)
        kv = PagedKVState(
            tuple(kv_pages), tuple(k_scales), tuple(v_scales)
        )
        return (kv, nll), None

    nll0 = jnp.zeros((B,), jnp.float32)
    (state, nll), _ = jax.lax.scan(
        jax.jit(step), (state, nll0), jnp.arange(T - 1)
    )
    n_pred = np.maximum(lengths - 1, 0)
    return np.asarray(nll), n_pred


def perplexity(params, model_cfg, engine_cfg, tokens, lengths) -> float:
    nll, n_pred = teacher_forced_nll(params, model_cfg, engine_cfg, tokens, lengths)
    total = n_pred.sum()
    return float(np.exp(nll.sum() / max(total, 1)))


def delta_ppl_kv(
    params,
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    tokens: np.ndarray,
    lengths: np.ndarray,
    kv_dtype: str = "int8",
) -> dict:
    """PPL with full-precision KV vs quantized (int8/int4) paged KV on the
    same sequences. Returns {"ppl_ref", "ppl_q", "delta_ppl"}."""
    import dataclasses

    ref_cfg = dataclasses.replace(engine_cfg, kv_dtype=model_cfg.dtype)
    q_cfg = dataclasses.replace(engine_cfg, kv_dtype=kv_dtype)
    ppl_ref = perplexity(params, model_cfg, ref_cfg, tokens, lengths)
    ppl_q = perplexity(params, model_cfg, q_cfg, tokens, lengths)
    return {
        "ppl_ref": ppl_ref,
        "ppl_q": ppl_q,
        "delta_ppl": ppl_q - ppl_ref,
    }


def delta_ppl_int8_kv(
    params,
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    tokens: np.ndarray,
    lengths: np.ndarray,
) -> dict:
    """PPL with full-precision KV vs INT8 paged KV on the same sequences.
    Returns {"ppl_ref", "ppl_int8", "delta_ppl"}."""
    r = delta_ppl_kv(params, model_cfg, engine_cfg, tokens, lengths, "int8")
    return {
        "ppl_ref": r["ppl_ref"],
        "ppl_int8": r["ppl_q"],
        "delta_ppl": r["delta_ppl"],
    }

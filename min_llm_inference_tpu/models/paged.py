"""Paged-KV backend.

TPU-native analogue of the reference's paged backends
(PagedAttentionLayer / PagedAttentionCublasLayer + the page-table machinery,
src/kernels/paged_attention.cu, include/paged_item_storage.h). The
reference's ``float**`` pointer page table becomes an **integer** page-index
table ``[n_slots, pages_per_slot]`` into pooled KV arrays
``[n_pages, page_size, emb]`` per layer — indices, not pointers, so the
table rides into jit/Pallas as data (and, in the fused kernel, as
scalar-prefetch SMEM operands — the analogue of the reference's
shared-memory ``page_pos`` caching trick, paged_attention.cu:38-44).

Two interchangeable attention implementations:
  * ``jnp``   — gathers pages to a contiguous per-slot view and reuses the
    dense masked attention: bitwise-identical math to the dense backend,
    which makes token-exact cross-backend parity tests possible (the
    reference's golden property, tests/inferencer_test.cpp:151-163).
  * ``pallas`` — fused paged-attention decode kernel (ops/paged_attention.py)
    that streams pages HBM->VMEM with double-buffered DMA; the analogue of
    the reference's fastest cuBLAS+warp-tiled backend.

Prefill is *compact*: only new slots (padded to a fixed bucket) are
projected and scattered into their pages — the analogue of the reference
prefill kernels gridding only over new items
(self_attention_inference_optimized.cu grid z = new item index).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..ops.quant import dequantize_rows, quantize_tokens_per_page
from ..ops.reference import masked_attention
from .model import decode_round_tokens, prefill_write_kv


class PagedKVState(NamedTuple):
    # tuples of per-layer arrays [n_pages, page_size, emb]; for int8 KV the
    # pages are int8 with one fp32 scale per PAGE in *_scales [n_pages]
    # (None entries when unquantized) — per-page scales ride into the
    # Pallas kernel as scalar prefetch, costing zero extra DMA
    k_pages: Tuple[jax.Array, ...]
    v_pages: Tuple[jax.Array, ...]
    k_scales: Tuple = ()
    v_scales: Tuple = ()


def init_paged_state(model_cfg: ModelConfig, engine_cfg: EngineConfig) -> PagedKVState:
    shape = (engine_cfg.n_pages, engine_cfg.page_size, model_cfg.emb_dim)
    dtype = engine_cfg.kv_jax_dtype
    L = model_cfg.n_layers
    k = tuple(jnp.zeros(shape, dtype) for _ in range(L))
    v = tuple(jnp.zeros(shape, dtype) for _ in range(L))
    if engine_cfg.kv_dtype == "int8":
        ks = tuple(jnp.zeros((engine_cfg.n_pages,), jnp.float32) for _ in range(L))
        vs = tuple(jnp.zeros((engine_cfg.n_pages,), jnp.float32) for _ in range(L))
        return PagedKVState(k, v, ks, vs)
    return PagedKVState(k, v, (None,) * L, (None,) * L)


def _flat_scatter_indices(page_rows, positions, valid, page_size, n_pages):
    """Map (slot-local) positions to flat token indices in the pooled KV.

    page_rows: [..., W] page-index rows; positions: [...] int32 token
    positions; valid: [...] bool. Invalid entries map out of range so the
    scatter drops them — crucial: a dead slot's stale page ids may now
    belong to another live slot, so dead writes must be dropped, not
    clamped.
    """
    page = jnp.take_along_axis(
        page_rows, (positions // page_size)[..., None], axis=-1
    )[..., 0]
    flat = page * page_size + positions % page_size
    return jnp.where(valid, flat, n_pages * page_size)


def _scatter_tokens(pool, flat_idx, values):
    """pool: [n_pages, P, D]; flat_idx: [N] (OOB = drop); values: [N, D]."""
    n_pages, P, D = pool.shape
    flat = pool.reshape(n_pages * P, D)
    flat = flat.at[flat_idx].set(values.astype(pool.dtype), mode="drop")
    return flat.reshape(n_pages, P, D)


def _write_tokens(pool, scales, flat_idx, values, positions):
    """Scatter token rows into the pool; int8 pools quantize against their
    page's scale (set when the page's row 0 is written — see
    quantize_tokens_per_page)."""
    if scales is None:
        return _scatter_tokens(pool, flat_idx, values), None
    P = pool.shape[1]
    q, scales = quantize_tokens_per_page(values, flat_idx, scales, P, positions)
    pool = _scatter_tokens(pool, flat_idx, q)
    return pool, scales


def gather_context(pool, page_table, page_size):
    """Gather each slot's pages into a contiguous [B, W*P, D] view.

    Stale/garbage table entries are clamped in-bounds by the gather; the
    gathered garbage is masked by `lengths` downstream.
    """
    n_pages, P, D = pool.shape
    B, W = page_table.shape
    flat = pool.reshape(n_pages * P, D)
    idx = page_table[:, :, None] * P + jnp.arange(P, dtype=page_table.dtype)[None, None, :]
    return flat[jnp.clip(idx.reshape(B, W * P), 0, n_pages * P - 1)]


def gather_scales(scales, page_table, page_size):
    """Expand per-page scales [n_pages] -> per-token [B, W*page_size]."""
    B, W = page_table.shape
    per_page = scales[jnp.clip(page_table, 0, scales.shape[0] - 1)]  # [B, W]
    return jnp.repeat(per_page, page_size, axis=1)


def _prefill(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    params,
    state: PagedKVState,
    prompts,       # [M, S] int32, compact new slots (padded rows: length 0)
    prompt_lengths,  # [M] int32
    page_rows,     # [M, W] int32 page-table rows of those slots
):
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    M, S = prompts.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (M, S))
    valid = positions < prompt_lengths[:, None]
    rows3 = jnp.broadcast_to(page_rows[:, None, :], (M, S, page_rows.shape[1]))
    flat_idx = _flat_scatter_indices(rows3, positions, valid, P, NP).reshape(-1)

    k_pages = list(state.k_pages)
    v_pages = list(state.v_pages)
    k_scales = list(state.k_scales)
    v_scales = list(state.v_scales)

    flat_positions = positions.reshape(-1)

    def write_kv_block(li, k, v):
        D = k.shape[-1]
        k_pages[li], k_scales[li] = _write_tokens(
            k_pages[li], k_scales[li], flat_idx, k.reshape(-1, D), flat_positions
        )
        v_pages[li], v_scales[li] = _write_tokens(
            v_pages[li], v_scales[li], flat_idx, v.reshape(-1, D), flat_positions
        )

    prefill_write_kv(params, model_cfg, prompts, prompt_lengths, write_kv_block)
    return PagedKVState(
        tuple(k_pages), tuple(v_pages), tuple(k_scales), tuple(v_scales)
    )


def _decode_rounds(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    attention_impl: str,
    params,
    state: PagedKVState,
    sched_packed,  # [B, 2+W] int32: col0 len-update (-1 = keep), col1
                   # last-token-update, cols 2: the page table. One packed
                   # upload carries every scheduler decision per host step.
    lengths,      # [B] int32 (device-chained)
    last_tokens,  # [B] int32 (device-chained)
):
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    B = lengths.shape[0]
    upd = sched_packed[:, 0]
    lengths = jnp.where(upd >= 0, upd, lengths)
    last_tokens = jnp.where(upd >= 0, sched_packed[:, 1], last_tokens)
    page_table = sched_packed[:, 2:]

    if attention_impl == "pallas":
        from ..ops.paged_attention import paged_decode_attention

        # Pallas compiles natively on TPU (incl. the tunneled "axon"
        # platform); on CPU (tests) it runs in interpreter mode. Decided at
        # trace time — the backend is static.
        interpret = jax.default_backend() == "cpu"

        def attend_impl(kp, vp, ks, vs, q, lens):
            return paged_decode_attention(
                q, kp, vp, lens, page_table,
                k_scales=ks, v_scales=vs,
                n_heads=model_cfg.n_heads, interpret=interpret,
            ).astype(q.dtype)
    else:
        def attend_impl(kp, vp, ks, vs, q, lens):
            kctx = gather_context(kp, page_table, P)
            vctx = gather_context(vp, page_table, P)
            if ks is not None:
                kctx = dequantize_rows(kctx, gather_scales(ks, page_table, P))
                vctx = dequantize_rows(vctx, gather_scales(vs, page_table, P))
            return masked_attention(q, kctx, vctx, lens, model_cfg.n_heads)

    def round_fn(carry, _):
        k_pages, v_pages, k_scales, v_scales, lengths, last = carry
        k_pages, v_pages = list(k_pages), list(v_pages)
        k_scales, v_scales = list(k_scales), list(v_scales)
        live = lengths > 0
        pos = jnp.maximum(lengths - 1, 0)
        flat_idx = _flat_scatter_indices(page_table, pos, live, P, NP)

        def write_kv(li, pos_, k, v, live_):
            k_pages[li], k_scales[li] = _write_tokens(
                k_pages[li], k_scales[li], flat_idx, k, pos
            )
            v_pages[li], v_scales[li] = _write_tokens(
                v_pages[li], v_scales[li], flat_idx, v, pos
            )

        def attend(li, q, lens):
            return attend_impl(
                k_pages[li], v_pages[li], k_scales[li], v_scales[li], q, lens
            )

        tok, new_lengths = decode_round_tokens(
            params, model_cfg, lengths, last, write_kv, attend
        )
        new_last = jnp.where(live, tok, last)
        return (
            tuple(k_pages), tuple(v_pages), tuple(k_scales), tuple(v_scales),
            new_lengths, new_last,
        ), tok

    (kps, vps, kss, vss, lengths, last), toks = jax.lax.scan(
        round_fn,
        (state.k_pages, state.v_pages, state.k_scales, state.v_scales,
         lengths, last_tokens),
        None,
        length=engine_cfg.n_forward_rounds,
    )
    return PagedKVState(kps, vps, kss, vss), lengths, last, toks.T


@functools.lru_cache(maxsize=None)
def make_paged_fns(model_cfg: ModelConfig, engine_cfg: EngineConfig, attention_impl: str = "jnp"):
    prefill = jax.jit(
        functools.partial(_prefill, model_cfg, engine_cfg), donate_argnums=(1,)
    )
    decode_rounds = jax.jit(
        functools.partial(_decode_rounds, model_cfg, engine_cfg, attention_impl),
        donate_argnums=(1,),
    )
    return prefill, decode_rounds

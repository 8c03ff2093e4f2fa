"""Paged-KV backend.

TPU-native analogue of the reference's paged backends
(PagedAttentionLayer / PagedAttentionCublasLayer + the page-table machinery,
src/kernels/paged_attention.cu, include/paged_item_storage.h). The
reference's ``float**`` pointer page table becomes an **integer** page-index
table ``[n_slots, pages_per_slot]`` into a pooled KV array — indices, not
pointers, so the table rides into jit/Pallas as data (and, in the fused
kernel, as scalar-prefetch SMEM operands — the analogue of the reference's
shared-memory ``page_pos`` caching trick, paged_attention.cu:38-44).

K and V live in ONE pool per layer, ``[n_pages, 2, page_size, emb]``
(index 0 = K rows, 1 = V rows) — the TPU analogue of the reference packing
(inp_emb, k, v) sub-buffers into a single page allocation
(include/constants.h page-table offsets, include/utils.h:32-44). One page
fetch delivers K and V together (one DMA instead of two in the decode
kernel — the decode path is DMA-latency-bound), and one scatter + one
quantize pass writes both.

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
from ..ops.quant import (
    dequantize_rows,
    kv_qmax,
    pack_int4_rows,
    quantize_rows_against_pages,
    unpack_int4,
    update_page_scales,
)
from ..ops.reference import masked_attention
from .model import DEFAULT_CTX, decode_round_tokens, prefill_write_kv


class PagedKVState(NamedTuple):
    # tuples of per-layer pools [n_pages, 2, page_size, emb] (0=K, 1=V); for
    # int8 KV the pools are int8 with one fp32 scale per page per side in
    # k_scales/v_scales [n_pages] (None entries when unquantized) —
    # per-page scales ride into the Pallas kernel as scalar prefetch,
    # costing zero extra DMA
    kv_pages: Tuple[jax.Array, ...]
    k_scales: Tuple = ()
    v_scales: Tuple = ()


def init_paged_state(model_cfg: ModelConfig, engine_cfg: EngineConfig) -> PagedKVState:
    # int4 pools store two nibbles per int8 byte -> half the feature width
    feat = model_cfg.emb_dim // 2 if engine_cfg.kv_packed else model_cfg.emb_dim
    shape = (engine_cfg.n_pages, 2, engine_cfg.page_size, feat)
    dtype = engine_cfg.kv_jax_dtype
    L = model_cfg.n_layers
    kv = tuple(jnp.zeros(shape, dtype) for _ in range(L))
    if engine_cfg.kv_quantized:
        ks = tuple(jnp.zeros((engine_cfg.n_pages,), jnp.float32) for _ in range(L))
        vs = tuple(jnp.zeros((engine_cfg.n_pages,), jnp.float32) for _ in range(L))
        return PagedKVState(kv, ks, vs)
    return PagedKVState(kv, (None,) * L, (None,) * L)


def _flat_scatter_indices(page_rows, positions, valid, page_size, n_pages):
    """Map (slot-local) positions to flat TOKEN indices (page*P + row).

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


def _kv_row_indices(flat_idx, page_size):
    """Token flat idx (page*P + row) -> (k_row, v_row) into the pooled
    [n_pages*2*P, D] flat view. OOB token indices stay OOB."""
    page = flat_idx // page_size
    row = flat_idx % page_size
    k_row = page * (2 * page_size) + row
    return k_row, k_row + page_size


def _scatter_kv(pool, flat_idx, k, v):
    """pool: [NP, 2, P, D]; flat_idx: [N] token indices (OOB = drop);
    k/v: [N, D]. One scatter writes both sides."""
    NP_, _, P, D = pool.shape
    flat = pool.reshape(NP_ * 2 * P, D)
    ki, vi = _kv_row_indices(flat_idx, P)
    idx = jnp.concatenate([ki, vi])
    vals = jnp.concatenate([k, v]).astype(pool.dtype)
    return flat.at[idx].set(vals, mode="drop").reshape(NP_, 2, P, D)


def _write_kv_tokens(pool, k_scales, v_scales, flat_idx, k, v, fresh_pid,
                     scale_reduce=None, n_heads: int = 1):
    """Scatter K and V token rows into the pool (one pass). For int8/int4
    pools, pages listed in fresh_pid (their row 0 is among these writes)
    get their scale reset from that row's absmax (see
    quant.update_page_scales); all rows quantize against the resulting
    per-page scales. int4 pools (feature width D/2) pack two nibbles per
    byte after quantization.

    fresh_pid: [N] page id per row if that row starts its page, else OOB.
    scale_reduce: cross-rank absmax reduce under tp (see update_page_scales).
    """
    if k_scales is None:
        return _scatter_kv(pool, flat_idx, k, v), None, None
    P = pool.shape[2]
    packed = pool.shape[-1] * 2 == k.shape[-1]
    qmax = kv_qmax(packed)
    k_scales = update_page_scales(k_scales, k, fresh_pid, scale_reduce, qmax)
    v_scales = update_page_scales(v_scales, v, fresh_pid, scale_reduce, qmax)
    qk = quantize_rows_against_pages(k, flat_idx, k_scales, P, qmax)
    qv = quantize_rows_against_pages(v, flat_idx, v_scales, P, qmax)
    if packed:
        qk = pack_int4_rows(qk, n_heads)
        qv = pack_int4_rows(qv, n_heads)
    return _scatter_kv(pool, flat_idx, qk, qv), k_scales, v_scales


def decode_fresh_pid(page_table, pos, live, page_size, n_pages):
    """Page id to (re)set the scale of during a decode append: the write
    lands on the page's row 0 (pos % P == 0) of a live slot; OOB = none."""
    page = jnp.take_along_axis(
        page_table, (pos // page_size)[..., None], axis=-1
    )[..., 0]
    return jnp.where(live & (pos % page_size == 0), page, n_pages)


def gather_kv_context(pool, page_table, page_size):
    """Gather each slot's pages into contiguous per-slot views.

    pool: [NP, 2, P, D] -> (k_ctx, v_ctx) each [B, W*P, D]. Stale/garbage
    table entries are clamped in-bounds by the gather; the gathered garbage
    is masked by `lengths` downstream.
    """
    NP_, _, P, D = pool.shape
    B, W = page_table.shape
    flat = pool.reshape(NP_ * 2 * P, D)
    base = jnp.clip(page_table, 0, NP_ - 1)[:, :, None] * (2 * P)
    offs = jnp.arange(P, dtype=page_table.dtype)[None, None, :]
    kidx = (base + offs).reshape(B, W * P)
    return flat[kidx], flat[kidx + P]


def gather_scales(scales, page_table, page_size):
    """Expand per-page scales [n_pages] -> per-token [B, W*page_size]."""
    B, W = page_table.shape
    per_page = scales[jnp.clip(page_table, 0, scales.shape[0] - 1)]  # [B, W]
    return jnp.repeat(per_page, page_size, axis=1)


def combine_kv_pools(k_pages, v_pages):
    """[NP, P, D] x2 -> pooled [NP, 2, P, D] (test/fixture helper)."""
    return jnp.stack([k_pages, v_pages], axis=1)


def make_prefill_kv_writer(
    state: PagedKVState,
    page_rows,        # [M, W] page-table rows of the new slots
    prompt_lengths,   # [M] int32 (0 = inert padding row)
    s_pre: int,       # prompt-block width (prompts.shape[1])
    page_size: int,
    n_pages: int,
    scale_reduce=None,
    n_heads: int = 1,  # for int4 nibble packing (per-head halves)
):
    """Build the write_kv_block callback for prefill_write_kv over this
    paged state. Prefill writes whole pages starting at their row 0, so the
    fresh rows are the STATIC stride-P slices of the block — the per-page
    scale needs absmax over M*ceil(S/P) rows, not all M*S rows.

    When the block width is a page multiple the write is PAGE-granular:
    each covered page lands as one [P, D] window scatter instead of P
    row-indexed scatters (measured 7.8 ms -> sub-ms for the bench's
    [256, 64] int8 block — XLA's scatter cost is per *index*, so moving
    64x more bytes per index wins; the same economics as the reference's
    coalesced prefill stores, self_attention_inference_optimized.cu:27-85).
    Rows past prompt_length inside a covered page carry garbage — every
    consumer masks by length, and decode appends overwrite them in turn.

    Returns (write_kv_block, finalize) where finalize() -> new PagedKVState.
    """
    kv_pages = list(state.kv_pages)
    k_scales = list(state.k_scales)
    v_scales = list(state.v_scales)
    P = page_size
    M = page_rows.shape[0]
    fresh_pid = prefill_fresh_pid(page_rows, prompt_lengths, s_pre, P, n_pages)
    paged_write = s_pre % P == 0
    if paged_write:
        W_pre = s_pre // P
        covered = (
            jnp.arange(W_pre, dtype=jnp.int32)[None, :] * P
            < prompt_lengths[:, None]
        )  # [M, W_pre]
        pid = jnp.where(covered, page_rows[:, :W_pre], n_pages)
        # flat [(NP*2), P, D] window index: page p side s -> p*2 + s
        k_win = jnp.where(covered, pid * 2, 2 * n_pages).reshape(-1)
        v_win = jnp.where(covered, pid * 2 + 1, 2 * n_pages).reshape(-1)
        safe_pid = jnp.clip(pid, 0, n_pages - 1)
    else:
        positions = jnp.broadcast_to(
            jnp.arange(s_pre, dtype=jnp.int32)[None, :], (M, s_pre)
        )
        valid = positions < prompt_lengths[:, None]
        rows3 = jnp.broadcast_to(
            page_rows[:, None, :], (M, s_pre, page_rows.shape[1])
        )
        flat_idx = _flat_scatter_indices(
            rows3, positions, valid, P, n_pages
        ).reshape(-1)

    def scatter_pages(pool, k, v):
        # k/v: [M, S, D] already pool-dtype; one [P, D]-window scatter per
        # covered page per side
        D = k.shape[-1]
        flat = pool.reshape(n_pages * 2, P, D)
        vals = jnp.concatenate(
            [k.reshape(-1, P, D), v.reshape(-1, P, D)]
        ).astype(pool.dtype)
        idx = jnp.concatenate([k_win, v_win])
        return flat.at[idx].set(vals, mode="drop").reshape(pool.shape)

    def write_kv_block(li, k, v):
        # k/v: [M, S, D]
        D = k.shape[-1]
        if k_scales[li] is None:
            if paged_write:
                kv_pages[li] = scatter_pages(kv_pages[li], k, v)
            else:
                kv_pages[li] = _scatter_kv(
                    kv_pages[li], flat_idx, k.reshape(-1, D), v.reshape(-1, D)
                )
            return
        packed = kv_pages[li].shape[-1] * 2 == D
        qmax = kv_qmax(packed)
        k_scales[li] = update_page_scales(
            k_scales[li], k[:, ::P].reshape(-1, D), fresh_pid, scale_reduce,
            qmax,
        )
        v_scales[li] = update_page_scales(
            v_scales[li], v[:, ::P].reshape(-1, D), fresh_pid, scale_reduce,
            qmax,
        )
        if packed:
            # quantize to nibble range, pack two-per-byte, window-scatter
            # the packed [P, D/2] pages (the fused Pallas prefill kernel is
            # int8-only; packed blocks are half the bytes anyway)
            if paged_write:
                qk = _quantize_block_per_page(k, k_scales[li], safe_pid, P, qmax)
                qv = _quantize_block_per_page(v, v_scales[li], safe_pid, P, qmax)
                kv_pages[li] = scatter_pages(
                    kv_pages[li],
                    pack_int4_rows(qk, n_heads), pack_int4_rows(qv, n_heads),
                )
            else:
                qk = quantize_rows_against_pages(
                    k.reshape(-1, D), flat_idx, k_scales[li], P, qmax
                )
                qv = quantize_rows_against_pages(
                    v.reshape(-1, D), flat_idx, v_scales[li], P, qmax
                )
                kv_pages[li] = _scatter_kv(
                    kv_pages[li], flat_idx,
                    pack_int4_rows(qk, n_heads), pack_int4_rows(qv, n_heads),
                )
            return
        if paged_write:
            interpret = jax.default_backend() == "cpu"
            if interpret or (P % 32 == 0 and D % 128 == 0):
                # fused Pallas quantize+page-scatter: one pass over the
                # block instead of quantize-materialize + window scatter
                # (hardware path needs full int8 tiles per page)
                from ..ops.prefill_scatter import prefill_quant_scatter

                def inv(s):
                    sp = s[safe_pid]
                    return jnp.where(
                        sp > 0, 1.0 / jnp.maximum(sp, 1e-30), 0.0
                    )

                kv_pages[li] = prefill_quant_scatter(
                    kv_pages[li], k, v, pid,
                    inv(k_scales[li]), inv(v_scales[li]),
                    interpret=interpret,
                )
            else:
                qk = _quantize_block_per_page(k, k_scales[li], safe_pid, P)
                qv = _quantize_block_per_page(v, v_scales[li], safe_pid, P)
                kv_pages[li] = scatter_pages(kv_pages[li], qk, qv)
        else:
            qk = quantize_rows_against_pages(
                k.reshape(-1, D), flat_idx, k_scales[li], P
            )
            qv = quantize_rows_against_pages(
                v.reshape(-1, D), flat_idx, v_scales[li], P
            )
            kv_pages[li] = _scatter_kv(kv_pages[li], flat_idx, qk, qv)

    def finalize() -> PagedKVState:
        return PagedKVState(tuple(kv_pages), tuple(k_scales), tuple(v_scales))

    return write_kv_block, finalize


def _quantize_block_per_page(x, page_scales, safe_pid, page_size,
                             qmax=127.0):
    """Quantize a [M, W_pre*P, D] prefill block against per-page scales
    gathered at safe_pid [M, W_pre]."""
    M, S, D = x.shape
    W_pre = S // page_size
    s = page_scales[safe_pid]  # [M, W_pre]
    inv = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    xf = x.reshape(M, W_pre, page_size, D).astype(jnp.float32)
    q = jnp.clip(
        jnp.round(xf * inv[:, :, None, None]), -qmax, qmax
    ).astype(jnp.int8)
    return q.reshape(M, S, D)


def prefill_fresh_pid(page_rows, prompt_lengths, s_pre, page_size, n_pages):
    """Fresh-page ids for a compact prefill block: positions 0, P, 2P, ...
    < prompt_length start their pages. page_rows: [M, W]. Returns [M*F]."""
    F = -(-s_pre // page_size)  # ceil
    fresh_positions = jnp.arange(F, dtype=jnp.int32) * page_size
    valid = fresh_positions[None, :] < prompt_lengths[:, None]  # [M, F]
    pid = jnp.where(valid, page_rows[:, :F], n_pages)
    return pid.reshape(-1)


def _prefill(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    params,
    state: PagedKVState,
    prompts,       # [M, S] int32, compact new slots (padded rows: length 0)
    prompt_lengths,  # [M] int32
    page_rows,     # [M, W] int32 page-table rows of those slots
    ctx=DEFAULT_CTX,
):
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    M, S = prompts.shape
    scale_reduce = ctx.pmax if ctx.tp > 1 else None
    write_kv_block, finalize = make_prefill_kv_writer(
        state, page_rows, prompt_lengths, S, P, NP, scale_reduce,
        n_heads=ctx.local_heads(model_cfg),
    )
    prefill_write_kv(
        params, model_cfg, prompts, prompt_lengths, write_kv_block, ctx
    )
    return finalize()


def jnp_paged_attend(pool, ks, vs, q, lengths, page_table, page_size, n_heads):
    """The gather-based (oracle) paged attention for one layer."""
    kctx, vctx = gather_kv_context(pool, page_table, page_size)
    if pool.shape[-1] * 2 == q.shape[-1]:
        # packed int4 pool: two nibbles per byte, per-head lo/hi halves
        kctx = unpack_int4(kctx, n_heads)
        vctx = unpack_int4(vctx, n_heads)
    if ks is not None:
        kctx = dequantize_rows(kctx, gather_scales(ks, page_table, page_size))
        vctx = dequantize_rows(vctx, gather_scales(vs, page_table, page_size))
    return masked_attention(q, kctx, vctx, lengths, n_heads)


def make_attend_impl(model_cfg: ModelConfig, engine_cfg: EngineConfig,
                     attention_impl: str, page_table, n_heads=None,
                     contiguous_pages: bool = False):
    """attend(pool, ks, vs, q, lengths) for a fixed page table, dispatching
    to the fused Pallas kernel (one-slot or grouped grid) or the jnp oracle.
    n_heads overrides the model's head count (tp ranks attend over their
    local heads). contiguous_pages: caller guarantees every table row is a
    consecutive page range (AutonomousEngine group allocator) — the
    grouped kernel then fetches multi-page runs with one DMA."""
    P = engine_cfg.page_size
    n_heads = n_heads or model_cfg.n_heads
    if attention_impl in ("pallas", "grouped"):
        # Pallas compiles natively on TPU (incl. the tunneled "axon"
        # platform); on CPU (tests) it runs in interpreter mode. Decided at
        # trace time — the backend is static.
        interpret = jax.default_backend() == "cpu"
        if attention_impl == "grouped":
            from ..ops.paged_attention_grouped import (
                paged_decode_attention_grouped,
            )
            kernel = functools.partial(
                paged_decode_attention_grouped,
                contiguous_pages=contiguous_pages,
                group_size=engine_cfg.attn_group_size,
                pages_per_dma=(
                    engine_cfg.pages_per_dma if contiguous_pages else None
                ),
                packed_int4=engine_cfg.kv_packed,
            )
        else:
            assert not engine_cfg.kv_packed, (
                "int4 KV is supported by attention='grouped' or 'jnp' only"
            )
            from ..ops.paged_attention import paged_decode_attention as kernel

        def attend(pool, ks, vs, q, lens):
            return kernel(
                q, pool, lens, page_table, k_scales=ks, v_scales=vs,
                n_heads=n_heads, interpret=interpret,
            ).astype(q.dtype)
    else:
        def attend(pool, ks, vs, q, lens):
            return jnp_paged_attend(
                pool, ks, vs, q, lens, page_table, P, n_heads
            )

    return attend


def make_round_kv_callbacks(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    attention_impl: str,
    page_table,
    kv_pages: list,
    k_scales: list,
    v_scales: list,
    lengths,
    n_heads=None,
    scale_reduce=None,
    contiguous_pages: bool = False,
    ablate: frozenset = frozenset(),
):
    """Build the (write_kv, attend) pair for ONE decode round, mutating the
    per-layer kv_pages/k_scales/v_scales lists in place.

    For the grouped Pallas kernel the decode KV write is FUSED into the
    attention call: write_kv only pre-updates fresh pages' scales (tiny
    scalar scatter) and stashes the raw K/V rows; attend hands them to the
    kernel, which quantizes + inserts the row into the already-fetched page
    and writes the page back to the aliased pool — eliminating the XLA
    per-row scatter (~0.39 ms/round fixed cost at bench shapes). Other
    impls keep the scatter-then-attend path. Both are token-exact equal
    (tests/test_paged_attention_kernel.py fused-write cases)."""
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    heads = n_heads or model_cfg.n_heads
    live = lengths > 0
    pos = jnp.maximum(lengths - 1, 0)
    fresh_pid = decode_fresh_pid(page_table, pos, live, P, NP)

    if attention_impl == "grouped":
        from ..ops.paged_attention_grouped import (
            paged_decode_attention_grouped,
        )
        from ..ops.quant import update_page_scales

        interpret = jax.default_backend() == "cpu"
        pending = {}

        qmax = kv_qmax(engine_cfg.kv_packed)

        def write_kv(li, pos_, k, v, live_):
            if "kvwrite" in ablate:
                # profiling knockout (tools/burst_ablate.py): kernel runs
                # read-only — no scale update, no fused row insert
                pending[li] = (None, None)
                return
            if k_scales[li] is not None and "scales" not in ablate:
                k_scales[li] = update_page_scales(
                    k_scales[li], k, fresh_pid, scale_reduce, qmax
                )
                v_scales[li] = update_page_scales(
                    v_scales[li], v, fresh_pid, scale_reduce, qmax
                )
            pending[li] = (k, v)

        def attend(li, q, lens):
            k, v = pending.pop(li)
            out = paged_decode_attention_grouped(
                q, kv_pages[li], lens, page_table,
                k_scales[li], v_scales[li], k, v,
                n_heads=heads, contiguous_pages=contiguous_pages,
                group_size=engine_cfg.attn_group_size,
                pages_per_dma=(
                    engine_cfg.pages_per_dma if contiguous_pages else None
                ),
                max_run_pages=(page_table.shape[1] // 2
                               if engine_cfg.overcommit else None),
                packed_int4=engine_cfg.kv_packed,
                interpret=interpret,
            )
            if k is not None:
                out, kv_pages[li] = out
            return out.astype(q.dtype)

        return write_kv, attend

    flat_idx = _flat_scatter_indices(page_table, pos, live, P, NP)
    attend_impl = make_attend_impl(
        model_cfg, engine_cfg, attention_impl, page_table, n_heads=n_heads,
        contiguous_pages=contiguous_pages,
    )

    def write_kv(li, pos_, k, v, live_):
        if "kvwrite" in ablate:
            return
        kv_pages[li], k_scales[li], v_scales[li] = _write_kv_tokens(
            kv_pages[li], k_scales[li], v_scales[li],
            flat_idx, k, v, fresh_pid, scale_reduce, n_heads=heads,
        )

    def attend(li, q, lens):
        return attend_impl(kv_pages[li], k_scales[li], v_scales[li], q, lens)

    return write_kv, attend


def ring_pad_rows(n_forward_rounds: int) -> int:
    """Ring rows: one per decode round, padded to a multiple of 8 so the
    [G, R, 2*Dk] kernel block keeps full sublane tiles and the page-block
    concat stays tile-aligned."""
    return max(8, -(-n_forward_rounds // 8) * 8)


def make_ring_round_callbacks(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    page_table,
    kv_pages: list,
    k_scales: list,
    v_scales: list,
    rings: list,      # per-layer [B, R, 2*Dk], mutated in place
    ring_scs: list,   # per-layer [B, 128] f32 scale cols (quantized only)
    lengths,
    ring_start,       # [B] i32, fixed for the whole burst (burst-start len - 1)
    round_idx,        # [] i32 — ring column written this round
    ring_r0=None,     # [B] i32 — first valid ring column per slot (the
                      # absolute round its occupant was admitted; burst-wide
                      # rings under sub-burst admission). None = column 0.
    n_heads=None,
    scale_reduce=None,
    contiguous_pages: bool = False,
    ablate: frozenset = frozenset(),
):
    """Ring-mode (write_kv, attend) for ONE decode round of a burst.

    The decode KV write becomes ONE dynamic-update-slice into the per-layer
    ring (the K|V row quantized in XLA against the per-page scales, exactly
    the bytes the flush lands in the pool) instead of a full-page in-kernel
    write-back every round; the kernel reads the pool read-only (pages hold
    positions < ring_start) and scores the ring as extra columns
    concatenated onto each slot's page block. The pool is updated ONCE per
    burst (ops/ring_flush.ring_flush). Token-exact vs the scatter and
    fused-write paths (same quantized values, same masks)."""
    from ..ops.paged_attention_grouped import paged_decode_attention_grouped

    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    heads = n_heads or model_cfg.n_heads
    live = lengths > 0
    pos = jnp.maximum(lengths - 1, 0)
    fresh_pid = decode_fresh_pid(page_table, pos, live, P, NP)
    flat_idx = _flat_scatter_indices(page_table, pos, live, P, NP)
    quantized = engine_cfg.kv_quantized
    qmax = kv_qmax(engine_cfg.kv_packed)
    interpret = jax.default_backend() == "cpu"

    def write_kv(li, pos_, k, v, live_):
        if "kvwrite" in ablate:
            return
        if quantized:
            if "scales" not in ablate:
                k_scales[li] = update_page_scales(
                    k_scales[li], k, fresh_pid, scale_reduce, qmax
                )
                v_scales[li] = update_page_scales(
                    v_scales[li], v, fresh_pid, scale_reduce, qmax
                )
            # quantize against THIS row's page scale; record the scale in
            # the carried [B, 128] column buffer (col r = K, 64 + r = V) —
            # the column is read only from this round on, by which time the
            # scale is final (fresh pages reset exactly at their row 0)
            pidr = jnp.clip(flat_idx // P, 0, NP - 1)
            sk = k_scales[li][pidr]
            sv = v_scales[li][pidr]

            def quant(x, s):
                inv = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-30), 0.0)
                return jnp.clip(
                    jnp.round(x.astype(jnp.float32) * inv[:, None]),
                    -qmax, qmax,
                ).astype(jnp.int8)

            qk, qv = quant(k, sk), quant(v, sv)
            # int4 pools: the ring stores UNPACKED nibble values (one int8
            # per feature). Packing here forced merge_ring_partial to
            # unpack the whole ring every round — measured as the int4
            # ring path collapsing to 311k vs 485k tok/s no-ring
            # (INT4_r05.json). The flush packs ONCE per burst instead.
            # "ringdus" knockout: STATIC-index updates (column 0) instead
            # of the scan-counter index — isolates whether dynamic-start
            # update-slices defeat XLA's in-place donation on the carried
            # ring (timing only; contents wrong)
            zero = jnp.zeros((), jnp.int32)
            r_ix = zero if "ringdus" in ablate else round_idx
            sc = ring_scs[li]
            sc = jax.lax.dynamic_update_slice(
                sc, sk[:, None], (zero, r_ix))
            ring_scs[li] = jax.lax.dynamic_update_slice(
                sc, sv[:, None], (zero, 64 + r_ix))
        else:
            qk = k.astype(rings[li].dtype)
            qv = v.astype(rings[li].dtype)
            zero = jnp.zeros((), jnp.int32)
            r_ix = zero if "ringdus" in ablate else round_idx
        row = jnp.concatenate([qk, qv], axis=-1)[:, None, :]  # [B, 1, 2Dk]
        rings[li] = jax.lax.dynamic_update_slice(
            rings[li], row, (zero, r_ix, zero)
        )

    def attend(li, q, lens):
        # page partial from the kernel (pool read-only, positions < rs)
        max_run = (page_table.shape[1] // 2
                   if engine_cfg.overcommit else None)
        if engine_cfg.attn_dgrid and contiguous_pages:
            # dense-grid Pallas partial: block-pipelined pool stream over
            # the full-grant group view, constant ops per group block
            # (ops/paged_attention_dgrid.py)
            from ..ops.paged_attention_dgrid import dgrid_paged_partial

            o_p, m_p, l_p = dgrid_paged_partial(
                q, kv_pages[li],
                k_scales[li] if quantized else None,
                v_scales[li] if quantized else None,
                ring_start, lens, page_table,
                n_heads=heads, page_size=P,
                group_block=engine_cfg.dgrid_block,
                interpret=interpret,
            )
        elif engine_cfg.attn_dense and contiguous_pages:
            # dense-view XLA partial over the full-grant group layout —
            # zero per-slot ops (the gpt2s op-floor fix; see
            # ops/paged_attention_dense.py for the measured trade)
            from ..ops.paged_attention_dense import (
                dense_paged_partial_bucketed,
            )

            o_p, m_p, l_p = dense_paged_partial_bucketed(
                q, kv_pages[li],
                k_scales[li] if quantized else None,
                v_scales[li] if quantized else None,
                ring_start, lens, page_table,
                n_heads=heads, page_size=P,
                packed_int4=engine_cfg.kv_packed,
            )
        elif engine_cfg.attn_flat and contiguous_pages:
            from ..ops.paged_attention_flat import (
                paged_decode_attention_flat,
            )

            o_p, m_p, l_p = paged_decode_attention_flat(
                q, kv_pages[li], lens, page_table,
                k_scales[li], v_scales[li], ring_start,
                n_heads=heads,
                group_size=engine_cfg.attn_group_size,
                pages_per_dma=engine_cfg.pages_per_dma,
                max_run_pages=max_run,
                packed_int4=engine_cfg.kv_packed,
                interpret=interpret,
            )
        else:
            o_p, m_p, l_p = paged_decode_attention_grouped(
                q, kv_pages[li], lens, page_table,
                k_scales[li], v_scales[li],
                ring_start=ring_start,
                n_heads=heads, contiguous_pages=contiguous_pages,
                group_size=engine_cfg.attn_group_size,
                pages_per_dma=(
                    engine_cfg.pages_per_dma if contiguous_pages else None
                ),
                max_run_pages=max_run,
                packed_int4=engine_cfg.kv_packed,
                interpret=interpret,
            )
        return merge_ring_partial(
            o_p, m_p, l_p, q, rings[li],
            ring_scs[li] if quantized else None,
            # packed=False even for int4 pools: the ring rides unpacked
            # (see write_kv) so the merge reads it like an int8 ring
            ring_start, lens, heads, False,
            ring_r0=ring_r0,
        ).astype(q.dtype)

    return write_kv, attend


def pack_ring_for_flush(ring, n_heads: int):
    """[B, R, 2*D] unpacked int4-value ring -> [B, R, D] packed (two
    nibbles per byte, per-head halves) for the page flush. Runs ONCE per
    burst; keeping the per-round ring unpacked is what removed the int4
    ring merge cliff (INT4_r05.json)."""
    B, R, two_d = ring.shape
    D = two_d // 2
    qk = pack_int4_rows(ring[:, :, :D].reshape(B * R, D), n_heads)
    qv = pack_int4_rows(ring[:, :, D:].reshape(B * R, D), n_heads)
    return jnp.concatenate(
        [qk.reshape(B, R, D // 2), qv.reshape(B, R, D // 2)], axis=-1
    )


def merge_ring_partial(o_p, m_p, l_p, q, ring, ring_sc, ring_start, lens,
                       heads, packed, ring_r0=None):
    """Merge the kernel's page-context online-softmax partial (o_p [B, D]
    normalized, m_p/l_p [B, H]) with the burst ring's contribution.

    The ring partial is computed HERE in batched XLA ([B, R, D] einsums —
    ~1% of the page bytes); keeping it out of the kernel preserves 128-col
    MXU dots and avoids carrying the ring as a kernel operand, both
    measured regressions. Numerics: exactly a two-block flash merge of
    normalized partials — the same dequantized values as the scatter
    paths, so cross-backend token parity holds."""
    B = q.shape[0]
    dh = q.shape[1] // heads
    R = ring.shape[1]
    Dk = ring.shape[2] // 2
    kq = ring[:, :, :Dk]
    vq = ring[:, :, Dk:]
    if packed:
        kd = unpack_int4(kq, heads)
        vd = unpack_int4(vq, heads)
    else:
        kd = kq.astype(jnp.float32)
        vd = vq.astype(jnp.float32)
    if ring_sc is not None:
        kd = kd * ring_sc[:, :R, None]
        vsc = ring_sc[:, 64 : 64 + R]
    qh = q.astype(jnp.float32).reshape(B, heads, dh)
    kh = kd.reshape(B, R, heads, dh)
    vh = vd.reshape(B, R, heads, dh)
    s = jnp.einsum("brhd,bhd->bhr", kh, qh) * (dh ** -0.5)
    # ring col r holds position ring_start + (r - r0), valid inside length
    # and only from the occupant's own first column r0 on (burst-wide rings
    # under sub-burst admission: columns < r0 belong to a previous occupant)
    col = jnp.arange(R, dtype=jnp.int32)[None, None, :]
    if ring_r0 is None:
        valid = (ring_start[:, None, None] + col) < lens[:, None, None]
    else:
        r0b = ring_r0[:, None, None]
        valid = (col >= r0b) & (
            (ring_start[:, None, None] - r0b + col) < lens[:, None, None]
        )
    m_r = jnp.max(jnp.where(valid, s, -jnp.inf), axis=-1)   # [B, H]
    w = jnp.where(valid, jnp.exp(s - m_r[..., None]), 0.0)
    l_r = jnp.sum(w, axis=-1)
    if ring_sc is not None:
        w = w * vsc[:, None, :]
    o_r = jnp.einsum("bhr,brhd->bhd", w, vh)
    o_r = o_r / jnp.maximum(l_r, jnp.finfo(jnp.float32).tiny)[..., None]
    # flash-merge the two normalized partials
    m = jnp.maximum(m_p, m_r)

    def coef(m_x, l_x):
        return jnp.where(
            jnp.isinf(m_x) & (m_x < 0), 0.0, jnp.exp(m_x - m)
        ) * l_x

    a, b = coef(m_p, l_p), coef(m_r, l_r)
    o_p3 = o_p.reshape(B, heads, dh)
    out = (a[..., None] * o_p3 + b[..., None] * o_r) / jnp.maximum(
        a + b, jnp.finfo(jnp.float32).tiny
    )[..., None]
    return out.reshape(B, heads * dh)


def flush_ring_to_pages(pool, ring, ring_start, lengths, n_rounds,
                        page_table, page_size, n_pages, ring_r0=None):
    """Reference XLA formulation of the ring flush (gather both candidate
    pages, where-merge, window-scatter) — kept as the oracle for
    tests/test_ring_attention.py. Production uses ops/ring_flush.ring_flush
    (Pallas, in-place, touched-pages-only: this version moved ~4x the page
    bytes and measured 0.52 ms/round at ref bench shapes).

    A live slot's valid ring rows r in [r0, r0 + min(length - ring_start,
    n_rounds - r0)) hold positions ring_start + (r - r0), spanning at most
    two pages (n_rounds <= page_size). ring_r0 (None = 0) is the slot
    occupant's first valid column — burst-wide rings under sub-burst
    admission start a mid-burst admittee's rows at its admission round.
    Rows of slots DEAD at flush time are dropped: their pages are freed at
    the next burst start and fully re-prefilled before anything reads them
    (scales included — fresh pages reset their scale positionally)."""
    B, R, two_dk = ring.shape
    Dk = two_dk // 2
    NP_, _, P, _ = pool.shape
    W = page_table.shape[1]
    live = lengths > 0
    r0 = (jnp.zeros_like(ring_start) if ring_r0 is None
          else ring_r0.astype(ring_start.dtype))
    nv = jnp.where(live,
                   jnp.minimum(lengths - ring_start, n_rounds - r0), 0)
    p0 = jnp.clip(ring_start, 0, None) // P
    cand = p0[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]   # [B, 2]
    cand_ok = live[:, None] & (cand * P < (ring_start + nv)[:, None]) \
        & (cand < W)
    pid = jnp.take_along_axis(page_table, jnp.clip(cand, 0, W - 1), axis=1)

    flat = pool.reshape(NP_ * 2, P, Dk)
    win = jnp.clip(pid, 0, NP_ - 1) * 2                     # [B, 2]
    cur_k = flat[win]                                       # [B, 2, P, Dk]
    cur_v = flat[win + 1]

    prow = jnp.arange(P, dtype=jnp.int32)[None, None, :]
    r = cand[:, :, None] * P + prow - ring_start[:, None, None]  # [B, 2, P]
    use = (r >= 0) & (r < nv[:, None, None])
    rc = jnp.clip(r + r0[:, None, None], 0, R - 1).reshape(B, 2 * P, 1)

    def merge(cur, side):
        rows = jnp.take_along_axis(
            ring[:, :, side * Dk : (side + 1) * Dk], rc, axis=1
        ).reshape(B, 2, P, Dk)
        return jnp.where(use[..., None], rows, cur)

    idx = jnp.concatenate([
        jnp.where(cand_ok, pid * 2, 2 * NP_).reshape(-1),
        jnp.where(cand_ok, pid * 2 + 1, 2 * NP_).reshape(-1),
    ])
    vals = jnp.concatenate([
        merge(cur_k, 0).reshape(-1, P, Dk),
        merge(cur_v, 1).reshape(-1, P, Dk),
    ])
    return flat.at[idx].set(vals, mode="drop").reshape(pool.shape)


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
    ctx=DEFAULT_CTX,
):
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    upd = sched_packed[:, 0]
    lengths = jnp.where(upd >= 0, upd, lengths)
    last_tokens = jnp.where(upd >= 0, sched_packed[:, 1], last_tokens)
    page_table = sched_packed[:, 2:]
    scale_reduce = ctx.pmax if ctx.tp > 1 else None

    def round_fn(carry, _):
        kv_pages, k_scales, v_scales, lengths, last = carry
        kv_pages = list(kv_pages)
        k_scales, v_scales = list(k_scales), list(v_scales)
        live = lengths > 0
        write_kv, attend = make_round_kv_callbacks(
            model_cfg, engine_cfg, attention_impl, page_table,
            kv_pages, k_scales, v_scales, lengths,
            n_heads=ctx.local_heads(model_cfg), scale_reduce=scale_reduce,
        )

        tok, new_lengths = decode_round_tokens(
            params, model_cfg, lengths, last, write_kv, attend, ctx
        )
        new_last = jnp.where(live, tok, last)
        return (
            tuple(kv_pages), tuple(k_scales), tuple(v_scales),
            new_lengths, new_last,
        ), tok

    (kvp, kss, vss, lengths, last), toks = jax.lax.scan(
        round_fn,
        (state.kv_pages, state.k_scales, state.v_scales,
         lengths, last_tokens),
        None,
        length=engine_cfg.n_forward_rounds,
    )
    return PagedKVState(kvp, kss, vss), lengths, last, toks.T


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

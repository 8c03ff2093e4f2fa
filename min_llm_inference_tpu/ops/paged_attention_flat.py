"""Flat-layout grouped paged-attention decode (ring/partial mode).

The grouped kernel (ops/paged_attention_grouped.py) computes per-SLOT dots:
~6 tensor ops per slot per grid step. On a 12-layer model that is ~6k
trace-unrolled Mosaic ops per kernel call, and the in-burst profile showed
attend at 5.96 of 7.89 ms/round at len=32 — nearly all op-ISSUE cost, not
bytes or FLOPs (page reads at len 32 are one page per slot).

This kernel stacks all G slots' fetched blocks into ONE [G*bk, Dk] tensor
per side and runs a CONSTANT number of ops per grid step (~20), regardless
of G:

  scores  = ((K ⊙ q_bcast) . M)                 one [G*bk, D] x [D, H] dot
            (M[c, h] = 1 iff feature c belongs to head h)
  stats   = segment max / sum over each slot's bk rows via [G, bk, H]
            sublane reductions (reshape splits the leading dim only)
  PV      = (probs . M^T) ⊙ V, segment-summed to [G, D]
  scales  = per-page columns via two tiny selector dots from a [B, W]
            scale-table input (k_scales[page_table], gathered in XLA) —
            replaces the per-slot SMEM scalar chains

MEASURED NEGATIVE RESULT (kept for A/B; default off, EngineConfig
.attn_flat): ref bench 442k -> 308k tok/s, gpt2s 78k -> 64k. The constant
op count is real, but it is bought with ~3 extra elementwise passes over
[G*bk, D] f32 tensors per grid step (broadcast-q materialization, probs
expansion s.M^T, the u product) — at ref shapes ~3G extra VPU elements per
kernel call, which swamps the ~0.5 ms/call issue savings. The per-slot
formulation's ~7 ops/slot/step (~0.56 us/slot/layer at 80-100 ns/op) is
the cheaper side of the trade at these shapes; a formulation that fuses
the q-broadcast into the MXU operand would need a cheap transpose, which
Mosaic does not offer.

RING/PARTIAL CONTRACT (the only mode this kernel serves): the pool is
READ-ONLY and holds positions < ring_start[b]; the call returns the
online-softmax partial (out [B, D], m [B, H], l [B, H]) over the page
context; the caller merges the burst ring's contribution
(models/paged.merge_ring_partial) and flushes the ring once per burst
(ops/ring_flush). Per-slot work survives only in the DMA issue chains
(page-exact contiguous-run copies — same scheme as the grouped kernel,
derived from JAX's Apache-2.0 pallas paged_attention double-buffering).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paged_attention import MASK_VALUE


def _gmax(ref, g, G):
    return functools.reduce(
        jnp.maximum, [ref[g * G + j] for j in range(G)]
    )


def _flat_kernel(
    *refs,
    batch_size: int,
    group_size: int,
    pages_per_compute_block: int,
    n_heads: int,
    quantized: bool,
    pages_per_dma: int,
    packed_int4: bool,
    mask_value: float = MASK_VALUE,
):
    G = group_size
    ppcb = pages_per_compute_block
    H = n_heads
    if quantized:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         rs_ref, q_ref, rs_col_ref, ktab_ref, vtab_ref,
         pages_hbm, o_ref, m_ref, l_ref, kv_buf, kv_sem) = refs
    else:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         rs_ref, q_ref, rs_col_ref,
         pages_hbm, o_ref, m_ref, l_ref, kv_buf, kv_sem) = refs
        ktab_ref = vtab_ref = None

    g, i = pl.program_id(0), pl.program_id(1)
    num_groups = batch_size // G
    P = kv_buf.shape[4]
    dkv = kv_buf.shape[5]
    bk = ppcb * P
    N = G * bk
    page_exact = kv_buf.dtype == jnp.int8

    # ---- page-run DMAs (per-slot by necessity; page-exact predicated
    # variants keep one fired DMA per contiguous run) ----
    def make_copies(g_, i_, buf_idx):
        items = []
        for j in range(G):
            slot = g_ * G + j
            ln = rs_ref[slot]   # pages hold positions < ring_start
            for p0 in range(0, ppcb, pages_per_dma):
                tok0 = (i_ * ppcb + (p0 if page_exact else 0)) * P
                pid0 = page_tbl_ref[slot, i_ * ppcb + p0]
                if page_exact and pages_per_dma > 1:
                    for m_ in range(1, pages_per_dma + 1):
                        lo = tok0 + (m_ - 1) * P
                        cond = (ln > lo) if m_ == pages_per_dma else (
                            (ln > lo) & (ln <= lo + P)
                        )
                        items.append((cond, pltpu.make_async_copy(
                            pages_hbm.at[pl.ds(pid0, m_)],
                            kv_buf.at[buf_idx, j, pl.ds(p0, m_)],
                            kv_sem.at[buf_idx],
                        )))
                else:
                    items.append((tok0 < ln, pltpu.make_async_copy(
                        pages_hbm.at[pl.ds(pid0, pages_per_dma)],
                        kv_buf.at[buf_idx, j, pl.ds(p0, pages_per_dma)],
                        kv_sem.at[buf_idx],
                    )))
        return items

    def start_copies(items):
        for cond, c in items:
            @pl.when(cond)
            def _():
                c.start()

    def wait_copies(items):
        for cond, c in items:
            @pl.when(cond)
            def _():
                c.wait()

    def next_block(g_, i_):
        def advance():
            def body(_, gg):
                dead = _gmax(
                    rs_ref, lax.clamp(0, gg, num_groups - 1), G) == 0
                return jnp.where((gg < num_groups) & dead, gg + 1, gg)

            return lax.fori_loop(0, num_groups, body, g_ + 1), 0

        return lax.cond(i_ * bk < _gmax(rs_ref, g_, G),
                        lambda: (g_, i_), advance)

    @pl.when(i == 0)
    def init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(i * bk < _gmax(rs_ref, g, G))
    def flash_body():
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0
        buffer_index = buffer_index_ref[0]
        next_g, next_i = next_block(g, i + 1)

        @pl.when(init_flag == 1)
        def prefetch_first():
            start_copies(make_copies(g, i, buffer_index))

        @pl.when(next_g < num_groups)
        def prefetch_next():
            nbi = jnp.where(buffer_index == 0, 1, 0)
            start_copies(make_copies(next_g, next_i, nbi))
            buffer_index_ref[0] = nbi

        wait_copies(make_copies(g, i, buffer_index))

        D = q_ref.shape[1]
        dh = D // H
        q = q_ref[...].astype(jnp.float32)                   # [G, D]
        if packed_int4:
            # per-head plane transform: q_eff = [q_a | q_b - 16 q_a] so
            # q_eff . (byte + hi) recovers q_a.lo + q_b.hi after the hi
            # plane is added (byte = 16*hi + lo)
            parts = []
            for h in range(H):
                qa = q[:, h * dh : h * dh + dh // 2]
                qb = q[:, h * dh + dh // 2 : (h + 1) * dh]
                parts.extend([qa, qb - 16.0 * qa])
            q = jnp.concatenate(parts, axis=1)               # [G, D]
        q_bc = lax.broadcast_in_dim(
            q, (G, bk, q.shape[1]), (0, 2)
        ).reshape(N, q.shape[1])

        # head-selector matrices (packed int4: head h owns PLANE columns
        # [2h*dhp, (2h+2)*dhp) of the doubled plane tensor)
        dsel = q.shape[1]
        m_mat = (
            lax.broadcasted_iota(jnp.int32, (dsel, H), 0) // (dsel // H)
            == lax.broadcasted_iota(jnp.int32, (dsel, H), 1)
        ).astype(jnp.float32)

        def flat_block(side):
            blk = kv_buf[buffer_index, :, :, side]    # [G, ppcb, P, dkv]
            return blk.reshape(N, dkv)

        def planes(raw):
            # int4: [byte, hi] plane pairs per head, concatenated to the
            # same per-head order as the q transform above
            if not packed_int4:
                return raw.astype(jnp.float32)
            f = raw.astype(jnp.float32)
            dhp = dkv // H
            out = []
            for h in range(H):
                b = f[:, h * dhp : (h + 1) * dhp]
                hi = jnp.floor(b * (1.0 / 16.0) + 0.5)
                out.extend([b, hi])
            return jnp.concatenate(out, axis=1)       # [N, 2*dkv]

        # per-row (slot, page) scale columns from the [G, W]-blocked scale
        # tables: two tiny selector dots replace G*ppcb SMEM scalar chains
        row_slot = lax.broadcasted_iota(jnp.int32, (N, G), 0) // bk
        sel_j = (row_slot
                 == lax.broadcasted_iota(jnp.int32, (N, G), 1)
                 ).astype(jnp.float32)
        if quantized:
            W = ktab_ref.shape[1]
            # global page index of row r: i*ppcb + (r % bk) // P; select
            # its column of the slot's [W] scale row with a one-hot mask
            # (no value slicing — grid index i is a traced scalar)
            rowpage = i * ppcb + (
                lax.broadcasted_iota(jnp.int32, (N, W), 0) % bk
            ) // P
            onehot_w = (
                rowpage == lax.broadcasted_iota(jnp.int32, (N, W), 1)
            ).astype(jnp.float32)
            ones_c = jnp.ones((W, 1), jnp.float32)

            def scale_col(tab_ref):
                per_slot = lax.dot_general(
                    sel_j, tab_ref[...].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                        # [N, W]
                return lax.dot_general(
                    per_slot * onehot_w, ones_c,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                        # [N, 1]

            kcol = scale_col(ktab_ref)
            vcol = scale_col(vtab_ref)

        # ---- scores: one dot for every slot and head ----
        kall = planes(flat_block(0))
        p = kall * q_bc
        qk = lax.dot_general(
            p, m_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (dh ** -0.5)                                  # [N, H]
        if quantized:
            qk = qk * kcol
        # position mask: row r holds position i*bk + r % bk of slot r//bk
        pos = i * bk + lax.broadcasted_iota(jnp.int32, (N, 1), 0) % bk
        bound = lax.broadcast_in_dim(
            rs_col_ref[...], (G, bk, 1), (0, 2)).reshape(N, 1)
        rowmask = pos < bound
        qk = jnp.where(rowmask, qk, mask_value)

        # ---- segment statistics over each slot's bk rows ----
        m_curr = jnp.max(qk.reshape(G, bk, H), axis=1)     # [G, H]
        m_bc = lax.broadcast_in_dim(
            m_curr, (G, bk, H), (0, 2)).reshape(N, H)
        s = jnp.where(rowmask, jnp.exp(qk - m_bc), 0.0)    # [N, H]
        l_curr = jnp.sum(s.reshape(G, bk, H), axis=1)      # [G, H]

        # ---- PV: probs broadcast to features, one elementwise + segment
        # sum (packed int4: plane algebra o = [t1 - 16 t2 | t2]) ----
        s_eff = s * vcol if quantized else s
        s_full = lax.dot_general(
            s_eff, m_mat.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [N, dsel]
        vall = planes(flat_block(1))
        u = jnp.where(rowmask, s_full * vall, 0.0)
        t = jnp.sum(u.reshape(G, bk, dsel), axis=1)        # [G, dsel]
        if packed_int4:
            dhp = dkv // H
            outs = []
            for h in range(H):
                t1 = t[:, 2 * h * dhp : (2 * h + 1) * dhp]
                t2 = t[:, (2 * h + 1) * dhp : (2 * h + 2) * dhp]
                outs.extend([t1 - 16.0 * t2, t2])
            o_curr = jnp.concatenate(outs, axis=1)         # [G, D]
        else:
            o_curr = t

        # ---- merge into the running [G, *] partial ----
        HP = m_ref.shape[1]                                # lane-padded H
        if HP != H:
            zpad = jnp.full((G, HP - H), -jnp.inf, jnp.float32)
            m_curr = jnp.concatenate([m_curr, zpad], axis=1)
            l_curr = jnp.concatenate(
                [l_curr, jnp.zeros((G, HP - H), jnp.float32)], axis=1)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.where(jnp.isinf(m_prev) & (m_prev < 0), 0.0,
                          jnp.exp(m_prev - m_next))
        beta = jnp.where(jnp.isinf(m_curr) & (m_curr < 0), 0.0,
                         jnp.exp(m_curr - m_next))
        l_next = alpha * l_prev + beta * l_curr
        m_ref[...] = m_next
        l_ref[...] = l_next
        l_safe = jnp.maximum(l_next, jnp.finfo(jnp.float32).tiny)
        # per-feature coefficients via the head selector (heads expand to
        # their dh feature columns)
        msel = (
            lax.broadcasted_iota(jnp.int32, (H, D), 1) // dh
            == lax.broadcasted_iota(jnp.int32, (H, D), 0)
        ).astype(jnp.float32)

        def feat(x):
            return lax.dot_general(
                x[:, :H], msel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        o_ref[...] = (
            feat(l_prev * alpha / l_safe) * o_ref[...]
            + feat(beta / l_safe) * o_curr
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "group_size", "pages_per_compute_block",
                     "pages_per_dma", "max_run_pages", "packed_int4",
                     "interpret"),
)
def paged_decode_attention_flat(
    q,            # [B, D]
    kv_pages,     # [NP, 2, P, Dk]
    lengths,      # [B] i32
    page_table,   # [B, W] i32 (CONTIGUOUS runs within allocation units)
    k_scales=None,
    v_scales=None,
    ring_start=None,   # [B] i32 — REQUIRED (partial mode only)
    *,
    n_heads: int = 1,
    group_size: int | None = None,
    pages_per_compute_block: int | None = None,
    pages_per_dma: int | None = None,
    max_run_pages: int | None = None,
    packed_int4: bool = False,
    interpret: bool = False,
):
    """Flat ring/partial paged attention: returns (out [B, D] f32,
    m [B, H] f32, l [B, H] f32) over the PAGE context (positions <
    ring_start). Requires a contiguous-run page table (AutonomousEngine's
    group allocator). See module docstring for why this formulation."""
    B, D = q.shape
    NP, two, P, Dk = kv_pages.shape
    assert two == 2 and Dk == (D // 2 if packed_int4 else D)
    assert ring_start is not None
    W = page_table.shape[1]
    dh = D // n_heads
    quantized = k_scales is not None

    b_orig = B
    pad = (-B) % 8
    if pad:
        # pad rows are dead: ring_start 0 -> no DMA, init-only outputs
        q = jnp.concatenate([q, jnp.zeros((pad, D), q.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad,), lengths.dtype)])
        ring_start = jnp.concatenate(
            [ring_start, jnp.zeros((pad,), ring_start.dtype)])
        page_table = jnp.concatenate(
            [page_table, jnp.zeros((pad, W), page_table.dtype)])
        B += pad

    from .paged_attention_grouped import _best_ppcb, _choose_group

    auto_g, auto_c = _choose_group(B, W, P, Dk, kv_pages.dtype.itemsize)
    G = group_size or auto_g
    ppcb = pages_per_compute_block or (
        auto_c if group_size is None
        else _best_ppcb(W, G, P, Dk, kv_pages.dtype.itemsize))
    assert B % G == 0 and W % ppcb == 0
    if pages_per_dma is None:
        auto = 2 if (kv_pages.dtype == jnp.int8 and ppcb % 2 == 0) else ppcb
        ppd = min(auto, ppcb)
    else:
        ppd = min(pages_per_dma, ppcb)
    if max_run_pages is not None:
        ppd = math.gcd(ppd, max_run_pages)
    assert ppcb % ppd == 0

    HP = max(n_heads, 128)   # lane-padded stats width
    scalar_args = [
        lengths, page_table,
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
        ring_start,
    ]
    q_spec = pl.BlockSpec((G, D), lambda g, i, *_: (g, 0))
    col_spec = pl.BlockSpec((G, 1), lambda g, i, *_: (g, 0))
    in_specs = [q_spec, col_spec]
    inputs = [q, ring_start.reshape(B, 1)]
    if quantized:
        tab_spec = pl.BlockSpec((G, W), lambda g, i, *_: (g, 0))
        in_specs += [tab_spec, tab_spec]
        safe = jnp.clip(page_table, 0, NP - 1)
        inputs += [k_scales[safe], v_scales[safe]]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(kv_pages)

    out = pl.pallas_call(
        functools.partial(
            _flat_kernel,
            batch_size=B,
            group_size=G,
            pages_per_compute_block=ppcb,
            n_heads=n_heads,
            quantized=quantized,
            pages_per_dma=ppd,
            packed_int4=packed_int4,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((G, D), lambda g, i, *_: (g, 0)),
                pl.BlockSpec((G, HP), lambda g, i, *_: (g, 0)),
                pl.BlockSpec((G, HP), lambda g, i, *_: (g, 0)),
            ],
            grid=(B // G, W // ppcb),
            scratch_shapes=[
                pltpu.VMEM((2, G, ppcb, 2, P, Dk), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, HP), jnp.float32),
            jax.ShapeDtypeStruct((B, HP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalar_args, *inputs)
    o, m, l = out
    return (o[:b_orig], m[:b_orig, :n_heads], l[:b_orig, :n_heads])

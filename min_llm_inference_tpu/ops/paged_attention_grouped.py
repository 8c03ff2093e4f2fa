"""Grouped fused paged-attention decode kernel (batched-VPU variant).

Variant of ops/paged_attention.py that processes GROUP_SIZE slots per grid
step. Motivation (measured): the one-slot kernel's marginal cost is
~2us/slot dominated by VPU chains on single-row tensors (softmax stats on
[1, bk] uses 1 of 8 sublanes) and by per-step DMA-wait latency. Here the
per-slot work is only the QK^T / PV dots (different K/V blocks per slot);
ALL elementwise work — masking, online-softmax statistics, accumulator
updates — runs batched on [G*H, bk] / [G*H, dh] tiles at full VPU width,
and G slots' page DMAs are issued together (G x more DMAs in flight per
grid step — directly attacking the DMA-wait equilibrium).

Inactive rows (dead slots, or slots whose length ends before this block)
are handled by zeroing their score rows: their l stays 0 and the guarded
division leaves their output at the init value (exact zeros).

Same layout contract as the ungrouped kernel (pooled K|V pages
[n_pages, 2, page_size, D]); requires n_slots % group_size == 0. Lengths
ride twice: scalar prefetch (control flow, group-skip walk) and as a
[B, 1] VMEM column (vector masks).

Kernel-structure attribution: shares the double-buffered page-DMA scheme
derived from JAX's Apache-2.0 ``jax.experimental.pallas.ops.tpu
.paged_attention`` kernel (see ops/paged_attention.py), reworked here for
grouped slots and batched VPU statistics.

MEASURED NEGATIVE RESULT (round 4, code in git at 647f7ae): hoisting the
batched-heads path's remaining per-slot elementwise ops into whole-group
stacks — one [G*bk, D] int8->f32 convert per side, q broadcast to rows by
an MXU dot against the slot-expansion matrix E[r, j] = [r//bk == j], and
the PV diagonal mask+fold once per step on the stacked [G*H, D] result,
leaving only the two MXU dots per slot — LOST end-to-end on gpt2s:
77.4k -> 73.2k tok/s (same-session A/B, subbursts=1). Two mechanisms:
the whole-group f32 temps (3*G*bk*D*4 bytes) push the VMEM chooser from
ppcb=4 to ppcb=2, doubling grid steps at grown contexts; and the big
passes + small-contraction MXU broadcast cost more wall time than the
~80-100ns/op issue floor they save — the same trade that sank the flat
kernel (ops/paged_attention_flat.py), at smaller scale. The per-slot
form below (7 ops/slot: convert, q-mul, score dot, convert, PV dot,
diag mask, fold dot) remains the measured optimum at bench shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paged_attention import MASK_VALUE


def _group_max_len(lengths_ref, g, group_size):
    vals = [lengths_ref[g * group_size + j] for j in range(group_size)]
    return functools.reduce(jnp.maximum, vals)


def _group_gate(lengths_ref, ring_start_ref, g, group_size):
    """Per-group compute gate. Non-ring mode: the group's max length (blocks
    past it carry nothing). Ring mode: page DMAs are bounded by the max
    ring_start (pages only hold positions < ring_start), but a live group
    must still run its i==0 step for the ring fold even when every slot's
    context is entirely in the ring (ring_start == 0), hence the min(len,1)
    floor."""
    len_max = _group_max_len(lengths_ref, g, group_size)
    if ring_start_ref is None:
        return len_max
    # ring mode: pages hold positions < ring_start only; a group whose
    # slots are entirely in the ring has no page work (its o/m/l init at
    # i == 0 runs unconditionally, outside the gate)
    return _group_max_len(ring_start_ref, g, group_size)


def _grouped_kernel(
    *refs,
    batch_size: int,
    group_size: int,
    pages_per_compute_block: int,
    n_heads: int,
    quantized: bool,
    fused_write: bool = False,
    pages_per_dma: int = 1,
    packed_int4: bool = False,
    batched_heads: bool = False,
    ring_mode: bool = False,
    mask_value: float = MASK_VALUE,
):
    G = group_size
    ppcb = pages_per_compute_block
    if quantized:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         k_scales_ref, v_scales_ref, *rest) = refs
    else:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         *rest) = refs
        k_scales_ref = v_scales_ref = None
    if ring_mode:
        ring_start_ref, *rest = rest   # [B] i32 scalar prefetch
    else:
        ring_start_ref = None
    q_ref, *rest = rest
    if batched_heads:
        q2_ref, *rest = rest   # [G, D] row-per-slot view of the same q
    else:
        q2_ref = None
    len_col_ref, *rest = rest
    if fused_write:
        (pages_hbm, kn_ref, vn_ref,
         o_ref, pages_out, m_scratch, l_scratch, kv_buf, kv_sem,
         w_sem) = rest
    elif ring_mode:
        # partial mode: the online-softmax state (m, l) ships out alongside
        # o so the caller can flash-merge the burst ring's contribution
        # (computed in batched XLA) outside the kernel
        (pages_hbm, o_ref, m_scratch, l_scratch, kv_buf, kv_sem) = rest
        kn_ref = vn_ref = pages_out = w_sem = None
    else:
        (pages_hbm,
         o_ref, m_scratch, l_scratch, kv_buf, kv_sem) = rest
        kn_ref = vn_ref = pages_out = w_sem = None

    g, i = pl.program_id(0), pl.program_id(1)
    num_groups = batch_size // G
    page_size = kv_buf.shape[4]
    bk = ppcb * page_size
    H = n_heads
    gmax = _group_gate(lengths_ref, ring_start_ref, g, G)

    # Per-slot length gating: a slot's pages are DMA'd only while inside
    # ITS OWN length — short and dead slots in a live group fetch nothing
    # beyond their context (group-max gating alone streams every slot out
    # to the longest member). int8 pools gate per PAGE (exact bytes: any
    # stale buffer bits are finite int8, and masked columns are dropped by
    # select); float pools gate per BLOCK — an active row's whole block is
    # fetched so its masked columns never read unfetched (possibly NaN)
    # bytes, which would poison the 0-weight PV dot.
    page_exact = kv_buf.dtype == jnp.int8
    # packed int4: pool feature width is dh*H/2 (two nibbles per byte,
    # per-head lo/hi halves); unpacking is a concat of the nibble planes
    dkv = kv_buf.shape[5]

    def make_copies(g_, i_, buf_idx):
        # the same predicate gates start and wait, so semaphore counts
        # always match
        items = []
        for j in range(G):
            slot = g_ * G + j
            # ring mode: pages only hold positions < ring_start (the
            # burst's own rows are merged outside the kernel)
            ln = (ring_start_ref[slot] if ring_mode
                  else lengths_ref[slot])
            if pages_per_dma > 1:
                # contiguous-page mode: the caller guarantees each
                # pages_per_dma run of table entries is a consecutive HBM
                # range (group allocator), so the run moves as ONE DMA —
                # K and V sides included. For int8 pools the run length is
                # page-exact: ONE of pages_per_dma predicated copy variants
                # fires (first m pages of the run, m = pages the slot's
                # length actually reaches), so the DMA count stays one per
                # run while no byte beyond ceil(len/P) pages moves. Float
                # pools gate per BLOCK (masked columns must never read
                # unfetched, possibly-NaN bytes).
                for p0 in range(0, ppcb, pages_per_dma):
                    tok0 = (i_ * ppcb + (p0 if page_exact else 0)) * page_size
                    pid0 = page_tbl_ref[slot, i_ * ppcb + p0]
                    if page_exact:
                        for m in range(1, pages_per_dma + 1):
                            lo = tok0 + (m - 1) * page_size
                            cond = (ln > lo) if m == pages_per_dma else (
                                (ln > lo) & (ln <= lo + page_size)
                            )
                            items.append((cond, pltpu.make_async_copy(
                                pages_hbm.at[pl.ds(pid0, m)],
                                kv_buf.at[buf_idx, j, pl.ds(p0, m)],
                                kv_sem.at[buf_idx],
                            )))
                    else:
                        items.append((tok0 < ln, pltpu.make_async_copy(
                            pages_hbm.at[pl.ds(pid0, pages_per_dma)],
                            kv_buf.at[buf_idx, j, pl.ds(p0, pages_per_dma)],
                            kv_sem.at[buf_idx],
                        )))
            else:
                for p in range(ppcb):
                    tok0 = (i_ * ppcb + (p if page_exact else 0)) * page_size
                    items.append((tok0 < ln, pltpu.make_async_copy(
                        pages_hbm.at[page_tbl_ref[slot, i_ * ppcb + p]],
                        kv_buf.at[buf_idx, j, p],
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

    def next_compute_block(g_, i_):
        def advance_g():
            def body(_, gg):
                dead = _group_gate(
                    lengths_ref, ring_start_ref,
                    lax.clamp(0, gg, num_groups - 1), G
                ) == 0
                return jnp.where((gg < num_groups) & dead, gg + 1, gg)

            next_g = lax.fori_loop(0, num_groups, body, g_ + 1)
            return next_g, 0

        return lax.cond(i_ * bk < gmax, lambda: (g_, i_), advance_g)

    @pl.when(i == 0)
    def init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(i * bk < gmax)
    def flash_body():
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0
        buffer_index = buffer_index_ref[0]
        next_g, next_i = next_compute_block(g, i + 1)

        @pl.when(init_flag == 1)
        def prefetch_first():
            start_copies(make_copies(g, i, buffer_index))

        @pl.when(next_g < num_groups)
        def prefetch_next():
            nbi = jnp.where(buffer_index == 0, 1, 0)
            start_copies(make_copies(next_g, next_i, nbi))
            buffer_index_ref[0] = nbi

        wait_copies(make_copies(g, i, buffer_index))

        # ---- fused decode KV write (replaces the XLA quantize+scatter) ----
        # The current token's K/V row lands at pos = length-1, whose page
        # is already in VMEM (pos < length => its fetch was never gated
        # off). Quantize the new row against the page's (pre-updated) SMEM
        # scale, insert it into the fetched page buffer — so the attention
        # below sees the current token exactly like the scatter path did —
        # and DMA the FULL page back to the aliased HBM pool (int8 tiling
        # forbids single-row HBM writes; a page is exactly one 32-sublane
        # tile). Write DMAs overlap the flash compute; waited at step end
        # (a deferred cross-step wait was tried and measured SLOWER: the
        # dynamic fori_loop semaphore drain serializes worse than the
        # in-step wait overlaps).
        write_items = []
        if fused_write:
            for j in range(G):
                slot = g * G + j
                ln = lengths_ref[slot]
                pos = ln - 1
                wpi = pos // page_size           # page slot in table row
                p_loc = wpi % ppcb
                r = pos % page_size
                pid = page_tbl_ref[slot, wpi]
                cond = (ln > 0) & (i == wpi // ppcb)
                write_items.append((cond, j, p_loc, pid))

                @pl.when(cond)
                def _insert():
                    for side, (nref, sref) in enumerate(
                        ((kn_ref, k_scales_ref), (vn_ref, v_scales_ref))
                    ):
                        row = nref[j : j + 1, :].astype(jnp.float32)
                        if quantized:
                            s = sref[pid]
                            inv = jnp.where(
                                s > 0, 1.0 / jnp.maximum(s, 1e-30), 0.0
                            )
                            qmax = 7.0 if packed_int4 else 127.0
                            row = jnp.clip(
                                jnp.round(row * inv), -qmax, qmax
                            )
                        if packed_int4:
                            # arithmetic pack per head: byte = 16*hi + lo
                            # (both in [-7, 7]; f32 math, integer-exact)
                            dh_full = row.shape[1] // n_heads
                            parts = []
                            for h in range(n_heads):
                                lo = row[:, h * dh_full : h * dh_full + dh_full // 2]
                                hi = row[:, h * dh_full + dh_full // 2 : (h + 1) * dh_full]
                                parts.append(16.0 * hi + lo)
                            row = (parts[0] if n_heads == 1
                                   else jnp.concatenate(parts, axis=1))
                        # Mosaic requires sublane indices provably 8-aligned:
                        # update the 8-row tile containing r with a masked
                        # select (cheaper than a full-page where; a raw
                        # pl.ds(r, 1) store does not compile)
                        r8 = (r // 8) * 8
                        tile = kv_buf[
                            buffer_index, j, p_loc, side, pl.ds(r8, 8), :
                        ]
                        sel = (
                            lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                            == r - r8
                        )
                        kv_buf[
                            buffer_index, j, p_loc, side, pl.ds(r8, 8), :
                        ] = jnp.where(sel, row.astype(kv_buf.dtype), tile)

            def wb_copy(j, p_loc, pid):
                return pltpu.make_async_copy(
                    kv_buf.at[buffer_index, j, p_loc],
                    pages_out.at[pid],
                    w_sem,
                )

            for cond, j, p_loc, pid in write_items:
                @pl.when(cond)
                def _start_wb(j=j, p_loc=p_loc, pid=pid):
                    wb_copy(j, p_loc, pid).start()

        q_all = q_ref[...].astype(jnp.float32)   # [G*H, dh]
        dh = q_all.shape[-1]
        if packed_int4:
            # query transform matching head_block's [byte, hi] planes
            # (each q row is ONE head's dh-vector): q_eff = [q_a | q_b -
            # 16 q_a], so that q_eff . [16 hi + lo | hi] == q_a.lo + q_b.hi
            dhp_q = dh // 2
            q_a = q_all[:, :dhp_q]
            q_eff = jnp.concatenate(
                [q_a, q_all[:, dhp_q:] - 16.0 * q_a], axis=1
            )
        else:
            q_eff = q_all

        if batched_heads:
            # Head-batched scores: H per-head [1, dh] x [dh, bk] dots per
            # slot collapse into ONE [bk, D] elementwise product and ONE
            # block-sum dot against the head-selector matrix M [D, H]
            # (M[c, h] = 1 iff feature c belongs to head h):
            #   (M^T . (K ⊙ q)^T)[h, t] = sum_c q[c] K[t, c] [c in head h]
            # Cuts the per-call dot count G*H-fold (the multihead kernel's
            # measured fixed cost: 12,288 tiny dots/call at gpt2s shapes).
            feat = lax.broadcasted_iota(jnp.int32, (dh * H, H), 0) // dh
            hsel = lax.broadcasted_iota(jnp.int32, (dh * H, H), 1)
            m_mat = (feat == hsel).astype(jnp.float32)
            # PV side: one [H, ncols] x [ncols, D] dot per slot; the
            # per-head outputs are the diagonal dh-blocks of the result.
            # Extracting them by slicing produces lane-misaligned [1, dh]
            # pieces Mosaic cannot concat ("offset mismatch on non-concat
            # dimension"), so fold them with a second masked dot instead:
            # zero the off-diagonal blocks, then contract with a [D, dh]
            # stack of identities — an aligned [H, dh] block per slot.
            rowmask = (
                lax.broadcasted_iota(jnp.int32, (H, dh * H), 1) // dh
                == lax.broadcasted_iota(jnp.int32, (H, dh * H), 0)
            ).astype(jnp.float32)
            fold = (
                lax.broadcasted_iota(jnp.int32, (dh * H, dh), 0) % dh
                == lax.broadcasted_iota(jnp.int32, (dh * H, dh), 1)
            ).astype(jnp.float32)

        def compute_qk(block_of, ncols):
            """[G*H, ncols] raw QK^T scores over blocks from block_of(j, 0)
            (a [ncols, Dk] raw K block per slot); per-slot dots — different
            K per slot. Conversion temps are transient per dot, not held
            across the flash stats."""
            qk_rows = []
            if batched_heads:
                for j in range(G):
                    kb = block_of(j, 0).astype(jnp.float32)
                    p = kb * q2_ref[j : j + 1, :].astype(jnp.float32)
                    qk_rows.append(
                        lax.dot_general(
                            m_mat, p, (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )  # [H, ncols]
            else:
                for j in range(G):
                    kb = block_of(j, 0)
                    for h in range(H):
                        qk_rows.append(
                            lax.dot_general(
                                q_eff[j * H + h : j * H + h + 1],
                                head_block(kb, h),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        )
            return jnp.concatenate(qk_rows, axis=0) * (dh ** -0.5)

        def compute_pv(block_of, s_eff, ncols):
            """[G*H, dh] PV products for scale-folded probabilities s_eff
            [G*H, ncols] against V blocks from block_of(j, 1)."""
            o_rows = []
            if batched_heads:
                for j in range(G):
                    vb = block_of(j, 1).astype(jnp.float32)
                    r = lax.dot_general(
                        s_eff[j * H : (j + 1) * H, :], vb,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [H, D]
                    o_rows.append(
                        lax.dot_general(
                            r * rowmask, fold,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )  # [H, dh]
            else:
                for j in range(G):
                    vb = block_of(j, 1)
                    for h in range(H):
                        t = lax.dot_general(
                            s_eff[(j * H + h) : (j * H + h + 1)],
                            head_block(vb, h),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        if packed_int4:
                            # planes were [byte, hi] = [16 hi + lo, hi]:
                            # un-mix to [probs.lo | probs.hi]
                            dhp_o = dh // 2
                            t2 = t[:, dhp_o:]
                            t = jnp.concatenate(
                                [t[:, :dhp_o] - 16.0 * t2, t2], axis=1
                            )
                        o_rows.append(t)
            return jnp.concatenate(o_rows, axis=0)

        # Dequantization is folded into SCORE columns instead of the KV
        # blocks: per page, q.(s*K)^T == s*(q.K^T) column-wise and
        # (w).(s*V) == (w*s).V row-wise, so one f32 multiply per score
        # element replaces the [bk, D] dequantized K/V copies. This removes
        # the dominant scoped-VMEM term (f32 dequant buffers held across
        # the softmax stats) and the per-page [P, D] VPU multiplies —
        # letting group_size/ppcb (and the per-step DMA batch) grow ~4x.
        def raw_block(j, side):
            blk = kv_buf[buffer_index, j, :, side]     # [ppcb, P, dkv] raw
            return blk.reshape(bk, dkv)

        def head_block(blk, h):
            """Head h's [bk, dh] f32 operand. int8 pools: a plain slice.
            int4 pools (arithmetic packing byte = 16*hi + lo): the PLANES
            [byte, hi] — three vector ops (convert, scale, round); the lo
            plane is never materialized. Consumers compensate: QK uses the
            transformed query [q_a | q_b - 16 q_a] (so q_eff . planes ==
            q_a.lo + q_b.hi) and PV un-mixes its output columns
            (t1 - 16 t2 | t2)."""
            if not packed_int4:
                return blk[:, h * dh : (h + 1) * dh].astype(jnp.float32)
            dhp = dh // 2
            bf = blk[:, h * dhp : (h + 1) * dhp].astype(jnp.float32)
            # floor(b/16 + 1/2) == round(b/16) exactly here (|lo| <= 7, so
            # the fraction never hits 1/2); floor is one Mosaic op while
            # round-nearest-even expands
            hi = jnp.floor(bf * (1.0 / 16.0) + 0.5)
            return jnp.concatenate([bf, hi], axis=1)

        def scale_rows(scales_ref):
            # [G, bk] f32: column t of row j carries the scale of the page
            # holding token i*bk + t of slot g*G+j (SMEM scalar reads)
            rows = []
            for j in range(G):
                parts = [
                    jnp.full(
                        (1, page_size),
                        scales_ref[page_tbl_ref[g * G + j, i * ppcb + p]],
                        jnp.float32,
                    )
                    for p in range(ppcb)
                ]
                rows.append(parts[0] if ppcb == 1
                            else jnp.concatenate(parts, axis=1))
            mat = jnp.concatenate(rows, axis=0) if G > 1 else rows[0]
            if H > 1:
                mat = lax.broadcast_in_dim(
                    mat, (G, H, bk), (0, 2)
                ).reshape(G * H, bk)
            return mat

        # batched masking columns: row r belongs to slot r // H; lengths as
        # a VMEM column, expanded H-fold to match j-major/h-minor row order
        len_col = len_col_ref[...].astype(jnp.int32)      # [G, 1]

        def smem_col(ref):
            # Mosaic rejects the (G, H) -> (G*H, 1) reshape (mixes the lane
            # dim into sublanes); build the column from SMEM scalars like
            # scale_rows does: G stacked [H, 1] broadcasts
            return jnp.concatenate(
                [jnp.full((H, 1), ref[g * G + j], jnp.int32)
                 for j in range(G)],
                axis=0,
            )

        row_len = len_col if H == 1 else smem_col(lengths_ref)
        if ring_mode:
            # positions < ring_start live in pages; >= ring_start in the ring
            rs_row = smem_col(ring_start_ref) if H > 1 else jnp.concatenate(
                [jnp.full((1, 1), ring_start_ref[g * G + j], jnp.int32)
                 for j in range(G)], axis=0)

        def expand_h(mat_g, ncols):
            if H == 1:
                return mat_g
            return lax.broadcast_in_dim(
                mat_g, (G, H, ncols), (0, 2)
            ).reshape(G * H, ncols)

        def merge_block(qk_masked, active, pv_fn):
            """Fold one masked score block into the online-softmax state and
            the output accumulator. active: [G*H, 1] f32 where-guard (not
            a multiply): inactive rows' blocks were never DMA'd, so scores
            may be built from arbitrary stale bytes and 0 * NaN would still
            poison the statistics."""
            m_prev = m_scratch[...]
            l_prev = l_scratch[...]
            m_curr_col = jnp.max(qk_masked, axis=-1, keepdims=True)
            s_curr = jnp.where(
                active > 0, jnp.exp(qk_masked - m_curr_col), 0.0
            )
            l_curr = lax.broadcast_in_dim(
                jnp.sum(s_curr, axis=-1), l_prev.shape, (0,)
            )
            m_curr = lax.broadcast_in_dim(
                jnp.where(active > 0, m_curr_col, -jnp.inf)[:, 0],
                m_prev.shape, (0,),
            )
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.where(jnp.isinf(m_prev) & (m_prev < 0), 0.0,
                              jnp.exp(m_prev - m_next))
            beta = jnp.where(jnp.isinf(m_curr) & (m_curr < 0), 0.0,
                             jnp.exp(m_curr - m_next))
            l_next = alpha * l_prev + beta * l_curr
            m_scratch[...] = m_next
            l_scratch[...] = l_next
            l_safe = jnp.maximum(l_next, jnp.finfo(jnp.float32).tiny)
            # same stale-bytes guard on the PV side: s rows are zero for
            # inactive rows but 0-dot-NaN is NaN
            o_curr = jnp.where(active > 0, pv_fn(s_curr), 0.0)
            o_ref[...] = (
                (l_prev * alpha * o_ref[...] + beta * o_curr) / l_safe
            ).astype(o_ref.dtype)

        # ---- page score block ----
        # Ring mode: the burst's own rows are NOT kernel operands — widening
        # the per-slot dots by R columns crossed an MXU tile boundary
        # (128 -> 144 cols = 2 tiles, measured +0.3 ms/round), and carrying
        # the ring through the kernel forced per-round buffer copies. The
        # kernel scores PAGES ONLY (positions < ring_start) and ships its
        # online-softmax state (o, m, l); the caller merges the ring
        # contribution, computed as batched XLA einsums.
        qk = compute_qk(raw_block, bk)
        if quantized:
            qk = qk * scale_rows(k_scales_ref)
        c = lax.broadcasted_iota(jnp.int32, (G * H, bk), 1)
        # select, not add: columns past the bound may come from pages the
        # gated DMA never fetched (stale/NaN bytes) -- adding mask_value to
        # NaN stays NaN and would poison the row max
        page_bound = rs_row if ring_mode else row_len
        qk = jnp.where(i * bk + c < page_bound, qk, mask_value)
        active = (i * bk < page_bound).astype(jnp.float32)  # [G*H, 1]

        def pv_page(s_curr):
            s_eff = (s_curr * scale_rows(v_scales_ref)
                     if quantized else s_curr)
            return compute_pv(raw_block, s_eff, bk)

        merge_block(qk, active, pv_page)

        if fused_write:
            # the write DMAs ran concurrently with the flash compute; they
            # must land before this grid step ends (the buffer slot is
            # refetched two steps later, and the pool must be durable)
            for cond, j, p_loc, pid in write_items:
                @pl.when(cond)
                def _wait_wb(j=j, p_loc=p_loc, pid=pid):
                    wb_copy(j, p_loc, pid).wait()


def _vmem_cost(g, c, page_size, d, kv_bytes):
    """Scoped-VMEM bytes for a (group_size, ppcb) candidate: the
    double-buffered raw KV block buffer plus a margin for the transient
    f32 convert temps feeding the MXU (a handful of [bk, D] blocks live
    at a time — dequant scales are folded into the score columns, so no
    persistent dequantized copies exist)."""
    raw = 2 * g * c * 2 * page_size * d * kv_bytes
    temps = 4 * c * page_size * d * 4
    return raw + temps


# v5e has 128MB VMEM; the default scoped limit is 16MB but Mosaic accepts
# an explicit higher vmem_limit_bytes. Big groups batch more page DMAs per
# grid step, which is the whole point (the decode path is DMA-latency
# bound, CLAUDE.md), so spend VMEM on in-flight KV blocks.
_VMEM_BUDGET = 72 * 1024 * 1024
_VMEM_LIMIT = 112 * 1024 * 1024


def _choose_group(b, w, page_size, d, kv_bytes):
    """Pick (group_size, ppcb) maximizing in-flight pages within budget,
    preferring wider groups (more slots batched per grid step).

    Measured caution (v5e, bench shapes): a STANDALONE no-write sweep
    says G=16/ppd=2 is ~2x faster than G=64 (0.42 vs 0.7+ ms), but the
    engine's fused-write path measures the OPPOSITE end-to-end (343k vs
    433k tok/s): the per-step write-back DMA wait penalizes many small
    grid steps. Group-size tuning must be validated on the fused-write
    path; wide groups win there."""
    best = (1, 1)
    # G > 64 fits VMEM at narrow widths (gpt2s) but measured 55k vs 76k
    # tok/s — wide-group DMA batching stops paying past 64 slots/step
    for g in (64, 32, 16, 8, 4, 2, 1):
        if b % g:
            continue
        for c in range(w, 0, -1):
            if w % c:
                continue
            if _vmem_cost(g, c, page_size, d, kv_bytes) <= _VMEM_BUDGET:
                if g * c > best[0] * best[1]:
                    best = (g, c)
                break
    return best


def _best_ppcb(w, g, page_size, d, kv_bytes):
    for c in range(w, 0, -1):
        if w % c == 0 and _vmem_cost(g, c, page_size, d, kv_bytes) <= _VMEM_BUDGET:
            return c
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "group_size", "pages_per_compute_block",
                     "contiguous_pages", "pages_per_dma", "max_run_pages",
                     "packed_int4", "interpret"),
)
def paged_decode_attention_grouped(
    q,            # [B, D]
    kv_pages,     # [NP, 2, P, D] (0 = K rows, 1 = V rows)
    lengths,      # [B] int32
    page_table,   # [B, W] int32
    k_scales=None,
    v_scales=None,
    k_new=None,   # [B, D] raw new-token K rows -> fused in-kernel write
    v_new=None,   # [B, D] raw new-token V rows
    ring=None,        # [B, R, 2*Dk] pool-dtype burst ring (cols :Dk=K)
    ring_scales=None,  # [B, 128] f32 (cols 0..R-1 K, 64..64+R-1 V scales)
    ring_start=None,   # [B] i32 first position held by the ring
    *,
    n_heads: int = 1,
    group_size: int | None = None,
    pages_per_compute_block: int | None = None,
    contiguous_pages: bool = False,
    pages_per_dma: int | None = None,
    max_run_pages: int | None = None,
    packed_int4: bool = False,
    interpret: bool = False,
):
    """Grouped paged decode attention; with k_new/v_new the decode KV write
    is FUSED into the kernel (quantize against the already-updated per-page
    scales + insert at position lengths-1 + full-page write-back into the
    aliased pool) and the call returns (out, new_kv_pages). Replaces the
    XLA per-row scatter (measured ~0.39 ms/round of fixed cost at bench
    shapes; the reference's analogue is the in-kernel cache append of
    decoder.cu:69-90).

    RING/PARTIAL MODE (``ring_start`` given; mutually exclusive with
    k_new): the pool is READ-ONLY and holds positions < ring_start[b] (the
    burst's own decode rows live in a caller-side ring); page DMAs and
    masks are gated by ring_start instead of length, and the call returns
    the ONLINE-SOFTMAX PARTIAL (out, m, l) over the page context — each
    [B, n_heads] after the caller reshapes — so the caller can flash-merge
    the ring's contribution (batched XLA einsums over [B, R, D]; see
    models/paged.make_ring_round_callbacks) and flush the ring to pages
    once per burst (ops/ring_flush). This keeps the burst free of per-round
    page write-backs — the write path that was 2.4 of 8.6 ms/round on the
    12-layer model — without widening the kernel's per-slot dots past an
    MXU tile or making the ring a per-round kernel operand (both measured
    regressions)."""
    B, D = q.shape
    NP, two, P, Dk = kv_pages.shape
    assert two == 2 and Dk == (D // 2 if packed_int4 else D)
    W = page_table.shape[1]
    dh = D // n_heads
    # Odd slot counts: pad the batch to a multiple of 8 with dead rows
    # (length 0 -> no DMA, no insert, zero output) so a >=8-row group
    # always exists; callers get the original B back.
    b_orig = B
    pad = (-B) % 8
    if pad:
        # Pad page_table rows are ZEROS, and page id 0 may belong to a live
        # slot. Safety rests entirely on length == 0 gating: every page DMA,
        # fused insert, and write-back in the kernel is predicated on the
        # slot's length, so pad rows never touch page 0. Any edit that
        # weakens that gating silently corrupts a live page.
        zrow = jnp.zeros((pad, D), q.dtype)
        q = jnp.concatenate([q, zrow])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad,), lengths.dtype)])
        page_table = jnp.concatenate(
            [page_table, jnp.zeros((pad, W), page_table.dtype)])
        if k_new is not None:
            k_new = jnp.concatenate([k_new, zrow.astype(k_new.dtype)])
            v_new = jnp.concatenate([v_new, zrow.astype(v_new.dtype)])
        if ring_start is not None:
            ring_start = jnp.concatenate(
                [ring_start, jnp.zeros((pad,), ring_start.dtype)])
        B += pad
    if packed_int4:
        assert dh % 2 == 0 and k_scales is not None
    auto_g, auto_c = _choose_group(B, W, P, Dk, kv_pages.dtype.itemsize)
    G = group_size or auto_g
    ppcb = pages_per_compute_block or (auto_c if group_size is None else
                                       _best_ppcb(W, G, P, Dk, kv_pages.dtype.itemsize))
    assert B % G == 0 and W % ppcb == 0
    assert G * n_heads >= 8, "need >=8 rows per block for TPU sublane tiling"
    quantized = k_scales is not None
    fused_write = k_new is not None
    assert (k_new is None) == (v_new is None)
    ring_mode = ring_start is not None
    if ring_mode:
        assert not fused_write, "ring mode replaces the fused decode write"

    if contiguous_pages:
        # caller guarantees each slot's table row is a consecutive page
        # range (AutonomousEngine's group allocator); fetch whole runs with
        # one DMA each. Auto run length balances DMA count against
        # over-fetched bytes: int8 pools gate per RUN (2-page runs measured
        # best at bench shapes: 433k vs 400k tok/s for whole-block runs vs
        # 370k for per-page copies); float pools gate per BLOCK anyway, so
        # the whole block moves as one DMA.
        if pages_per_dma is None:
            auto = 2 if (kv_pages.dtype == jnp.int8 and ppcb % 2 == 0) else ppcb
            ppd = min(auto, ppcb)
        else:
            ppd = min(pages_per_dma, ppcb)
        if max_run_pages is not None:
            # contiguity may only hold within allocation units smaller than
            # a table row (overcommit half-groups): a run must never cross
            # a unit boundary, so it must DIVIDE the unit size (runs start
            # at multiples of ppd)
            import math as _math

            ppd = _math.gcd(ppd, max_run_pages)
        assert ppcb % ppd == 0
    else:
        assert pages_per_dma in (None, 1), (
            "pages_per_dma > 1 requires contiguous_pages"
        )
        ppd = 1

    # multihead: batch each slot's H per-head dots into one masked dot
    # (see _grouped_kernel); int4 keeps the per-head plane path
    batched = n_heads > 1 and not packed_int4

    q3 = q.reshape(B * n_heads, dh)
    block_spec = pl.BlockSpec((G * n_heads, dh), lambda g, i, *_: (g, 0))
    len_col_spec = pl.BlockSpec((G, 1), lambda g, i, *_: (g, 0))

    scalar_args = [
        lengths, page_table,
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
    ]
    if quantized:
        scalar_args += [k_scales, v_scales]
    if ring_mode:
        scalar_args += [ring_start]

    in_specs = [
        block_spec,
        len_col_spec,
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q3, lengths.reshape(B, 1), kv_pages]
    if batched:
        # the same q, viewed row-per-slot [B, D] for the elementwise side
        in_specs.insert(1, pl.BlockSpec((G, D), lambda g, i, *_: (g, 0)))
        inputs.insert(1, q)
    out_specs = block_spec
    out_shape = jax.ShapeDtypeStruct((B * n_heads, dh), jnp.float32)
    if ring_mode:
        # m/l ship out as dh-broadcast columns (they live in that layout
        # as the flash state anyway); the caller reads column 0
        out_specs = [block_spec, block_spec, block_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B * n_heads, dh), jnp.float32),
                     jax.ShapeDtypeStruct((B * n_heads, dh), jnp.float32)]
    scratch = [
        pltpu.VMEM((2, G, ppcb, 2, P, Dk), kv_pages.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if not ring_mode:
        scratch = [
            pltpu.VMEM((G * n_heads, dh), jnp.float32),  # m
            pltpu.VMEM((G * n_heads, dh), jnp.float32),  # l
        ] + scratch
    io_aliases = {}
    if fused_write:
        new_spec = pl.BlockSpec((G, D), lambda g, i, *_: (g, 0))
        in_specs += [new_spec, new_spec]
        inputs += [k_new, v_new]
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype)]
        scratch.append(pltpu.SemaphoreType.DMA)  # write-back semaphore
        # flattened operand index of kv_pages (scalars count) -> output 1
        io_aliases = {len(scalar_args) + (3 if batched else 2): 1}

    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel,
            batch_size=B,
            group_size=G,
            pages_per_compute_block=ppcb,
            n_heads=n_heads,
            quantized=quantized,
            fused_write=fused_write,
            pages_per_dma=ppd,
            packed_int4=packed_int4,
            batched_heads=batched,
            ring_mode=ring_mode,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
            in_specs=in_specs,
            out_specs=out_specs,
            grid=(B // G, W // ppcb),
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*scalar_args, *inputs)
    if fused_write:
        o, new_pages = out
        return o.reshape(B, D)[:b_orig], new_pages
    if ring_mode:
        o, m, l = out
        return (o.reshape(B, D)[:b_orig],
                m.reshape(B, n_heads, dh)[:b_orig, :, 0],
                l.reshape(B, n_heads, dh)[:b_orig, :, 0])
    return out.reshape(B, D)[:b_orig]

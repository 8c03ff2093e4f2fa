"""Dense-view paged decode attention (ring/partial mode, pure XLA).

The round-3 profile pinned gpt2s decode in ATTEND (5.96 of 7.89 ms/round
at len=32): a per-slot-per-layer Mosaic op floor in the grouped Pallas
kernel (~7 trace-unrolled ops/slot — each a small tensor op whose ~80-100ns
fixed cost dwarfs its bytes at 1-page contexts). The flat cross-slot kernel
attacked that floor in Pallas and lost (ops/paged_attention_flat.py).

This module attacks it OUTSIDE Pallas. Under the autonomous engine's group
allocator every slot's page-table row is exactly
``group_id * W + arange(W)`` (runtime/autonomous.py — contiguous full-group
grants), so the pool [NP, 2, P, D] reshapes FREE of charge to the dense
per-group tensor [NG, W, 2, P, D]. Attention then runs in group order as
pure batched XLA elementwise+reduce — zero per-slot ops, zero Pallas — with
a [B, D] scatter/gather moving q/o between slot and group order, and a
STATIC page-count bucket Wb <= W (lax.switch on the device-side max
ring_start) gating the bytes read to the live context.

Measured on v5e at gpt2s bench shapes (tools/attend_formulations.py,
B=1024, P=32, D=768, H=12, int8 + per-page scales): 0.20 ms/layer at
1-page contexts vs the grouped kernel's 0.31 ms — and the whole gpt2s
workload (len 32 prompts + a burst of rounds) sits in the 1-2 page bucket.
The grouped kernel stays the default for long contexts, where its
page-exact DMA gating beats dense reads (2+ page buckets measured 2-4x in
the kernel's favor without bucket folding; the folded single-token-axis
view below closes part of that, sweep in the tool).

CONTRACT (mirrors the grouped kernel's ring mode): pool is READ-ONLY and
holds positions < ring_start[b]; returns the online-softmax partial
(o [B, D] normalized, m [B, H], l [B, H]) for the caller to flash-merge
with the burst ring (models/paged.merge_ring_partial). Requires FULL-GRANT
contiguous group rows (EngineConfig.overcommit off — half-group grants
break the dense view; config.validate enforces this).

Reference parity note: the reference's paged attention walks per-slot page
pointers (paged_attention.cu); this formulation is only possible because
the TPU-side allocator hands out whole aligned groups — a design choice the
dense view now pays for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import unpack_int4


def _to_groups(x, grp, live, ng, fill=0):
    """Scatter [B, ...] slot-order rows into [NG, ...] group order; dead
    slots are dropped (their stale group ids may alias a live slot's)."""
    tgt = jnp.where(live, grp, ng)
    return jnp.full((ng,) + x.shape[1:], fill, x.dtype).at[tgt].set(
        x, mode="drop")


def dense_paged_partial(
    q,            # [B, D]
    kv_pages,     # [NP, 2, P, Dk] pool (int8 / float)
    k_scales,     # [NP] f32 or None
    v_scales,
    ring_start,   # [B] i32 — pages hold positions < ring_start
    lengths,      # [B] i32 (liveness: 0 = dead)
    page_table,   # [B, W] i32 — FULL-GRANT group rows (row[0] % W == 0)
    *,
    n_heads: int,
    page_size: int,
    w_bucket: int,
    packed_int4: bool = False,
):
    """One bucket's dense partial: read the first ``w_bucket`` pages of
    every group, return (o [B, D] normalized, m [B, H], l [B, H]) over
    page positions < ring_start. The [Wb, P] page axes are FOLDED into one
    token axis before the reductions — separate axes measured a large
    fusion cliff at Wb >= 2 on v5e."""
    B, D = q.shape
    NP = kv_pages.shape[0]
    P = page_size
    W = page_table.shape[1]
    NG = NP // W
    H = n_heads
    dh = D // H
    Wb = w_bucket
    T = Wb * P

    live = lengths > 0
    grp = page_table[:, 0] // W
    qg = _to_groups(q.astype(jnp.float32), grp, live, NG)
    rsg = _to_groups(jnp.where(live, ring_start, 0), grp, live, NG)

    view = kv_pages.reshape(NG, W, 2, P, kv_pages.shape[-1])[:, :Wb]
    if packed_int4:
        kd = unpack_int4(view[:, :, 0].reshape(NG, T, -1), H)
        vd = unpack_int4(view[:, :, 1].reshape(NG, T, -1), H)
    else:
        kd = view[:, :, 0].reshape(NG, T, D).astype(jnp.float32)
        vd = view[:, :, 1].reshape(NG, T, D).astype(jnp.float32)
    Kh = kd.reshape(NG, T, H, dh)
    Vh = vd.reshape(NG, T, H, dh)

    if k_scales is not None:
        pid = (jnp.arange(NG, dtype=jnp.int32)[:, None] * W
               + jnp.arange(Wb, dtype=jnp.int32)[None, :])      # [NG, Wb]
        kst = jnp.repeat(k_scales[pid], P, axis=1)              # [NG, T]
        vst = jnp.repeat(v_scales[pid], P, axis=1)

    qh = qg.reshape(NG, 1, H, dh)
    s = jnp.sum(Kh * qh, axis=-1) * (dh ** -0.5)                # [NG, T, H]
    if k_scales is not None:
        s = s * kst[:, :, None]
    pos = jnp.arange(T, dtype=jnp.int32)
    maskd = pos[None, :, None] < rsg[:, None, None]             # [NG, T, 1]
    s = jnp.where(maskd, s, -jnp.inf)
    m = jnp.max(s, axis=1)                                      # [NG, H]
    w = jnp.where(maskd, jnp.exp(s - m[:, None, :]), 0.0)
    l = jnp.sum(w, axis=1)                                      # [NG, H]
    if k_scales is not None:
        w = w * vst[:, :, None]
    o = jnp.einsum("gth,gthd->ghd", w, Vh)
    o = o / jnp.maximum(l, jnp.finfo(jnp.float32).tiny)[..., None]

    gi = jnp.clip(grp, 0, NG - 1)
    return o[gi].reshape(B, D), m[gi], l[gi]


def _bucket_widths(w: int):
    """Static Wb candidates: powers of two up to W (plus W itself) — keeps
    the lax.switch branch count at log2(W) while bounding over-read to 2x
    the live context."""
    out = []
    wb = 1
    while wb < w:
        out.append(wb)
        wb *= 2
    out.append(w)
    return out


def dense_paged_partial_bucketed(
    q, kv_pages, k_scales, v_scales, ring_start, lengths, page_table, *,
    n_heads, page_size, packed_int4=False,
):
    """Device-side bucketed dense partial: pick the smallest power-of-two
    page count covering max(ring_start) with lax.switch (no host trip, no
    per-shape recompile — all branches live in one executable)."""
    W = page_table.shape[1]
    widths = _bucket_widths(W)
    max_rs = jnp.max(jnp.where(lengths > 0, ring_start, 0))
    need = (max_rs + page_size - 1) // page_size            # pages needed

    idx = jnp.int32(0)
    for i, wb in enumerate(widths[1:], start=1):
        idx = jnp.where(need > widths[i - 1], jnp.int32(i), idx)

    def branch(wb):
        def f(args):
            return dense_paged_partial(
                *args, n_heads=n_heads, page_size=page_size,
                w_bucket=wb, packed_int4=packed_int4,
            )
        return f

    return jax.lax.switch(
        idx, [branch(wb) for wb in widths],
        (q, kv_pages, k_scales, v_scales, ring_start, lengths, page_table),
    )

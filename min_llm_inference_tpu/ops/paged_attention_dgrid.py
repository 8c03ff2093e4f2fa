"""Dense-grid Pallas paged decode attention (ring/partial mode).

Third attack on the gpt2s op-issue floor (CLAUDE.md r3 profile: attend is
5.96 of 7.89 ms/round at len=32, ~7 trace-unrolled Mosaic ops per slot per
layer — DMA issue chains + per-slot dots — not bytes). The two prior
formulations each fixed half the problem:

- ops/paged_attention_flat.py made COMPUTE constant-op per grid step but
  kept per-slot page-run DMA chains, and bought the op win with ~3 extra
  f32 passes over [G*bk, D] (measured loss: ref 442->308k, gpt2s 78->64k).
- ops/paged_attention_dense.py removed per-slot work entirely (pure XLA
  over the dense group view) but reads the WHOLE pool in group order each
  layer and materializes XLA dequant temps; past 1-page contexts it
  collapses (gpt2s bench 78k -> 10.9k at the full-width bucket).

This kernel combines the two fixes. Under the autonomous engine's group
allocator every slot's page-table row is ``group_id * W + arange(W)``
(runtime/autonomous.py — contiguous full-grant grants), so the pool
[NP, 2, P, D] is ALSO the dense tensor [NG, W, 2, P, D]. The kernel grids
over (group blocks, page columns) with REGULAR BlockSpecs:

- page fetch is the Pallas pipeline's own block DMA — ONE copy per grid
  step for Gb slots (no per-slot async_copy chains at all);
- per-block byte gating: a scalar-prefetched per-block page count clamps
  the w index_map, so steps past a block's live width re-address the
  previous block (Pallas skips the re-fetch) and skip compute;
- compute is constant-op per step (~25 Mosaic ops for Gb slots): scores
  for all Gb slots via ONE (K ⊙ q_bcast) . M selector dot (M[c, h] = 1
  iff feature c belongs to head h, the batched-heads trick of
  ops/paged_attention_grouped.py), [Gb, P, H] sublane flash stats, and
  ONE probs-expansion dot for PV. Per-page dequant scales multiply score
  ROWS (k) and prob rows (v) — raw int8 stays the MXU operand exactly as
  in the grouped kernel, so no dequantized KV copy ever exists.

CONTRACT (same as dense_paged_partial_bucketed): pool is READ-ONLY and
holds positions < ring_start[b]; returns the online-softmax partial
(o [B, D] normalized, m [B, H], l [B, H]) for the caller to merge with
the burst ring (models/paged.merge_ring_partial). Requires FULL-GRANT
contiguous group rows (EngineConfig.overcommit off). packed int4 pools
are not supported (the arithmetic nibble planes need per-head operand
splits that defeat the whole-block selector dot) — config.validate gates.

Reference parity note: the reference walks per-slot page pointers on the
GPU (paged_attention.cu); this formulation exists because the TPU-side
allocator hands out whole aligned page groups, making the pool itself a
dense tensor the hardware pipeline can stream.

MEASURED (round 4, one v5e chip): microbench (tools/attend_formulations
.py, B=1024 slots, D=768, H=12, int8): 0.312 ms vs grouped 0.618 at
1-page contexts, 0.332 vs 0.612 at 2-page — ~2x and FLAT in width (the
gate works). Same-session full-burst A/B (tools/dgrid_ab.py, gpt2s,
uniform lens): 7.35 vs 10.35 ms/round at len 32 (-29%), 9.21 vs 11.24 at
72, 9.86 vs 11.93 at 112. dgrid_block=8 measured WORSE everywhere
(10.96/13.08/14.27 — per-step fixed costs beat gate tightening; keep the
auto 32). On the REF workload (single layer, emb 2048) dgrid LOSES:
424.6k vs 521.0k same-day — that model is bandwidth/schedule bound, not
op-issue bound, and the block max-width gate reads dead bytes the
grouped kernel skips. Default: ON for gpt2s (bench.py), OFF for ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 1024 * 1024


def _dgrid_kernel(
    need_ref,      # [NB] i32 scalar prefetch: live page count per block
    q_ref,         # [Gb, D] model dtype
    rs_ref,        # [Gb, 1] i32 ring_start per group row
    *rest,
    n_pages_w: int,
    group_block: int,
    n_heads: int,
    page_size: int,
    quantized: bool,
):
    if quantized:
        # [Gb, W] blocks (a (Gb, 1) column block would violate the TPU
        # block-shape rule: the minor dim must be 128-divisible or equal
        # the array dim); the live page's column is selected in-kernel
        ks_ref, vs_ref, kv_ref, o_ref, m_ref, l_ref = rest
    else:
        kv_ref, o_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    Gb = group_block
    H = n_heads
    P = page_size
    D = q_ref.shape[1]
    dh = D // H
    N = Gb * P
    nb, w = pl.program_id(0), pl.program_id(1)
    neg_inf = jnp.float32(-jnp.inf)

    @pl.when(w == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
        m_ref[...] = jnp.full_like(m_ref, neg_inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    # head-selector matrix: M[c, h] = 1 iff feature c belongs to head h
    feat = lax.broadcasted_iota(jnp.int32, (D, H), 0) // dh
    hsel = lax.broadcasted_iota(jnp.int32, (D, H), 1)
    m_mat = (feat == hsel).astype(jnp.float32)

    @pl.when(w < need_ref[nb])
    def _compute():
        kf = kv_ref[:, 0, 0].astype(jnp.float32)          # [Gb, P, D]
        qf = q_ref[...].astype(jnp.float32)               # [Gb, D]
        qb = lax.broadcast_in_dim(qf, (Gb, P, D), (0, 2))
        p = (kf * qb).reshape(N, D)
        s = lax.dot_general(
            p, m_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (dh ** -0.5)                                  # [N, H]

        def col(mat):
            # [Gb, 1] -> [N, 1] row-per-(slot, token) column
            return lax.broadcast_in_dim(
                mat, (Gb, P, 1), (0, 2)
            ).reshape(N, 1)

        def page_scale(ref2d):
            # select page column w of the [Gb, W] scale block (compute only
            # runs under w < need, so the kv block's page column IS w)
            lane = lax.broadcasted_iota(jnp.int32, ref2d.shape, 1)
            return jnp.sum(
                jnp.where(lane == w, ref2d[...], 0.0),
                axis=1, keepdims=True,
            )                                             # [Gb, 1]

        if quantized:
            s = s * col(page_scale(ks_ref))
        pos = w * P + lax.broadcasted_iota(jnp.int32, (N, 1), 0) % P
        s = jnp.where(pos < col(rs_ref[...]), s, neg_inf)

        s3 = s.reshape(Gb, P, H)
        m_curr = jnp.max(s3, axis=1)                      # [Gb, H]
        m_prev = m_ref[...]
        m_next = jnp.maximum(m_prev, m_curr)
        # rows with no live column anywhere stay at -inf: exp against a
        # finite stand-in keeps exp(-inf - 0) == 0 without NaN
        safe_m = jnp.where(m_next == neg_inf, 0.0, m_next)
        alpha = jnp.where(
            m_prev == neg_inf, 0.0, jnp.exp(m_prev - safe_m)
        )                                                 # [Gb, H]
        probs = jnp.exp(s3 - safe_m[:, None, :])          # [Gb, P, H]
        l_curr = jnp.sum(probs, axis=1)
        m_ref[...] = m_next
        l_ref[...] = alpha * l_ref[...] + l_curr

        pf = probs.reshape(N, H)
        if quantized:
            pf = pf * col(page_scale(vs_ref))
        u = lax.dot_general(
            pf, m_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [N, D]
        vf = kv_ref[:, 0, 1].astype(jnp.float32).reshape(N, D)
        ov = jnp.sum((u * vf).reshape(Gb, P, D), axis=1)  # [Gb, D]
        alpha_d = lax.dot_general(
            alpha, m_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [Gb, D]
        o_ref[...] = alpha_d * o_ref[...] + ov

    @pl.when(w == n_pages_w - 1)
    def _finalize():
        l_d = lax.dot_general(
            jnp.maximum(l_ref[...], jnp.finfo(jnp.float32).tiny), m_mat,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o_ref[...] / l_d


def _choose_group_block(ng: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if ng % g == 0:
            return g
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "page_size", "group_block", "interpret"),
)
def dgrid_paged_partial(
    q,            # [B, D]
    kv_pages,     # [NP, 2, P, D] pool (int8 or float)
    k_scales,     # [NP] f32 or None
    v_scales,
    ring_start,   # [B] i32 — pages hold positions < ring_start
    lengths,      # [B] i32 (liveness: 0 = dead)
    page_table,   # [B, W] i32 — FULL-GRANT group rows (row[0] % W == 0)
    *,
    n_heads: int,
    page_size: int,
    group_block: int | None = None,
    interpret: bool = False,
):
    """Online-softmax page partial over the dense group view; returns
    (o [B, D] normalized, m [B, H], l [B, H]) in slot order. One XLA
    scatter moves q into group order and three gathers move the partial
    back (~4 x [B, D]-scale transfers per call — ~0.5%% of the page bytes
    at bench shapes)."""
    B, D = q.shape
    NP, two, P, Dk = kv_pages.shape
    assert two == 2 and Dk == D, "dgrid: packed int4 unsupported"
    assert P == page_size
    W = page_table.shape[1]
    assert NP % W == 0
    NG = NP // W
    H = n_heads
    Gb = group_block or _choose_group_block(NG)
    assert NG % Gb == 0
    NB = NG // Gb
    quantized = k_scales is not None

    live = lengths > 0
    grp = page_table[:, 0] // W
    tgt = jnp.where(live, grp, NG)
    qg = jnp.zeros((NG, D), q.dtype).at[tgt].set(q, mode="drop")
    rsg = jnp.zeros((NG,), jnp.int32).at[tgt].set(
        jnp.where(live, ring_start, 0), mode="drop")
    need_b = ((rsg + P - 1) // P).reshape(NB, Gb).max(axis=1)  # [NB] i32

    view = kv_pages.reshape(NG, W, 2, P, D)

    def wmap(nb, w, need_ref):
        # steps past the block's live width re-address its last live page
        # column: the pipeline sees an unchanged block index and skips the
        # fetch; compute is skipped by the in-kernel pl.when
        return jnp.minimum(w, jnp.maximum(need_ref[nb] - 1, 0))

    in_specs = [
        pl.BlockSpec((Gb, D), lambda nb, w, *_: (nb, 0)),
        pl.BlockSpec((Gb, 1), lambda nb, w, *_: (nb, 0)),
    ]
    inputs = [qg, rsg.reshape(NG, 1)]
    if quantized:
        # whole [Gb, W] scale rows per block (W is a handful of lanes; a
        # (Gb, 1) column block would be an illegal sub-lane block shape)
        in_specs += [
            pl.BlockSpec((Gb, W), lambda nb, w, *_: (nb, 0)),
            pl.BlockSpec((Gb, W), lambda nb, w, *_: (nb, 0)),
        ]
        inputs += [k_scales.reshape(NG, W), v_scales.reshape(NG, W)]
    in_specs.append(
        pl.BlockSpec(
            (Gb, 1, 2, P, D),
            lambda nb, w, nd: (nb, wmap(nb, w, nd), 0, 0, 0),
        )
    )
    inputs.append(view)

    out_specs = [
        pl.BlockSpec((Gb, D), lambda nb, w, *_: (nb, 0)),
        pl.BlockSpec((Gb, H), lambda nb, w, *_: (nb, 0)),
        pl.BlockSpec((Gb, H), lambda nb, w, *_: (nb, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NG, D), jnp.float32),
        jax.ShapeDtypeStruct((NG, H), jnp.float32),
        jax.ShapeDtypeStruct((NG, H), jnp.float32),
    ]

    og, mg, lg = pl.pallas_call(
        functools.partial(
            _dgrid_kernel,
            n_pages_w=W,
            group_block=Gb,
            n_heads=H,
            page_size=P,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=in_specs,
            out_specs=out_specs,
            grid=(NB, W),
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(need_b, *inputs)

    gi = jnp.clip(grp, 0, NG - 1)
    return og[gi], mg[gi], lg[gi]

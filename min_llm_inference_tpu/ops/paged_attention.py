"""Fused Pallas paged-attention decode kernel.

The TPU-native replacement for the reference's per-token paged decode
pipeline (qkt_paged_attention + softmax_in_place_with_lengths +
softmax_v_paged_attention, /root/reference/src/kernels/paged_attention.cu:
208-326) — one kernel instead of three, flash-style online softmax instead
of a materialized [B, n_seq] score matrix:

  * page indices ride in as scalar-prefetch SMEM operands, the TPU analogue
    of the reference's shared-memory ``page_pos`` caching trick
    (paged_attention.cu:38-44; README.md:56-72): indices are available
    before the kernel body, so page DMAs are issued ahead of compute;
  * K and V live in ONE pool ``[n_pages, 2, page_size, D]`` (the analogue
    of the reference packing k/v sub-buffers into one page allocation,
    include/utils.h:32-44), so ONE DMA per page streams both — the decode
    path is DMA-latency-bound, and this halves the DMA count;
  * pages stream HBM -> VMEM with double-buffered async DMA, the next
    block prefetched while the current one is in the MXU;
  * per-slot ``lengths`` masking, with length-0 (dead) slots producing
    exact zeros — the engine's liveness convention;
  * INT8 KV: pages are int8 with one fp32 scale per page per side; the
    scales ride scalar prefetch (SMEM), so the quantized path DMAs exactly
    half the bytes of bf16 — dequant is a per-page scalar multiply after
    the copy.

Layout (framework-native, differs from jax.experimental's kernel):
  q:          [B, D]           D = n_heads * head_dim, packed
  kv_pages:   [n_pages, 2, page_size, D]  one shared pool (0=K, 1=V)
  lengths:    [B] int32        0 = dead slot
  page_table: [B, W] int32     page ids per slot (stale beyond its pages)
  k/v_scales: [n_pages] f32    per-page int8 scales (quantized only)
Returns [B, D] float32.

Kernel-structure attribution: the double-buffered page-DMA scheme
(_PageBlockCopy, next_compute_block's dead-slot walk, buffer_index/
init_flag flags, the -0.7*f32max mask value) is derived from JAX's
Apache-2.0 ``jax.experimental.pallas.ops.tpu.paged_attention`` kernel,
substantially reworked for this framework (pooled K|V page layout, packed
heads, per-page scalar int8 scales via SMEM, exact-zero dead slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class _PageBlockCopy:
    """Async-copy descriptor for one compute block of KV pages: one DMA per
    page (pages are non-contiguous in the pool) covering that page's K AND
    V rows, all started concurrently."""

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_tbl_ref, b, block_start, n_pages_to_load):
        self._buf = vmem_buf
        self._copies = [
            pltpu.make_async_copy(
                pages_hbm_ref.at[page_tbl_ref[b, block_start + j]],
                vmem_buf.at[j],
                sem,
            )
            for j in range(n_pages_to_load)
        ]

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()

    def wait_and_get_kv(self, k_scales_ref=None, v_scales_ref=None,
                        page_tbl_ref=None, b=None, block_start=None):
        """Returns (k, v) each [bk, D] float32; int8 pages are dequantized
        with their page's scalar scales (read from SMEM — no scale DMA)."""
        for c in self._copies:
            c.wait()
        ppcb, _, page_size, d = self._buf.shape
        if k_scales_ref is None:
            blk = self._buf[...].astype(jnp.float32)  # [ppcb, 2, P, D]
            return (
                blk[:, 0].reshape(ppcb * page_size, d),
                blk[:, 1].reshape(ppcb * page_size, d),
            )
        ks, vs = [], []
        for j in range(ppcb):
            pid = page_tbl_ref[b, block_start + j]
            ks.append(self._buf[j, 0].astype(jnp.float32) * k_scales_ref[pid])
            vs.append(self._buf[j, 1].astype(jnp.float32) * v_scales_ref[pid])
        return jnp.concatenate(ks, axis=0), jnp.concatenate(vs, axis=0)


def _paged_decode_kernel(
    # scalar prefetch (order fixed by the launcher)
    *refs,
    batch_size: int,
    pages_per_compute_block: int,
    n_heads: int,
    quantized: bool = False,
    mask_value: float = MASK_VALUE,
):
    if quantized:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         k_scales_ref, v_scales_ref,
         q_ref, pages_hbm,
         o_ref, m_scratch, l_scratch, kv_buf, kv_sem) = refs
    else:
        (lengths_ref, page_tbl_ref, buffer_index_ref, init_flag_ref,
         q_ref, pages_hbm,
         o_ref, m_scratch, l_scratch, kv_buf, kv_sem) = refs
        k_scales_ref = v_scales_ref = None

    b, i = pl.program_id(0), pl.program_id(1)
    ppcb = pages_per_compute_block
    page_size = kv_buf.shape[3]
    bk = ppcb * page_size
    length = lengths_ref[b]

    def make_copy(b_, i_, buf_idx):
        return _PageBlockCopy(
            pages_hbm, kv_buf.at[buf_idx], kv_sem.at[buf_idx],
            page_tbl_ref, b_, i_ * ppcb, ppcb,
        )

    def next_compute_block(b_, i_):
        """First (b', i') at or after (b_, i_) whose block is inside its
        slot's length — skipping dead slots (length 0) entirely."""

        def advance_b():
            next_b = b_ + 1

            def skip_dead():
                # bb can reach batch_size when every trailing slot is dead;
                # clamp the SMEM read and gate the walk (the unclamped read
                # would be out-of-bounds UB on hardware).
                def body(_, bb):
                    dead = lengths_ref[lax.clamp(0, bb, batch_size - 1)] == 0
                    return jnp.where((bb < batch_size) & dead, bb + 1, bb)

                return lax.fori_loop(next_b + 1, batch_size, body, next_b + 1)

            return (
                lax.cond(
                    jnp.logical_and(
                        next_b < batch_size,
                        lengths_ref[lax.clamp(0, next_b, batch_size - 1)] == 0,
                    ),
                    skip_dead,
                    lambda: next_b,
                ),
                0,
            )

        return lax.cond(i_ * bk < length, lambda: (b_, i_), advance_b)

    @pl.when(i == 0)
    def init():
        # Dead slots never enter the flash body; this zero IS their output.
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(i * bk < length)
    def flash_body():
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0
        buffer_index = buffer_index_ref[0]
        next_b, next_i = next_compute_block(b, i + 1)

        @pl.when(init_flag == 1)
        def prefetch_first():
            make_copy(b, i, buffer_index).start()

        @pl.when(next_b < batch_size)
        def prefetch_next():
            nbi = jnp.where(buffer_index == 0, 1, 0)
            make_copy(next_b, next_i, nbi).start()
            buffer_index_ref[0] = nbi

        copy = make_copy(b, i, buffer_index)
        q = q_ref[...].astype(jnp.float32)          # [H, dh]
        dh = q.shape[-1]
        k, v = copy.wait_and_get_kv(
            k_scales_ref, v_scales_ref, page_tbl_ref, b, i * ppcb
        )
        # qk[h, t] = sum_d q[h, d] * k[t, h*dh + d], scaled 1/sqrt(dh) like
        # the reference qkt kernel (scale applied at score time). Heads are
        # a static unrolled loop — Mosaic has no batched dot_general.
        qk = jnp.concatenate(
            [
                lax.dot_general(
                    q[h : h + 1, :], k[:, h * dh : (h + 1) * dh],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_heads)
            ],
            axis=0,
        ) * (dh ** -0.5)                             # [H, bk]
        mask = i * bk + lax.broadcasted_iota(jnp.int32, qk.shape, 1) < length
        qk = qk + jnp.where(mask, 0.0, mask_value)

        m_prev, l_prev = m_scratch[...], l_scratch[...]   # [H, dh]
        m_curr = jnp.max(qk, axis=-1)                     # [H]
        s_curr = jnp.exp(qk - m_curr[..., None])          # [H, bk]
        l_curr = lax.broadcast_in_dim(jnp.sum(s_curr, axis=-1), l_prev.shape, (0,))
        m_curr = lax.broadcast_in_dim(m_curr, m_prev.shape, (0,))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        beta = jnp.exp(m_curr - m_next)
        l_next = alpha * l_prev + beta * l_curr
        m_scratch[...], l_scratch[...] = m_next, l_next

        o_curr = jnp.concatenate(
            [
                lax.dot_general(
                    s_curr[h : h + 1, :], v[:, h * dh : (h + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_heads)
            ],
            axis=0,
        )                                            # [H, dh]
        o_ref[...] = (
            (l_prev * alpha * o_ref[...] + beta * o_curr) / l_next
        ).astype(o_ref.dtype)


def _choose_ppcb(w: int, page_size: int, d: int, kv_bytes: int) -> int:
    """Largest divisor of W keeping the double-buffered KV VMEM under ~8MB."""
    budget = 8 * 1024 * 1024
    best = 1
    for c in range(1, w + 1):
        if w % c == 0 and 4 * c * page_size * d * kv_bytes <= budget:
            best = c
    return best


@functools.partial(
    jax.jit, static_argnames=("n_heads", "pages_per_compute_block", "interpret")
)
def paged_decode_attention(
    q,            # [B, D]
    kv_pages,     # [NP, 2, P, D] (0 = K rows, 1 = V rows)
    lengths,      # [B] int32
    page_table,   # [B, W] int32
    k_scales=None,  # [NP] f32 per-page scales (int8 KV)
    v_scales=None,
    *,
    n_heads: int = 1,
    pages_per_compute_block: int | None = None,
    interpret: bool = False,
):
    B, D = q.shape
    NP, two, P, Dk = kv_pages.shape
    assert two == 2 and Dk == D
    W = page_table.shape[1]
    assert D % n_heads == 0
    dh = D // n_heads
    ppcb = pages_per_compute_block or _choose_ppcb(W, P, D, kv_pages.dtype.itemsize)
    assert W % ppcb == 0
    quantized = k_scales is not None
    if quantized:
        assert k_scales.shape == (NP,) and v_scales.shape == (NP,)

    q3 = q.reshape(B, n_heads, dh)
    block_spec = pl.BlockSpec((None, n_heads, dh), lambda b, i, *_: (b, 0, 0))

    scalar_args = [
        lengths,
        page_table,
        jnp.zeros((1,), jnp.int32),  # buffer_index
        jnp.ones((1,), jnp.int32),   # init_flag
    ]
    if quantized:
        scalar_args += [k_scales, v_scales]

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_kernel,
            batch_size=B,
            pages_per_compute_block=ppcb,
            n_heads=n_heads,
            quantized=quantized,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
            in_specs=[
                block_spec,
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=block_spec,
            grid=(B, W // ppcb),
            scratch_shapes=[
                pltpu.VMEM((n_heads, dh), jnp.float32),  # m
                pltpu.VMEM((n_heads, dh), jnp.float32),  # l
                pltpu.VMEM((2, ppcb, 2, P, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_heads, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        *scalar_args,
        q3,
        kv_pages,
    )
    return out.reshape(B, D)

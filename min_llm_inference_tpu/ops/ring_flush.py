"""Pallas ring-flush: land a burst's decode ring in its KV pages in-place.

Once per burst, each live slot's ring rows (positions ring_start ..
ring_start + nv - 1, at most two pages since n_forward_rounds <= page_size)
must be merged into the paged pool. The XLA formulation (gather both
candidate pages, where-merge, window-scatter) moved ~4x the page bytes and
measured 0.52 ms/round at ref bench shapes — as much as the write path it
replaced. This kernel does the minimal thing: DMA the <=2 touched pages to
VMEM, insert the ring rows with ONE dynamic roll + select per side, and DMA
the pages back into the ALIASED pool. Bytes moved = touched pages x2, DMA
issues = <=4 per slot, zero pool copies.

Roll trick: the padded-to-page ring block rolled by ring_start % page_size
aligns ring row (pos - ring_start) under page row pos % page_size for BOTH
candidate pages at once (page starts differ by exactly one page), so one
rolled tensor serves both inserts; the validity mask selects the real rows.
pltpu.roll needs 32-bit lanes — int8/bf16 rings upcast transiently
(CLAUDE.md Mosaic notes).

Slots DEAD at flush time are skipped entirely: their pages are freed at the
next burst start and re-prefilled before anything reads them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # slots per grid step


def _flush_kernel(
    rs_ref, r0_ref, lengths_ref, page_tbl_ref,   # scalar prefetch
    ring_ref,                            # [G, R, 2*Dk] VMEM block
    pages_hbm,                           # ANY (aliased input)
    pages_out,                           # ANY (aliased output)
    buf, fsem, wsem,                     # scratch
    *,
    n_rounds: int,
    page_size: int,
):
    g = pl.program_id(0)
    G = _G
    P = page_size
    W = page_tbl_ref.shape[1]
    R = ring_ref.shape[1]
    dk = ring_ref.shape[2] // 2

    def slot_items(j):
        slot = g * G + j
        ln = lengths_ref[slot]
        rs = rs_ref[slot]
        r0 = r0_ref[slot]   # first valid ring column (admission round)
        end = rs + jnp.minimum(ln - rs, n_rounds - r0)  # exclusive bound
        out = []
        for t in range(2):
            w = rs // P + t
            pid = page_tbl_ref[slot, jnp.clip(w, 0, W - 1)]
            cond = (ln > 0) & (w * P < end) & (w < W)
            out.append((cond, t, w, pid))
        return rs, r0, end, out

    def fetch_copy(j, t, pid):
        return pltpu.make_async_copy(
            pages_hbm.at[pid], buf.at[j, t], fsem
        )

    def wb_copy(j, t, pid):
        return pltpu.make_async_copy(
            buf.at[j, t], pages_out.at[pid], wsem
        )

    for j in range(G):
        _, _, _, items = slot_items(j)
        for cond, t, w, pid in items:
            @pl.when(cond)
            def _start(j=j, t=t, pid=pid):
                fetch_copy(j, t, pid).start()
    for j in range(G):
        _, _, _, items = slot_items(j)
        for cond, t, w, pid in items:
            @pl.when(cond)
            def _wait(j=j, t=t, pid=pid):
                fetch_copy(j, t, pid).wait()

    prow = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    for j in range(G):
        rs, r0, end, items = slot_items(j)
        # align ring row (pos - rs + r0) under page row pos % P
        shift = jnp.remainder(rs - r0, P)
        any_touch = items[0][0] | items[1][0]

        @pl.when(any_touch)
        def _insert(j=j, rs=rs, end=end, shift=shift, items=items):
            for side in (0, 1):
                rsl = ring_ref[j][:, side * dk : (side + 1) * dk]  # [R, dk]
                if R < P:
                    rsl = jnp.concatenate(
                        [rsl, jnp.zeros((P - R, dk), rsl.dtype)], axis=0
                    )
                up = jnp.int32 if rsl.dtype == jnp.int8 else jnp.float32
                rolled = pltpu.roll(rsl.astype(up), shift, 0)
                for cond, t, w, pid in items:
                    @pl.when(cond)
                    def _one(t=t, w=w, rolled=rolled, side=side):
                        pos = w * P + prow
                        valid = (pos >= rs) & (pos < end)
                        tile = buf[j, t, side]
                        buf[j, t, side] = jnp.where(
                            valid, rolled.astype(tile.dtype), tile
                        )

        for cond, t, w, pid in items:
            @pl.when(cond)
            def _wb(j=j, t=t, pid=pid):
                wb_copy(j, t, pid).start()
    for j in range(G):
        _, _, _, items = slot_items(j)
        for cond, t, w, pid in items:
            @pl.when(cond)
            def _wbwait(j=j, t=t, pid=pid):
                wb_copy(j, t, pid).wait()


@functools.partial(jax.jit, static_argnames=("n_rounds", "interpret"))
def ring_flush(kv_pages, ring, ring_start, lengths, page_table, *,
               n_rounds: int, ring_r0=None, interpret: bool = False):
    """kv_pages: [NP, 2, P, Dk] (returned updated, aliased in-place);
    ring: [B, R, 2*Dk] (cols :Dk = K, Dk: = V); ring_start/lengths: [B] i32;
    page_table: [B, W]; ring_r0: [B] i32 first valid ring column per slot
    (None = 0 — single-admission rings). A slot's rows live at columns
    r0 + (pos - ring_start) for pos in [ring_start, ring_start +
    min(length - ring_start, n_rounds - r0))."""
    NP, two, P, Dk = kv_pages.shape
    B, R, two_dk = ring.shape
    assert two == 2 and two_dk == 2 * Dk
    assert R <= P, "ring must fit one page (n_forward_rounds <= page_size)"
    if ring_r0 is None:
        ring_r0 = jnp.zeros((B,), jnp.int32)
    pad = (-B) % _G
    if pad:
        # pad rows are dead (length 0): no fetch, no insert, no write-back
        ring = jnp.concatenate(
            [ring, jnp.zeros((pad, R, two_dk), ring.dtype)])
        ring_start = jnp.concatenate(
            [ring_start, jnp.zeros((pad,), ring_start.dtype)])
        ring_r0 = jnp.concatenate(
            [ring_r0, jnp.zeros((pad,), ring_r0.dtype)])
        lengths = jnp.concatenate(
            [lengths, jnp.zeros((pad,), lengths.dtype)])
        page_table = jnp.concatenate(
            [page_table, jnp.zeros((pad, page_table.shape[1]),
                                   page_table.dtype)])
        B += pad

    grid = (B // _G,)
    return pl.pallas_call(
        functools.partial(_flush_kernel, n_rounds=n_rounds, page_size=P),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=[
                pl.BlockSpec((_G, R, two_dk), lambda g, *_: (g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            grid=grid,
            scratch_shapes=[
                pltpu.VMEM((_G, 2, 2, P, Dk), kv_pages.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        input_output_aliases={5: 0},  # 4 scalar operands + ring -> kv_pages
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ring_start, ring_r0, lengths, page_table, ring, kv_pages)

"""Fused prefill quantize + page-scatter Pallas kernel (int8 KV pools).

The XLA path for an int8 prefill write is three passes over the K/V block
(quantize-materialize, window scatter, plus the f32 convert chain XLA does
not fully fuse — measured ~1.9 ms of a 4.5 ms [256, 64] prefill burst).
This kernel does it in ONE pass: per covered page it loads the [P, D]
bf16/f32 tile, multiplies by the page's inverse scale (scalar prefetch),
rounds/clips to int8 in VMEM, and DMAs the tile straight into the aliased
pool at its page id — the TPU analogue of the reference's coalesced
prefill stores (self_attention_inference_optimized.cu:27-85).

Scales must be pre-updated (ops/quant.update_page_scales) exactly as for
the XLA path, so the quantized bytes are bit-identical to
models/paged._quantize_block_per_page + scatter (tests pin this).

Layout contract: pool [NP, 2, P, D] (0 = K rows, 1 = V rows); blocks
k/v [M, W_pre * P, D]; pid/inv_k/inv_v [M, W_pre] with pid == NP for
pages that must not be written (uncovered / padding rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    pid_ref,      # [M * W] i32 scalar prefetch, (m, w) at m*W + w (NP = skip)
    inv_k_ref,    # [M * W] f32 (1D: 2D SMEM operands pad the minor dim to
    inv_v_ref,    # [M * W] f32  128 lanes and blow the 1MB SMEM budget)
    k_ref,        # [1, P, D] block of K rows for (m, w)
    v_ref,        # [1, P, D]
    pool_in,      # [NP, 2, P, D] int8 (ANY; same buffer as pool_hbm)
    pool_hbm,     # [NP, 2, P, D] int8 output (ANY; aliased to pool_in)
    qbuf,         # VMEM [2, 2, P, D] int8 double-buffered staging
    sem,          # DMA sem [2]
    *,
    n_pages: int,
    n_w: int,
):
    m, w = pl.program_id(0), pl.program_id(1)
    pid = pid_ref[m * n_w + w]
    valid = pid < n_pages
    buf = (m * n_w + w) % 2

    def copy(b, p):
        return pltpu.make_async_copy(
            qbuf.at[b], pool_hbm.at[p], sem.at[b]
        )

    # wait for the DMA that used this buffer slot two steps ago
    step = m * n_w + w
    prev = step - 2
    pm, pw = prev // n_w, prev % n_w

    @pl.when(step >= 2)
    def _wait_prev():
        ppid = pid_ref[pm * n_w + pw]

        @pl.when(ppid < n_pages)
        def _():
            copy(buf, ppid).wait()

    @pl.when(valid)
    def _quantize_and_store():
        for side, (ref, inv_ref) in enumerate(
            ((k_ref, inv_k_ref), (v_ref, inv_v_ref))
        ):
            x = ref[0].astype(jnp.float32) * inv_ref[m * n_w + w]
            qbuf[buf, side] = jnp.clip(
                jnp.round(x), -127.0, 127.0
            ).astype(jnp.int8)
        copy(buf, pid).start()

    # drain: the last two steps' DMAs must land before the kernel exits
    last = n_w * pl.num_programs(0) - 1

    @pl.when(step == last)
    def _drain():
        for s in (last - 1, last):
            if s < 0:
                continue
            @pl.when(pid_ref[s] < n_pages)
            def _(s=s):
                copy(s % 2, pid_ref[s]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefill_quant_scatter(
    pool,      # [NP, 2, P, D] int8
    k,         # [M, S_pre, D] float block (S_pre % P == 0)
    v,         # [M, S_pre, D]
    pid,       # [M, W_pre] i32 page ids; NP = skip
    inv_k,     # [M, W_pre] f32 inverse K scales
    inv_v,     # [M, W_pre] f32 inverse V scales
    *,
    interpret: bool = False,
):
    NP, two, P, D = pool.shape
    M, S_pre, Dk = k.shape
    assert two == 2 and Dk == D and S_pre % P == 0
    W_pre = S_pre // P
    assert pid.shape == (M, W_pre)

    grid = (M, W_pre)
    k4 = k.reshape(M * W_pre, P, D)
    v4 = v.reshape(M * W_pre, P, D)
    blk = pl.BlockSpec((1, P, D), lambda m, w, *_: (m * W_pre + w, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, n_pages=NP, n_w=W_pre),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            in_specs=[blk, blk, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            grid=grid,
            scratch_shapes=[
                pltpu.VMEM((2, 2, P, D), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={5: 0},  # pool (after 3 scalars + k4 + v4)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pid.reshape(-1), inv_k.reshape(-1), inv_v.reshape(-1), k4, v4, pool)
    return out

"""gpt2s attend-formulation shootout (round-4 op-issue-floor attack).

The round-3 profile pinned gpt2s's cost in ATTEND: 5.96 of 7.89 ms/round
at len=32, diagnosed as a per-slot-per-layer Mosaic op-issue floor (~7
trace-unrolled ops/slot: predicated DMA chains + per-slot dots). The flat
cross-slot kernel attacked it and lost (ops/paged_attention_flat.py).

Round-4 candidate: the DENSE-VIEW XLA attend. Under the autonomous
engine's group allocator every slot's page-table row is exactly
``group_id * W + arange(W)`` (runtime/autonomous.py:81-114), so the pool
[NP, 2, P, D] reshapes FREE of charge to [NG, W, 2, P, D] — a dense
per-group KV tensor. Attend then runs in group order as pure batched
XLA elementwise+reduce (zero per-slot ops, zero Pallas), with a cheap
[B, D] scatter/gather to move q/o between slot and group order, and a
STATIC page-count bucket Wb <= W (the engine picks it per burst with
lax.switch on max ring_start — device-side, no host trip) to gate bytes.

This tool measures per-call wall time of each formulation at gpt2s bench
shapes (B=1024, W=4, P=32, D=768, H=12, int8 pool + per-page scales) as a
function of the page-resident context length, using the data-chained
two-count methodology (tools/decode_microbench.py::chain_time — the
transport elides independent same-arg calls and block_until_ready lies).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/attend_formulations.py
       [--lens 24,56,88,120] [--out /dev/stdout]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from min_llm_inference_tpu.ops.paged_attention_dense import (
    dense_paged_partial,
    dense_paged_partial_bucketed,
)
from min_llm_inference_tpu.ops.paged_attention_dgrid import (
    dgrid_paged_partial,
)
from min_llm_inference_tpu.ops.paged_attention_grouped import (
    paged_decode_attention_grouped,
)


def _barrier(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def chain_time(step, first, n_small=16, n_big=64):
    def run(n):
        s = first
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _barrier(s[0] if isinstance(s, tuple) else s)
        return time.perf_counter() - t0

    run(2)
    t_small = run(n_small)
    t_big = run(n_big)
    return (t_big - t_small) / (n_big - n_small)


# ---------------------------------------------------------------- dense

def dense_partial(q, pool, ks, vs, ring_start, lens, grp, *, n_heads, w_full,
                  w_bucket, page_size):
    """Online-softmax partial (o [B, D] normalized, m/l [B, H]) over page
    positions < ring_start, computed on the dense group view with only the
    first ``w_bucket`` pages of each group read. Pure batched XLA: the
    per-slot work of the Pallas kernel becomes fused elementwise+reduce
    over [NG, Wb, P, H, dh] with no materialized f32 KV copy."""
    B, D = q.shape
    NP = pool.shape[0]
    P = page_size
    NG = NP // w_full
    H = n_heads
    dh = D // H
    Wb = w_bucket

    live = lens > 0
    tgt = jnp.where(live, grp, NG)
    qg = jnp.zeros((NG, D), jnp.float32).at[tgt].set(
        q.astype(jnp.float32), mode="drop")
    rsg = jnp.zeros((NG,), jnp.int32).at[tgt].set(
        jnp.where(live, ring_start, 0), mode="drop")

    view = pool.reshape(NG, w_full, 2, P, D)[:, :Wb]
    Kh = view[:, :, 0].reshape(NG, Wb, P, H, dh)
    Vh = view[:, :, 1].reshape(NG, Wb, P, H, dh)
    ksg = ks.reshape(NG, w_full)[:, :Wb]
    vsg = vs.reshape(NG, w_full)[:, :Wb]

    qh = qg.reshape(NG, 1, 1, H, dh)
    s = jnp.sum(Kh.astype(jnp.float32) * qh, axis=-1)        # [NG, Wb, P, H]
    s = s * (dh ** -0.5) * ksg[:, :, None, None]
    pos = (jnp.arange(Wb, dtype=jnp.int32)[:, None] * P
           + jnp.arange(P, dtype=jnp.int32)[None, :])        # [Wb, P]
    maskd = pos[None, :, :, None] < rsg[:, None, None, None]
    s = jnp.where(maskd, s, -jnp.inf)
    m = jnp.max(s, axis=(1, 2))                              # [NG, H]
    w = jnp.where(maskd, jnp.exp(s - m[:, None, None, :]), 0.0)
    l = jnp.sum(w, axis=(1, 2))                              # [NG, H]
    wv = w * vsg[:, :, None, None]
    o = jnp.einsum("gwph,gwphd->ghd", wv, Vh.astype(jnp.float32))
    o = o / jnp.maximum(l, jnp.finfo(jnp.float32).tiny)[..., None]
    # back to slot order; dead slots read garbage rows, masked by callers
    gi = jnp.clip(grp, 0, NG - 1)
    return (o[gi].reshape(B, D), m[gi], l[gi])


def dense_partial_dot(q, pool, ks, vs, ring_start, lens, grp, *, n_heads,
                      w_full, w_bucket, page_size):
    """Same contract via batched dot_general (batch g, contract dh) —
    measures whether XLA's batched-GEMM lowering beats the fused
    elementwise+reduce at these shapes (N=H=12 tiles poorly on the MXU
    but the contraction is a single HLO)."""
    B, D = q.shape
    NP = pool.shape[0]
    P = page_size
    NG = NP // w_full
    H = n_heads
    dh = D // H
    Wb = w_bucket
    T = Wb * P

    live = lens > 0
    tgt = jnp.where(live, grp, NG)
    qg = jnp.zeros((NG, D), jnp.float32).at[tgt].set(
        q.astype(jnp.float32), mode="drop")
    rsg = jnp.zeros((NG,), jnp.int32).at[tgt].set(
        jnp.where(live, ring_start, 0), mode="drop")

    view = pool.reshape(NG, w_full, 2, P, D)[:, :Wb]
    Kh = view[:, :, 0].reshape(NG, Wb, P, H, dh)
    Vh = view[:, :, 1].reshape(NG, Wb, P, H, dh)
    ksg = ks.reshape(NG, w_full)[:, :Wb]
    vsg = vs.reshape(NG, w_full)[:, :Wb]

    qh = qg.reshape(NG, H, dh)
    # batch (g, h): s[g, h, w, p]
    s = jax.lax.dot_general(
        qh[:, :, None, :],
        Kh.astype(jnp.float32).transpose(0, 3, 1, 2, 4).reshape(
            NG, H, T, dh),
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).reshape(NG, H, Wb, P)
    scal = (ksg * (dh ** -0.5))[:, None, :, None]
    s = s * scal
    pos = (jnp.arange(Wb, dtype=jnp.int32)[:, None] * P
           + jnp.arange(P, dtype=jnp.int32)[None, :])
    maskd = pos[None, None] < rsg[:, None, None, None]
    s = jnp.where(maskd, s, -jnp.inf)
    m = jnp.max(s, axis=(2, 3))
    w = jnp.where(maskd, jnp.exp(s - m[..., None, None]), 0.0)
    l = jnp.sum(w, axis=(2, 3))
    wv = (w * vsg[:, None, :, None]).reshape(NG, H, 1, T)
    o = jax.lax.dot_general(
        wv,
        Vh.astype(jnp.float32).transpose(0, 3, 1, 2, 4).reshape(
            NG, H, T, dh),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).reshape(NG, H, dh)
    o = o / jnp.maximum(l, jnp.finfo(jnp.float32).tiny)[..., None]
    gi = jnp.clip(grp, 0, NG - 1)
    return (o[gi].reshape(B, D), m[gi], l[gi])


# ---------------------------------------------------------------- bench

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--emb", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--lens", default="24,56,88,120")
    ap.add_argument("--out", default="/dev/stdout")
    args = ap.parse_args()

    B, NP, P, D, H = (args.slots, args.pages, args.page_size, args.emb,
                      args.heads)
    W = NP // B
    rng = np.random.default_rng(0)

    pool = jnp.asarray(
        rng.integers(-127, 128, (NP, 2, P, D), dtype=np.int8))
    ks = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 0.01)
    vs = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 0.01)
    # identity slot->group mapping (bench full-grant layout)
    grp = jnp.arange(B, dtype=jnp.int32)
    table = (grp[:, None] * W
             + jnp.arange(W, dtype=jnp.int32)[None, :])
    q0 = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32),
                     jnp.bfloat16)

    results = []
    for L in [int(x) for x in args.lens.split(",")]:
        lens = jnp.full((B,), L + 1, jnp.int32)   # page ctx = L, 1 in ring
        rs = jnp.full((B,), L, jnp.int32)
        wb = max(1, -(-L // P))

        def step_kernel(q):
            o, m, l = paged_decode_attention_grouped(
                q, pool, lens, table, ks, vs, ring_start=rs,
                n_heads=H, contiguous_pages=True)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6),)

        def step_dense(q, fn=dense_partial, wb_=wb):
            o, m, l = fn(q, pool, ks, vs, rs, lens, grp, n_heads=H,
                         w_full=W, w_bucket=wb_, page_size=P)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6),)

        def step_fold(q, wb_=wb):
            o, m, l = dense_paged_partial(
                q, pool, ks, vs, rs, lens, table, n_heads=H,
                page_size=P, w_bucket=wb_)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6),)

        def step_dgrid(q):
            o, m, l = dgrid_paged_partial(
                q, pool, ks, vs, rs, lens, table, n_heads=H, page_size=P)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6),)

        def step_bucketed(q):
            o, m, l = dense_paged_partial_bucketed(
                q, pool, ks, vs, rs, lens, table, n_heads=H, page_size=P)
            return (q + o.astype(q.dtype) * jnp.bfloat16(1e-6),)

        row = {"page_ctx": L, "w_bucket": wb}
        jk = jax.jit(step_kernel)
        row["kernel_ms"] = chain_time(lambda s: jk(*s), (q0,)) * 1e3
        # dense-grid Pallas kernel (block-pipelined pool stream, constant
        # ops per group block, per-block width gate)
        jg = jax.jit(step_dgrid)
        row["dgrid_ms"] = chain_time(lambda s: jg(*s), (q0,)) * 1e3
        jd = jax.jit(functools.partial(step_dense, fn=dense_partial))
        row["dense_er_ms"] = chain_time(lambda s: jd(*s), (q0,)) * 1e3
        jdd = jax.jit(functools.partial(step_dense, fn=dense_partial_dot))
        row["dense_dot_ms"] = chain_time(lambda s: jdd(*s), (q0,)) * 1e3
        # production impl: [Wb, P] page axes FOLDED into one token axis
        jfold = jax.jit(step_fold)
        row["dense_fold_ms"] = chain_time(lambda s: jfold(*s), (q0,)) * 1e3
        # production bucketed switch (device-side Wb pick)
        jb = jax.jit(step_bucketed)
        row["dense_bucketed_ms"] = chain_time(lambda s: jb(*s), (q0,)) * 1e3
        # full-W dense (no bucketing) isolates the bucket win
        jf = jax.jit(functools.partial(step_dense, fn=dense_partial, wb_=W))
        row["dense_er_fullW_ms"] = chain_time(lambda s: jf(*s), (q0,)) * 1e3
        results.append(row)
        print(json.dumps(row), file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump({"shapes": {"B": B, "NP": NP, "P": P, "D": D, "H": H},
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()

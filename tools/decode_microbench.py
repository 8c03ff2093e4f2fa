"""On-device decode-phase microbenchmark at bench shapes.

Times the pieces of one decode round separately (attention kernel variants,
KV quantize+scatter, projections+logits) and reports a roofline, at the
headline bench workload shapes with a realistic mid-run length distribution.
This is the evidence base for the optimization log (CLAUDE.md perf state).

METHODOLOGY (axon gotchas, both measured):
  * repeated *independent* calls of a jitted fn are unreliable to time
    (a 30-call loop once reported "5 TB/s" attention);
  * jax.block_until_ready sometimes returns WITHOUT syncing the queue.
Every phase here is therefore timed as a DATA-CHAINED loop (each call
consumes the previous call's output, provably on the critical path), the
barrier is a tiny np.asarray fetch (fetches serialize behind the device
queue, CLAUDE.md), and the loop runs at two different n so the fixed
dispatch+fetch cost cancels in the difference.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/decode_microbench.py
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from min_llm_inference_tpu.config import EngineConfig, ModelConfig
from min_llm_inference_tpu.models.paged import (
    _flat_scatter_indices,
    _write_kv_tokens,
    decode_fresh_pid,
    init_paged_state,
)
from min_llm_inference_tpu.ops.paged_attention import paged_decode_attention
from min_llm_inference_tpu.ops.paged_attention_grouped import (
    paged_decode_attention_grouped,
)
from min_llm_inference_tpu.ops.reference import (
    feed_forward,
    greedy_next_token,
    tied_logits,
    token_pos_embed,
)


def _barrier(s):
    """Force completion of the whole queue via a tiny element fetch."""
    leaf = jax.tree_util.tree_leaves(s)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def chain_time(step, first, n_small=8, n_big=32):
    """Per-iteration seconds of `state -> step(state) -> state`, measured as
    (t(n_big) - t(n_small)) / (n_big - n_small) so warmup+sync cancels."""

    def run(n):
        s = first
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _barrier(s)
        return time.perf_counter() - t0

    run(2)  # warm/compile
    t_small = run(n_small)
    t_big = run(n_big)
    return (t_big - t_small) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--live-frac", type=float, default=0.85,
                    help="fraction of slots live (mid-run occupancy)")
    ap.add_argument("--skip", default="",
                    help="comma list of phases to skip (pallas,grouped,write,proj)")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep grouped-kernel (group_size, pages_per_dma) "
                    "on a contiguous table instead of the default variants")
    args = ap.parse_args()

    B, NP, S, D, V, P = (args.slots, args.pages, args.seq, args.emb,
                         args.vocab, args.page_size)
    W = S // P
    skip = set(args.skip.split(",")) if args.skip else set()
    model_cfg = ModelConfig(n_vocab=V, emb_dim=D, n_seq=S,
                            eof_token_id=V - 1, dtype="bfloat16")
    engine_cfg = EngineConfig(n_slots=B, n_pages=NP, page_size=P,
                              kv_dtype=args.kv_dtype, init_num_pages=2)

    rng = np.random.default_rng(0)
    # mid-run state: live slots with uniform lengths, fragmented page table
    live = rng.random(B) < args.live_frac
    lengths = np.where(live, rng.integers(8, S, B), 0).astype(np.int32)
    page_table = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    last_tokens = rng.integers(0, V, B).astype(np.int32)

    state = init_paged_state(model_cfg, engine_cfg)
    pool = state.kv_pages[0]
    if args.kv_dtype == "int8":
        pool = jnp.asarray(
            rng.integers(-127, 128, pool.shape), jnp.int8
        )
        ks = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 1e-3)
        vs = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 1e-3)
    else:
        pool = jnp.asarray(rng.standard_normal(pool.shape), pool.dtype)
        ks = vs = None

    dt = model_cfg.jax_dtype
    q0 = jnp.asarray(rng.standard_normal((B, D)), dt)
    lengths_d = jnp.asarray(lengths)
    table_d = jnp.asarray(page_table)
    wte = jnp.asarray(rng.random((V, D), np.float32), dt)
    wpe = jnp.asarray(rng.random((S, D), np.float32), dt)
    wqkv = jnp.asarray(rng.random((D, 3 * D), np.float32), dt)

    n_live = int(live.sum())
    tot_ctx = int(lengths.sum())
    # bytes a length-exact kernel would read vs what block granularity reads
    kv_itm = 1 if args.kv_dtype == "int8" else 2
    exact_bytes = 2 * tot_ctx * D * kv_itm
    print(f"B={B} live={n_live} avg_len={tot_ctx / max(n_live,1):.0f} "
          f"kv={args.kv_dtype} D={D}", flush=True)

    # ---- attention variants (chained via q) ----
    @jax.jit
    def fold_q(out):
        return (q0 + 1e-6 * out).astype(dt)

    variants = [
        ("pallas ", functools.partial(paged_decode_attention, n_heads=1)),
        ("grouped", functools.partial(paged_decode_attention_grouped, n_heads=1)),
    ]
    if args.sweep:
        # contiguous-table G x ppd grid sweep (group-allocator layout)
        W_ = W
        gids = rng.permutation(NP // W_)[:B].astype(np.int32)
        table_d = jnp.asarray(
            gids[:, None] * W_ + np.arange(W_, dtype=np.int32)[None, :]
        )
        variants = [
            (f"contig G={g} ppd={ppd}", functools.partial(
                paged_decode_attention_grouped, n_heads=1, group_size=g,
                contiguous_pages=True, pages_per_dma=ppd))
            for g in (16, 32, 64) for ppd in (1, 2, 4)
        ]
    for name, fn in variants:
        if name.strip() in skip:
            continue
        def step(qq, fn=fn):
            return fold_q(fn(qq, pool, lengths_d, table_d, ks, vs))
        t = chain_time(step, q0)
        print(f"attention/{name}: {t*1e3:7.3f} ms   "
              f"({exact_bytes/t/1e9:6.1f} GB/s length-exact-equiv read)",
              flush=True)

    # ---- KV write: quantize + combined scatter (chained via pool) ----
    if "write" not in skip:
        k_new = jnp.asarray(rng.standard_normal((B, D)), dt)
        v_new = jnp.asarray(rng.standard_normal((B, D)), dt)

        @jax.jit
        def write(pool, ks, vs):
            livej = lengths_d > 0
            pos = jnp.maximum(lengths_d - 1, 0)
            flat_idx = _flat_scatter_indices(table_d, pos, livej, P, NP)
            fresh = decode_fresh_pid(table_d, pos, livej, P, NP)
            return _write_kv_tokens(pool, ks, vs, flat_idx, k_new, v_new, fresh)

        def step(s):
            return write(*s) if ks is not None else (write(s[0], None, None),)

        first = (pool, ks, vs) if ks is not None else (pool,)
        t = chain_time(step, first)
        print(f"kv quant+scatter : {t*1e3:7.3f} ms", flush=True)

    # ---- projections + logits + argmax (chained via tokens) ----
    if "proj" not in skip:

        @jax.jit
        def proj_logits(last):
            pos = jnp.maximum(lengths_d - 1, 0)
            h = token_pos_embed(last, pos, wte, wpe)
            qkv = feed_forward(h, wqkv)
            attn = qkv[:, :D]  # stand-in for attention output
            logits = tied_logits(attn, wte)
            # chain on the token array only (greedy returns (tok, lens))
            return greedy_next_token(logits, lengths_d, S, V - 1)[0]

        t = chain_time(proj_logits, jnp.asarray(last_tokens))
        print(f"embed+qkv+logits : {t*1e3:7.3f} ms", flush=True)

    # ---- fine-grained: embed strategies, out-token scatter, matmuls ----
    if "micro" not in skip:
        pos0 = jnp.maximum(lengths_d - 1, 0)

        @jax.jit
        def embed_gather(last):
            h = wte[jnp.clip(last, 0, V - 1)] + wpe[jnp.clip(pos0, 0, S - 1)]
            return (last + h[:, 0].astype(jnp.int32)) % V

        @jax.jit
        def embed_onehot(last):
            oh_t = (last[:, None] == jnp.arange(V)[None, :]).astype(dt)
            oh_p = (pos0[:, None] == jnp.arange(S)[None, :]).astype(dt)
            h = (
                jnp.dot(oh_t, wte, preferred_element_type=jnp.float32).astype(dt)
                + jnp.dot(oh_p, wpe, preferred_element_type=jnp.float32).astype(dt)
            )
            return (last + h[:, 0].astype(jnp.int32)) % V

        R_total = 2048
        out0 = jnp.zeros((R_total * S,), jnp.int32)
        rid = jnp.asarray(rng.integers(0, R_total, B), jnp.int32)

        @jax.jit
        def out_scatter(out):
            tok = out[:B].astype(jnp.int32) % V
            idx = jnp.where(lengths_d > 0, rid * S + lengths_d, R_total * S)
            return out.at[idx].set(tok, mode="drop")

        @jax.jit
        def qkv_only(x):
            y = feed_forward(x, wqkv)
            return y[:, :D]

        @jax.jit
        def logits_argmax(x):
            logits = tied_logits(x, wte)
            t = greedy_next_token(logits, lengths_d, S, V - 1)[0]
            return x + (t[:, None] % 3).astype(dt)

        for name, fn, first in (
            ("embed gather    ", embed_gather, jnp.asarray(last_tokens)),
            ("embed one-hot   ", embed_onehot, jnp.asarray(last_tokens)),
            ("out-tok scatter ", out_scatter, out0),
            ("wqkv matmul     ", qkv_only, q0),
            ("logits+argmax   ", logits_argmax, q0),
        ):
            t = chain_time(fn, first)
            print(f"{name}: {t*1e3:7.3f} ms", flush=True)

    # roofline context
    peak_hbm = 819e9  # v5e
    print(f"ctx-read roofline: {exact_bytes/peak_hbm*1e3:7.3f} ms "
          f"({exact_bytes/2**20:.0f} MiB length-exact at 819 GB/s); "
          f"block-granular read {2*n_live*W*P*D*kv_itm/2**20:.0f} MiB "
          f"-> {2*n_live*W*P*D*kv_itm/peak_hbm*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

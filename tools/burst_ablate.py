"""In-burst phase ablation: the trustworthy per-phase decode profile.

Standalone microbenches of small ops are polluted by ~0.1-0.3 ms of
per-executable dispatch overhead on this transport (CLAUDE.md), so this
tool times the FULL autonomous burst with one phase knocked out at a time
(make_autonomous_fn(ablate=...)) and reports the deltas. Each knockout
replaces the phase with a cheap data-dependent stand-in with identical
shapes and liveness schedule, so the rest of the burst is untouched and
the delta is that phase's true marginal cost inside the executable.

Phases:
  embed    token+pos embedding gather
  qkv      fused QKV projection matmul
  attend   grouped attention kernel call (incl. fused KV insert/writeback)
  kvwrite  per-page scale scatter + in-kernel row insert (kernel stays,
           read-only) — subset of attend's work
  logits   tied logits matmul + argmax decode
  argmax   argmax decode only (logits matmul stays)

Timing: data-chained donated bursts, np.asarray status fetch as barrier,
two loop counts so fixed costs cancel (tools/decode_microbench.py rules).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/burst_ablate.py
       [--live 1024] [--len 32] [--rounds 16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from min_llm_inference_tpu import EngineConfig, ModelConfig, init_params
from min_llm_inference_tpu.models.params import fuse_qkv_params
from min_llm_inference_tpu.runtime.autonomous import (
    init_auto_state,
    make_autonomous_fn,
)

ABLATIONS = [
    "", "embed", "qkv", "attend", "kvwrite", "logits", "argmax",
    # scales: skip the per-page scale scatters only (stale-scale quantize
    # is numerically wrong but schedule/shape-identical — timing only)
    "scales",
    # flush: skip the once-per-burst ring->pages merge (ring mode only)
    "flush",
    # ringdus: ring updates at STATIC column 0 (in-place-donation probe)
    "ringdus",
    # combined knockouts resolve interactions the singles can't
    "attend,qkv", "attend,embed,qkv,logits",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--live", type=int, default=1024)
    ap.add_argument("--len", type=int, default=32, dest="ctx_len")
    ap.add_argument("--attention", default="grouped")
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-big", type=int, default=5)
    ap.add_argument("--no-ring", action="store_true",
                    help="per-round fused write-backs instead of the ring")
    ap.add_argument("--model", default="ref", choices=["ref", "gpt2s"])
    ap.add_argument("--attn-dgrid", action="store_true",
                    help="profile the dense-grid Pallas attend (the gpt2s "
                         "bench default) instead of the grouped kernel")
    ap.add_argument("--attn-dense", action="store_true",
                    help="profile the dense-view XLA attend")
    ap.add_argument("--subbursts", type=int, default=1,
                    help="in-burst admission granularity (the queue here "
                         "is drained, so this isolates the fixed cost of "
                         "extra admission/prefill/flush blocks)")
    ap.add_argument("--no-burst-flush", action="store_true",
                    help="flush the ring per sub-burst (round-4 behavior) "
                         "instead of once per burst")
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--only", default=None,
                    help="semicolon-separated subset of ablations to run "
                         "('' = full burst only); each ablation is its own "
                         "remote compile, so restrict when iterating")
    args = ap.parse_args()

    B, NP, S, D = args.slots, args.pages, args.seq, args.emb
    if args.model == "gpt2s":
        model = ModelConfig(
            n_vocab=1024, emb_dim=768, n_seq=S, n_layers=12, n_heads=12,
            ffn_dim=3072, use_output_proj=True, use_layernorm=True,
            eof_token_id=1023, dtype="bfloat16",
        )
    else:
        model = ModelConfig(n_vocab=1024, emb_dim=D, n_seq=S,
                            eof_token_id=1023, dtype="bfloat16")
    cfg = EngineConfig(n_slots=B, n_pages=NP, page_size=args.page_size,
                       kv_dtype=args.kv_dtype, n_forward_rounds=args.rounds,
                       decode_ring=not args.no_ring,
                       attn_dgrid=args.attn_dgrid, attn_dense=args.attn_dense,
                       subbursts=args.subbursts,
                       burst_flush=not args.no_burst_flush)
    rng = np.random.default_rng(0)
    if args.model == "gpt2s":
        params = fuse_qkv_params(init_params(jax.random.PRNGKey(0), model))
    else:
        params = fuse_qkv_params(init_params(jax.random.PRNGKey(0), model))

    max_bursts = (S - 1 - args.ctx_len) // args.rounds
    assert args.n_big <= max_bursts, "bursts overrun n_seq; lower --n-big"

    n_req = 2048
    st0 = init_auto_state(model, cfg, n_req)
    W = cfg.pages_per_slot(S)

    lengths = np.zeros(B, np.int32)
    lengths[: args.live] = args.ctx_len
    table = np.arange(B * W, dtype=np.int32).reshape(B, W)
    template = st0._replace(
        lengths=jnp.asarray(lengths),
        page_table=jnp.asarray(table),
        last_tokens=jnp.asarray(rng.integers(0, 1023, B), jnp.int32),
        rid=jnp.asarray(np.arange(B, dtype=np.int32)),
        allocated=jnp.asarray(lengths > 0),
        queue_head=jnp.asarray(n_req, jnp.int32),  # drained
        free_top=jnp.asarray(NP // W - B, jnp.int32),
        page_stack=jnp.asarray(
            np.concatenate([np.arange(B, NP // W), np.zeros(B)]
                           ).astype(np.int32)),
    )

    s_pre = 64
    prompts = jnp.asarray(rng.integers(0, 1023, (n_req, s_pre)), jnp.int32)
    plens = jnp.asarray(rng.integers(1, s_pre, n_req), jnp.int32)
    n_real = jnp.asarray(n_req, jnp.int32)

    def fresh():
        return jax.tree_util.tree_map(jnp.array, template)

    def measure(ablate, repeats=3):
        burst = make_autonomous_fn(model, cfg, args.attention,
                                   min(256, B), ablate=ablate)

        def run(n, st_l):
            t0 = time.perf_counter()
            for _ in range(n):
                st_l, status = burst(params, st_l, prompts, plens, n_real)
            _ = np.asarray(status)
            return time.perf_counter() - t0

        run(2, fresh())  # compile + warm
        vals = []
        for _ in range(repeats):
            t_small = run(args.n_small, fresh())
            t_big = run(args.n_big, fresh())
            per_burst = (t_big - t_small) / (args.n_big - args.n_small)
            vals.append(per_burst / args.rounds)
        vals.sort()
        return vals[len(vals) // 2], vals[0], vals[-1]

    variant = ("dgrid" if args.attn_dgrid else
               "dense" if args.attn_dense else "grouped")
    print(f"B={B} live={args.live} len={args.ctx_len} "
          f"attn={args.attention}/{variant} rounds={args.rounds} "
          f"subbursts={args.subbursts} "
          f"burst_flush={not args.no_burst_flush}", flush=True)
    ablations = (ABLATIONS if args.only is None
                 else args.only.split(";"))
    base = None
    for ab in ablations:
        med, lo, hi = (x * 1e3 for x in measure(ab))
        name = "full burst" if ab == "" else "-" + ab
        if ab == "":
            base = med
            print(f"{name:<28s}: {med:7.3f} ms/round "
                  f"[{lo:.3f},{hi:.3f}]", flush=True)
        elif base is None:
            print(f"{name:<28s}: {med:7.3f} ms/round "
                  f"[{lo:.3f},{hi:.3f}]", flush=True)
        else:
            print(f"{name:<28s}: {med:7.3f} ms/round "
                  f"[{lo:.3f},{hi:.3f}]   delta {base - med:+7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()

"""Time ONE autonomous burst at bench shapes, isolating the decode scan.

Builds a full-live AutoState (queue drained: no admission, no prefill) and
chains the donated burst call N times (tools/decode_microbench.py timing
methodology: data-chained loop, tiny fetch barrier, two loop counts so
fixed costs cancel). Reports ms/burst and ms/round.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/burst_microbench.py
       [--live 1024] [--queue-open]
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
    AutoState,
    init_auto_state,
    make_autonomous_fn,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--live", default="1024",
                    help="comma-separated live-slot counts; one compile "
                    "serves all (shapes are identical)")
    ap.add_argument("--len", default="32", dest="ctx_len",
                    help="comma-separated context lengths (one compile "
                    "serves all)")
    ap.add_argument("--attention", default="grouped")
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--queue-open", action="store_true",
                    help="leave requests in the queue (admission+prefill "
                    "fire when slots die)")
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-big", type=int, default=5)
    args = ap.parse_args()

    B, NP, S, D = args.slots, args.pages, args.seq, args.emb
    model = ModelConfig(n_vocab=1024, emb_dim=D, n_seq=S,
                        eof_token_id=1023, dtype="bfloat16")
    cfg = EngineConfig(n_slots=B, n_pages=NP, page_size=32,
                       kv_dtype="int8", n_forward_rounds=args.rounds)
    rng = np.random.default_rng(0)
    params = fuse_qkv_params(init_params(jax.random.PRNGKey(0), model))

    ctx_lens = [int(x) for x in str(args.ctx_len).split(",")]
    # a slot dies when its length hits n_seq: every timed burst must keep
    # all `live` slots alive (queue drained -> dead slots stay dead and we
    # would silently time the noop path)
    # (each run() below starts from a fresh state at ctx_len)
    for cl in ctx_lens:
        max_bursts = (S - 1 - cl) // args.rounds
        assert args.n_big <= max_bursts, (
            f"{args.n_big} bursts x {args.rounds} rounds from len="
            f"{cl} overruns n_seq={S}; lower --n-big/--len"
        )

    n_req = 2048
    st0 = init_auto_state(model, cfg, n_req)
    W = cfg.pages_per_slot(S)

    def build_state(live: int, ctx_len: int):
        # `live` slots mid-sequence, pages granted in order
        lengths = np.zeros(B, np.int32)
        lengths[:live] = ctx_len
        table = np.arange(B * W, dtype=np.int32).reshape(B, W)
        return st0._replace(
            lengths=jnp.asarray(lengths),
            page_table=jnp.asarray(table),
            last_tokens=jnp.asarray(rng.integers(0, 1023, B), jnp.int32),
            rid=jnp.asarray(np.arange(B, dtype=np.int32)),
            allocated=jnp.asarray(lengths > 0),
            queue_head=jnp.asarray(
                n_req if not args.queue_open else 0, jnp.int32),
            free_top=jnp.asarray(NP // W - B, jnp.int32),
            page_stack=jnp.asarray(
                np.concatenate([np.arange(B, NP // W), np.zeros(B)]
                               ).astype(np.int32)),
        )

    s_pre = 64
    prompts = jnp.asarray(rng.integers(0, 1023, (n_req, s_pre)), jnp.int32)
    plens = jnp.asarray(rng.integers(1, s_pre, n_req), jnp.int32)
    n_real = jnp.asarray(n_req, jnp.int32)

    burst = make_autonomous_fn(model, cfg, args.attention, 256)

    def run(n, st_l):
        t0 = time.perf_counter()
        for _ in range(n):
            st_l, status = burst(params, st_l, prompts, plens, n_real)
        _ = np.asarray(status)  # barrier: fetch serializes behind queue
        return time.perf_counter() - t0, st_l

    def fresh(template):
        # burst donates st: rebuild a fresh copy outside the timed region
        return jax.tree_util.tree_map(jnp.array, template)

    print(f"B={B} attn={args.attention} rounds={args.rounds} "
          f"queue={'open' if args.queue_open else 'drained'}", flush=True)
    lives = [int(x) for x in str(args.live).split(",")]
    template = build_state(lives[0], ctx_lens[0])
    run(2, fresh(template))  # compile + warm (one executable serves all)
    for ctx_len in ctx_lens:
        for live in lives:
            template = build_state(live, ctx_len)
            t_small, _ = run(args.n_small, fresh(template))
            t_big, st_end = run(args.n_big, fresh(template))
            n_live_end = int(np.asarray(jnp.sum(st_end.lengths > 0)))
            per_burst = (t_big - t_small) / (args.n_big - args.n_small)
            print(f"len={ctx_len:4d} live={live:5d}  "
                  f"per-burst: {per_burst*1e3:8.3f} ms   "
                  f"per-round: {per_burst/args.rounds*1e3:7.3f} ms   "
                  f"(live at end: {n_live_end})", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: paged continuous-batching greedy decode throughput.

Mirrors the reference's profile workload
(/root/reference/tests/paged_cubluas_for_profile.cpp:9-19):
max_batches=1024, n_pages=4096, n_sequence=128, emb=2048, n_vocab=1024,
2048 requests with uniform prompt lengths in [1, 64],
uniform(0,1) weights with the EOF embedding row scaled by 1.0001 (so, as in
the reference, sequences run to the n_sequence cap: ~196k generated
tokens). Baseline to beat: 123,284 tok/s (reference README.md:79-82,
best published lineage — cuBLAS projections + warp-tiled prefill).

Prints ONE JSON line:
  {"metric": "decode_tokens_per_s", "value": N, "unit": "tok/s",
   "vs_baseline": N/123284}
"""

import argparse
import time
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    PagedEngine,
    Request,
    get_global_throughput_counter,
)
from min_llm_inference_tpu.runtime.autonomous import AutonomousEngine

BASELINE_TOK_S = 123284.0


def bench_params(rng, model_cfg: ModelConfig):
    """Uniform(0,1) weights like the reference's curand init
    (src/kernels/rand_assign.cu), EOF row scaled 1.0001
    (tests/test_utils.cpp get_random_device_emb_table)."""
    dt = model_cfg.jax_dtype
    V, D, S = model_cfg.n_vocab, model_cfg.emb_dim, model_cfg.n_seq

    def u(shape):
        return jnp.asarray(rng.random(shape, dtype=np.float32), dt)

    wte = np.asarray(rng.random((V, D), dtype=np.float32))
    wte[model_cfg.eof_token_id] *= 1.0001
    return {
        "wte": jnp.asarray(wte, dt),
        "wpe": u((S, D)),
        "layers": [{"wq": u((D, D)), "wk": u((D, D)), "wv": u((D, D))}],
    }


def build_store(rng, n_requests, max_prompt, n_vocab):
    store = ItemStorage()
    for i in range(n_requests):
        ln = int(rng.integers(1, max_prompt + 1))
        store.add_new_item(
            Request(i, rng.integers(0, n_vocab - 1, ln).tolist())
        )
    return store


def run_once(params, model_cfg, engine_cfg, store, attention, engine_kind="host", rounds_chunk=4, capacity=None, max_new=128, min_drain=None):
    if engine_kind == "auto":
        engine = AutonomousEngine(
            params, model_cfg, engine_cfg, attention_impl=attention,
            bursts_per_chunk=rounds_chunk, request_capacity=capacity,
            max_new_per_burst=max_new,
            min_drain_slots=min_drain or engine_cfg.n_slots,
        )
    else:
        engine = PagedEngine(params, model_cfg, engine_cfg, attention_impl=attention)
    engine.run(store)
    return get_global_throughput_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--requests", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--init-pages", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kv-dtype", default=None,
                    help="KV cache dtype (default: int4 for ref — the "
                         "r5 same-session sweep winner at 505.1k vs int8's "
                         "494.2k no-ring / 473.8k ring; int8 for gpt2s — "
                         "dgrid rejects packed int4)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--attention", default="grouped",
                    choices=["jnp", "pallas", "grouped"])
    ap.add_argument("--max-prefill-batch", type=int, default=128)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--warm-requests", type=int, default=None,
                    help="warm-run request count (default 64). Overcommit "
                         "runs admit different slot counts than full grant, "
                         "so their big prefill buckets only compile under a "
                         "full-size warm stream — pass the timed --requests "
                         "value to keep remote compiles out of timed run 1")
    ap.add_argument("--engine", default="auto", choices=["host", "auto"])
    ap.add_argument("--model", default="ref", choices=["ref", "gpt2s"],
                    help="ref = reference-parity single attention block; "
                         "gpt2s = 12-layer GPT-2-small-class stack")
    ap.add_argument("--bursts-per-chunk", type=int, default=None,
                    help="bursts dispatched per status fetch (default 24 "
                         "for ref, 6 for gpt2s — the long 12-layer bursts "
                         "need finer chunks for the drain downshift to "
                         "engage before the run ends)")
    ap.add_argument("--max-new-per-burst", type=int, default=512)
    ap.add_argument("--min-drain-slots", type=int, default=None,
                    help="drain-downshift floor (default: off for ref — "
                         "executable switching measured -12% there — and "
                         "512 for gpt2s: with chunk 6 + sort-admits it "
                         "measured 86.7k vs 82.7k same-session)")
    ap.add_argument("--pages-per-dma", type=int, default=None,
                    help="contiguous-run DMA length in pages (grouped kernel)")
    ap.add_argument("--attn-group", type=int, default=None,
                    help="grouped-kernel slots per grid step (default auto)")
    ap.add_argument("--subbursts", type=int, default=None,
                    help="in-burst admission granularity: split each "
                         "burst's rounds into this many admit+decode+flush "
                         "bodies (one dispatch either way). Default: 2 for "
                         "the ref model (same-session sweep at rounds=16: "
                         "1 -> 450.5k, 2 -> 529.4k, 4 -> 502.9k, 8 -> "
                         "323.0k tok/s), 1 for gpt2s (the 12-layer ring "
                         "flush doubles with the sub-burst count and eats "
                         "the schedule win: 73.2k -> 66.9k measured)")
    ap.add_argument("--attn-dense", action="store_true",
                    help="dense-view XLA page partial (full-grant group "
                         "rows; the gpt2s op-floor fix)")
    ap.add_argument("--attn-dgrid", action="store_true",
                    help="dense-grid Pallas page partial (block-pipelined "
                         "pool stream over full-grant group rows); default "
                         "ON for gpt2s (same-session A/B: 7.35 vs 10.35 "
                         "ms/round at len 32, still -17% at len 112), OFF "
                         "for ref (424.6k vs 521.0k — the single-layer "
                         "model is not op-issue bound)")
    ap.add_argument("--no-attn-dgrid", action="store_true",
                    help="force the grouped kernel on gpt2s")
    ap.add_argument("--sort-admits", action="store_true",
                    help="sort each admission wave by prompt length so "
                         "dgrid group blocks are width-homogeneous "
                         "(see config.sort_admits)")
    ap.add_argument("--no-sort-admits", action="store_true")
    ap.add_argument("--dgrid-block", type=int, default=None,
                    help="dgrid group-block rows per grid step (default "
                         "auto = 32 at bench shapes); smaller blocks gate "
                         "page reads at finer length granularity")
    ap.add_argument("--no-burst-flush", action="store_true",
                    help="flush the decode ring per SUB-burst (round-4 "
                         "behavior) instead of once per burst — A/B knob "
                         "for the burst-wide ring")
    ap.add_argument("--overcommit", action="store_true",
                    help="half-group grants + growth + youngest-first "
                         "preemption (pair with a reduced --pages to "
                         "measure the oversubscription trade)")
    ap.add_argument("--no-ring", action="store_true",
                    help="disable the per-burst decode ring (per-round "
                         "fused page write-backs instead). Default: ring "
                         "OFF for ref (r5 same-session A/B: no-ring won "
                         "for BOTH kv dtypes at subbursts=2 — int8 494.2k "
                         "vs 473.8k, int4 505.1k vs 313.9k; the int4 ring "
                         "merge unpacks nibbles every round), ON for "
                         "gpt2s (dgrid implements the ring partial "
                         "contract)")
    ap.add_argument("--ring", action="store_true",
                    help="force the decode ring on (overrides the "
                         "per-model default)")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler (xprof) trace of ONE timed "
                         "run into LOGDIR (reference: NVTX + make profile)")
    ap.add_argument("--phase-stats", action="store_true",
                    help="print per-engine-phase host wall times to stderr")
    args = ap.parse_args()
    if args.profile:
        args.repeats = 1  # trace exactly the one timed run

    if args.model == "gpt2s":
        model_cfg = ModelConfig(
            n_vocab=args.vocab, emb_dim=768, n_seq=args.seq, n_layers=12,
            n_heads=12, ffn_dim=3072, use_output_proj=True,
            use_layernorm=True, eof_token_id=args.vocab - 1, dtype=args.dtype,
        )
    else:
        model_cfg = ModelConfig(
            n_vocab=args.vocab, emb_dim=args.emb, n_seq=args.seq,
            eof_token_id=args.vocab - 1, dtype=args.dtype,
        )
    gpt2s = args.model == "gpt2s"
    # per-model tuned defaults, every one a committed same-session A/B:
    # ref  = int4 KV + no ring + subbursts 2        (INT4_r05.json)
    # gpt2s = int8 KV + ring + dgrid + sort-admits,
    #         chunk 6 + drain downshift to 512      (GPT2S_r05.json)
    kv_dtype = args.kv_dtype or ("int8" if gpt2s else "int4")
    if kv_dtype == "int4" and args.kv_dtype is None and (
            args.overcommit          # keep the overcommit A/B on r4 footing
            or args.attention == "pallas"):  # one-slot kernel is int8-only
        kv_dtype = "int8"
    engine_cfg = EngineConfig(
        n_slots=args.slots, n_pages=args.pages,
        n_forward_rounds=args.rounds,
        page_size=args.page_size, init_num_pages=args.init_pages,
        kv_dtype=kv_dtype,
        max_prefill_batch=args.max_prefill_batch,
        pages_per_dma=args.pages_per_dma,
        attn_group_size=args.attn_group,
        decode_ring=args.ring or (gpt2s and not args.no_ring),
        attn_dense=args.attn_dense,
        # the dgrid default drops out whenever its preconditions do:
        # it implements the ring-partial contract (--no-ring on gpt2s
        # falls back to the grouped fused-write path) and rejects packed
        # int4 (per-head nibble planes defeat the whole-block selector)
        attn_dgrid=(args.attn_dgrid or
                    (gpt2s and not args.no_attn_dgrid
                     and not args.no_ring and kv_dtype != "int4"
                     and not args.overcommit and not args.attn_dense)),
        dgrid_block=args.dgrid_block,
        sort_admits=((args.sort_admits or gpt2s)
                     and not args.no_sort_admits),
        subbursts=(args.subbursts if args.subbursts is not None
                   else (1 if gpt2s else 2)),
        burst_flush=not args.no_burst_flush,
        overcommit=args.overcommit,
    )
    if args.bursts_per_chunk is None:
        args.bursts_per_chunk = 6 if gpt2s else 24
    if args.min_drain_slots is None and gpt2s:
        args.min_drain_slots = 512
    rng = np.random.default_rng(0)
    if args.model == "gpt2s":
        import jax as _jax
        from min_llm_inference_tpu import init_params
        params = init_params(_jax.random.PRNGKey(0), model_cfg)
    else:
        params = bench_params(rng, model_cfg)

    if not args.no_warmup:
        # Warm run: compiles every jit (prefill bucket, decode) on a small
        # request stream; jit caches are keyed per config so the timed run
        # recompiles nothing.
        n_warm = args.warm_requests or min(args.slots, 64)
        warm_store = build_store(rng, n_warm, min(64, args.seq // 2), args.vocab)
        run_once(params, model_cfg, engine_cfg, warm_store, args.attention,
                 args.engine, args.bursts_per_chunk, args.requests,
                 args.max_new_per_burst, args.min_drain_slots)

    # N timed runs, MEDIAN reported (the device transport has ~15-20%
    # run-to-run variance; a best-of number overstates, a single run is a
    # coin flip — VERDICT r1 weak #8). All runs ship in the JSON.
    from min_llm_inference_tpu.utils.profiling import (
        get_global_phase_stats,
        trace,
    )

    runs = []
    for _ in range(max(1, args.repeats)):
        get_global_throughput_counter().reset()  # before submits, for TTFT
        get_global_phase_stats().reset()
        store = build_store(rng, args.requests, min(64, args.seq // 2), args.vocab)
        t0 = time.perf_counter()
        with trace(args.profile):
            counter = run_once(params, model_cfg, engine_cfg, store, args.attention,
                               args.engine, args.bursts_per_chunk, args.requests,
                               args.max_new_per_burst, args.min_drain_slots)
        wall = time.perf_counter() - t0
        # snapshot: the throughput counter is a global singleton reused
        # (and reset) across runs, so copy its numbers out per run
        runs.append({
            "wall": wall,
            "tok_s": counter.total_tokens / wall,
            "total_tokens": counter.total_tokens,
            "counter_seconds": counter.elapsed_seconds,
            "p50_ttft_ms": counter.ttft_percentile(0.5) * 1e3,
        })
    runs.sort(key=lambda r: r["tok_s"])
    # median by throughput; lower-middle for even N (upper-middle would
    # recreate best-of bias, e.g. --repeats 2 reporting the faster run)
    med = runs[(len(runs) - 1) // 2]
    if args.phase_stats or args.profile:
        print(json.dumps({"phase_stats": get_global_phase_stats().summary()}),
              file=sys.stderr)
    if args.profile:
        print(f"profiler trace written to {args.profile}", file=sys.stderr)

    tok_s = med["tok_s"]  # honest wall around the whole run
    result = {
        "metric": "decode_tokens_per_s",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
        "total_tokens": med["total_tokens"],
        "seconds": round(med["wall"], 3),
        "counter_seconds": round(med["counter_seconds"], 3),
        "runs_tok_s": [round(r["tok_s"], 1) for r in runs],
        "p50_ttft_ms": round(med["p50_ttft_ms"], 1),
        "config": {
            "slots": args.slots, "pages": args.pages, "seq": args.seq,
            "emb": args.emb, "vocab": args.vocab, "requests": args.requests,
            "dtype": args.dtype, "kv_dtype": engine_cfg.kv_dtype,
            "attention": args.attention, "rounds": args.rounds,
            "engine": args.engine, "model": args.model,
            "subbursts": engine_cfg.subbursts,
            "decode_ring": engine_cfg.decode_ring,
            "sort_admits": engine_cfg.sort_admits,
            "page_size": args.page_size,
            "bursts_per_chunk": args.bursts_per_chunk,
            "min_drain_slots": args.min_drain_slots,
            "overcommit": args.overcommit,
            "attn_variant": ("dgrid" if engine_cfg.attn_dgrid else
                             "dense" if engine_cfg.attn_dense else
                             "default"),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

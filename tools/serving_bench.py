#!/usr/bin/env python
"""Online-serving benchmark: StreamingSession under staggered arrivals.

The headline bench (bench.py) measures the one-shot batch workload the
reference profiles (all 2048 requests queued up front). Production serving
is different: requests ARRIVE while the engine runs. This drives
StreamingSession at the same bench shapes with requests submitted in
waves between engine steps and reports sustained throughput plus
completion-latency percentiles (observed at poll granularity — one chunk
of bursts — which is the engine's actual scheduling quantum).

Writes ONE JSON line (optionally to --out) so the result can be committed
as a round artifact.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/serving_bench.py \
           [--requests 2048] [--waves 8] [--out SERVING_r02.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from min_llm_inference_tpu import (  # noqa: E402
    EngineConfig,
    ModelConfig,
    Request,
    StreamingSession,
)
from min_llm_inference_tpu.runtime.autonomous import AutonomousEngine  # noqa: E402

BASELINE_TOK_S = 123284.0  # reference one-shot batch number (BASELINE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--requests", type=int, default=2048)
    ap.add_argument("--waves", type=int, default=4,
                    help="requests arrive in this many equal waves, one "
                         "submitted before each early engine step")
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--max-prompt", type=int, default=64)
    # smaller chunk than the batch bench (24): the chunk is the serving
    # QUANTUM — arrivals are only admitted and completions only observed
    # at chunk boundaries, so serving trades a little dispatch efficiency
    # (more status-fetch RPCs) for admission/poll latency
    ap.add_argument("--bursts-per-chunk", type=int, default=6)
    # chunked mode (default): chunk-quantum loop (step + fin-gated poll).
    # The per-burst pipelined observation path measured WORSE on BOTH axes
    # in round 4 — saturation 211.4k/p99 330ms chunked vs 157.9k/472ms
    # pipelined, provisioned capacity 132.5k/p50 99ms vs 102.3k/251ms —
    # even after fusing its two per-burst d2h snapshots into one RPC: one
    # status fetch per burst serializes behind the device queue ~6x more
    # often than the chunk loop's fin-gated fetch. Kept for the
    # observation-latency API (dispatch/observe/poll) and as the measured
    # negative.
    ap.add_argument("--chunked", dest="pipelined", action="store_false",
                    help="(default) chunk-quantum loop")
    ap.add_argument("--pipelined", dest="pipelined", action="store_true",
                    help="per-burst dispatch/observe loop (measured worse; "
                         "see above)")
    ap.set_defaults(pipelined=False)
    ap.add_argument("--observe-lag", type=int, default=2)
    ap.add_argument("--subbursts", type=int, default=2,
                    help="in-burst admission granularity (see bench.py)")
    ap.add_argument("--overcommit", action="store_true",
                    help="half-group grants + growth + youngest-first "
                         "preemption — pair with a reduced --pages for the "
                         "oversubscribed-pool serving regime the reference's "
                         "paged scheduler exists for")
    # open-loop arrivals: requests become available at fixed rate lambda
    # (req/s) on a virtual clock; latency is measured from the SCHEDULED
    # arrival time, the standard serving-bench convention. The closed-loop
    # default (all waves queued up front at 2x oversubscription) has a
    # queueing+generation latency floor of ~292 ms at bench shapes
    # (SERVING_r03 latency_floor_analysis), so tail targets are only
    # meaningful at a controlled offered load below saturation
    ap.add_argument("--arrival-rate", type=float, default=None, metavar="REQ_S",
                    help="open-loop arrival rate (requests/second); "
                         "overrides --waves")
    ap.add_argument("--trace", action="store_true",
                    help="print per-iteration wall/made/finished lines "
                         "(diagnosing loop stalls; adds host prints only)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    model_cfg = ModelConfig(
        n_vocab=args.vocab, emb_dim=args.emb, n_seq=args.seq,
        eof_token_id=args.vocab - 1, dtype="bfloat16",
    )
    engine_cfg = EngineConfig(
        n_slots=args.slots, n_pages=args.pages, page_size=32,
        n_forward_rounds=args.rounds, kv_dtype=args.kv_dtype,
        subbursts=args.subbursts, overcommit=args.overcommit,
    )
    # bench.py's uniform(0,1) weights with the EOF row scaled so sequences
    # terminate like the reference profile workload
    from bench import bench_params, BASELINE_TOK_S as _b  # noqa: F401

    rng = np.random.default_rng(0)
    params = bench_params(rng, model_cfg)

    def make_requests(n, id0=0):
        out = []
        for i in range(n):
            ln = int(rng.integers(1, args.max_prompt + 1))
            out.append(Request(
                id0 + i, rng.integers(0, args.vocab - 1, ln).tolist()
            ))
        return out

    eng = AutonomousEngine(
        params, model_cfg, engine_cfg,
        bursts_per_chunk=args.bursts_per_chunk,
        max_new_per_burst=512,
    )

    # warm: every executable the timed run dispatches, at the SAME shapes
    # (request_capacity rule, CLAUDE.md) — the burst + prefill buckets, the
    # wave-sized submit updates, and the power-of-two poll-gather buckets
    # (remote compiles are seconds each; any cold shape pollutes the run)
    import jax.numpy as jnp

    wave = args.requests // args.waves
    warm = StreamingSession(eng, capacity=args.requests,
                            max_prompt_len=args.max_prompt)
    warm.submit(make_requests(wave))
    if args.arrival_rate:
        # open-loop submits power-of-two batches; compile each size now
        made, k = wave, 1
        while k <= 512 and made + k <= args.requests:
            warm.submit(make_requests(k, id0=made))
            made += k
            k *= 2
    warm.step()
    warm.poll()
    warm.dispatch()            # pipelined-path executables (final_lens copy)
    warm.observe(block=True)
    warm.close()
    b = 1
    while True:
        bb = min(b, args.requests)
        np.asarray(warm.st.out_tokens[jnp.zeros((bb,), jnp.int32)])
        if bb >= args.requests:
            break
        b *= 2

    # timed run: staggered arrivals
    sess = StreamingSession(eng, capacity=args.requests,
                            max_prompt_len=args.max_prompt,
                            observe_lag=args.observe_lag)
    wave = args.requests // args.waves
    submit_t = {}
    done_t = {}
    n_gen = 0
    t0 = time.perf_counter()
    made = 0

    def feed_open_loop():
        """Submit every request whose scheduled arrival time has passed,
        in power-of-two batches (submit compiles per batch size; the warm
        loop above compiled 1..512). Latency counts from the SCHEDULED
        arrival, so backpressure delay is charged to the engine."""
        nonlocal made
        due = min(int((time.perf_counter() - t0) * args.arrival_rate),
                  args.requests)
        while made < due:
            k = min(due - made, sess.free_capacity, 512)
            if k <= 0:
                break
            k = 1 << (k.bit_length() - 1)
            reqs = make_requests(k, id0=made)
            for j, r in enumerate(reqs):
                submit_t[r.id] = t0 + (made + j) / args.arrival_rate
            sess.submit(reqs)
            made += k

    if not args.pipelined:
        # legacy chunk-quantum loop (r3 shape): observation and admission
        # happen only at chunk boundaries
        while made < args.requests or len(done_t) < args.requests:
            if args.arrival_rate:
                feed_open_loop()
            elif made < args.requests:
                reqs = make_requests(
                    min(wave, args.requests - made), id0=made)
                now = time.perf_counter()
                for r in reqs:
                    submit_t[r.id] = now
                sess.submit(reqs)
                made += len(reqs)
            # Open-loop arrivals finish requests continuously, so poll
            # fires nearly every chunk — fuse the final_lens snapshot
            # into the status RPC (step observe mode) so polling costs
            # only the row gather (measured at 1500 req/s offered:
            # 39.8k tok/s delivered unfused -> 116.3k fused, both same
            # session). Closed-loop waves complete in bunches; the
            # fin-gated separate fetch polls rarely and measured better
            # at saturation (227.1k vs 192.0k fused, same afternoon),
            # so it stays the closed-loop path.
            s = sess.step(observe=bool(args.arrival_rate))
            if s["finished_total"] > len(done_t):
                now = time.perf_counter()
                # fused path hands poll the snapshot; unfused (fin_lens
                # None) lets poll fetch the latest final_lens itself
                for r in sess.poll(s.get("fin_lens"),
                                   s.get("n_submitted_at")):
                    done_t[r.id] = now
                    n_gen += len(r.tokens) - r.prompt_len
            if args.trace:
                print(f"it wall={time.perf_counter()-t0:.3f} made={made} "
                      f"fin={s['finished_total']} coll={len(done_t)} "
                      f"live={s['live']}", flush=True)
    else:
        # pipelined loop: one burst per iteration; statuses/final_lens
        # snapshots stream back asynchronously and are read observe_lag
        # bursts behind — burst-granular completion observation with the
        # device queue kept observe_lag deep (never drained by a fetch)
        collected = 0
        submit_every = max(1, args.bursts_per_chunk)
        i = 0
        while made < args.requests or len(done_t) < args.requests:
            if args.arrival_rate:
                feed_open_loop()
            elif made < args.requests and i % submit_every == 0:
                reqs = make_requests(
                    min(wave, args.requests - made), id0=made)
                now = time.perf_counter()
                for r in reqs:
                    submit_t[r.id] = now
                sess.submit(reqs)
                made += len(reqs)
            sess.dispatch()
            i += 1
            block = made >= args.requests and len(done_t) < made
            s = sess.observe(block=block)
            if s is not None and s["finished_total"] > collected:
                collected = s["finished_total"]
                now = time.perf_counter()
                for r in sess.poll(s["fin_lens"], s["n_submitted_at"]):
                    done_t[r.id] = now
                    n_gen += len(r.tokens) - r.prompt_len
        for r in sess.close():
            done_t[r.id] = time.perf_counter()
            n_gen += len(r.tokens) - r.prompt_len
    wall = time.perf_counter() - t0

    lat = np.array(sorted(done_t[i] - submit_t[i] for i in done_t))
    result = {
        "metric": "serving_tokens_per_s",
        "value": round(n_gen / wall, 1),
        "unit": "tok/s",
        "vs_batch_baseline": round(n_gen / wall / BASELINE_TOK_S, 4),
        "total_tokens": n_gen,
        "seconds": round(wall, 3),
        "requests": args.requests,
        "arrival_waves": args.waves,
        "mode": "pipelined" if args.pipelined else "chunked",
        "arrival_rate_req_s": args.arrival_rate,
        "offered_tok_s": (round(args.arrival_rate * n_gen / args.requests, 1)
                          if args.arrival_rate else None),
        "completion_latency_s": {
            "p50": round(float(np.quantile(lat, 0.5)), 3),
            "p90": round(float(np.quantile(lat, 0.9)), 3),
            "p99": round(float(np.quantile(lat, 0.99)), 3),
        },
        "config": {
            "slots": args.slots, "pages": args.pages, "seq": args.seq,
            "emb": args.emb, "kv_dtype": args.kv_dtype,
            "rounds": args.rounds, "subbursts": args.subbursts,
            "bursts_per_chunk": args.bursts_per_chunk,
            "overcommit": args.overcommit,
            "device": str(jax.devices()[0]),
        },
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

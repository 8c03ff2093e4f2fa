"""Scaling-efficiency harness: tokens/s of the sharded engine across mesh
sizes (north-star metric: >=85% tokens/s scaling efficiency).

On a multi-chip slice this measures real ICI scaling; on a single-chip or
CPU session it exercises the same code over virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) to
validate the sharding path — CPU numbers demonstrate the methodology, not
hardware scaling.

    python examples/scaling_bench.py [--tp 2] [--requests 128]
"""

import argparse
import time

import numpy as np

import jax

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    Request,
    get_global_throughput_counter,
    init_params,
)
from min_llm_inference_tpu.parallel.autonomous import ShardedAutonomousEngine
from min_llm_inference_tpu.parallel.engine import ShardedPagedEngine


def run(params, model_cfg, engine_cfg, n_devices, tp, requests, rng, engine):
    store = ItemStorage()
    for i, toks in enumerate(requests):
        store.add_new_item(Request(i, list(toks)))
    counter = get_global_throughput_counter()
    counter.reset()
    if engine == "auto":
        eng = ShardedAutonomousEngine(
            params, model_cfg, engine_cfg, n_devices=n_devices, tp=tp
        )
    else:
        eng = ShardedPagedEngine(
            params, model_cfg, engine_cfg, n_devices=n_devices, tp=tp
        )
    t0 = time.perf_counter()
    eng.run(store)
    wall = time.perf_counter() - t0
    return counter.total_tokens / wall, counter.total_tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--slots-per-dp", type=int, default=16)
    ap.add_argument("--engine", default="auto", choices=["auto", "paged"],
                    help="auto = flagship device-resident scheduler "
                         "(ShardedAutonomousEngine); paged = host-scheduled")
    args = ap.parse_args()

    n_avail = len(jax.devices())
    model_cfg = ModelConfig(
        n_vocab=256, emb_dim=128, n_seq=64, n_layers=2, n_heads=4,
        ffn_dim=256, use_output_proj=True, use_layernorm=True,
        eof_token_id=255,
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg, eof_bias=0.02)
    rng = np.random.default_rng(0)
    reqs = [rng.integers(0, 255, int(rng.integers(1, 24))).tolist()
            for _ in range(args.requests)]

    base = None
    n = args.tp
    while n <= n_avail:
        dp = n // args.tp
        engine_cfg = EngineConfig(
            n_slots=args.slots_per_dp * dp, page_size=16,
            n_pages=args.slots_per_dp * dp * 4, max_prefill_batch=8,
        )
        tok_s, total = run(params, model_cfg, engine_cfg, n, args.tp, reqs,
                           rng, args.engine)
        if base is None:
            base = tok_s / n
        eff = tok_s / (n * base)
        print(f"devices={n:2d} (dp={dp} x tp={args.tp}): "
              f"{tok_s:10.1f} tok/s  per-device {tok_s/n:9.1f}  "
              f"efficiency {eff*100:5.1f}%")
        n *= 2


if __name__ == "__main__":
    main()

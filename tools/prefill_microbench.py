"""Time the in-burst prefill path (embed + wkv + quantize + scatter) alone.

Chained-timing methodology (tools/decode_microbench.py): data-chain the
jitted prefill over its donated KV pool, fetch a tiny barrier element, at
two loop counts so fixed costs cancel.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/prefill_microbench.py
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
from min_llm_inference_tpu.models.model import prefill_write_kv
from min_llm_inference_tpu.models.paged import (
    init_paged_state,
    make_prefill_kv_writer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--s-pre", type=int, default=64)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--n-small", type=int, default=4)
    ap.add_argument("--n-big", type=int, default=12)
    ap.add_argument("--phases", action="store_true",
                    help="also time embed / matmul sub-phases")
    args = ap.parse_args()

    M, S_pre, D = args.max_new, args.s_pre, args.emb
    NP, P = args.pages, args.page_size
    model = ModelConfig(n_vocab=1024, emb_dim=D, n_seq=128,
                       eof_token_id=1023, dtype="bfloat16")
    rng = np.random.default_rng(0)
    params = fuse_qkv_params(init_params(jax.random.PRNGKey(0), model))
    W = -(-128 // P)

    prompts = jnp.asarray(rng.integers(0, 1023, (M, S_pre)), jnp.int32)
    plens = jnp.asarray(rng.integers(1, S_pre + 1, M), jnp.int32)
    granted = jnp.asarray(
        rng.permutation(NP)[: M * W].reshape(M, W).astype(np.int32))

    def make_fn(kv_dtype):
        cfg = EngineConfig(n_slots=1024, n_pages=NP, page_size=P,
                           kv_dtype=kv_dtype, n_forward_rounds=16)

        def pf(params, kv, prompts, plens, granted):
            write_kv_block, finalize = make_prefill_kv_writer(
                kv, granted, plens, S_pre, P, NP)
            prefill_write_kv(params, model, prompts, plens, write_kv_block)
            return finalize()

        return jax.jit(pf, donate_argnums=(1,)), cfg

    def chain_time(fn, kv0, n):
        kv = jax.tree_util.tree_map(jnp.array, kv0)
        t0 = time.perf_counter()
        for _ in range(n):
            kv = fn(params, kv, prompts, plens, granted)
        _ = np.asarray(kv.kv_pages[0][0, 0, 0, :1])  # barrier
        return time.perf_counter() - t0

    for kv_dtype in ("int8", "bfloat16"):
        fn, cfg = make_fn(kv_dtype)
        kv0 = init_paged_state(model, cfg)
        chain_time(fn, kv0, 2)  # compile + warm
        t_small = chain_time(fn, kv0, args.n_small)
        t_big = chain_time(fn, kv0, args.n_big)
        per = (t_big - t_small) / (args.n_big - args.n_small)
        print(f"kv={kv_dtype:9s} prefill[{M},{S_pre}]: {per*1e3:8.3f} ms",
              flush=True)

    if not args.phases:
        return

    # ---- phase breakdown (chained; per-executable overhead NOT cancelled,
    # so treat each as an upper bound) ----
    from min_llm_inference_tpu.ops.reference import feed_forward, token_pos_embed

    positions = jnp.broadcast_to(
        jnp.arange(S_pre, dtype=jnp.int32)[None, :], (M, S_pre))
    wkv = params["layers"][0]["wkv"]

    @jax.jit
    def embed_only(toks):
        h = token_pos_embed(toks, positions, params["wte"], params["wpe"])
        return (toks + h[:, :, 0].astype(jnp.int32)) % 1023

    @jax.jit
    def matmul_only(h):
        kv = feed_forward(h, wkv)
        return h + kv[:, :, :D] * 1e-6

    def chain(fn, first, n):
        s = first
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        np.asarray(jax.tree_util.tree_leaves(s)[0][0, 0])
        return time.perf_counter() - t0

    h0 = jnp.asarray(rng.standard_normal((M, S_pre, D)), jnp.bfloat16)
    for name, fn, first in (
        ("embed ", embed_only, prompts),
        ("matmul", matmul_only, h0),
    ):
        chain(fn, first, 2)
        ts = chain(fn, first, args.n_small)
        tb = chain(fn, first, args.n_big)
        per = (tb - ts) / (args.n_big - args.n_small)
        print(f"phase {name} [{M},{S_pre}]: {per*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

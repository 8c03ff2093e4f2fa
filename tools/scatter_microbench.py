"""Decode KV-write strategies, measured on device at bench shapes.

Splits the decode KV write into its parts and compares scatter strategies:
  * quant-only      — per-row quantize against page scales, no pool write
  * xla (no donate) — `_write_kv_tokens` as a plain jit (copies the pool;
                      what tools/decode_microbench.py reports)
  * xla (donated)   — same but donate_argnums on the pool, the in-engine
                      situation (scan carry / donated state)

All phases are DATA-CHAINED through the pool and timed at two loop counts
(tools/decode_microbench.py methodology).

Findings (v5e, bench shapes B=1024 NP=4096 P=32 D=2048, 512MiB pool):
  quant-only 0.62ms / xla no-donate ~2.2ms / xla DONATED 0.47ms.
The earlier "2.2ms KV-write cost" was a measurement artifact of the
non-donated microbench: with the pool donated (the real in-engine
situation — scan carry / donated engine state) XLA updates the pages in
place and the full quantize+scatter costs 0.47ms. A per-row Pallas DMA
scatter kernel was prototyped and REJECTED: Mosaic requires HBM DMA
slices aligned to the dtype tiling (8 sublanes; 32 for int8), so
single-token-row copies into an int8 pool do not compile on hardware
("slice must be aligned to tiling (8), but is 1"), and the donated XLA
path is already near the write's bandwidth floor.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/scatter_microbench.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from min_llm_inference_tpu.models.paged import (
    _flat_scatter_indices,
    _write_kv_tokens,
    decode_fresh_pid,
)
from min_llm_inference_tpu.ops.quant import (
    quantize_rows_against_pages,
    update_page_scales,
)
from tools.decode_microbench import _barrier, chain_time


def chain_time_donated(step, make_first, n_small=8, n_big=32):
    """chain_time for donated jits: the chain consumes its own input, so
    each run starts from a FRESH copy (made outside the timed region)."""
    import time

    def run(n):
        s = make_first()
        _barrier(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _barrier(s)
        return time.perf_counter() - t0

    run(2)
    t_small = run(n_small)
    t_big = run(n_big)
    return (t_big - t_small) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=4096)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--emb", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=32)
    ap.add_argument("--live-frac", type=float, default=0.85)
    args = ap.parse_args()

    B, NP, S, D, P = args.slots, args.pages, args.seq, args.emb, args.page_size
    W = S // P
    rng = np.random.default_rng(0)
    live = rng.random(B) < args.live_frac
    lengths = np.where(live, rng.integers(8, S, B), 0).astype(np.int32)
    table = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)

    pool = jnp.asarray(rng.integers(-127, 128, (NP, 2, P, D)), jnp.int8)
    ks = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 1e-3)
    vs = jnp.asarray(rng.random(NP, dtype=np.float32) * 0.02 + 1e-3)
    lengths_d = jnp.asarray(lengths)
    table_d = jnp.asarray(table)
    k_new = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)

    livej = lengths_d > 0
    pos = jnp.maximum(lengths_d - 1, 0)
    flat_idx = jax.jit(_flat_scatter_indices, static_argnums=(3, 4))(
        table_d, pos, livej, P, NP
    )
    fresh = jax.jit(decode_fresh_pid, static_argnums=(3, 4))(
        table_d, pos, livej, P, NP
    )

    print(f"B={B} live={int(live.sum())} NP={NP} P={P} D={D} "
          f"pool={pool.nbytes/2**20:.0f}MiB", flush=True)

    # quantize-only (chained via scales)
    @jax.jit
    def quant_only(ks, vs):
        ks = update_page_scales(ks, k_new, fresh)
        vs = update_page_scales(vs, v_new, fresh)
        qk = quantize_rows_against_pages(k_new, flat_idx, ks, P)
        qv = quantize_rows_against_pages(v_new, flat_idx, vs, P)
        # fold the int8 rows back into the f32 scales to keep the chain
        return (ks + 1e-20 * qk[0, 0].astype(jnp.float32),
                vs + 1e-20 * qv[0, 0].astype(jnp.float32))

    t = chain_time(lambda s: quant_only(*s), (ks, vs))
    print(f"quant-only        : {t*1e3:7.3f} ms", flush=True)

    # full write, XLA scatter, no donation
    @jax.jit
    def write_plain(pool, ks, vs):
        return _write_kv_tokens(pool, ks, vs, flat_idx, k_new, v_new, fresh)

    t = chain_time(lambda s: write_plain(*s), (pool, ks, vs))
    print(f"xla   (no donate) : {t*1e3:7.3f} ms", flush=True)

    # full write, XLA scatter, donated pool+scales (in-engine situation)
    write_don = jax.jit(
        lambda pool, ks, vs: _write_kv_tokens(
            pool, ks, vs, flat_idx, k_new, v_new, fresh
        ),
        donate_argnums=(0, 1, 2),
    )

    def fresh_state():
        return (jnp.array(pool), jnp.array(ks), jnp.array(vs))

    t = chain_time_donated(lambda s: write_don(*s), fresh_state)
    print(f"xla   (donated)   : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Same-session grouped-vs-dgrid full-burst A/B across context lengths.

Cross-process bench comparisons carry the tunnel's 15-20% run-to-run
variance (CLAUDE.md), so formulation A/Bs must interleave in ONE process.
This times the full autonomous gpt2s burst (no knockouts) per attend
formulation at several uniform context lengths, with burst_ablate.py's
measurement discipline: data-chained donated bursts, np.asarray status
fetch as the barrier, two loop counts so fixed costs cancel.

The length sweep exposes the dgrid per-block max-width gate's byte cost:
at uniform lengths the gate is exact, so any dgrid loss vs grouped here is
NOT gating waste; bench-level gaps beyond this table are mixed-length
gating (blocks read max(rs) pages for all Gb slots).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/dgrid_ab.py \
           [--lens 32,72,112] [--out AB.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
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


def main():
    ap = argparse.ArgumentParser()
    # seq 256 / pages 8192 (vs the bench's 128/4096) so the long-ctx
    # points have room for n_big bursts without hitting the cap; page
    # geometry per slot doubles (W=8) but uniform-length gating is exact
    # either way, so the grouped-vs-dgrid comparison is unaffected
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--pages", type=int, default=8192)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--live", type=int, default=1024)
    ap.add_argument("--lens", default="32,72,112")
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-big", type=int, default=5)
    ap.add_argument("--model", default="gpt2s", choices=["ref", "gpt2s"])
    ap.add_argument("--variants", default="grouped,dgrid,dgrid8",
                    help="comma list: grouped, dgrid (auto block), dgridN "
                         "(block of N rows)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    B, NP, S = args.slots, args.pages, args.seq
    if args.model == "gpt2s":
        model = ModelConfig(
            n_vocab=1024, emb_dim=768, n_seq=S, n_layers=12, n_heads=12,
            ffn_dim=3072, use_output_proj=True, use_layernorm=True,
            eof_token_id=1023, dtype="bfloat16",
        )
    else:
        model = ModelConfig(n_vocab=1024, emb_dim=2048, n_seq=S,
                            eof_token_id=1023, dtype="bfloat16")
    base_cfg = EngineConfig(n_slots=B, n_pages=NP, page_size=32,
                            kv_dtype="int8", n_forward_rounds=args.rounds)
    params = fuse_qkv_params(init_params(jax.random.PRNGKey(0), model))
    rng = np.random.default_rng(0)

    n_req = 2048
    st0 = init_auto_state(model, base_cfg, n_req)
    W = base_cfg.pages_per_slot(S)
    s_pre = 64
    prompts = jnp.asarray(rng.integers(0, 1023, (n_req, s_pre)), jnp.int32)
    plens = jnp.asarray(rng.integers(1, s_pre, n_req), jnp.int32)
    n_real = jnp.asarray(n_req, jnp.int32)

    def variant_cfg(name):
        if name == "grouped":
            return base_cfg
        assert name.startswith("dgrid")
        blk = int(name[5:]) if len(name) > 5 else None
        return dataclasses.replace(base_cfg, attn_dgrid=True,
                                   dgrid_block=blk)

    def template_for(ctx_len):
        lengths = np.zeros(B, np.int32)
        lengths[: args.live] = ctx_len
        table = np.arange(B * W, dtype=np.int32).reshape(B, W)
        return st0._replace(
            lengths=jnp.asarray(lengths),
            page_table=jnp.asarray(table),
            last_tokens=jnp.asarray(rng.integers(0, 1023, B), jnp.int32),
            rid=jnp.asarray(np.arange(B, dtype=np.int32)),
            allocated=jnp.asarray(lengths > 0),
            queue_head=jnp.asarray(n_req, jnp.int32),
            free_top=jnp.asarray(NP // W - B, jnp.int32),
            page_stack=jnp.asarray(
                np.concatenate([np.arange(B, NP // W), np.zeros(B)]
                               ).astype(np.int32)),
        )

    def measure(burst, template, repeats=3):
        def fresh():
            return jax.tree_util.tree_map(jnp.array, template)

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
            vals.append((t_big - t_small)
                        / (args.n_big - args.n_small) / args.rounds)
        vals.sort()
        return vals[len(vals) // 2]

    variants = args.variants.split(",")
    lens = [int(x) for x in args.lens.split(",")]
    rows = []
    for ctx in lens:
        assert args.n_big <= (S - 1 - ctx) // args.rounds, (
            f"bursts overrun n_seq at len {ctx}; lower --n-big")
        tmpl = template_for(ctx)
        row = {"ctx_len": ctx}
        for v in variants:
            burst = make_autonomous_fn(model, variant_cfg(v), "grouped",
                                       min(256, B))
            row[f"{v}_ms_round"] = round(measure(burst, tmpl) * 1e3, 4)
            print(json.dumps(row), flush=True)
        rows.append(row)

    out = {"model": args.model, "live": args.live,
           "device": str(jax.devices()[0]), "rows": rows}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

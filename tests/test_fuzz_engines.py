"""Randomized cross-engine fuzz over odd geometries.

The reference's strongest oracle is token-exact two-backend comparison on
one fixed shape (tests/inferencer_test.cpp:76-164). This file widens that
to a randomized matrix: random page sizes, pool pressures, burst shapes,
KV dtypes, and prompt distributions — each draw runs the SAME request set
through the host paged engine (jnp attend, per-round scatter writes) and
the autonomous engine (grouped Pallas kernel, fused in-kernel writes) and
asserts token-exact equality plus the termination invariant (every
sequence ends with EOF or at the n_seq cap).

Scheduling differs wildly across the two engines (admission order, page
assignment, preemption vs full-grant) — greedy determinism says outputs
must not.
"""

import numpy as np
import pytest

import jax

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    PagedEngine,
    Request,
    get_global_throughput_counter,
    init_params,
)
from min_llm_inference_tpu.runtime.autonomous import AutonomousEngine

# (page_size, n_slots, pool_groups, rounds, kv_dtype, n_seq, vocab, flags)
DRAWS = [
    (8, 6, 6, 3, "float32", 40, 128, {}),
    (16, 12, 12, 5, "float32", 48, 256, {}),
    (16, 8, 8, 2, "int8", 64, 256, {}),
    (32, 8, 8, 4, "int8", 64, 512, {}),
    (16, 8, 8, 4, "int4", 64, 256, {}),
    (8, 10, 10, 1, "int8", 32, 128, {}),
    # dense-grid Pallas ring partial over full-grant group rows
    (16, 8, 8, 4, "int8", 64, 256, {"attn_dgrid": True}),
    (8, 6, 6, 3, "float32", 40, 128, {"attn_dgrid": True}),
]


def _run(engine_cls, params, model, cfg, prompts, **kw):
    get_global_throughput_counter().reset()
    store = ItemStorage()
    for i, p in enumerate(prompts):
        store.add_new_item(Request(i, list(p)))
    engine_cls(params, model, cfg, **kw).run(store)
    return store


@pytest.mark.parametrize(
    "page_size,slots,groups,rounds,kv_dtype,n_seq,vocab,flags", DRAWS
)
def test_fuzz_host_vs_autonomous(page_size, slots, groups, rounds,
                                 kv_dtype, n_seq, vocab, flags):
    model = ModelConfig(n_vocab=vocab, emb_dim=64, n_seq=n_seq,
                        eof_token_id=vocab - 1)
    W = -(-n_seq // page_size)
    cfg = EngineConfig(
        n_slots=slots, page_size=page_size, n_pages=groups * W,
        n_forward_rounds=rounds, kv_dtype=kv_dtype,
        max_prefill_batch=slots, **flags,
    )
    seed = hash((page_size, slots, rounds, kv_dtype)) % 2**31
    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(seed % 97), model, eof_bias=0.05)
    n = slots * 2 + 3  # force turnover / multiple admission waves
    prompts = [
        rng.integers(0, vocab - 1, int(rng.integers(1, n_seq // 2))).tolist()
        for _ in range(n)
    ]

    auto = _run(AutonomousEngine, params, model, cfg, prompts,
                attention_impl="grouped", max_new_per_burst=slots,
                bursts_per_chunk=2)
    host = _run(PagedEngine, params, model, cfg, prompts,
                attention_impl="jnp")

    assert len(auto.finished) == n and len(host.finished) == n
    for i in range(n):
        a, h = auto.finished[i].tokens, host.finished[i].tokens
        assert a == h, f"request {i}: {a} != {h}"
        gen_len = len(a) - len(prompts[i])
        assert gen_len > 0
        assert a[-1] == model.eof_token_id or len(a) == n_seq

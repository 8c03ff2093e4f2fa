"""dp x tp ShardedAutonomousEngine parity on the virtual 8-device CPU mesh.

Oracle: the single-chip AutonomousEngine on the identical request stream.
Greedy decode makes every request's tokens a pure function of (prompt,
weights), so partitioning requests over dp groups and sharding heads over
tp must not change a single token — the same golden property the reference
enforces between its backends (tests/inferencer_test.cpp:151-163), extended
to the mesh on the flagship engine."""

import numpy as np
import pytest

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
from min_llm_inference_tpu.runtime.autonomous import AutonomousEngine

MODEL = ModelConfig(
    n_vocab=128, emb_dim=64, n_seq=32, n_layers=2, n_heads=4,
    ffn_dim=128, use_output_proj=True, use_layernorm=True,
    eof_token_id=127,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), MODEL, eof_bias=0.05)


def make_store(rng, n):
    get_global_throughput_counter().reset()
    store = ItemStorage()
    for i in range(n):
        ln = int(rng.integers(1, MODEL.n_seq // 2))
        store.add_new_item(
            Request(i, rng.integers(0, MODEL.eof_token_id, ln).tolist())
        )
    return store


def run_single(params, cfg, store, attention):
    AutonomousEngine(params, MODEL, cfg, attention_impl=attention).run(store)
    return store


def run_sharded(params, cfg, store, attention, n_devices, tp, **kw):
    eng = ShardedAutonomousEngine(
        params, MODEL, cfg, n_devices=n_devices, tp=tp,
        attention_impl=attention, **kw,
    )
    eng.run(store)
    return store


@pytest.mark.parametrize("n_devices,tp", [(8, 1), (8, 2), (4, 4), (2, 1)])
def test_sharded_autonomous_matches_single_chip(params, rng, n_devices, tp):
    n = 22  # not a multiple of dp: uneven groups exercised
    dp = n_devices // tp
    cfg = EngineConfig(
        n_slots=2 * dp, page_size=8, n_pages=2 * dp * 4,
        n_forward_rounds=2, max_prefill_batch=8,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]
    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg, oracle, "jnp")

    store = ItemStorage()
    for i, p in enumerate(prompts):
        store.add_new_item(Request(i, list(p)))
    run_sharded(params, cfg, store, "jnp", n_devices, tp,
                max_new_per_burst=2, bursts_per_chunk=2)
    assert len(store.finished) == n
    for i in range(n):
        assert store.finished[i].tokens == oracle.finished[i].tokens, i


@pytest.mark.parametrize("kv_dtype,attention", [
    ("int8", "grouped"),
    ("int8", "jnp"),
    ("int4", "grouped"),
    ("bfloat16", "jnp"),
])
def test_sharded_autonomous_kv_dtypes(params, rng, kv_dtype, attention):
    """Quantized KV on the mesh: per-page scales are position-based (row-0
    absmax), identical regardless of which group's pool shard a page lives
    in, so int8/int4 streams stay token-exact too."""
    n_devices, tp = 4, 2
    dp = n_devices // tp
    n = 10
    cfg = EngineConfig(
        n_slots=4 * dp, page_size=8, n_pages=4 * dp * 4,
        n_forward_rounds=2, kv_dtype=kv_dtype, max_prefill_batch=8,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]
    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg, oracle, attention)

    store = ItemStorage()
    for i, p in enumerate(prompts):
        store.add_new_item(Request(i, list(p)))
    run_sharded(params, cfg, store, attention, n_devices, tp)
    assert len(store.finished) == n
    for i in range(n):
        assert store.finished[i].tokens == oracle.finished[i].tokens, i


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_sharded_autonomous_overcommit_matches_single_chip(
    params, rng, kv_dtype
):
    """Overcommit on the mesh under real pool pressure: each dp group's
    pool holds only HALF the full demand (forcing half-grants, growth and
    youngest-first preemption inside every group's shard), and outputs stay
    token-exact with the single-chip overcommit engine AND the full-grant
    oracle — preemption timing may differ per group, tokens may not
    (greedy determinism, recompute-on-preempt)."""
    n_devices, tp = 4, 2
    dp = n_devices // tp
    n = 14
    W = 4  # pages per slot at page_size 8, n_seq 32
    slots = 4 * dp
    # pool: half the full grant demand per group -> constant pressure
    cfg_oc = EngineConfig(
        n_slots=slots, page_size=8, n_pages=slots * W // 2,
        n_forward_rounds=2, kv_dtype=kv_dtype, max_prefill_batch=8,
        overcommit=True,
    )
    cfg_full = EngineConfig(
        n_slots=slots, page_size=8, n_pages=slots * W,
        n_forward_rounds=2, kv_dtype=kv_dtype, max_prefill_batch=8,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg_full, oracle, "grouped")

    single_oc = ItemStorage()
    for i, p in enumerate(prompts):
        single_oc.add_new_item(Request(i, list(p)))
    run_single(params, cfg_oc, single_oc, "grouped")

    store = ItemStorage()
    for i, p in enumerate(prompts):
        store.add_new_item(Request(i, list(p)))
    run_sharded(params, cfg_oc, store, "grouped", n_devices, tp)
    assert len(store.finished) == n
    for i in range(n):
        assert store.finished[i].tokens == oracle.finished[i].tokens, i
        assert store.finished[i].tokens == single_oc.finished[i].tokens, i


def test_sharded_streaming_matches_oneshot(params, rng):
    """Mesh serving: ShardedStreamingSession (round-robin dealt per-group
    rings, pipelined observe, row recycling) is token-exact with the
    single-chip one-shot engine."""
    from min_llm_inference_tpu.parallel.autonomous import (
        ShardedStreamingSession,
    )

    n_devices, tp = 4, 1
    dp = n_devices // tp
    n = 26
    cfg = EngineConfig(
        n_slots=2 * dp, page_size=8, n_pages=2 * dp * 4,
        n_forward_rounds=2, max_prefill_batch=8,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]
    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg, oracle, "jnp")

    eng = ShardedAutonomousEngine(
        params, MODEL, cfg, n_devices=n_devices, tp=tp,
        attention_impl="jnp", max_new_per_burst=2, bursts_per_chunk=2,
    )
    # capacity < n forces per-group row recycling
    sess = ShardedStreamingSession(eng, capacity=16, max_prompt_len=16,
                                   observe_lag=2)
    finished = {}
    submitted = 0
    for _ in range(600):
        take = min(4, n - submitted, sess.free_capacity)
        if take:
            sess.submit([Request(i, list(prompts[i]))
                         for i in range(submitted, submitted + take)])
            submitted += take
        sess.dispatch()
        s = sess.observe()
        if s is not None and s["finished_total"]:
            for r in sess.poll(s["fin_lens"], s["n_submitted_at"]):
                finished[r.id] = r
        if submitted == n and len(finished) == n:
            break
    for r in sess.close():
        finished[r.id] = r
    assert len(finished) == n
    for i in range(n):
        assert finished[i].tokens == oracle.finished[i].tokens, i


def test_sharded_autonomous_rejects_bad_shapes(params):
    cfg = EngineConfig(n_slots=6, page_size=8, n_pages=24)
    with pytest.raises(AssertionError):
        ShardedAutonomousEngine(params, MODEL, cfg, n_devices=4, tp=1)


def test_sharded_fused_step_observe_matches_oneshot(params, rng):
    """ShardedStreamingSession.step(observe=True): the fused
    status+final_lens snapshot drives poll() exactly once per
    completion, token-exact vs the single-chip one-shot run."""
    from min_llm_inference_tpu.parallel.autonomous import (
        ShardedStreamingSession,
    )

    n_devices, tp = 4, 1
    dp = n_devices // tp
    n = 18
    cfg = EngineConfig(
        n_slots=2 * dp, page_size=8, n_pages=2 * dp * 4,
        n_forward_rounds=2, max_prefill_batch=8,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]
    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg, oracle, "jnp")

    eng = ShardedAutonomousEngine(
        params, MODEL, cfg, n_devices=n_devices, tp=tp,
        attention_impl="jnp", max_new_per_burst=2, bursts_per_chunk=2,
    )
    sess = ShardedStreamingSession(eng, capacity=16, max_prompt_len=16)
    finished = {}
    submitted = 0
    for _ in range(600):
        take = min(4, n - submitted, sess.free_capacity)
        if take:
            sess.submit([Request(i, list(prompts[i]))
                         for i in range(submitted, submitted + take)])
            submitted += take
        s = sess.step(observe=True)
        if s["finished_total"]:
            for r in sess.poll(s["fin_lens"], s["n_submitted_at"]):
                finished[r.id] = r
        if submitted == n and len(finished) == n:
            break
    for r in sess.close():
        finished[r.id] = r
    assert len(finished) == n
    for i in range(n):
        assert finished[i].tokens == oracle.finished[i].tokens, i


def test_sharded_sort_admits_subbursts_burst_flush(params, rng):
    """The r5 engine knobs compose on the mesh: sorted admission waves +
    sub-burst admission with the burst-wide ring (single flush, per-slot
    ring_r0) under dp x tp sharding, token-exact vs the single-chip jnp
    oracle. int8 exercises the quantized ring + scale columns."""
    n_devices, tp = 4, 2
    dp = n_devices // tp
    n = 20
    cfg = EngineConfig(
        n_slots=2 * dp, page_size=8, n_pages=2 * dp * 4,
        n_forward_rounds=4, max_prefill_batch=8, kv_dtype="int8",
        subbursts=2, sort_admits=True,
    )
    base = make_store(rng, n)
    prompts = [list(base._new[i].tokens) for i in range(n)]
    oracle = ItemStorage()
    for i, p in enumerate(prompts):
        oracle.add_new_item(Request(i, list(p)))
    run_single(params, cfg, oracle, "jnp")

    store = ItemStorage()
    for i, p in enumerate(prompts):
        store.add_new_item(Request(i, list(p)))
    run_sharded(params, cfg, store, "grouped", n_devices, tp,
                max_new_per_burst=2, bursts_per_chunk=2)
    assert len(store.finished) == n
    for i in range(n):
        assert store.finished[i].tokens == oracle.finished[i].tokens, i

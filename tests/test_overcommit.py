"""AutonomousEngine overcommit: half-grants, growth, device preemption.

The reference's core paged-KV behaviors — admit more sequences than the
pool can simultaneously hold, grow on demand, preempt when dry and
recompute (src/paged_item_storage.cpp:14-60) — running entirely inside the
jitted burst. Token-exactness vs the host engines is the contract: greedy
decode makes scheduling (including preemption + recompute) invisible in
the outputs.
"""

import numpy as np
import pytest

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    PagedEngine,
    Request,
)
from min_llm_inference_tpu.models.params import init_params
from min_llm_inference_tpu.runtime.autonomous import AutonomousEngine

import jax


def _mk_model(n_layers=1, emb=64):
    return ModelConfig(
        n_vocab=256, emb_dim=emb, n_seq=64, n_layers=n_layers,
        n_heads=1 if n_layers == 1 else 2,
        ffn_dim=0 if n_layers == 1 else emb * 2,
        use_output_proj=n_layers > 1, use_layernorm=n_layers > 1,
        eof_token_id=255, dtype="float32",
    )


def _run_requests(rng, n, max_plen, model_cfg):
    return [
        Request(i, rng.integers(0, model_cfg.n_vocab - 1,
                                int(rng.integers(1, max_plen + 1))).tolist())
        for i in range(n)
    ]


def _engine_outputs(engine, requests):
    store = ItemStorage()
    for r in requests:
        store.add_new_item(
            Request(r.id, list(r.tokens))
        )
    engine.run(store)
    done = {rid: r.tokens for rid, r in store.finished.items()}
    assert len(done) == len(requests), "not all requests finished"
    return done


@pytest.mark.parametrize("attention", ["grouped", "jnp"])
@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_overcommit_pool_pressure_token_exact(attention, kv_dtype):
    """Pool far below peak demand: 16 slots x 4 pages = 64 pages wanted,
    pool holds 24. The overcommit engine must finish everything with
    outputs token-exact vs the host paged engine (its own overcommit
    implementation)."""
    model_cfg = _mk_model()
    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    requests = _run_requests(rng, 40, 24, model_cfg)

    eng_cfg = EngineConfig(
        n_slots=16, n_pages=24, page_size=16, n_forward_rounds=4,
        kv_dtype=kv_dtype, init_num_pages=2, max_prefill_batch=16,
        overcommit=True,
    )
    auto = AutonomousEngine(
        params, model_cfg, eng_cfg, attention_impl=attention,
        max_new_per_burst=16, bursts_per_chunk=2,
    )
    got = _engine_outputs(auto, requests)

    host_cfg = EngineConfig(
        n_slots=16, n_pages=24, page_size=16, n_forward_rounds=4,
        kv_dtype=kv_dtype, init_num_pages=2, max_prefill_batch=16,
    )
    host = PagedEngine(params, model_cfg, host_cfg, attention_impl="jnp")
    want = _engine_outputs(host, requests)
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_overcommit_forced_preemption_completes():
    """A pool of only 4 half-groups with 8 slots: growth MUST preempt.
    Everything still finishes, token-exact vs an uncontended run."""
    model_cfg = _mk_model()
    rng = np.random.default_rng(1)
    params = init_params(jax.random.PRNGKey(1), model_cfg)
    # long generations: tiny prompts run to the 64-token cap -> every slot
    # eventually needs both halves
    requests = [Request(i, rng.integers(0, 254, 2).tolist())
                for i in range(12)]

    tight = EngineConfig(
        n_slots=8, n_pages=8, page_size=16, n_forward_rounds=4,
        kv_dtype="float32", init_num_pages=2, max_prefill_batch=8,
        overcommit=True,
    )
    got = _engine_outputs(
        AutonomousEngine(params, model_cfg, tight, attention_impl="grouped",
                         max_new_per_burst=8, bursts_per_chunk=2),
        requests,
    )
    roomy = EngineConfig(
        n_slots=8, n_pages=64, page_size=16, n_forward_rounds=4,
        kv_dtype="float32", init_num_pages=2, max_prefill_batch=8,
    )
    want = _engine_outputs(
        AutonomousEngine(params, model_cfg, roomy, attention_impl="grouped",
                         max_new_per_burst=8, bursts_per_chunk=2),
        requests,
    )
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_overcommit_long_prompt_double_grant():
    """Prompts longer than a half-group force a two-half admission grant."""
    model_cfg = _mk_model()
    rng = np.random.default_rng(2)
    params = init_params(jax.random.PRNGKey(2), model_cfg)
    # half-group = 2 pages x 16 = 32 positions; prompts of 40 need both
    requests = [Request(i, rng.integers(0, 254, 40).tolist())
                for i in range(6)]
    cfg = EngineConfig(
        n_slots=8, n_pages=16, page_size=16, n_forward_rounds=4,
        kv_dtype="int8", init_num_pages=2, max_prefill_batch=8,
        overcommit=True,
    )
    got = _engine_outputs(
        AutonomousEngine(params, model_cfg, cfg, attention_impl="grouped",
                         max_new_per_burst=8, bursts_per_chunk=2),
        requests,
    )
    host_cfg = EngineConfig(
        n_slots=8, n_pages=32, page_size=16, n_forward_rounds=4,
        kv_dtype="int8", init_num_pages=3, max_prefill_batch=8,
    )
    want = _engine_outputs(
        PagedEngine(params, model_cfg, host_cfg, attention_impl="jnp"),
        requests,
    )
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_overcommit_multilayer_int8():
    """2-layer stack + int8 KV with on-demand GROWTH (pool sized so no
    preemption occurs: int8 recompute after preemption is exact only for
    single-layer models — the documented engine invariant — while growth
    alone must stay token-exact for any depth)."""
    model_cfg = _mk_model(n_layers=2, emb=64)
    rng = np.random.default_rng(3)
    params = init_params(jax.random.PRNGKey(3), model_cfg)
    requests = _run_requests(rng, 24, 20, model_cfg)
    cfg = EngineConfig(
        n_slots=8, n_pages=32, page_size=16, n_forward_rounds=4,
        kv_dtype="int8", init_num_pages=2, max_prefill_batch=8,
        overcommit=True,
    )
    got = _engine_outputs(
        AutonomousEngine(params, model_cfg, cfg, attention_impl="grouped",
                         max_new_per_burst=8, bursts_per_chunk=2),
        requests,
    )
    host_cfg = EngineConfig(
        n_slots=8, n_pages=32, page_size=16, n_forward_rounds=4,
        kv_dtype="int8", init_num_pages=2, max_prefill_batch=8,
    )
    want = _engine_outputs(
        AutonomousEngine(params, model_cfg, host_cfg,
                         attention_impl="grouped",
                         max_new_per_burst=8, bursts_per_chunk=2),
        requests,
    )
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged"


def test_overcommit_streaming_session_token_exact():
    """StreamingSession x overcommit: the oversubscribed-pool regime is
    precisely where online serving needs overcommit (the reference's paged
    scheduler exists for it, paged_item_storage.cpp:14-60). Requests
    arrive in waves under pool pressure (growth + preemption + the device
    retry stack all active) and every output must be token-exact vs an
    uncontended one-shot run."""
    from min_llm_inference_tpu import StreamingSession

    model_cfg = _mk_model()
    rng = np.random.default_rng(5)
    params = init_params(jax.random.PRNGKey(5), model_cfg)
    n = 28
    requests = _run_requests(rng, n, 20, model_cfg)

    # uncontended oracle (full-grant pool, one-shot)
    oracle_cfg = EngineConfig(
        n_slots=8, n_pages=32, page_size=16, n_forward_rounds=4,
        init_num_pages=2, max_prefill_batch=8,
    )
    want = _engine_outputs(
        AutonomousEngine(params, model_cfg, oracle_cfg,
                         attention_impl="grouped"),
        requests,
    )

    # 75%-of-full pool + overcommit, streaming arrivals
    cfg = EngineConfig(
        n_slots=8, n_pages=24, page_size=16, n_forward_rounds=4,
        init_num_pages=2, max_prefill_batch=8, overcommit=True,
    )
    eng = AutonomousEngine(params, model_cfg, cfg,
                           attention_impl="grouped",
                           max_new_per_burst=8, bursts_per_chunk=2)
    sess = StreamingSession(eng, capacity=12, max_prompt_len=32)
    done = {}
    submitted = 0
    guard = 0
    while len(done) < n:
        k = min(sess.free_capacity, n - submitted, 5)
        if k:
            sess.submit([Request(r.id, list(r.tokens))
                         for r in requests[submitted:submitted + k]])
            submitted += k
        sess.step()
        for r in sess.poll():
            done[r.id] = r.tokens
        guard += 1
        assert guard < 500, "overcommit streaming made no progress"
    assert sess.n_submitted == n > 12  # rows recycled under pressure
    for rid in want:
        assert done[rid] == want[rid], f"request {rid} diverged"

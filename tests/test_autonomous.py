"""Device-autonomous engine tests: token-exact parity with the host paged
engine (greedy determinism — scheduling may differ, outputs must not),
ramp/turnover admission, pool-limited concurrency, and int8 mode."""

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

MODEL = ModelConfig(n_vocab=256, emb_dim=32, n_seq=64, eof_token_id=255)


def make_store(rng, n, eof):
    get_global_throughput_counter().reset()
    store = ItemStorage()
    for i in range(n):
        ln = int(rng.integers(1, 24))
        store.add_new_item(Request(i, rng.integers(0, eof, ln).tolist()))
    return store


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), MODEL, eof_bias=0.05)


def test_autonomous_matches_host_engine(params, rng):
    n = 24
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4, max_prefill_batch=8)
    store_a = make_store(rng, n, MODEL.eof_token_id)
    store_b = ItemStorage()
    for i in range(n):
        store_b.add_new_item(Request(i, list(store_a._new[i].tokens)))

    PagedEngine(params, MODEL, cfg).run(store_a)
    get_global_throughput_counter().reset()
    AutonomousEngine(params, MODEL, cfg, attention_impl="jnp").run(store_b)

    assert len(store_b.finished) == n
    for i in range(n):
        assert store_a.finished[i].tokens == store_b.finished[i].tokens, i
    c = get_global_throughput_counter()
    gen = sum(len(r.tokens) - r.prompt_len for r in store_b.finished.values())
    assert c.total_tokens == gen > 0


@pytest.mark.parametrize("attention,kv_dtype", [
    ("pallas", "float32"), ("pallas", "int8"),
    ("grouped", "float32"), ("grouped", "int8"),
    # packed int4: grouped kernel unpacks the nibble planes exactly like
    # the jnp oracle's unpack_int4 -> token-exact
    ("grouped", "int4"),
])
def test_autonomous_kernel_impls_match_jnp(params, rng, attention, kv_dtype):
    """Fused-kernel attention (one-slot and grouped grids) must be
    token-exact with the jnp gather oracle inside the same engine, fp and
    int8/int4 (identical quantized pages -> identical dequant math)."""
    n = 12
    cfg = EngineConfig(
        n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=2,
        kv_dtype=kv_dtype,
    )
    stores = {}
    base = make_store(rng, n, MODEL.eof_token_id)
    for impl in ("jnp", attention):
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(params, MODEL, cfg, attention_impl=impl).run(s)
        stores[impl] = s
    assert len(stores[attention].finished) == n
    for i in range(n):
        assert (
            stores["jnp"].finished[i].tokens
            == stores[attention].finished[i].tokens
        ), i


@pytest.mark.parametrize("kv_dtype", ["float32", "int8", "int4"])
def test_autonomous_dense_attend_matches_jnp(params, rng, kv_dtype):
    """attn_dense (the dense-view XLA page partial over full-grant group
    rows, ops/paged_attention_dense.py) must be token-exact with the jnp
    oracle through the same engine — including slot turnover, where group
    assignments become non-identity."""
    n = 14
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for dense in (False, True):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=2,
            kv_dtype=kv_dtype, attn_dense=dense,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        impl = "grouped" if dense else "jnp"
        AutonomousEngine(params, MODEL, cfg, attention_impl=impl).run(s)
        stores[dense] = s
    assert len(stores[True].finished) == n
    for i in range(n):
        assert stores[False].finished[i].tokens == stores[True].finished[i].tokens, i


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_autonomous_dgrid_attend_matches_jnp(params, rng, kv_dtype):
    """attn_dgrid (the dense-grid Pallas partial over full-grant group
    rows, ops/paged_attention_dgrid.py) must be token-exact with the jnp
    oracle through the same engine — including slot turnover, where group
    assignments become non-identity. (int4 is rejected by config.)"""
    n = 14
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for dgrid in (False, True):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=2,
            kv_dtype=kv_dtype, attn_dgrid=dgrid,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        impl = "grouped" if dgrid else "jnp"
        AutonomousEngine(params, MODEL, cfg, attention_impl=impl).run(s)
        stores[dgrid] = s
    assert len(stores[True].finished) == n
    for i in range(n):
        assert stores[False].finished[i].tokens == stores[True].finished[i].tokens, i


def test_autonomous_subbursts_match_single(params, rng):
    """subbursts > 1 (in-burst re-admission every R/subbursts rounds) must
    be token-exact with the single-body burst: scheduling granularity may
    change WHICH slot a request lands in, never its tokens (greedy
    determinism)."""
    n = 20
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for sub in (1, 4):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=4,
            subbursts=sub,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(s)
        stores[sub] = s
    assert len(stores[4].finished) == n
    for i in range(n):
        assert stores[1].finished[i].tokens == stores[4].finished[i].tokens, i


def test_autonomous_burst_flush_modes_match(rng):
    """The burst-wide ring with ONE end-of-burst flush (burst_flush=True,
    per-slot ring_r0 masking pre-admission columns) must be token-exact
    with the round-4 per-sub-burst flush AND with subbursts=1 — on a
    multi-layer model with int8 KV, where mid-burst slot turnover makes a
    re-admitted slot's early ring columns hold a previous occupant's
    quantized rows (the case ring_r0 exists for)."""
    model = ModelConfig(n_vocab=256, emb_dim=32, n_seq=64, n_layers=2,
                        n_heads=2, ffn_dim=64, use_output_proj=True,
                        use_layernorm=True, eof_token_id=255)
    params2 = init_params(jax.random.PRNGKey(1), model, eof_bias=0.3)
    n = 24
    base = make_store(rng, n, model.eof_token_id)
    stores = {}
    for sub, bflush in ((1, True), (4, True), (4, False), (2, True)):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=4,
            subbursts=sub, burst_flush=bflush, kv_dtype="int8",
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(params2, model, cfg,
                         attention_impl="grouped").run(s)
        stores[(sub, bflush)] = s
    ref = stores[(1, True)]
    assert len(ref.finished) == n
    for key, s in stores.items():
        for i in range(n):
            assert s.finished[i].tokens == ref.finished[i].tokens, (key, i)


def test_autonomous_burst_flush_dgrid_match(params, rng):
    """burst_flush composes with the dgrid attend (the gpt2s bench
    config): token-exact vs the jnp oracle engine under sub-burst
    admission."""
    n = 16
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for dgrid in (False, True):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=4,
            subbursts=2, kv_dtype="int8", attn_dgrid=dgrid,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        impl = "grouped" if dgrid else "jnp"
        AutonomousEngine(params, MODEL, cfg,
                         attention_impl=impl).run(s)
        stores[dgrid] = s
    assert len(stores[True].finished) == n
    for i in range(n):
        assert stores[False].finished[i].tokens == \
            stores[True].finished[i].tokens, i


def test_autonomous_sort_admits_token_exact(params, rng):
    """sort_admits permutes which slot/page-group an admitted request
    lands in (length clustering for the dgrid block gate) — outputs must
    be token-exact unsorted vs sorted, jnp oracle vs dgrid."""
    n = 20
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for sort, dgrid in ((False, False), (True, False), (True, True)):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=4,
            subbursts=2, kv_dtype="int8", sort_admits=sort,
            attn_dgrid=dgrid,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        impl = "grouped" if dgrid else "jnp"
        AutonomousEngine(params, MODEL, cfg, attention_impl=impl,
                         max_new_per_burst=6).run(s)
        stores[(sort, dgrid)] = s
    ref = stores[(False, False)]
    assert len(ref.finished) == n
    for key, s in stores.items():
        for i in range(n):
            assert s.finished[i].tokens == ref.finished[i].tokens, (key, i)


def test_autonomous_subbursts_overcommit_match(params, rng):
    """Sub-bursts compose with overcommit: growth lookahead shrinks to the
    sub-burst rounds and admission/preemption run per sub-burst."""
    n = 16
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for sub in (1, 2):
        cfg = EngineConfig(
            n_slots=8, page_size=16, n_pages=16, n_forward_rounds=4,
            subbursts=sub, overcommit=True,
        )
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(s)
        stores[sub] = s
    assert len(stores[2].finished) == n
    for i in range(n):
        assert stores[1].finished[i].tokens == stores[2].finished[i].tokens, i


def test_autonomous_turnover_small_max_new(params, rng):
    # max_new smaller than slot count: admission trickles over bursts
    n = 20
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4, n_forward_rounds=4)
    store = make_store(rng, n, MODEL.eof_token_id)
    AutonomousEngine(
        params, MODEL, cfg, attention_impl="jnp", max_new_per_burst=2,
        bursts_per_chunk=2,
    ).run(store)
    assert len(store.finished) == n
    for r in store.finished.values():
        assert r.tokens[-1] == MODEL.eof_token_id or len(r.tokens) == MODEL.n_seq


def test_autonomous_pool_limits_concurrency(params, rng):
    # pool holds pages for only 2 concurrent slots (W=4, 8 pages)
    n = 9
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8)
    store = make_store(rng, n, MODEL.eof_token_id)
    AutonomousEngine(params, MODEL, cfg, attention_impl="jnp").run(store)
    assert len(store.finished) == n


def test_autonomous_int8(params, rng):
    n = 8
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=32, kv_dtype="int8")
    store = make_store(rng, n, MODEL.eof_token_id)
    AutonomousEngine(params, MODEL, cfg, attention_impl="jnp").run(store)
    assert len(store.finished) == n


def test_autonomous_rejects_tiny_pool(params):
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=2)
    with pytest.raises(AssertionError):
        AutonomousEngine(params, MODEL, cfg)


def test_autonomous_empty_store(params):
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=32)
    store = ItemStorage()
    AutonomousEngine(params, MODEL, cfg, attention_impl="jnp").run(store)
    assert len(store.finished) == 0


def test_autonomous_drain_downshift_parity(params, rng):
    """Drain downshift (compaction + smaller burst executables once the
    queue is empty) must not change any output token."""
    n = 24
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       max_prefill_batch=8)
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for min_drain in (8, 2):  # 8 = never downshifts, 2 = down to 2 slots
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(
            params, MODEL, cfg, attention_impl="jnp",
            min_drain_slots=min_drain, max_new_per_burst=4,
        ).run(s)
        stores[min_drain] = s
    assert len(stores[2].finished) == n
    for i in range(n):
        assert stores[2].finished[i].tokens == stores[8].finished[i].tokens, i


def test_autonomous_downshift_grouped_int8(params, rng):
    """Downshift with the grouped kernel + int8 pool (the bench config's
    path, incl. contiguous-page DMA at the smaller grid)."""
    n = 20
    cfg = EngineConfig(n_slots=16, page_size=16, n_pages=16 * 4,
                       kv_dtype="int8", n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    stores = {}
    for min_drain in (16, 8):
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(
            params, MODEL, cfg, attention_impl="grouped",
            min_drain_slots=min_drain, max_new_per_burst=8,
        ).run(s)
        stores[min_drain] = s
    assert len(stores[8].finished) == n
    for i in range(n):
        assert stores[8].finished[i].tokens == stores[16].finished[i].tokens, i


def test_autonomous_sampling_deterministic_per_seed(params, rng):
    """temperature>0 switches to stochastic decoding (autonomous-only
    extension): same seed -> identical outputs, different seed -> differs;
    liveness/cap rules unchanged."""
    n = 12
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)

    def run(seed):
        s = ItemStorage()
        for i in range(n):
            s.add_new_item(Request(i, list(base._new[i].tokens)))
        get_global_throughput_counter().reset()
        AutonomousEngine(
            params, MODEL, cfg, attention_impl="jnp",
            temperature=1.5, top_k=16, sample_seed=seed,
        ).run(s)
        return s

    a, b, c = run(7), run(7), run(8)
    assert len(a.finished) == n
    for i in range(n):
        ta = a.finished[i].tokens
        assert ta == b.finished[i].tokens, i  # same seed, bit-equal
        assert len(ta) <= MODEL.n_seq
        assert all(0 <= t < MODEL.n_vocab for t in ta)
    assert any(
        a.finished[i].tokens != c.finished[i].tokens for i in range(n)
    ), "different seeds produced identical streams"


def test_streaming_session_matches_oneshot(params, rng):
    """Online serving: requests submitted in waves while the engine runs
    produce token-identical outputs to the one-shot engine (greedy
    determinism — arrival time and slot assignment must not matter)."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 18
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    # oracle: one-shot run
    oneshot = ItemStorage()
    for i, p in enumerate(prompts):
        oneshot.add_new_item(Request(i, list(p)))
    AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(oneshot)

    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="grouped",
                           max_new_per_burst=4, bursts_per_chunk=2)
    sess = StreamingSession(eng, capacity=n, max_prompt_len=32)
    finished = {}
    # wave 1, run a bit, wave 2 mid-flight, wave 3, then drain
    sess.submit([Request(i, list(prompts[i])) for i in range(6)])
    sess.step()
    for r in sess.poll():
        finished[r.id] = r
    sess.submit([Request(i, list(prompts[i])) for i in range(6, 12)])
    sess.step()
    sess.step()
    for r in sess.poll():
        finished[r.id] = r
    sess.submit([Request(i, list(prompts[i])) for i in range(12, n)])
    for r in sess.close():
        finished[r.id] = r
    assert len(finished) == n
    for i in range(n):
        assert finished[i].tokens == oneshot.finished[i].tokens, i


def test_streaming_pipelined_observe_matches_oneshot(params, rng):
    """The pipelined serving path (dispatch + lag-delayed observe +
    snapshot polls) collects every request exactly once with tokens
    identical to the one-shot engine — including row recycling, where a
    stale snapshot must not surface a recycled row's NEW occupant as
    finished (the n_submitted_at bound)."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 22
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    oneshot = ItemStorage()
    for i, p in enumerate(prompts):
        oneshot.add_new_item(Request(i, list(p)))
    AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(oneshot)

    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="grouped",
                           max_new_per_burst=4)
    # capacity < n forces row recycling through the pipelined path
    sess = StreamingSession(eng, capacity=12, max_prompt_len=32,
                            observe_lag=2)
    finished = {}
    submitted = 0
    for _ in range(400):
        take = min(3, n - submitted, sess.free_capacity)
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
        assert finished[i].tokens == oneshot.finished[i].tokens, i


def test_streaming_fused_step_observe_matches_oneshot(params, rng):
    """step(observe=True) fuses the final_lens snapshot into the status
    RPC; polling from that snapshot must collect every request exactly
    once, token-identical to the one-shot engine — including row
    recycling (capacity < n)."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 20
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    oneshot = ItemStorage()
    for i, p in enumerate(prompts):
        oneshot.add_new_item(Request(i, list(p)))
    AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(oneshot)

    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="grouped",
                           max_new_per_burst=4, bursts_per_chunk=2)
    sess = StreamingSession(eng, capacity=9, max_prompt_len=32)
    finished = {}
    submitted = 0
    for _ in range(400):
        take = min(3, n - submitted, sess.free_capacity)
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
        assert finished[i].tokens == oneshot.finished[i].tokens, i


def test_streaming_session_int8_matches_oneshot(params, rng):
    """Streaming parity holds under quantized KV too: the per-page scale
    rule is position-based (row-0 absmax, no host coordination), so slot
    assignment and arrival timing cannot change the quantized stream."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 12
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       kv_dtype="int8", n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    oneshot = ItemStorage()
    for i, p in enumerate(prompts):
        oneshot.add_new_item(Request(i, list(p)))
    AutonomousEngine(params, MODEL, cfg, attention_impl="jnp").run(oneshot)

    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="jnp",
                           max_new_per_burst=4, bursts_per_chunk=2)
    sess = StreamingSession(eng, capacity=n, max_prompt_len=32)
    sess.submit([Request(i, list(prompts[i])) for i in range(5)])
    sess.step()
    sess.submit([Request(i, list(prompts[i])) for i in range(5, n)])
    finished = {r.id: r for r in sess.close()}
    assert len(finished) == n
    for i in range(n):
        assert finished[i].tokens == oneshot.finished[i].tokens, i


def test_streaming_session_sampling_same_pattern_same_seed(params, rng):
    """Sampling sessions are deterministic for a fixed (seed, submission
    pattern): the rng key advances per ROUND, so unlike greedy, sampled
    outputs may legitimately depend on arrival timing — the guarantee is
    reproducibility, not arrival-invariance."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 10
    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4,
                       n_forward_rounds=2)
    base = make_store(rng, n, MODEL.eof_token_id)
    prompts = [list(base._new[i].tokens) for i in range(n)]

    def run(seed):
        eng = AutonomousEngine(
            params, MODEL, cfg, attention_impl="jnp",
            temperature=1.5, top_k=16, sample_seed=seed,
            max_new_per_burst=4, bursts_per_chunk=2,
        )
        sess = StreamingSession(eng, capacity=n, max_prompt_len=32)
        sess.submit([Request(i, list(prompts[i])) for i in range(4)])
        sess.step()
        sess.submit([Request(i, list(prompts[i])) for i in range(4, n)])
        return {r.id: r.tokens for r in sess.close()}

    a, b, c = run(3), run(3), run(4)
    assert len(a) == n
    assert a == b, "same seed + same pattern must reproduce exactly"
    assert a != c, "different seeds produced identical streams"


def test_streaming_session_rejects_overlong_prompt(params):
    """submit() enforces the declared max_prompt_len, not the padded
    power-of-two buffer width (ADVICE r2: an n_seq-length prompt accepted
    via the rounded bucket would scatter its first decode token into the
    NEXT request's output row)."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    cfg = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4)
    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="jnp")
    sess = StreamingSession(eng, capacity=4, max_prompt_len=40)
    assert sess.s_pre == 64  # rounded up: the hole ADVICE flagged
    with pytest.raises(AssertionError, match="max_prompt_len"):
        sess.submit([Request(0, list(range(1, 42)))])
    sess.submit([Request(0, list(range(1, 41)))])  # exactly max: fine
    sess.close()


def test_streaming_session_capacity_recycling(params, rng):
    """capacity bounds IN-FLIGHT requests, not session lifetime: rows of
    collected requests are recycled (ring buffer), and the backpressure
    contract rejects submissions past free_capacity."""
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    n = 30
    cap = 8
    cfg = EngineConfig(n_slots=4, page_size=16, n_pages=16,
                       n_forward_rounds=4, max_prefill_batch=4)
    reqs = [Request(i, rng.integers(0, 255, int(rng.integers(1, 24))).tolist())
            for i in range(n)]

    # oracle: one-shot run of the same prompts
    store = ItemStorage()
    for r in reqs:
        store.add_new_item(Request(r.id, list(r.tokens)))
    AutonomousEngine(params, MODEL, cfg, attention_impl="grouped").run(store)

    eng = AutonomousEngine(params, MODEL, cfg, attention_impl="grouped",
                           bursts_per_chunk=2)
    sess = StreamingSession(eng, capacity=cap, max_prompt_len=32)
    submitted = 0
    done = {}
    guard = 0
    while len(done) < n:
        k = min(sess.free_capacity, n - submitted)
        if k:
            sess.submit([Request(r.id, list(r.tokens))
                         for r in reqs[submitted : submitted + k]])
            submitted += k
        sess.step()
        for r in sess.poll():
            done[r.id] = r.tokens
        guard += 1
        assert guard < 500, "recycling session made no progress"
    assert sess.n_submitted == n > cap  # rows actually recycled
    for i in range(n):
        assert done[i] == store.finished[i].tokens, f"request {i} diverged"


def test_streaming_session_stall_detection_raises(params):
    """The two-consecutive-no-progress stall detector must fire (not spin
    forever) when the page pool can never admit pending work. Legal
    configs cannot reach this state (validate() sizes the pool for at
    least one grant), so the test corrupts the device state directly:
    free list emptied, every slot dead and unallocated, queue pending."""
    import jax.numpy as jnp

    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    cfg = EngineConfig(n_slots=4, page_size=16, n_pages=16,
                       n_forward_rounds=2, max_prefill_batch=4)
    eng = AutonomousEngine(params, MODEL, cfg)
    sess = StreamingSession(eng, capacity=4, max_prompt_len=16)
    sess.submit([Request(0, [1, 2, 3])])
    # simulate a wedged pool: nothing free, nothing freeable
    sess.st = sess.st._replace(free_top=jnp.zeros((), jnp.int32))
    with pytest.raises(RuntimeError, match="stalled"):
        sess.close()


def test_streaming_session_backpressure_raises(params):
    from min_llm_inference_tpu.runtime.autonomous import StreamingSession

    cfg = EngineConfig(n_slots=4, page_size=16, n_pages=16,
                       n_forward_rounds=4, max_prefill_batch=4)
    eng = AutonomousEngine(params, MODEL, cfg)
    sess = StreamingSession(eng, capacity=4, max_prompt_len=16)
    sess.submit([Request(i, [1, 2, 3]) for i in range(4)])
    assert sess.free_capacity == 0
    with pytest.raises(AssertionError, match="backpressure"):
        sess.submit([Request(9, [1])])

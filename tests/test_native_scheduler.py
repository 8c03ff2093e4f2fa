"""Differential tests: native C++ scheduler vs the Python scheduler, plus
the NativePagedEngine end-to-end vs PagedEngine (token-exact)."""

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
from min_llm_inference_tpu.constants import EMPTY_ROW_TOKEN_ID, EOF_TOKEN_ID
from min_llm_inference_tpu.runtime.engine import NativePagedEngine
from min_llm_inference_tpu.runtime.item_storage import ProcessingStorage
from min_llm_inference_tpu.runtime.native import NativeScheduler, native_available
from min_llm_inference_tpu.runtime.paged_scheduler import (
    PagePool,
    PageTable,
    allocate_or_free_pages,
    insert_new_items_paged,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native scheduler lib unavailable"
)


def test_native_vs_python_differential(rng):
    B, S, P, NP, INIT, R = 12, 64, 8, 40, 2, 4
    W = -(-S // P)
    eof = 1023
    lookahead = 2 * R
    n_requests = 40
    plens = [int(rng.integers(1, 40)) for _ in range(n_requests)]

    store = ItemStorage()
    processing = ProcessingStorage()
    pool = PagePool(NP)
    table_py = PageTable(B, W)
    prompts_py = np.zeros((B, S), np.int32)
    lengths_py = np.zeros(B, np.int32)
    last_py = np.zeros(B, np.int32)

    sched = NativeScheduler(B, S, NP, W, P, INIT, R, eof, lookahead=lookahead)
    table_nt = np.zeros((B, W), np.int32)
    prompts_nt = np.zeros((B, S), np.int32)
    lengths_nt = np.zeros(B, np.int32)
    last_nt = np.zeros(B, np.int32)

    for i in range(n_requests):
        toks = rng.integers(0, eof, plens[i]).tolist()
        store.add_new_item(Request(i, list(toks)))
        sched.add_request(i, toks)

    def py_insert():
        return insert_new_items_paged(
            prompts_py, lengths_py, last_py, store, processing, pool,
            table_py, R, P, INIT, lookahead,
        )

    new_py = py_insert()
    new_nt = sched.insert_new(prompts_nt, lengths_nt, last_nt, table_nt)
    assert new_py == new_nt
    np.testing.assert_array_equal(lengths_py, lengths_nt)
    skip_py = set(new_py)

    # simulate bursts: each live slot emits R random tokens (EOF-biased),
    # newly admitted slots emit EMPTY (pipelined: one-burst lag)
    for step in range(60):
        results = np.full((B, R), EMPTY_ROW_TOKEN_ID, np.int32)
        for slot in range(B):
            if processing.contains(slot) and slot not in skip_py:
                ln = lengths_py[slot]
                for j in range(R):
                    if ln == 0:
                        break
                    tok = int(rng.integers(0, eof + 1))
                    if rng.random() < 0.15:
                        tok = eof
                    results[slot, j] = tok
                    ln = 0 if (tok == eof or ln + 1 >= S) else ln + 1

        # python walk (pipelined variant lives in PagedEngine._process_results;
        # emulate with the same rules)
        from min_llm_inference_tpu.metrics import get_global_throughput_counter
        fin_py = []
        for slot in range(B):
            if slot in skip_py or not processing.contains(slot):
                continue
            req = processing.get(slot)
            finished = empty = False
            for j in range(R):
                tok = int(results[slot, j])
                if tok == EMPTY_ROW_TOKEN_ID:
                    empty = True
                else:
                    req.tokens.append(tok)
                    if len(req.tokens) >= S or tok == eof:
                        finished = True
                if finished or empty:
                    break
            if finished or empty:
                fin_py.append(slot)
            if finished:
                processing.move_to_finished(slot, store)
        for slot in list(processing.slots()):
            req = processing.get(slot)
            lengths_py[slot] = len(req.tokens)
            last_py[slot] = req.tokens[-1]
        for slot in fin_py:
            if not processing.contains(slot):
                lengths_py[slot] = 0

        fin_nt = sched.process_results(results, lengths_nt, last_nt)
        assert fin_py == fin_nt.tolist(), f"step {step}"
        np.testing.assert_array_equal(lengths_py, lengths_nt)

        pre_py = allocate_or_free_pages(
            table_py, pool, processing, store, fin_py, R, P, lookahead
        )
        for s_ in pre_py:
            lengths_py[s_] = 0
        pre_nt = sched.alloc_or_free(np.asarray(fin_py, np.int32), table_nt, lengths_nt)
        assert pre_py == pre_nt, f"step {step}"
        assert pool.free_count() == sched.free_page_count(), f"step {step}"

        new_py = py_insert()
        new_nt = sched.insert_new(prompts_nt, lengths_nt, last_nt, table_nt)
        assert new_py == new_nt, f"step {step}"
        np.testing.assert_array_equal(lengths_py, lengths_nt)
        np.testing.assert_array_equal(table_py.table, table_nt)
        skip_py = set(new_py)

        from min_llm_inference_tpu.runtime.item_storage import is_done
        assert is_done(store, processing) == sched.is_done()
        if sched.is_done():
            break
    assert sched.is_done(), "differential sim did not drain"
    assert len(store.finished) == sched._lib.mls_finished_count(sched._h)


MODEL = ModelConfig(n_vocab=256, emb_dim=32, n_seq=64, eof_token_id=255)
ENGINE = EngineConfig(n_slots=8, page_size=16, n_pages=8 * 4, max_prefill_batch=4)


def test_native_engine_matches_python_engine(rng):
    params = init_params(jax.random.PRNGKey(0), MODEL, eof_bias=0.05)
    n = 20
    store_a = ItemStorage()
    store_b = ItemStorage()
    for i in range(n):
        toks = rng.integers(0, 255, int(rng.integers(1, 20))).tolist()
        store_a.add_new_item(Request(i, list(toks)))
        store_b.add_new_item(Request(i, list(toks)))
    get_global_throughput_counter().reset()
    PagedEngine(params, MODEL, ENGINE).run(store_a)
    get_global_throughput_counter().reset()
    NativePagedEngine(params, MODEL, ENGINE).run(store_b)
    assert len(store_b.finished) == n
    for i in range(n):
        assert store_a.finished[i].tokens == store_b.finished[i].tokens, i
    c = get_global_throughput_counter()
    assert c.total_tokens == sum(
        len(r.tokens) - r.prompt_len for r in store_b.finished.values()
    )

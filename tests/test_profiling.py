"""Tracing/profiling subsystem tests (reference: NVTX phase ranges around
the engine loop, src/inferencer.cpp:55-82 + `make profile`)."""

import numpy as np

import jax

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    PagedEngine,
    Request,
    init_params,
)
from min_llm_inference_tpu.utils.profiling import (
    get_global_phase_stats,
    phase,
    trace,
)


def test_phase_accumulates():
    stats = get_global_phase_stats()
    stats.reset()
    with phase("unit_phase"):
        pass
    with phase("unit_phase"):
        pass
    s = stats.summary()
    assert s["unit_phase"]["calls"] == 2
    assert s["unit_phase"]["seconds"] >= 0
    assert 0 < s["unit_phase"]["share"] <= 1


def test_trace_none_is_noop():
    with trace(None):
        x = jax.numpy.ones(4) + 1
    assert float(x.sum()) == 8.0


def test_engine_run_records_all_phases(rng):
    model = ModelConfig(n_vocab=64, emb_dim=16, n_seq=16, eof_token_id=63)
    engine_cfg = EngineConfig(
        n_slots=4, page_size=8, n_pages=16, max_prefill_batch=4
    )
    params = init_params(jax.random.PRNGKey(0), model, eof_bias=0.3)
    store = ItemStorage()
    for i in range(6):
        store.add_new_item(
            Request(i, rng.integers(0, 62, int(rng.integers(1, 6))).tolist())
        )
    stats = get_global_phase_stats()
    stats.reset()
    PagedEngine(params, model, engine_cfg).run(store)
    s = stats.summary()
    for name in ("forward", "process_results", "schedule", "prefill"):
        assert name in s and s[name]["calls"] > 0, f"missing phase {name}"


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.numpy.ones(8).sum().block_until_ready()
    import os

    found = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(logdir)
        for f in fs
    ]
    assert found, "profiler produced no trace files"

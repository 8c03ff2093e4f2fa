"""Multi-chip sharding tests on a virtual 8-device CPU mesh (SURVEY.md §4:
same test body under jax.sharding meshes standing in for a slice).

Parity oracle: the unsharded paged backend with an equivalent global page
layout — dp groups own disjoint page-id ranges, tp shards heads, so sharded
and unsharded must agree on every round's tokens, over the full
kv_dtype x attention matrix (the sharded local step IS the single-chip
step, models/paged.py, run under shard_map with a TpShardCtx)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu.config import EngineConfig, ModelConfig
from min_llm_inference_tpu.models.paged import (
    init_paged_state,
    make_paged_fns,
)
from min_llm_inference_tpu.models.params import fuse_qkv_params, init_params
from min_llm_inference_tpu.parallel.sharded import (
    init_sharded_state,
    make_mesh,
    make_sharded_fns,
    shard_params,
)

MODEL = ModelConfig(
    n_vocab=128, emb_dim=64, n_seq=32, n_layers=2, n_heads=4,
    ffn_dim=128, use_output_proj=True, use_layernorm=True,
    eof_token_id=127,
)
ENGINE = EngineConfig(
    n_slots=8, n_forward_rounds=3, page_size=8, n_pages=32,
    init_num_pages=2, max_prefill_batch=8,
)


def build_inputs(rng, dp):
    """Global scheduler arrays where each dp group's slots use page ids
    local to that group's pool shard (the sharded engine's invariant);
    the unsharded oracle gets the same table with global ids."""
    B, W = ENGINE.n_slots, ENGINE.pages_per_slot(MODEL.n_seq)
    NP_loc = ENGINE.n_pages // dp
    B_loc = B // dp
    local_table = np.zeros((B, W), np.int32)
    global_table = np.zeros((B, W), np.int32)
    for g in range(dp):
        pages = rng.permutation(NP_loc)[: B_loc * W].reshape(B_loc, W)
        local_table[g * B_loc : (g + 1) * B_loc] = pages
        global_table[g * B_loc : (g + 1) * B_loc] = pages + g * NP_loc
    lengths = rng.integers(0, MODEL.n_seq - ENGINE.n_forward_rounds, B).astype(np.int32)
    lengths[0] = 0
    prompts = rng.integers(0, MODEL.eof_token_id, (B, MODEL.n_seq)).astype(np.int32)
    last = rng.integers(0, MODEL.eof_token_id, B).astype(np.int32)
    return prompts, lengths, last, local_table, global_table


def run_unsharded(params, engine_cfg, attention, prompts, lengths, last,
                  global_table):
    u_prefill, u_decode = make_paged_fns(MODEL, engine_cfg, attention)
    u_state = init_paged_state(MODEL, engine_cfg)
    u_state = u_prefill(params, u_state, prompts, lengths, global_table)
    W = global_table.shape[1]
    packed = np.full((engine_cfg.n_slots, 2 + W), -1, dtype=np.int32)
    packed[:, 2:] = global_table
    return u_decode(
        params, u_state, jnp.asarray(packed), jnp.asarray(lengths),
        jnp.asarray(last),
    )


def run_sharded(params, engine_cfg, attention, mesh, tp, prompts, lengths,
                last, local_table):
    s_params = shard_params(fuse_qkv_params(params, tp), mesh)
    s_prefill, s_decode = make_sharded_fns(MODEL, engine_cfg, mesh, attention)
    s_state = init_sharded_state(MODEL, engine_cfg, mesh)
    s_state = s_prefill(
        s_params, s_state,
        jnp.asarray(prompts), jnp.asarray(lengths), jnp.asarray(local_table),
    )
    W = local_table.shape[1]
    packed = np.full((engine_cfg.n_slots, 2 + W), -1, dtype=np.int32)
    packed[:, 2:] = local_table
    return s_decode(
        s_params, s_state, jnp.asarray(packed), jnp.asarray(lengths),
        jnp.asarray(last),
    )


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2), (8, 1), (1, 4)])
def test_sharded_matches_unsharded(dp, tp):
    rng = np.random.default_rng(dp * 10 + tp)
    n_dev = dp * tp
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev, tp)
    params = init_params(jax.random.PRNGKey(3), MODEL)
    prompts, lengths, last, local_table, global_table = build_inputs(rng, dp)

    u_state, u_len, u_last, u_toks = run_unsharded(
        fuse_qkv_params(params), ENGINE, "jnp",
        prompts, lengths, last, global_table,
    )
    s_state, s_len, s_last, s_toks = run_sharded(
        params, ENGINE, "jnp", mesh, tp, prompts, lengths, last, local_table
    )
    np.testing.assert_array_equal(np.asarray(u_toks), np.asarray(s_toks))
    np.testing.assert_array_equal(np.asarray(u_len), np.asarray(s_len))
    np.testing.assert_array_equal(np.asarray(u_last), np.asarray(s_last))


@pytest.mark.parametrize("kv_dtype,attention", [
    ("float32", "jnp"), ("float32", "pallas"), ("float32", "grouped"),
    ("int8", "jnp"), ("int8", "pallas"), ("int8", "grouped"),
    # packed int4 KV: per-head nibble halves pack rank-locally under tp
    ("int4", "jnp"), ("int4", "grouped"),
])
def test_sharded_matrix_kv_dtype_x_attention(kv_dtype, attention):
    """The full feature matrix on the mesh: int8 per-page scales (pmax'd
    over tp to the full-row absmax) and the fused Pallas kernels inside
    shard_map must all reproduce the unsharded token stream."""
    dp, tp = 2, 2
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(17)
    mesh = make_mesh(4, tp)
    engine_cfg = dataclasses.replace(ENGINE, kv_dtype=kv_dtype)
    params = init_params(jax.random.PRNGKey(3), MODEL)
    prompts, lengths, last, local_table, global_table = build_inputs(rng, dp)

    _, u_len, u_last, u_toks = run_unsharded(
        fuse_qkv_params(params), engine_cfg, "jnp",
        prompts, lengths, last, global_table,
    )
    _, s_len, s_last, s_toks = run_sharded(
        params, engine_cfg, attention, mesh, tp,
        prompts, lengths, last, local_table,
    )
    np.testing.assert_array_equal(np.asarray(u_toks), np.asarray(s_toks))
    np.testing.assert_array_equal(np.asarray(u_len), np.asarray(s_len))


def test_sharded_kv_pages_match_unsharded():
    """After prefill, the sharded pool shards concatenate to the oracle's
    global pool contents (feature-sharded over tp)."""
    dp, tp = 2, 2
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(0)
    mesh = make_mesh(4, tp)
    params = init_params(jax.random.PRNGKey(5), MODEL)
    prompts, lengths, last, local_table, global_table = build_inputs(rng, dp)

    u_prefill, _ = make_paged_fns(MODEL, ENGINE, "jnp")
    u_state = u_prefill(
        fuse_qkv_params(params), init_paged_state(MODEL, ENGINE),
        prompts, lengths, global_table,
    )

    s_params = shard_params(fuse_qkv_params(params, tp), mesh)
    s_prefill, _ = make_sharded_fns(MODEL, ENGINE, mesh)
    s_state = init_sharded_state(MODEL, ENGINE, mesh)
    s_state = s_prefill(
        s_params, s_state,
        jnp.asarray(prompts), jnp.asarray(lengths), jnp.asarray(local_table),
    )
    for li in range(MODEL.n_layers):
        got = np.asarray(s_state.kv_pages[li])
        want = np.asarray(u_state.kv_pages[li])
        # compare only token positions actually written (valid positions)
        B, W = global_table.shape
        P = ENGINE.page_size
        for b in range(B):
            for pos in range(int(lengths[b])):
                gp = global_table[b, pos // P]
                np.testing.assert_allclose(
                    got[gp, :, pos % P], want[gp, :, pos % P],
                    rtol=2e-5, atol=2e-5,
                )


@pytest.mark.parametrize("kv_dtype,attention", [
    ("float32", "jnp"), ("int8", "pallas"),
])
def test_sharded_engine_end_to_end_matches_single_chip(rng, kv_dtype, attention):
    """Full continuous-batching run over the dp x tp mesh: finished
    sequences must be token-identical to the single-chip PagedEngine."""
    from min_llm_inference_tpu import (
        ItemStorage, PagedEngine, Request, get_global_throughput_counter,
    )
    from min_llm_inference_tpu.parallel.engine import ShardedPagedEngine

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    engine_cfg = dataclasses.replace(ENGINE, kv_dtype=kv_dtype)
    n = 24
    store_a = ItemStorage()
    store_b = ItemStorage()
    for i in range(n):
        toks = rng.integers(0, MODEL.eof_token_id, int(rng.integers(1, 20))).tolist()
        store_a.add_new_item(Request(i, list(toks)))
        store_b.add_new_item(Request(i, list(toks)))

    params = init_params(jax.random.PRNGKey(7), MODEL)
    get_global_throughput_counter().reset()
    PagedEngine(params, MODEL, engine_cfg, attention_impl=attention).run(store_a)
    get_global_throughput_counter().reset()
    eng = ShardedPagedEngine(
        params, MODEL, engine_cfg, n_devices=8, tp=4, attention_impl=attention
    )
    eng.run(store_b)
    assert len(store_b.finished) == n
    for i in range(n):
        assert store_a.finished[i].tokens == store_b.finished[i].tokens, i
    c = get_global_throughput_counter()
    assert c.total_tokens > 0


def test_sharded_native_engine_matches_python_sharded(rng):
    """dp NATIVE scheduler instances (one per group, local slot/page space)
    must produce token-identical outputs to the Python-scheduled sharded
    engine — the mesh analogue of tests/test_native_scheduler.py's
    differential contract (VERDICT r2 weak #6)."""
    from min_llm_inference_tpu import ItemStorage, Request
    from min_llm_inference_tpu.parallel.engine import (
        ShardedNativePagedEngine,
        ShardedPagedEngine,
    )
    from min_llm_inference_tpu.runtime.native import native_available

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    if not native_available():
        pytest.skip("native scheduler unavailable")
    engine_cfg = dataclasses.replace(ENGINE, kv_dtype="int8")
    n = 24
    store_a = ItemStorage()
    store_b = ItemStorage()
    for i in range(n):
        toks = rng.integers(0, MODEL.eof_token_id,
                            int(rng.integers(1, 20))).tolist()
        store_a.add_new_item(Request(i, list(toks)))
        store_b.add_new_item(Request(i, list(toks)))
    params = init_params(jax.random.PRNGKey(7), MODEL)
    ShardedPagedEngine(
        params, MODEL, engine_cfg, n_devices=8, tp=2, attention_impl="jnp"
    ).run(store_a)
    ShardedNativePagedEngine(
        params, MODEL, engine_cfg, n_devices=8, tp=2, attention_impl="jnp"
    ).run(store_b)
    assert len(store_b.finished) == n
    for i in range(n):
        assert store_a.finished[i].tokens == store_b.finished[i].tokens, i

"""Multi-chip sharding tests on a virtual 8-device CPU mesh (SURVEY.md §4:
same test body under jax.sharding meshes standing in for a slice).

Parity oracle: the unsharded paged jnp backend with an equivalent global
page layout — dp groups own disjoint page-id ranges, tp shards heads, so
sharded and unsharded must agree to fp tolerance on every round's tokens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu.config import EngineConfig, ModelConfig
from min_llm_inference_tpu.models.paged import (
    PagedKVState,
    init_paged_state,
    make_paged_fns,
)
from min_llm_inference_tpu.models.params import init_params
from min_llm_inference_tpu.parallel.sharded import (
    SLOT_SPEC,
    TABLE_SPEC,
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


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2), (8, 1), (1, 4)])
def test_sharded_matches_unsharded(dp, tp):
    rng = np.random.default_rng(dp * 10 + tp)
    n_dev = dp * tp
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev, tp)
    params = init_params(jax.random.PRNGKey(3), MODEL)
    prompts, lengths, last, local_table, global_table = build_inputs(rng, dp)

    # --- unsharded oracle (paged jnp backend, global page ids) ---
    u_prefill, u_decode = make_paged_fns(MODEL, ENGINE, "jnp")
    u_state = init_paged_state(MODEL, ENGINE)
    u_state = u_prefill(params, u_state, prompts, lengths, global_table)
    W = global_table.shape[1]
    packed = np.full((ENGINE.n_slots, 2 + W), -1, dtype=np.int32)
    packed[:, 2:] = global_table
    u_state, u_len, u_last, u_toks = u_decode(
        params, u_state, jnp.asarray(packed), jnp.asarray(lengths),
        jnp.asarray(last),
    )

    # --- sharded path ---
    s_params = shard_params(params, mesh)
    s_prefill, s_decode = make_sharded_fns(MODEL, ENGINE, mesh)
    s_state = init_sharded_state(MODEL, ENGINE, mesh)
    kps, vps = s_prefill(
        s_params, s_state.k_pages, s_state.v_pages,
        jnp.asarray(prompts), jnp.asarray(lengths), jnp.asarray(local_table),
    )
    kps, vps, s_len, s_last, s_toks = s_decode(
        s_params, kps, vps, jnp.asarray(local_table), jnp.asarray(lengths),
        jnp.asarray(last),
    )

    np.testing.assert_array_equal(np.asarray(u_toks), np.asarray(s_toks))
    np.testing.assert_array_equal(np.asarray(u_len), np.asarray(s_len))
    np.testing.assert_array_equal(np.asarray(u_last), np.asarray(s_last))


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
        params, init_paged_state(MODEL, ENGINE), prompts, lengths, global_table
    )

    s_params = shard_params(params, mesh)
    s_prefill, _ = make_sharded_fns(MODEL, ENGINE, mesh)
    s_state = init_sharded_state(MODEL, ENGINE, mesh)
    kps, vps = s_prefill(
        s_params, s_state.k_pages, s_state.v_pages,
        jnp.asarray(prompts), jnp.asarray(lengths), jnp.asarray(local_table),
    )
    for li in range(MODEL.n_layers):
        got = np.asarray(kps[li])
        want = np.asarray(u_state.k_pages[li])
        # compare only token positions actually written (valid positions)
        B, W = global_table.shape
        P = ENGINE.page_size
        for b in range(B):
            for pos in range(int(lengths[b])):
                gp = global_table[b, pos // P]
                np.testing.assert_allclose(
                    got[gp, pos % P], want[gp, pos % P], rtol=2e-5, atol=2e-5
                )


def test_sharded_engine_end_to_end_matches_single_chip(rng):
    """Full continuous-batching run over the dp x tp mesh: finished
    sequences must be token-identical to the single-chip PagedEngine."""
    from min_llm_inference_tpu import (
        ItemStorage, PagedEngine, Request, get_global_throughput_counter,
    )
    from min_llm_inference_tpu.parallel.engine import ShardedPagedEngine

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    n = 24
    store_a = ItemStorage()
    store_b = ItemStorage()
    for i in range(n):
        toks = rng.integers(0, MODEL.eof_token_id, int(rng.integers(1, 20))).tolist()
        store_a.add_new_item(Request(i, list(toks)))
        store_b.add_new_item(Request(i, list(toks)))

    params = init_params(jax.random.PRNGKey(7), MODEL)
    get_global_throughput_counter().reset()
    PagedEngine(params, MODEL, ENGINE).run(store_a)
    get_global_throughput_counter().reset()
    eng = ShardedPagedEngine(params, MODEL, ENGINE, n_devices=8, tp=4)
    eng.run(store_b)
    assert len(store_b.finished) == n
    for i in range(n):
        assert store_a.finished[i].tokens == store_b.finished[i].tokens, i
    c = get_global_throughput_counter()
    assert c.total_tokens > 0

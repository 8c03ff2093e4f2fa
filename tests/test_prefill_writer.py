"""Page-granular prefill writer parity vs the legacy row scatter.

The paged write (s_pre % page_size == 0) scatters whole [P, D] page windows
instead of per-row indices; rows past prompt_length inside a covered page
carry garbage by design. These tests pin the contract: valid rows and page
scales are bit-identical to the row-scatter path, uncovered pages are
untouched, and padding (length-0) rows write nothing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu import EngineConfig, ModelConfig, init_params
from min_llm_inference_tpu.models.model import prefill_write_kv
from min_llm_inference_tpu.models.paged import (
    init_paged_state,
    make_prefill_kv_writer,
)

P = 8
NP = 64
D = 32
M = 6
W = 4  # pages per slot for n_seq = 32


def _run_prefill(kv_dtype, s_pre, rng):
    model = ModelConfig(
        n_vocab=50, emb_dim=D, n_seq=W * P, eof_token_id=49, dtype="float32"
    )
    cfg = EngineConfig(
        n_slots=M, page_size=P, n_pages=NP, kv_dtype=kv_dtype,
        max_prefill_batch=M,
    )
    params = init_params(jax.random.PRNGKey(0), model)
    prompts = jnp.asarray(rng.integers(0, 49, (M, s_pre)), jnp.int32)
    # mix: full-width, mid-page, one-token, padding (0)
    plens = np.array([s_pre, s_pre - 3, P + 1, 1, 5, 0][:M], np.int32)
    plens = np.minimum(plens, s_pre)
    granted = jnp.asarray(
        rng.permutation(NP)[: M * W].reshape(M, W).astype(np.int32)
    )
    state = init_paged_state(model, cfg)

    write, fin = make_prefill_kv_writer(
        state, granted, jnp.asarray(plens), s_pre, P, NP
    )
    prefill_write_kv(params, model, prompts, jnp.asarray(plens), write)
    return fin(), np.asarray(granted), plens


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_paged_write_matches_row_scatter(kv_dtype):
    rng = np.random.default_rng(7)
    st_fast, granted, plens = _run_prefill(kv_dtype, 2 * P, rng)
    rng = np.random.default_rng(7)
    # legacy path: widen the block by one column (17 % 8 != 0) with the
    # same prompts zero-padded -> identical semantics, row-granular scatter
    model = ModelConfig(
        n_vocab=50, emb_dim=D, n_seq=W * P, eof_token_id=49, dtype="float32"
    )
    cfg = EngineConfig(
        n_slots=M, page_size=P, n_pages=NP, kv_dtype=kv_dtype,
        max_prefill_batch=M,
    )
    params = init_params(jax.random.PRNGKey(0), model)
    s_pre = 2 * P
    prompts = jnp.asarray(rng.integers(0, 49, (M, s_pre)), jnp.int32)
    plens = np.array([s_pre, s_pre - 3, P + 1, 1, 5, 0][:M], np.int32)
    granted2 = jnp.asarray(
        rng.permutation(NP)[: M * W].reshape(M, W).astype(np.int32)
    )
    assert np.array_equal(granted, np.asarray(granted2))
    prompts_wide = jnp.pad(prompts, ((0, 0), (0, 1)))
    state = init_paged_state(model, cfg)
    write, fin = make_prefill_kv_writer(
        state, granted2, jnp.asarray(plens), s_pre + 1, P, NP
    )
    prefill_write_kv(params, model, prompts_wide, jnp.asarray(plens), write)
    st_row = fin()

    fast_pool = np.asarray(st_fast.kv_pages[0])
    row_pool = np.asarray(st_row.kv_pages[0])

    # 1. page scales identical
    if kv_dtype == "int8":
        np.testing.assert_array_equal(
            np.asarray(st_fast.k_scales[0]), np.asarray(st_row.k_scales[0])
        )
        np.testing.assert_array_equal(
            np.asarray(st_fast.v_scales[0]), np.asarray(st_row.v_scales[0])
        )

    # 2. valid rows identical; uncovered pages untouched (zero)
    covered = np.zeros(NP, bool)
    for m in range(M):
        for w in range(W):
            pid = granted[m, w]
            lo, hi = w * P, min((w + 1) * P, int(plens[m]))
            if lo < plens[m]:
                covered[pid] = True
                nvalid = hi - lo
                np.testing.assert_array_equal(
                    fast_pool[pid, :, :nvalid], row_pool[pid, :, :nvalid]
                )
    assert np.all(fast_pool[~covered] == 0)


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_paged_write_padding_rows_inert(kv_dtype):
    rng = np.random.default_rng(3)
    st, granted, plens = _run_prefill(kv_dtype, 2 * P, rng)
    pool = np.asarray(st.kv_pages[0])
    # slot 5 has plen 0: none of its pages may be written
    for w in range(W):
        assert np.all(pool[granted[5, w]] == 0)

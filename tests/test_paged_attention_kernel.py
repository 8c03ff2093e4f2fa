"""Tier-2 equivalence tests: fused Pallas paged-attention decode kernels
(one-slot grid and grouped grid) vs the jnp oracle (gather + masked
attention), on randomized shapes with fragmented page assignments and
zero-length rows — the analogue of the reference's paged-vs-contiguous
kernel tests (tests/paged_attention_kernels_test.cpp) run through the
shuffled-block fixture (test_utils.cpp:695-773). Runs in Pallas
interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu.models.paged import (
    combine_kv_pools,
    gather_kv_context,
)
from min_llm_inference_tpu.ops.paged_attention import paged_decode_attention
from min_llm_inference_tpu.ops.paged_attention_grouped import (
    paged_decode_attention_grouped,
)
from min_llm_inference_tpu.ops.reference import masked_attention


def build_paged_state(rng, B, W, P, D, n_pages, max_len):
    """Random fragmented paged KV state: page ids shuffled across the pool
    (simulating fragmentation), lengths in [0, max_len]."""
    assert n_pages >= B * W
    k_pages = rng.standard_normal((n_pages, P, D)).astype(np.float32)
    v_pages = rng.standard_normal((n_pages, P, D)).astype(np.float32)
    kv = np.asarray(combine_kv_pools(jnp.asarray(k_pages), jnp.asarray(v_pages)))
    perm = rng.permutation(n_pages)[: B * W]
    page_table = perm.reshape(B, W).astype(np.int32)
    lengths = rng.integers(0, max_len + 1, B).astype(np.int32)
    lengths[0] = 0          # dead slot
    lengths[-1] = max_len   # full slot
    q = rng.standard_normal((B, D)).astype(np.float32)
    return q, kv, lengths, page_table


def oracle(q, kv, lengths, table, P, H):
    kctx, vctx = gather_kv_context(jnp.asarray(kv), jnp.asarray(table), P)
    return np.asarray(
        masked_attention(jnp.asarray(q), kctx, vctx, jnp.asarray(lengths), H)
    )


@pytest.mark.parametrize(
    "B,W,P,D,H",
    [
        (4, 2, 8, 128, 1),
        (5, 4, 16, 128, 1),   # odd batch
        (4, 4, 16, 256, 2),   # multi-head
        (3, 8, 16, 128, 4),   # more pages than ppcb -> multi-block loop
    ],
)
def test_pallas_kernel_matches_jnp_oracle(B, W, P, D, H):
    rng = np.random.default_rng(B * 1000 + W)
    q, kv, lengths, table = build_paged_state(
        rng, B, W, P, D, n_pages=B * W + 3, max_len=W * P
    )
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(lengths), jnp.asarray(table),
            n_heads=H, interpret=True,
        )
    )
    want = oracle(q, kv, lengths, table, P, H)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[lengths == 0] == 0.0)


def test_pallas_kernel_partial_page_lengths():
    """Lengths that end mid-page and mid-block must mask exactly."""
    rng = np.random.default_rng(7)
    B, W, P, D = 6, 4, 8, 128
    q, kv, _, table = build_paged_state(rng, B, W, P, D, B * W, W * P)
    lengths = np.array([1, 7, 8, 9, 17, 32], dtype=np.int32)
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(lengths), jnp.asarray(table), interpret=True,
        )
    )
    want = oracle(q, kv, lengths, table, P, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_kernel_all_dead_slots():
    rng = np.random.default_rng(9)
    B, W, P, D = 4, 2, 8, 128
    q, kv, _, table = build_paged_state(rng, B, W, P, D, B * W, W * P)
    lengths = np.zeros(B, dtype=np.int32)
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(lengths), jnp.asarray(table), interpret=True,
        )
    )
    assert np.all(got == 0.0)


# ---- grouped kernel (batched-VPU grid) -----------------------------------


@pytest.mark.parametrize(
    "B,W,P,D,H,G",
    [
        (8, 2, 8, 128, 1, 8),     # one group
        (16, 4, 8, 128, 1, 8),    # two groups, multi-block
        (8, 4, 16, 256, 2, 4),    # multi-head, G*H = 8
        (16, 8, 8, 128, 4, 2),    # many pages, G*H = 8
    ],
)
def test_grouped_kernel_matches_jnp_oracle(B, W, P, D, H, G):
    rng = np.random.default_rng(B * 100 + W * 10 + G)
    q, kv, lengths, table = build_paged_state(
        rng, B, W, P, D, n_pages=B * W + 5, max_len=W * P
    )
    got = np.asarray(
        paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(lengths), jnp.asarray(table),
            n_heads=H, group_size=G, interpret=True,
        )
    )
    want = oracle(q, kv, lengths, table, P, H)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[lengths == 0] == 0.0)


def test_grouped_kernel_dead_group_and_partial_lengths():
    """A fully-dead group must be skipped (exact zeros) while later groups
    still compute; mid-page lengths mask exactly."""
    rng = np.random.default_rng(21)
    B, W, P, D, G = 16, 4, 8, 128, 8
    q, kv, _, table = build_paged_state(rng, B, W, P, D, B * W, W * P)
    lengths = np.zeros(B, dtype=np.int32)
    lengths[8:] = [1, 7, 8, 9, 17, 31, 32, 2]  # group 0 all dead
    got = np.asarray(
        paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(lengths), jnp.asarray(table),
            group_size=G, interpret=True,
        )
    )
    want = oracle(q, kv, lengths, table, P, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[:8] == 0.0)


def test_grouped_matches_ungrouped_int8():
    """Grouped and one-slot kernels agree bit-for-bit-ish on int8 pages."""
    rng = np.random.default_rng(33)
    B, W, P, D, G = 8, 4, 8, 128, 8
    NP = B * W + 2
    kq = rng.integers(-127, 128, (NP, 2, P, D)).astype(np.int8)
    ks = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
    vs = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
    table = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    lengths = np.array([0, 1, 5, 8, 9, 16, 31, 32], dtype=np.int32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    one = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kq), jnp.asarray(lengths),
            jnp.asarray(table), jnp.asarray(ks), jnp.asarray(vs),
            interpret=True,
        )
    )
    grp = np.asarray(
        paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(kq), jnp.asarray(lengths),
            jnp.asarray(table), jnp.asarray(ks), jnp.asarray(vs),
            group_size=G, interpret=True,
        )
    )
    np.testing.assert_allclose(grp, one, rtol=2e-5, atol=2e-5)

"""Tier-2 equivalence tests: fused Pallas paged-attention decode kernel vs
the jnp oracle (gather + masked attention), on randomized shapes with
fragmented page assignments and zero-length rows — the analogue of the
reference's paged-vs-contiguous kernel tests
(tests/paged_attention_kernels_test.cpp) run through the shuffled-block
fixture (test_utils.cpp:695-773). Runs in Pallas interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu.models.paged import gather_context
from min_llm_inference_tpu.ops.paged_attention import paged_decode_attention
from min_llm_inference_tpu.ops.reference import masked_attention


def build_paged_state(rng, B, W, P, D, n_pages, max_len):
    """Random fragmented paged KV state: page ids shuffled across the pool
    (simulating fragmentation), lengths in [0, max_len]."""
    assert n_pages >= B * W
    k_pages = rng.standard_normal((n_pages, P, D)).astype(np.float32)
    v_pages = rng.standard_normal((n_pages, P, D)).astype(np.float32)
    perm = rng.permutation(n_pages)[: B * W]
    page_table = perm.reshape(B, W).astype(np.int32)
    lengths = rng.integers(0, max_len + 1, B).astype(np.int32)
    lengths[0] = 0          # dead slot
    lengths[-1] = max_len   # full slot
    q = rng.standard_normal((B, D)).astype(np.float32)
    return q, k_pages, v_pages, lengths, page_table


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
    q, kp, vp, lengths, table = build_paged_state(
        rng, B, W, P, D, n_pages=B * W + 3, max_len=W * P
    )
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(lengths), jnp.asarray(table),
            n_heads=H, interpret=True,
        )
    )
    kctx = gather_context(jnp.asarray(kp), jnp.asarray(table), P)
    vctx = gather_context(jnp.asarray(vp), jnp.asarray(table), P)
    want = np.asarray(
        masked_attention(jnp.asarray(q), kctx, vctx, jnp.asarray(lengths), H)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[lengths == 0] == 0.0)


def test_pallas_kernel_partial_page_lengths():
    """Lengths that end mid-page and mid-block must mask exactly."""
    rng = np.random.default_rng(7)
    B, W, P, D = 6, 4, 8, 128
    q, kp, vp, _, table = build_paged_state(rng, B, W, P, D, B * W, W * P)
    lengths = np.array([1, 7, 8, 9, 17, 32], dtype=np.int32)
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(lengths), jnp.asarray(table), interpret=True,
        )
    )
    kctx = gather_context(jnp.asarray(kp), jnp.asarray(table), P)
    vctx = gather_context(jnp.asarray(vp), jnp.asarray(table), P)
    want = np.asarray(
        masked_attention(jnp.asarray(q), kctx, vctx, jnp.asarray(lengths), 1)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_kernel_all_dead_slots():
    rng = np.random.default_rng(9)
    B, W, P, D = 4, 2, 8, 128
    q, kp, vp, _, table = build_paged_state(rng, B, W, P, D, B * W, W * P)
    lengths = np.zeros(B, dtype=np.int32)
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(lengths), jnp.asarray(table), interpret=True,
        )
    )
    assert np.all(got == 0.0)

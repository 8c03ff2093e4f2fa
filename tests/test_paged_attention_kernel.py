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


# ---- fused decode KV write (write+attend in one kernel pass) --------------


def _fused_write_case(rng, B, W, P, D, H, G, kv_dtype):
    """Compare the fused write+attend kernel against the two-step reference
    path (XLA quantize+scatter via _write_kv_tokens, then the non-fused
    grouped kernel). Both the attention outputs and the resulting pools
    must match exactly."""
    from min_llm_inference_tpu.models.paged import (
        _flat_scatter_indices,
        _write_kv_tokens,
        decode_fresh_pid,
    )
    from min_llm_inference_tpu.ops.quant import update_page_scales

    NP = B * W + 3
    quantized = kv_dtype == "int8"
    if quantized:
        pool = rng.integers(-127, 128, (NP, 2, P, D)).astype(np.int8)
        ks = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
        vs = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
    else:
        pool = rng.standard_normal((NP, 2, P, D)).astype(np.float32)
        ks = vs = None
    table = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    # lengths INCLUDE the token being written at pos = len-1; cover dead,
    # fresh-page row 0 (len-1 % P == 0), mid-page, page-final rows
    lengths = np.zeros(B, np.int32)
    picks = [0, 1, P, P + 1, 2 * P - 1, 2 * P, W * P, 5]
    for b in range(B):
        lengths[b] = picks[b % len(picks)]
    q = rng.standard_normal((B, D)).astype(np.float32)
    k_new = rng.standard_normal((B, D)).astype(np.float32)
    v_new = rng.standard_normal((B, D)).astype(np.float32)

    jl = jnp.asarray(lengths)
    live = jl > 0
    pos = jnp.maximum(jl - 1, 0)
    jt = jnp.asarray(table)
    flat_idx = _flat_scatter_indices(jt, pos, live, P, NP)
    fresh = decode_fresh_pid(jt, pos, live, P, NP)

    # reference path: scatter first, attend second
    pool_a, ks_a, vs_a = _write_kv_tokens(
        jnp.asarray(pool), None if ks is None else jnp.asarray(ks),
        None if vs is None else jnp.asarray(vs),
        flat_idx, jnp.asarray(k_new), jnp.asarray(v_new), fresh,
    )
    out_a = paged_decode_attention_grouped(
        jnp.asarray(q), pool_a, jl, jt, ks_a, vs_a,
        n_heads=H, group_size=G, interpret=True,
    )

    # fused path: scales pre-updated outside, write happens in-kernel
    if quantized:
        ks_b = update_page_scales(jnp.asarray(ks), jnp.asarray(k_new), fresh)
        vs_b = update_page_scales(jnp.asarray(vs), jnp.asarray(v_new), fresh)
        np.testing.assert_array_equal(np.asarray(ks_b), np.asarray(ks_a))
    else:
        ks_b = vs_b = None
    out_b, pool_b = paged_decode_attention_grouped(
        jnp.asarray(q), jnp.asarray(pool), jl, jt, ks_b, vs_b,
        jnp.asarray(k_new), jnp.asarray(v_new),
        n_heads=H, group_size=G, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_a), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(pool_b), np.asarray(pool_a))


@pytest.mark.parametrize("kv_dtype", ["int8", "float32"])
def test_grouped_fused_write_matches_scatter_path(kv_dtype):
    rng = np.random.default_rng(51)
    _fused_write_case(rng, B=16, W=4, P=8, D=128, H=1, G=8, kv_dtype=kv_dtype)


def test_grouped_fused_write_multihead_multiblock():
    rng = np.random.default_rng(52)
    _fused_write_case(
        rng, B=8, W=8, P=8, D=256, H=2, G=4, kv_dtype="int8"
    )


# ---- contiguous-page mode (group allocator; multi-page runs, one DMA) ----


def _contiguous_state(rng, B, W, P, D, NP, int8):
    """Table rows are consecutive page ranges (shuffled GROUP order)."""
    assert NP % W == 0 and NP // W >= B
    gids = rng.permutation(NP // W)[:B].astype(np.int32)
    table = gids[:, None] * W + np.arange(W, dtype=np.int32)[None, :]
    if int8:
        pool = rng.integers(-127, 128, (NP, 2, P, D)).astype(np.int8)
        ks = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
        vs = (rng.random(NP) * 0.05 + 0.001).astype(np.float32)
    else:
        pool = rng.standard_normal((NP, 2, P, D)).astype(np.float32)
        ks = vs = None
    lengths = rng.integers(0, W * P + 1, B).astype(np.int32)
    lengths[0] = 0
    lengths[1] = W * P
    q = rng.standard_normal((B, D)).astype(np.float32)
    return q, pool, ks, vs, lengths, table


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("ppd", [1, 2, 4])
def test_grouped_contiguous_matches_oracle(int8, ppd):
    rng = np.random.default_rng(60 + ppd)
    B, W, P, D, G = 8, 4, 8, 128, 8
    NP = (B + 3) * W
    q, pool, ks, vs, lengths, table = _contiguous_state(
        rng, B, W, P, D, NP, int8
    )
    got = np.asarray(
        paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(pool), jnp.asarray(lengths),
            jnp.asarray(table),
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            group_size=G, pages_per_compute_block=W,
            contiguous_pages=True, pages_per_dma=ppd, interpret=True,
        )
    )
    if int8:
        kctx, vctx = gather_kv_context(jnp.asarray(pool), jnp.asarray(table), P)
        from min_llm_inference_tpu.models.paged import gather_scales
        from min_llm_inference_tpu.ops.quant import dequantize_rows
        kctx = dequantize_rows(kctx, gather_scales(jnp.asarray(ks), jnp.asarray(table), P))
        vctx = dequantize_rows(vctx, gather_scales(jnp.asarray(vs), jnp.asarray(table), P))
        want = np.asarray(
            masked_attention(jnp.asarray(q), kctx, vctx, jnp.asarray(lengths), 1)
        )
    else:
        want = oracle(q, pool, lengths, table, P, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[lengths == 0] == 0.0)


def test_grouped_contiguous_fused_write_matches_noncontiguous():
    """Fused write + contiguous runs vs fused write + per-page DMAs: same
    output and same resulting pool (on a contiguous table)."""
    rng = np.random.default_rng(71)
    B, W, P, D, G = 8, 4, 8, 128, 8
    NP = (B + 2) * W
    q, pool, ks, vs, lengths, table = _contiguous_state(
        rng, B, W, P, D, NP, True
    )
    from min_llm_inference_tpu.models.paged import decode_fresh_pid
    from min_llm_inference_tpu.ops.quant import update_page_scales

    lengths = np.maximum(lengths, 1)
    lengths[0] = 0
    k_new = rng.standard_normal((B, D)).astype(np.float32)
    v_new = rng.standard_normal((B, D)).astype(np.float32)
    jl, jt = jnp.asarray(lengths), jnp.asarray(table)
    pos = jnp.maximum(jl - 1, 0)
    fresh = decode_fresh_pid(jt, pos, jl > 0, P, NP)
    ksu = update_page_scales(jnp.asarray(ks), jnp.asarray(k_new), fresh)
    vsu = update_page_scales(jnp.asarray(vs), jnp.asarray(v_new), fresh)

    outs = []
    pools = []
    for contig, ppd in ((False, None), (True, 2), (True, 4)):
        o, p = paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(pool), jl, jt, ksu, vsu,
            jnp.asarray(k_new), jnp.asarray(v_new),
            group_size=G, pages_per_compute_block=W,
            contiguous_pages=contig, pages_per_dma=ppd, interpret=True,
        )
        outs.append(np.asarray(o))
        pools.append(np.asarray(p))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[2], outs[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(pools[1], pools[0])
    np.testing.assert_array_equal(pools[2], pools[0])

"""Ring-mode grouped kernel: decode rows ride a dense per-burst ring.

Covers the kernel contract of ring mode (pages hold positions < ring_start,
ring holds positions ring_start..length-1, pool is read-only) against a
straight dequantize-and-softmax oracle, including the stale-page guard:
pool rows at positions >= ring_start are filled with junk to prove the
kernel's masking never reads them.
"""

import numpy as np

import jax.numpy as jnp
import pytest

from min_llm_inference_tpu.models.paged import merge_ring_partial
from min_llm_inference_tpu.ops.paged_attention_dense import (
    dense_paged_partial_bucketed,
)
from min_llm_inference_tpu.ops.paged_attention_dgrid import (
    dgrid_paged_partial,
)
from min_llm_inference_tpu.ops.paged_attention_flat import (
    paged_decode_attention_flat,
)
from min_llm_inference_tpu.ops.paged_attention_grouped import (
    paged_decode_attention_grouped,
)


def _mk_case(rng, B, H, D, P, W, NP, R, kv, lengths, nv, impl="grouped"):
    """Build pool+ring from one underlying token stream per slot.

    kv: 'int8' | 'int4' | 'bf16'. Returns kernel args and the oracle's
    dequantized per-slot K/V context [B, S, D].
    """
    S = W * P
    dh = D // H
    lengths = np.asarray(lengths, np.int32)
    nv = np.asarray(nv, np.int32)
    rs = np.maximum(lengths - nv, 0)
    assert np.all(nv[lengths > 0] >= 1), "live slots keep >=1 ring row"
    assert np.all(nv <= R)

    ksrc = rng.standard_normal((B, S, D)).astype(np.float32)
    vsrc = rng.standard_normal((B, S, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)

    if impl in ("dense", "dgrid"):
        # these views require full-grant group rows (group_id*W + i);
        # groups are still assigned randomly (non-identity slot->group)
        grps = rng.permutation(NP // W)[:B].astype(np.int32)
        perm = grps[:, None] * W + np.arange(W, dtype=np.int32)[None, :]
    else:
        # distinct random pages per slot (fragmented table)
        perm = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)

    quant = kv in ("int8", "int4")
    packed = kv == "int4"
    qmax = 7.0 if packed else 127.0
    Dk = D // 2 if packed else D
    pool = np.zeros((NP, 2, P, Dk), np.int8 if quant else np.float32)
    if not quant:
        pool = pool.astype(jnp.bfloat16) if kv == "bf16" else pool
    k_scales = rng.uniform(0.01, 0.1, NP).astype(np.float32) if quant else None
    v_scales = rng.uniform(0.01, 0.1, NP).astype(np.float32) if quant else None

    def quantize(x, s):
        return np.clip(np.round(x / s), -qmax, qmax)

    def pack(row):
        # arithmetic per-head packing: byte = 16*hi + lo, both in [-7, 7]
        out = np.zeros(Dk, np.float32)
        dhp = dh // 2
        for h in range(H):
            lo = row[h * dh : h * dh + dhp]
            hi = row[h * dh + dhp : (h + 1) * dh]
            out[h * dhp : (h + 1) * dhp] = 16.0 * hi + lo
        return out

    kd = np.zeros((B, S, D), np.float32)  # oracle dequantized context
    vd = np.zeros((B, S, D), np.float32)
    ring = np.full((B, R, 2 * Dk), 77, pool.dtype)  # junk outside validity
    ring_sc = np.full((B, 128), 1e9, np.float32)  # junk outside validity

    for b in range(B):
        for pos in range(int(lengths[b])):
            pg = perm[b, pos // P]
            if quant:
                qk_ = quantize(ksrc[b, pos], k_scales[pg])
                qv_ = quantize(vsrc[b, pos], v_scales[pg])
                kd[b, pos] = qk_ * k_scales[pg]
                vd[b, pos] = qv_ * v_scales[pg]
                rowk = pack(qk_) if packed else qk_
                rowv = pack(qv_) if packed else qv_
            else:
                rowk = jnp.asarray(ksrc[b, pos], pool.dtype)
                rowv = jnp.asarray(vsrc[b, pos], pool.dtype)
                kd[b, pos] = np.float32(rowk)
                vd[b, pos] = np.float32(rowv)
            if pos < rs[b]:
                pool[pg, 0, pos % P] = rowk
                pool[pg, 1, pos % P] = rowv
            else:
                r = pos - rs[b]
                ring[b, r, :Dk] = rowk
                ring[b, r, Dk:] = rowv
                if quant:
                    ring_sc[b, r] = k_scales[pg]
                    ring_sc[b, 64 + r] = v_scales[pg]
        # stale-page junk: positions in [rs, len) must never be read from
        # the pool (they ride the ring); poison them
        for pos in range(int(rs[b]), int(lengths[b])):
            pg = perm[b, pos // P]
            pool[pg, 0, pos % P] = 99 if quant else 1e30
            pool[pg, 1, pos % P] = -99 if quant else -1e30

    if impl == "dgrid":
        o_p, m_p, l_p = dgrid_paged_partial(
            jnp.asarray(q), jnp.asarray(pool),
            jnp.asarray(k_scales) if quant else None,
            jnp.asarray(v_scales) if quant else None,
            jnp.asarray(rs), jnp.asarray(lengths), jnp.asarray(perm),
            n_heads=H, page_size=P, interpret=True,
        )
    elif impl == "dense":
        o_p, m_p, l_p = dense_paged_partial_bucketed(
            jnp.asarray(q), jnp.asarray(pool),
            jnp.asarray(k_scales) if quant else None,
            jnp.asarray(v_scales) if quant else None,
            jnp.asarray(rs), jnp.asarray(lengths), jnp.asarray(perm),
            n_heads=H, page_size=P, packed_int4=packed,
        )
    elif impl == "flat":
        # pages_per_dma=1: per-page copies work on a fragmented table
        o_p, m_p, l_p = paged_decode_attention_flat(
            jnp.asarray(q), jnp.asarray(pool), jnp.asarray(lengths),
            jnp.asarray(perm),
            jnp.asarray(k_scales) if quant else None,
            jnp.asarray(v_scales) if quant else None,
            jnp.asarray(rs),
            n_heads=H, pages_per_dma=1, packed_int4=packed, interpret=True,
        )
    else:
        o_p, m_p, l_p = paged_decode_attention_grouped(
            jnp.asarray(q), jnp.asarray(pool), jnp.asarray(lengths),
            jnp.asarray(perm),
            jnp.asarray(k_scales) if quant else None,
            jnp.asarray(v_scales) if quant else None,
            ring_start=jnp.asarray(rs),
            n_heads=H, packed_int4=packed, interpret=True,
        )
    out = merge_ring_partial(
        o_p, m_p, l_p, jnp.asarray(q), jnp.asarray(ring),
        jnp.asarray(ring_sc) if quant else None,
        jnp.asarray(rs), jnp.asarray(lengths), H, packed,
    )

    # oracle
    want = np.zeros((B, D), np.float32)
    for b in range(B):
        L = int(lengths[b])
        if L == 0:
            continue
        for h in range(H):
            sl = slice(h * dh, (h + 1) * dh)
            sc = kd[b, :L, sl] @ q[b, sl] / np.sqrt(dh)
            p = np.exp(sc - sc.max())
            p /= p.sum()
            want[b, sl] = p @ vd[b, :L, sl]
    return np.asarray(out), want


CASES = [
    # (H, kv)
    (1, "int8"),
    (2, "int8"),      # batched-heads path
    (1, "int4"),
    (2, "int4"),      # per-head plane path
    (1, "bf16"),
]


@pytest.mark.parametrize("impl", ["grouped", "flat", "dense", "dgrid"])
@pytest.mark.parametrize("H,kv", CASES)
def test_ring_kernel_vs_oracle(H, kv, impl):
    if impl == "dgrid" and kv == "int4":
        pytest.skip("dgrid: packed int4 unsupported (per-head planes "
                    "defeat the whole-block selector dot)")
    rng = np.random.default_rng(7)
    B, D, P, W, NP, R = 8, 128, 8, 4, 64, 8
    # lengths exercise: dead slot, all-in-ring (rs=0), page boundary
    # straddles, full context
    lengths = [0, 1, 5, 9, 17, 26, 32, 20]
    nv = [0, 1, 4, 2, 3, 8, 6, 4]
    got, want = _mk_case(rng, B, H, D, P, W, NP, R, kv, lengths, nv, impl)
    tol = 0.04 if kv == "bf16" else 1e-4
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


def test_flush_ring_to_pages_matches_rowwise_reference():
    from min_llm_inference_tpu.models.paged import flush_ring_to_pages

    rng = np.random.default_rng(3)
    B, P, W, NP, Dk, R = 6, 8, 4, 32, 16, 8
    n_rounds = 6  # fewer than the padded ring rows
    pool = rng.integers(-100, 100, (NP, 2, P, Dk)).astype(np.int8)
    ring = rng.integers(-100, 100, (B, R, 2 * Dk)).astype(np.int8)
    perm = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    # dead slot, page-straddling spans, rs=0 all-in-ring, cap-edge
    lengths = np.array([0, 7, 9, 17, 6, 32], np.int32)
    rs = np.array([3, 1, 5, 11, 0, 26], np.int32)

    got = np.asarray(flush_ring_to_pages(
        jnp.asarray(pool), jnp.asarray(ring), jnp.asarray(rs),
        jnp.asarray(lengths), n_rounds, jnp.asarray(perm), P, NP,
    ))

    want = pool.copy()
    for b in range(B):
        if lengths[b] == 0:
            continue  # dead at flush: rows dropped (pages re-prefilled)
        nv = min(int(lengths[b] - rs[b]), n_rounds)
        for r in range(nv):
            pos = int(rs[b]) + r
            pg = perm[b, pos // P]
            want[pg, 0, pos % P] = ring[b, r, :Dk]
            want[pg, 1, pos % P] = ring[b, r, Dk:]
    np.testing.assert_array_equal(got, want)


def test_ring_flush_ring_r0_matches_rowwise_reference():
    """Burst-wide rings under sub-burst admission: a slot admitted at
    absolute round r0 has valid ring columns [r0, r0 + nv) holding
    positions ring_start + (col - r0); columns < r0 belong to a PREVIOUS
    occupant and must not be flushed. Pallas kernel and XLA oracle vs a
    rowwise python reference, junk in the pre-admission columns."""
    from min_llm_inference_tpu.models.paged import flush_ring_to_pages
    from min_llm_inference_tpu.ops.ring_flush import ring_flush

    rng = np.random.default_rng(11)
    B, P, W, NP, Dk, R = 8, 8, 4, 32, 128, 8
    n_rounds = 8
    pool = rng.integers(-100, 100, (NP, 2, P, Dk)).astype(np.int8)
    ring = rng.integers(-100, 100, (B, R, 2 * Dk)).astype(np.int8)
    perm = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    # mid-burst admittees (r0 4, 6), burst-start slots (r0 0), a dead slot,
    # an admittee whose span straddles a page boundary, one at the cap
    lengths = np.array([7, 9, 0, 17, 6, 32, 3, 12], np.int32)
    rs = np.array([3, 5, 2, 11, 4, 26, 2, 9], np.int32)
    r0 = np.array([0, 4, 3, 6, 4, 2, 6, 0], np.int32)
    # slot 3 overruns its column span (lengths - rs > n_rounds - r0): the
    # flush must clamp to the columns that exist, exactly like a slot that
    # ran to the end of the burst (its final emitted token has no KV yet)
    assert lengths[3] - rs[3] > n_rounds - r0[3]

    got_pl = np.asarray(ring_flush(
        jnp.asarray(pool), jnp.asarray(ring), jnp.asarray(rs),
        jnp.asarray(lengths), jnp.asarray(perm),
        n_rounds=n_rounds, ring_r0=jnp.asarray(r0), interpret=True,
    ))
    got_xla = np.asarray(flush_ring_to_pages(
        jnp.asarray(pool), jnp.asarray(ring), jnp.asarray(rs),
        jnp.asarray(lengths), n_rounds, jnp.asarray(perm), P, NP,
        ring_r0=jnp.asarray(r0),
    ))

    want = pool.copy()
    for b in range(B):
        if lengths[b] == 0:
            continue
        nv = min(int(lengths[b] - rs[b]), n_rounds - int(r0[b]))
        for r in range(nv):
            pos = int(rs[b]) + r
            pg = perm[b, pos // P]
            want[pg, 0, pos % P] = ring[b, int(r0[b]) + r, :Dk]
            want[pg, 1, pos % P] = ring[b, int(r0[b]) + r, Dk:]
    np.testing.assert_array_equal(got_xla, want)
    np.testing.assert_array_equal(got_pl, want)


def test_merge_ring_partial_masks_pre_admission_columns():
    """merge_ring_partial(ring_r0=...) must ignore ring columns < r0 (a
    previous occupant's rows): junk there cannot change the output."""
    from min_llm_inference_tpu.models.paged import merge_ring_partial

    rng = np.random.default_rng(13)
    B, H, D, R = 4, 2, 64, 8
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ring = rng.standard_normal((B, R, 2 * D)).astype(np.float32)
    lengths = jnp.asarray([6, 9, 0, 4], jnp.int32)
    rs = jnp.asarray([2, 5, 0, 3], jnp.int32)
    r0 = np.array([3, 0, 2, 6], np.int32)
    # empty page partial (all mass in the ring)
    o_p = jnp.zeros((B, D), jnp.float32)
    m_p = jnp.full((B, H), -jnp.inf)
    l_p = jnp.zeros((B, H), jnp.float32)

    def run(rg):
        return np.asarray(merge_ring_partial(
            o_p, m_p, l_p, q, jnp.asarray(rg), None, rs, lengths, H,
            False, ring_r0=jnp.asarray(r0)))

    base = run(ring)
    poisoned = ring.copy()
    for b in range(B):
        poisoned[b, : r0[b]] = 1e9   # junk strictly below each slot's r0
    np.testing.assert_array_equal(base, run(poisoned))
    # sanity: junk INSIDE the valid span must change live rows (mask is
    # tight, not over-wide) — slot 1 has valid cols [0, lengths-rs)
    poisoned2 = ring.copy()
    poisoned2[1, 1] = 1e9
    assert not np.allclose(base[1], run(poisoned2)[1])


def test_pallas_ring_flush_matches_xla_oracle():
    from min_llm_inference_tpu.models.paged import flush_ring_to_pages
    from min_llm_inference_tpu.ops.ring_flush import ring_flush

    rng = np.random.default_rng(5)
    # B=6 exercises the pad-to-8 path (pad rows must not touch page 0)
    B, P, W, NP, Dk, R = 6, 8, 4, 32, 128, 8
    n_rounds = 6
    pool = rng.integers(-100, 100, (NP, 2, P, Dk)).astype(np.int8)
    ring = rng.integers(-100, 100, (B, R, 2 * Dk)).astype(np.int8)
    perm = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    lengths = np.array([0, 7, 9, 17, 6, 32], np.int32)
    rs = np.array([3, 1, 5, 11, 0, 26], np.int32)

    got = ring_flush(
        jnp.asarray(pool), jnp.asarray(ring), jnp.asarray(rs),
        jnp.asarray(lengths), jnp.asarray(perm),
        n_rounds=n_rounds, interpret=True,
    )
    want = flush_ring_to_pages(
        jnp.asarray(pool), jnp.asarray(ring), jnp.asarray(rs),
        jnp.asarray(lengths), n_rounds, jnp.asarray(perm), P, NP,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_ring_flush_bf16():
    from min_llm_inference_tpu.models.paged import flush_ring_to_pages
    from min_llm_inference_tpu.ops.ring_flush import ring_flush

    rng = np.random.default_rng(9)
    B, P, W, NP, Dk, R = 8, 8, 4, 32, 128, 8
    pool = jnp.asarray(rng.standard_normal((NP, 2, P, Dk)), jnp.bfloat16)
    ring = jnp.asarray(rng.standard_normal((B, R, 2 * Dk)), jnp.bfloat16)
    perm = jnp.asarray(
        rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32))
    lengths = jnp.asarray([5, 9, 0, 17, 32, 1, 8, 25], jnp.int32)
    rs = jnp.asarray([0, 4, 2, 11, 26, 0, 3, 19], jnp.int32)
    got = ring_flush(pool, ring, rs, lengths, perm, n_rounds=8,
                     interpret=True)
    want = flush_ring_to_pages(pool, ring, rs, lengths, 8, perm, P, NP)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ring_rejects_fused_write():
    q = jnp.zeros((8, 128))
    pool = jnp.zeros((16, 2, 8, 128), jnp.int8)
    with pytest.raises(AssertionError):
        paged_decode_attention_grouped(
            q, pool, jnp.zeros(8, jnp.int32), jnp.zeros((8, 4), jnp.int32),
            jnp.ones(16), jnp.ones(16),
            k_new=q, v_new=q,
            ring_start=jnp.zeros(8, jnp.int32),
            interpret=True,
        )

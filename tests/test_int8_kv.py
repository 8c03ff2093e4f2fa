"""INT8 paged-KV tests (north-star config 4): quantize/dequant roundtrip,
fused-kernel parity vs the dequantizing jnp oracle, and end-to-end engine
quality (int8 engine finishes everything; tokens track the fp32 engine)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu import (
    EngineConfig,
    ItemStorage,
    ModelConfig,
    PagedEngine,
    Request,
    get_global_throughput_counter,
    init_params,
)
from min_llm_inference_tpu.models.paged import gather_kv_context, gather_scales
from min_llm_inference_tpu.ops.paged_attention import paged_decode_attention
from min_llm_inference_tpu.ops.quant import (
    dequantize_rows,
    quantize_rows,
    quantize_weight,
    dequantize_weight,
)
from min_llm_inference_tpu.ops.reference import masked_attention


def test_quantize_rows_roundtrip(rng):
    x = rng.standard_normal((17, 64)).astype(np.float32) * 3.0
    x[3] = 0.0  # zero row
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(dequantize_rows(q, s))
    # symmetric int8: relative row error bounded by ~1/127
    for i in range(17):
        denom = np.abs(x[i]).max()
        if denom == 0:
            assert np.all(back[i] == 0)
        else:
            assert np.abs(back[i] - x[i]).max() <= denom / 127.0 + 1e-6


def test_quantize_weight_roundtrip(rng):
    w = rng.standard_normal((32, 48)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    back = np.asarray(dequantize_weight(q, s, jnp.float32))
    col_max = np.abs(w).max(axis=0)
    assert np.all(np.abs(back - w).max(axis=0) <= col_max / 127.0 + 1e-6)


def test_int8_kernel_matches_dequant_oracle(rng):
    # int8 pages + random per-page scales; oracle dequantizes via
    # gather_scales and runs the jnp masked attention
    B, W, P, D, NP = 5, 4, 32, 128, 24
    kvq = jnp.asarray(rng.integers(-127, 128, (NP, 2, P, D)).astype(np.int8))
    ks = jnp.asarray((rng.random(NP) * 0.05 + 0.001).astype(np.float32))
    vs = jnp.asarray((rng.random(NP) * 0.05 + 0.001).astype(np.float32))
    table = rng.permutation(NP)[: B * W].reshape(B, W).astype(np.int32)
    lengths = np.array([0, 1, 33, 100, 128], dtype=np.int32)
    q = rng.standard_normal((B, D)).astype(np.float32)

    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), kvq, jnp.asarray(lengths), jnp.asarray(table),
            ks, vs, interpret=True,
        )
    )
    kctx_q, vctx_q = gather_kv_context(kvq, jnp.asarray(table), P)
    kctx = dequantize_rows(kctx_q, gather_scales(ks, jnp.asarray(table), P))
    vctx = dequantize_rows(vctx_q, gather_scales(vs, jnp.asarray(table), P))
    want = np.asarray(
        masked_attention(jnp.asarray(q), kctx, vctx, jnp.asarray(lengths), 1)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[0] == 0.0)


def test_per_page_quantizer_semantics(rng):
    from min_llm_inference_tpu.ops.quant import quantize_tokens_per_page

    NP, P, D = 6, 4, 8
    scales = jnp.zeros((NP,), jnp.float32)
    # prefill-style write: slot with 6 tokens across pages [2, 5]
    vals = rng.standard_normal((6, D)).astype(np.float32)
    pos = np.arange(6, dtype=np.int32)
    flat = np.where(pos < 4, 2 * P + pos, 5 * P + (pos - 4)).astype(np.int32)
    q, new_scales = quantize_tokens_per_page(
        jnp.asarray(vals), jnp.asarray(flat), scales, P, jnp.asarray(pos)
    )
    new_scales = np.asarray(new_scales)
    assert new_scales[2] > 0 and new_scales[5] > 0  # both touched pages set
    assert np.all(new_scales[[0, 1, 3, 4]] == 0)
    # decode-style append at pos 6 (page 5, row 2): scale must NOT change
    v2 = (vals[:1] * 100.0)
    q2, s2 = quantize_tokens_per_page(
        jnp.asarray(v2), jnp.asarray(np.array([5 * P + 2], np.int32)),
        jnp.asarray(new_scales), P, jnp.asarray(np.array([6], np.int32)),
    )
    assert np.asarray(s2)[5] == new_scales[5]  # immutable mid-page
    assert np.asarray(q2).max() == 127  # clipped
    # decode write starting a FRESH page (pos % P == 0) resets the scale
    q3, s3 = quantize_tokens_per_page(
        jnp.asarray(v2), jnp.asarray(np.array([1 * P, ], np.int32)),
        jnp.asarray(new_scales), P, jnp.asarray(np.array([8], np.int32)),
    )
    assert np.asarray(s3)[1] > 0


MODEL = ModelConfig(n_vocab=256, emb_dim=32, n_seq=64, eof_token_id=255)


def _run(params, kv_dtype, attention, store):
    cfg = EngineConfig(
        n_slots=8, page_size=16, n_pages=64, kv_dtype=kv_dtype,
        max_prefill_batch=4,
    )
    get_global_throughput_counter().reset()
    eng = PagedEngine(params, MODEL, cfg, attention_impl=attention)
    eng.run(store)
    return {rid: r.tokens for rid, r in store.finished.items()}


@pytest.mark.parametrize("attention", ["jnp", "pallas"])
def test_int8_engine_end_to_end(attention, rng):
    params = init_params(jax.random.PRNGKey(0), MODEL, eof_bias=0.05)
    n = 10
    prompts = [rng.integers(0, 255, int(rng.integers(1, 16))).tolist() for _ in range(n)]

    def store():
        s = ItemStorage()
        for i, p in enumerate(prompts):
            s.add_new_item(Request(i, list(p)))
        return s

    ref = _run(params, "float32", "jnp", store())
    got = _run(params, "int8", attention, store())
    assert len(got) == n
    # int8 KV error can flip decisions on near-ties; require high agreement
    agree = 0
    total = 0
    for rid in range(n):
        a, b = ref[rid], got[rid]
        m = min(len(a), len(b))
        agree += sum(1 for x, y in zip(a[:m], b[:m]) if x == y)
        total += m
    assert agree / total > 0.9, f"token agreement {agree}/{total}"


def test_int4_pack_unpack_roundtrip(rng):
    """pack_int4_rows/unpack_int4 are exact inverses on [-7, 7] ints (the
    int4 qmax range; arithmetic byte = 16*hi + lo), for 1 and multiple
    heads (per-head lo/hi-half layout)."""
    from min_llm_inference_tpu.ops.quant import pack_int4_rows, unpack_int4

    for heads in (1, 4):
        x = rng.integers(-7, 8, (9, 64)).astype(np.float32)
        packed = pack_int4_rows(jnp.asarray(x), heads)
        assert packed.shape == (9, 32) and packed.dtype == jnp.int8
        back = np.asarray(unpack_int4(packed, heads))
        np.testing.assert_array_equal(back, x)


def test_delta_ppl_int4_kv_reported(rng):
    """int4 KV quality harness runs; the looser 4-bit grid is allowed a
    wider (but still bounded) PPL delta than int8's 0.1."""
    from min_llm_inference_tpu.utils.quality import delta_ppl_kv
    from min_llm_inference_tpu import init_params

    model = ModelConfig(n_vocab=256, emb_dim=64, n_seq=32, n_heads=2,
                        n_layers=2, ffn_dim=128, use_output_proj=True,
                        use_layernorm=True, eof_token_id=255)
    engine = EngineConfig(n_slots=8, n_pages=16, page_size=16)
    params = init_params(jax.random.PRNGKey(0), model)
    tokens = rng.integers(0, 255, (8, 32)).astype(np.int32)
    lengths = rng.integers(8, 33, 8).astype(np.int32)
    res = delta_ppl_kv(params, model, engine, tokens, lengths, "int4")
    assert np.isfinite(res["ppl_q"]) and np.isfinite(res["ppl_ref"])
    assert abs(res["delta_ppl"]) <= 0.5, res

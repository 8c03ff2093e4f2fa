"""Tier-1 kernel-semantics tests: jnp reference ops vs independent numpy
oracles on randomized odd shapes, incl. zero-length rows (the reference's
test strategy, SURVEY.md §4: tests/self_attention_inference_optimized_test
.cpp, softmax_test.cpp, decoder_test.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from min_llm_inference_tpu.constants import EMPTY_ROW_TOKEN_ID
from min_llm_inference_tpu.ops.reference import (
    greedy_next_token,
    masked_attention,
    masked_softmax,
    tied_logits,
    token_pos_embed,
)


def np_masked_attention(q, k, v, lengths, n_heads=1):
    """Independent numpy oracle (slow loops)."""
    B, L, D = k.shape
    dh = D // n_heads
    out = np.zeros((B, D), dtype=np.float64)
    for b in range(B):
        ln = lengths[b]
        if ln == 0:
            continue
        for h in range(n_heads):
            qh = q[b, h * dh : (h + 1) * dh].astype(np.float64)
            kh = k[b, :ln, h * dh : (h + 1) * dh].astype(np.float64)
            vh = v[b, :ln, h * dh : (h + 1) * dh].astype(np.float64)
            s = kh @ qh / np.sqrt(dh)
            s -= s.max()
            p = np.exp(s)
            p /= p.sum()
            out[b, h * dh : (h + 1) * dh] = p @ vh
    return out


@pytest.mark.parametrize("seed,B,L,D,H", [(0, 7, 33, 20, 1), (1, 13, 57, 48, 4), (2, 1, 5, 8, 2)])
def test_masked_attention_vs_numpy(seed, B, L, D, H):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, D)).astype(np.float32)
    k = rng.standard_normal((B, L, D)).astype(np.float32)
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = rng.integers(0, L + 1, B).astype(np.int32)
    lengths[0] = 0  # always include an empty slot
    got = np.asarray(masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths), H))
    want = np_masked_attention(q, k, v, lengths, H)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert np.all(got[lengths == 0] == 0.0)


def test_masked_softmax_rows():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 11)).astype(np.float32)
    mask = np.zeros((5, 11), dtype=bool)
    mask[1, :4] = True
    mask[2, :] = True
    mask[3, 10] = True
    p = np.asarray(masked_softmax(jnp.asarray(x), jnp.asarray(mask)))
    # fully-masked row -> zeros, not NaN
    assert np.all(p[0] == 0) and np.all(p[4] == 0)
    np.testing.assert_allclose(p[1, :4].sum(), 1.0, rtol=1e-6)
    assert np.all(p[1, 4:] == 0)
    np.testing.assert_allclose(p[2].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(p[3, 10], 1.0, rtol=1e-6)


def test_greedy_next_token_rules():
    # slots: 0 empty; 1 live picks argmax; 2 live hits EOF; 3 live hits cap
    n_seq, eof = 10, 3
    logits = np.zeros((4, 5), dtype=np.float32)
    logits[1, 2] = 5.0
    logits[2, eof] = 5.0
    logits[3, 1] = 5.0
    lengths = np.array([0, 4, 4, n_seq - 1], dtype=np.int32)
    tok, new_len = greedy_next_token(jnp.asarray(logits), jnp.asarray(lengths), n_seq, eof)
    tok, new_len = np.asarray(tok), np.asarray(new_len)
    assert tok.tolist() == [EMPTY_ROW_TOKEN_ID, 2, eof, 1]
    assert new_len.tolist() == [0, 5, 0, 0]


def test_greedy_argmax_tie_lowest_index():
    logits = np.array([[1.0, 7.0, 7.0, 0.0]], dtype=np.float32)
    tok, _ = greedy_next_token(jnp.asarray(logits), jnp.asarray(np.array([3], np.int32)), 100, 99)
    assert int(tok[0]) == 1  # strict > comparison: first max wins


def test_token_pos_embed_and_tied_logits():
    rng = np.random.default_rng(4)
    wte = rng.standard_normal((11, 6)).astype(np.float32)
    wpe = rng.standard_normal((9, 6)).astype(np.float32)
    tokens = np.array([3, -1, 10], dtype=np.int32)  # -1 sentinel clipped
    pos = np.array([0, 2, 8], dtype=np.int32)
    emb = np.asarray(token_pos_embed(jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(wte), jnp.asarray(wpe)))
    np.testing.assert_allclose(emb[0], wte[3] + wpe[0], rtol=1e-6)
    np.testing.assert_allclose(emb[2], wte[10] + wpe[8], rtol=1e-6)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    lg = np.asarray(tied_logits(jnp.asarray(x), jnp.asarray(wte)))
    np.testing.assert_allclose(lg, x @ wte.T, rtol=1e-5)


def test_feed_forward_bias_activation():
    # reference FeedForward validates W[in,out] + optional bias + activation
    # (src/layers.cpp:10-52, tests/feed_forward_layer_test.cpp)
    import jax
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    w = rng.standard_normal((8, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    from min_llm_inference_tpu.ops.reference import feed_forward
    y = np.asarray(feed_forward(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(y, x @ w + b, rtol=1e-5, atol=1e-5)
    y2 = np.asarray(feed_forward(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                 activation=jax.nn.relu))
    np.testing.assert_allclose(y2, np.maximum(x @ w + b, 0), rtol=1e-5, atol=1e-5)


def test_online_softmax_matches_numpy():
    from min_llm_inference_tpu.ops.reference import online_softmax
    rng = np.random.default_rng(6)
    x = rng.standard_normal((7, 33)).astype(np.float32) * 5
    got = np.asarray(online_softmax(jnp.asarray(x)))
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    want = e / e.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_qkv_params_equivalence(rng):
    # fused [wq|wk|wv] matmul must produce identical projections
    from min_llm_inference_tpu import ModelConfig, init_params
    from min_llm_inference_tpu.models.params import fuse_qkv_params
    from min_llm_inference_tpu.ops.reference import feed_forward
    import jax
    cfg = ModelConfig(n_vocab=32, emb_dim=16, n_seq=16, eof_token_id=31)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fused = fuse_qkv_params(params)
    x = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    qkv = np.asarray(feed_forward(x, fused["layers"][0]["wqkv"]))
    for i, name in enumerate(("wq", "wk", "wv")):
        np.testing.assert_allclose(
            qkv[:, i * 16 : (i + 1) * 16],
            np.asarray(feed_forward(x, params["layers"][0][name])),
            rtol=1e-5, atol=1e-6,
        )

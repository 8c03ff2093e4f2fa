"""Pure-jnp reference ops: the oracle layer.

These functions define the exact numerical semantics of every pipeline stage.
They are the TPU build's analogue of the reference's CPU oracle
implementations (/root/reference/tests/test_utils.cpp:29-647) — but here they
are *also* the production dense backend, since XLA compiles them well. Every
Pallas kernel is parity-tested against these.

Stage mapping to the reference CUDA pipeline
(/root/reference/src/kernels/self_attention_inference_optimized.cu,
encoder.cu, decoder.cu):
  token_pos_embed        <- encoder_kernel / inference_optimized_encoder
  project_qkv            <- fill_new_kt_v_cache + get_latest_kt_q_v (GEMM part)
  masked_softmax         <- softmax_in_place_with_lengths
  masked_attention       <- qkt + softmax + softmax_v
  tied_logits            <- gemm_transpose (logits = attn @ wte^T, weight tying)
  greedy_next_token      <- decoder_kernel (argmax + device-side length rules)

Conventions shared by all backends:
  * ``lengths[i] == 0`` means batch slot ``i`` is empty (liveness flag —
    reference decoder.cu:33-39).
  * Attention is length-masked: positions >= lengths[i] contribute nothing.
  * Scores scale by 1/sqrt(head_dim); the reference uses 1/sqrt(emb_dim)
    with a single head (self_attention_inference_optimized.cu:150-184).
  * Greedy argmax resolves ties toward the lowest index (jnp.argmax default;
    reference uses strict ``>`` comparisons, decoder.cu:51,62).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import EMPTY_ROW_TOKEN_ID

NEG_INF = float("-inf")


def onehot_rows(w, idx, out_dtype):
    """Embedding lookup as a one-hot MXU matmul: rows = onehot(idx) @ w.

    Bit-exact vs a row gather: each output row accumulates exactly one
    product 1.0 * w[i] in f32, then casts back to the table dtype. On TPU
    a per-index row gather costs ~0.4 us/row while the MXU runs this as a
    dense matmul — a win once the index count is large relative to the
    vocab (the per-index cost goes away; the one-hot FLOPs are cheap).
    """
    V = w.shape[0]
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(V, dtype=flat.dtype)[None, :]).astype(w.dtype)
    rows = jnp.dot(oh, w, preferred_element_type=jnp.float32).astype(w.dtype)
    return rows.reshape(*idx.shape, w.shape[1]).astype(out_dtype)


def _lookup_rows(w, idx, dtype):
    """gather vs one-hot heuristic (measured on v5e: one-hot loses at
    [1024] decode-sized index sets, wins ~3x at prefill-block sizes)."""
    from .quant import is_quantized_leaf, gather_rows

    n = 1
    for s in idx.shape:
        n *= s
    if not is_quantized_leaf(w) and n >= 4 * w.shape[0]:
        return onehot_rows(w, idx, dtype)
    return gather_rows(w, idx, dtype)


def token_pos_embed(tokens, positions, wte, wpe):
    """Token + positional embedding gather.

    tokens: int32 [...]; positions: int32 broadcastable to tokens.
    Sentinel/padding token ids (< 0) are clipped for the gather — callers
    mask the result by length. Tables may be weight-quantized leaves.
    """
    from .quant import is_quantized_leaf

    n_vocab = (wte["q"] if is_quantized_leaf(wte) else wte).shape[0]
    n_pos = (wpe["q"] if is_quantized_leaf(wpe) else wpe).shape[0]
    safe_tokens = jnp.clip(tokens, 0, n_vocab - 1)
    safe_pos = jnp.clip(positions, 0, n_pos - 1)
    dtype = (wte["q"] if is_quantized_leaf(wte) else wte).dtype
    if is_quantized_leaf(wte):
        dtype = jnp.bfloat16
    return _lookup_rows(wte, safe_tokens, dtype) + _lookup_rows(wpe, safe_pos, dtype)


def project_qkv(emb, wq, wk, wv):
    """QKV projections. emb: [..., D]; weights: [D, D]."""
    dtype = emb.dtype
    q = jnp.dot(emb, wq, preferred_element_type=jnp.float32).astype(dtype)
    k = jnp.dot(emb, wk, preferred_element_type=jnp.float32).astype(dtype)
    v = jnp.dot(emb, wv, preferred_element_type=jnp.float32).astype(dtype)
    return q, k, v


def masked_softmax(scores, mask):
    """Numerically-safe softmax along the last axis with a boolean mask.

    Masked-out columns get probability 0. Fully-masked rows (empty slots)
    produce an all-zero row instead of NaN (the reference skips such rows
    entirely; an all-zero probability row makes the subsequent PV product
    zero, which is equivalent for masked consumers).
    """
    scores = scores.astype(jnp.float32)
    masked = jnp.where(mask, scores, NEG_INF)
    row_max = jnp.max(masked, axis=-1, keepdims=True)
    row_max = jnp.maximum(row_max, jnp.finfo(jnp.float32).min)  # empty rows
    unnorm = jnp.where(mask, jnp.exp(scores - row_max), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    return unnorm / jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)


def masked_attention(q, k_ctx, v_ctx, lengths, n_heads: int = 1):
    """Single-token attention of q against a per-slot context, length-masked.

    q:      [B, D]      — query of the latest token per slot
    k_ctx:  [B, L, D]   — per-slot keys  (L >= max length)
    v_ctx:  [B, L, D]   — per-slot values
    lengths:[B] int32   — positions < lengths[i] are valid
    Returns [B, D] attention output (zeros for empty slots).
    """
    B, L, D = k_ctx.shape
    dh = D // n_heads
    qh = q.reshape(B, n_heads, dh).astype(jnp.float32)
    kh = k_ctx.reshape(B, L, n_heads, dh).astype(jnp.float32)
    vh = v_ctx.reshape(B, L, n_heads, dh).astype(jnp.float32)
    scores = jnp.einsum("bhd,blhd->bhl", qh, kh) * (1.0 / jnp.sqrt(dh))
    mask = (jnp.arange(L)[None, None, :] < lengths[:, None, None])
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhl,blhd->bhd", probs, vh)
    return out.reshape(B, D).astype(q.dtype)


def tied_logits(x, wte):
    """Weight-tied LM head: logits = x @ wte^T (reference decoder.cu:105-106
    — no separate LM head). wte may be a weight-quantized leaf.

    Operands stay in the model dtype (f32 models keep exact f32 math — the
    CPU parity oracles rely on it); accumulation is always f32. Forcing
    f32 operands on bf16 models measured ~0.09 ms/round extra at bench
    shapes for identical greedy decisions (every backend shares this
    function, so tie behavior moves in lockstep)."""
    from .quant import maybe_dequant

    wte = maybe_dequant(wte, x.dtype)
    return jnp.dot(
        x, wte.astype(x.dtype).T, preferred_element_type=jnp.float32
    )


def greedy_next_token(logits, lengths, n_seq: int, eof_token_id: int):
    """Greedy argmax + the device-side length/liveness rules of
    decoder_kernel (reference decoder.cu:25-91):

      * empty slot (length 0): emit EMPTY_ROW_TOKEN_ID, stay empty;
      * live slot: emit argmax token (lowest index wins ties), then
        lengths += 1, but reset to 0 (slot becomes empty) when the token is
        EOF or the new length reaches n_seq.

    Returns (next_tokens [B] int32, new_lengths [B] int32).
    """
    live = lengths > 0
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    tok = jnp.where(live, tok, jnp.int32(EMPTY_ROW_TOKEN_ID))
    finished = live & ((tok == eof_token_id) | (lengths + 1 >= n_seq))
    new_lengths = jnp.where(live & ~finished, lengths + 1, 0)
    return tok, new_lengths


def sample_next_token(logits, lengths, n_seq: int, eof_token_id: int,
                      key, temperature: float = 1.0, top_k: int = 0):
    """Stochastic decoding: temperature + optional top-k sampling, with the
    same device-side length/liveness rules as greedy_next_token.

    EXTENSION beyond the reference (greedy-only, decoder.cu): offered only
    by AutonomousEngine — the host engines' preemption recompute and
    pipelined-result discard rely on greedy determinism (CLAUDE.md
    invariants), while the autonomous engine never preempts or discards.
    Deterministic for a fixed key (same seed -> same tokens).
    """
    live = lengths > 0
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    if top_k and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
        scaled = jnp.where(scaled >= kth, scaled, NEG_INF)
    tok = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    tok = jnp.where(live, tok, jnp.int32(EMPTY_ROW_TOKEN_ID))
    finished = live & ((tok == eof_token_id) | (lengths + 1 >= n_seq))
    new_lengths = jnp.where(live & ~finished, lengths + 1, 0)
    return tok, new_lengths


def feed_forward(x, w, b=None, activation=None):
    """Generic dense layer: x @ W (+ b) (+ act). Reference FeedForward
    (src/layers.cpp:10-52) wraps a bias GEMM; defined-and-tested there but
    unused by the models — here it is the FFN building block of the
    multi-layer stack. W may be a weight-quantized leaf."""
    from .quant import maybe_dequant

    w = maybe_dequant(w, x.dtype)
    y = jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    if activation is not None:
        y = activation(y)
    return y


def online_softmax(x):
    """Standalone row softmax (reference src/kernels/softmax.cu:18-112,
    used only by tests there)."""
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)

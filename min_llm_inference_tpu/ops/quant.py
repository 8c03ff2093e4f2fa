"""Quantization ops: INT8 paged-KV and weight-only INT8.

North-star extension beyond the reference (BASELINE.json config 4): the
paged KV pool stores int8 token rows with one fp32 scale per token
(per-row absmax / 127); dequantization is fused into the consumers — the
Pallas decode kernel dequantizes after the page DMA (ops/paged_attention.py),
the jnp oracle path dequantizes after gather. Weight-only INT8 stores int8
weights + per-output-column scales, dequantized at use (XLA fuses the
convert+scale into the matmul read).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
INT4_MAX = 7.0


def kv_qmax(packed: bool) -> float:
    """Quantization range of a KV pool: int8 rows, or int4 nibbles packed
    two-per-byte (kv_dtype="int4")."""
    return INT4_MAX if packed else INT8_MAX


def pack_int4_rows(q, n_heads: int):
    """Pack int-valued rows (each in [-7, 7] — the int4 qmax range) two
    values per byte, ARITHMETICALLY: byte = 16*hi + lo, which stays inside
    int8 ([-119, 119]) because |lo|,|hi| <= 7.

    Packing is PER HEAD: for head h (width dh), byte c of the packed head
    block (width dh/2) holds feature h*dh+c as its lo value and feature
    h*dh+c+dh/2 as its hi value. Unpacking is a concat of the two value
    planes — no lane interleave, which Mosaic cannot express (pltpu.repeat
    tiles, it does not interleave; CLAUDE.md). The arithmetic encoding
    (vs bit-packing) lets the decode kernel recover the planes with THREE
    vector ops (convert, scale, round) and fold the lo-plane recovery into
    the query via q_a.lo + q_b.hi == q_a.byte + (q_b - 16 q_a).hi.

    q: [..., D] integer-valued float/int -> [..., D/2] int8.
    """
    d = q.shape[-1]
    dh = d // n_heads
    assert dh % 2 == 0
    qi = q.astype(jnp.int32)
    heads = qi.reshape(*q.shape[:-1], n_heads, dh)
    lo = heads[..., : dh // 2]
    hi = heads[..., dh // 2 :]
    packed = (16 * hi + lo).astype(jnp.int8)
    return packed.reshape(*q.shape[:-1], d // 2)


def unpack_int4(packed, n_heads: int):
    """Inverse of pack_int4_rows: [..., D/2] int8 -> [..., D] f32 with
    integer values in [-7, 7] (dequantize by multiplying the page scale).
    hi = round(byte/16) is exact: the lo remainder is at most 7/16 < 1/2."""
    dp = packed.shape[-1]
    dhp = dp // n_heads
    b = packed.astype(jnp.float32).reshape(*packed.shape[:-1], n_heads, dhp)
    hi = jnp.round(b * (1.0 / 16.0))
    lo = b - 16.0 * hi
    out = jnp.concatenate([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], 2 * dp)


def quantize_rows(x):
    """Per-row symmetric int8 quantization.

    x: [..., D] float -> (q int8 [..., D], scales f32 [...]).
    Zero rows get scale 0 (dequantizes to exact zeros).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = absmax / INT8_MAX
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def dequantize_rows(q, scales):
    """Inverse of quantize_rows. q: [..., D] int8; scales: [...] f32."""
    return q.astype(jnp.float32) * scales[..., None].astype(jnp.float32)


PAGE_SCALE_HEADROOM = 2.0


def update_page_scales(page_scales, rows, row_pid, absmax_reduce=None,
                       qmax=INT8_MAX):
    """(Re)set the scale of freshly-started pages from their row-0 write:
    scale = absmax(row) * PAGE_SCALE_HEADROOM / qmax (127 int8, 7 int4).

    rows: [N, D]; row_pid: [N] target page per row, OOB = no update. Valid
    row_pids must be unique within the call (each page has ONE row 0 —
    guaranteed by the write patterns: prefill strides by page_size, decode
    appends one row per slot to distinct pages).

    absmax_reduce: optional cross-device max over the [N] absmax vector —
    under tensor parallelism each rank sees only D/tp features, and a
    lax.pmax over the tp axis makes the scale the FULL-row absmax on every
    rank, keeping int8 token streams exactly equal to single-chip.
    """
    absmax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1)
    if absmax_reduce is not None:
        absmax = absmax_reduce(absmax)
    cand = absmax * (PAGE_SCALE_HEADROOM / qmax)
    return page_scales.at[row_pid].set(cand, mode="drop")


def quantize_rows_against_pages(values, flat_idx, page_scales, page_size,
                                qmax=INT8_MAX):
    """Quantize token rows against their page's (already-updated) scale.
    Rows exceeding the page scale clip — PAGE_SCALE_HEADROOM leaves room.
    values: [N, D]; flat_idx: [N] token index (page*P + row, OOB ok)."""
    n_pages = page_scales.shape[0]
    s_row = page_scales[jnp.clip(flat_idx // page_size, 0, n_pages - 1)]
    inv = jnp.where(s_row > 0, 1.0 / jnp.maximum(s_row, 1e-30), 0.0)
    vf = values.astype(jnp.float32)
    return jnp.clip(
        jnp.round(vf * inv[:, None]), -qmax, qmax
    ).astype(jnp.int8)


def quantize_tokens_per_page(values, flat_idx, page_scales, page_size, valid_pos):
    """Per-PAGE symmetric int8 quantization for paged-KV writes
    (BASELINE.json north star: "INT8 paged KV-cache, per-page scales").

    A page's scale is set exactly when its FIRST row (position % page_size
    == 0) is among the writes — prefill always writes pages from their row
    0, and a decode append hits row 0 only on a fresh page — so scales are
    assigned deterministically on-device with no host coordination, and
    stale scales from a page's previous occupant are overwritten.

    The scale comes from the ROW-0 absmax ONLY (times
    PAGE_SCALE_HEADROOM to leave room for later rows, which are clipped to
    the existing scale). Using the same rule in prefill and decode keeps
    recompute-on-preempt exact for the single-layer reference model: a
    preempted request's pages are re-quantized with the identical scales on
    re-admission. (Deeper stacks are inherently approximate under int8 +
    preemption: decode-time K/V is computed from quantized context while
    prefill recompute uses exact in-pass context.)

    values: [N, D]; flat_idx: [N] flat token slots (OOB = dropped rows);
    page_scales: [n_pages] f32; valid_pos: [N] the in-slot positions of the
    rows (only pos % page_size == 0 marks a fresh page).
    Returns (q int8 [N, D], new_page_scales [n_pages]).
    """
    n_pages = page_scales.shape[0]
    pid = flat_idx // page_size  # OOB rows map >= n_pages -> dropped
    fresh = (valid_pos % page_size == 0) & (flat_idx < n_pages * page_size)
    new_scales = update_page_scales(
        page_scales, values, jnp.where(fresh, pid, n_pages)
    )
    q = quantize_rows_against_pages(values, flat_idx, new_scales, page_size)
    return q, new_scales


def quantize_weight(w):
    """Weight-only int8: per-output-column symmetric scales.

    w: [D_in, D_out] -> (q int8 [D_in, D_out], scales f32 [D_out])."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = absmax / INT8_MAX
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(wf * inv[None, :]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def dequantize_weight(q, scales, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scales[None, :].astype(jnp.float32)).astype(dtype)


FP8_MAX = 448.0  # float8_e4m3fn


def quantize_weight_fp8(w):
    """Weight-only FP8 (e4m3) with per-output-column scales normalizing
    the column absmax to the fp8 range."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = absmax / FP8_MAX
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = (wf * inv[None, :]).astype(jnp.float8_e4m3fn)
    return q, scale


def quantize_params(params, mode: str = "int8"):
    """Convert every 2D weight in a params pytree to weight-only int8/fp8
    (stored as {"q": int8|fp8, "scale": f32} leaves); embeddings included —
    the tied LM head reads wte through the same dequant (north-star
    configs 4/5: INT8 / FP8 weight-only)."""
    assert mode in ("int8", "fp8")
    fn = quantize_weight if mode == "int8" else quantize_weight_fp8

    def conv(x):
        if isinstance(x, jax.Array) and x.ndim == 2:
            q, s = fn(x)
            return {"q": q, "scale": s}
        return x

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, jax.Array)
    )


def is_quantized_leaf(w) -> bool:
    return isinstance(w, dict) and "q" in w


def maybe_dequant(w, dtype):
    """Read a possibly weight-quantized leaf as a dense matrix (XLA fuses
    the convert+scale into the consuming matmul's operand read)."""
    if is_quantized_leaf(w):
        return dequantize_weight(w["q"], w["scale"], dtype)
    return w


def gather_rows(w, idx, dtype):
    """Row-gather from a possibly weight-quantized embedding table."""
    if is_quantized_leaf(w):
        rows = w["q"][idx].astype(jnp.float32) * w["scale"][None, :]
        return rows.astype(dtype)
    return w[idx]

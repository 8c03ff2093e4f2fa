"""Minimal hardware probe for ops/paged_attention_dgrid.py.

Runs the dense-grid Pallas partial against the dense-view XLA partial
(ops/paged_attention_dense.py — pure XLA, oracle-tested) on the SAME
inputs at bench-like shapes, on whatever backend jax selects (the axon
TPU under the tunnel). Fails fast on Mosaic rejections so the long bench
steps never start against a broken kernel. Loose tolerance: MXU matmuls
take bf16 operand passes for f32 arrays on TPU (CLAUDE.md)."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from min_llm_inference_tpu.ops.paged_attention_dense import (
    dense_paged_partial_bucketed,
)
from min_llm_inference_tpu.ops.paged_attention_dgrid import dgrid_paged_partial


def main():
    B, H, D, P, W = 64, 12, 768, 32, 4
    NP = B * W
    NG = NP // W
    rng = np.random.default_rng(11)

    pool = rng.integers(-127, 128, (NP, 2, P, D), dtype=np.int8)
    k_scales = (rng.random(NP) * 0.02 + 0.01).astype(np.float32)
    v_scales = (rng.random(NP) * 0.02 + 0.01).astype(np.float32)
    grps = rng.permutation(NG)[:B].astype(np.int32)
    table = grps[:, None] * W + np.arange(W, dtype=np.int32)[None, :]
    lengths = rng.integers(1, P * W, B).astype(np.int32)
    lengths[3] = 0  # dead slot
    rs = np.maximum(lengths - 1, 0).astype(np.int32)
    rs[7] = 0  # all-in-ring slot
    q = rng.standard_normal((B, D)).astype(np.float32)

    args = (
        jnp.asarray(q), jnp.asarray(pool), jnp.asarray(k_scales),
        jnp.asarray(v_scales), jnp.asarray(rs), jnp.asarray(lengths),
        jnp.asarray(table),
    )
    print("devices:", jax.devices(), flush=True)
    o_g, m_g, l_g = dgrid_paged_partial(*args, n_heads=H, page_size=P)
    o_d, m_d, l_d = dense_paged_partial_bucketed(*args, n_heads=H, page_size=P)
    o_g, o_d = np.asarray(o_g), np.asarray(o_d)
    m_g, m_d = np.asarray(m_g), np.asarray(m_d)
    l_g, l_d = np.asarray(l_g), np.asarray(l_d)

    live = (lengths > 0) & (rs > 0)
    err_o = np.max(np.abs(o_g[live] - o_d[live]))
    err_m = np.max(np.abs(m_g[live] - m_d[live]))
    rel_l = np.max(np.abs(l_g[live] - l_d[live]) / (np.abs(l_d[live]) + 1e-6))
    print(f"max|dO|={err_o:.5f} max|dM|={err_m:.5f} maxrel|dL|={rel_l:.5f}",
          flush=True)
    ok = err_o < 5e-2 and err_m < 5e-2 and rel_l < 5e-2
    print("PROBE", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Model parameters: init and pytree layout.

The reference uses random synthetic weights created on device per test
(tests/inferencer_test.cpp:21-36, src/kernels/rand_assign.cu) with an
embedding table biased so EOF_TOKEN_ID scores high — guaranteeing decodes
terminate (tests/test_utils.cpp:87-95 ``get_random_device_emb_table``).
Here: jax.random uniform weights, with the same EOF-bias knob for tests and
benchmarks.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig

Params = Dict[str, Any]


def init_params(
    key: jax.Array,
    cfg: ModelConfig,
    *,
    scale: float = 0.02,
    eof_bias: float = 0.0,
) -> Params:
    """Random parameters for the (possibly multi-layer) model.

    ``eof_bias`` > 0 additively boosts the EOF token's embedding so greedy
    decodes hit EOF sooner (mirrors eof_larger_ratio in the reference's
    get_random_device_emb_table): with weight tying, a larger EOF embedding
    row raises EOF logits.
    """
    cfg.validate()
    dtype = cfg.jax_dtype
    n_keys = 3 + 6 * cfg.n_layers
    keys = iter(jax.random.split(key, n_keys))

    def rand(k, shape):
        return (jax.random.uniform(k, shape, jnp.float32, -1.0, 1.0) * scale).astype(dtype)

    wte = rand(next(keys), (cfg.n_vocab, cfg.emb_dim))
    if eof_bias > 0.0:
        wte = wte.at[cfg.eof_token_id].add(jnp.asarray(eof_bias, dtype))
    wpe = rand(next(keys), (cfg.n_seq, cfg.emb_dim))

    layers = []
    for _ in range(cfg.n_layers):
        layer = {
            "wq": rand(next(keys), (cfg.emb_dim, cfg.emb_dim)),
            "wk": rand(next(keys), (cfg.emb_dim, cfg.emb_dim)),
            "wv": rand(next(keys), (cfg.emb_dim, cfg.emb_dim)),
        }
        if cfg.use_output_proj:
            layer["wo"] = rand(next(keys), (cfg.emb_dim, cfg.emb_dim))
        if cfg.ffn_dim > 0:
            layer["w_up"] = rand(next(keys), (cfg.emb_dim, cfg.ffn_dim))
            layer["w_down"] = rand(next(keys), (cfg.ffn_dim, cfg.emb_dim))
        if cfg.use_layernorm:
            layer["ln1_g"] = jnp.ones((cfg.emb_dim,), dtype)
            layer["ln2_g"] = jnp.ones((cfg.emb_dim,), dtype)
        layers.append(layer)

    return {"wte": wte, "wpe": wpe, "layers": layers}


def fuse_qkv_params(params: Params, tp: int = 1) -> Params:
    """Add fused projection weights per layer: wqkv = [wq|wk|wv] along the
    output dim (one MXU matmul instead of three in the decode round) and
    wkv = [wk|wv] (prefill). Works on plain and weight-quantized leaves
    (per-output-column scales concatenate). Returns a new params dict;
    originals kept (checkpointing/sharding use the unfused layout).

    tp > 1 interleaves the fused columns PER TENSOR-PARALLEL RANK —
    [q_r0|k_r0|v_r0 | q_r1|k_r1|v_r1 | ...] — so sharding the fused weight
    P(None, "tp") hands each rank a contiguous local [q_l|k_l|v_l] block
    that the shared model math splits by thirds of the local width.
    """
    import jax.numpy as jnp

    def cat(ws):
        def inter(arrs, axis):
            if tp == 1:
                return jnp.concatenate(arrs, axis=axis)
            blocks = []
            for r in range(tp):
                for a in arrs:
                    d = a.shape[axis] // tp
                    blocks.append(
                        jax.lax.slice_in_dim(a, r * d, (r + 1) * d, axis=axis)
                    )
            return jnp.concatenate(blocks, axis=axis)

        if isinstance(ws[0], dict):  # weight-quantized {"q","scale"}
            return {
                "q": inter([w["q"] for w in ws], 1),
                "scale": inter([w["scale"] for w in ws], 0),
            }
        return inter(ws, 1)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        nl["wqkv"] = cat([layer["wq"], layer["wk"], layer["wv"]])
        nl["wkv"] = cat([layer["wk"], layer["wv"]])
        out["layers"].append(nl)
    return out

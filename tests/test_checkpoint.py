"""Checkpoint tests: orbax save/load roundtrip (plain + weight-quantized
params) and the GPT-2 state-dict importer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from min_llm_inference_tpu import ModelConfig, init_params
from min_llm_inference_tpu.ops.quant import quantize_params
from min_llm_inference_tpu.utils.checkpoint import (
    import_gpt2_state_dict,
    load_params,
    save_params,
)

MODEL = ModelConfig(n_vocab=64, emb_dim=32, n_seq=32, n_layers=2, n_heads=4,
                    ffn_dim=64, use_output_proj=True, use_layernorm=True,
                    eof_token_id=63)


def _trees_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), MODEL)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, template=params)
    _trees_equal(params, restored)


def test_save_load_quantized(tmp_path):
    params = quantize_params(init_params(jax.random.PRNGKey(1), MODEL), "int8")
    path = str(tmp_path / "ckpt_q")
    save_params(path, params)
    restored = load_params(path, template=params)
    _trees_equal(params, restored)


def test_gpt2_import(rng):
    D, F, V, S = MODEL.emb_dim, MODEL.ffn_dim, MODEL.n_vocab, MODEL.n_seq
    state = {"wte.weight": rng.standard_normal((V, D)).astype(np.float32),
             "wpe.weight": rng.standard_normal((S, D)).astype(np.float32)}
    for i in range(MODEL.n_layers):
        state[f"h.{i}.attn.c_attn.weight"] = rng.standard_normal((D, 3 * D)).astype(np.float32)
        state[f"h.{i}.attn.c_proj.weight"] = rng.standard_normal((D, D)).astype(np.float32)
        state[f"h.{i}.mlp.c_fc.weight"] = rng.standard_normal((D, F)).astype(np.float32)
        state[f"h.{i}.mlp.c_proj.weight"] = rng.standard_normal((F, D)).astype(np.float32)
        state[f"h.{i}.ln_1.weight"] = np.ones(D, np.float32)
        state[f"h.{i}.ln_2.weight"] = np.ones(D, np.float32)

    params = import_gpt2_state_dict(state, MODEL, dtype=jnp.float32)
    assert params["wte"].shape == (V, D)
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["wk"]),
        state["h.0.attn.c_attn.weight"][:, D : 2 * D],
    )
    # imported params must drive the model end-to-end
    from min_llm_inference_tpu import EngineConfig, ItemStorage, PagedEngine, Request

    cfg = EngineConfig(n_slots=4, page_size=8, n_pages=16, max_prefill_batch=2)
    store = ItemStorage()
    store.add_new_item(Request(0, [3, 5, 7]))
    PagedEngine(params, MODEL, cfg).run(store)
    assert len(store.finished) == 1

"""Weight checkpointing via orbax.

The reference has no serialization at all (weights are random at startup,
tests/inferencer_test.cpp:21-36; SURVEY.md §5 "Checkpoint/resume: None").
A real serving framework needs a weight-loading story: save/load a params
pytree (plain or weight-quantized) with orbax, plus a helper to import a
HuggingFace-style GPT-2 state dict into the multi-layer model layout.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_params(path: str, params) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, params)


def load_params(path: str, template: Optional[Any] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        if template is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            return ckpt.restore(path, abstract)
        return ckpt.restore(path)


def import_gpt2_state_dict(state: dict, cfg, dtype=None):
    """Map a HuggingFace GPT-2-style state dict (numpy arrays) onto this
    framework's params layout (ModelConfig with use_output_proj=True,
    ffn_dim>0, use_layernorm=True). Expected keys per layer i:
      h.{i}.attn.c_attn.weight [D, 3D], h.{i}.attn.c_proj.weight [D, D],
      h.{i}.mlp.c_fc.weight [D, F], h.{i}.mlp.c_proj.weight [F, D],
      h.{i}.ln_1.weight [D], h.{i}.ln_2.weight [D]
    plus wte.weight [V, D], wpe.weight [S, D].
    Biases are not part of this model family and are ignored.
    """
    import jax.numpy as jnp

    dt = jnp.dtype(dtype or cfg.jax_dtype)
    D = cfg.emb_dim

    def arr(key):
        return jnp.asarray(np.asarray(state[key]), dt)

    layers = []
    for i in range(cfg.n_layers):
        c_attn = arr(f"h.{i}.attn.c_attn.weight")  # [D, 3D]
        layer = {
            "wq": c_attn[:, :D],
            "wk": c_attn[:, D : 2 * D],
            "wv": c_attn[:, 2 * D :],
            "wo": arr(f"h.{i}.attn.c_proj.weight"),
            "w_up": arr(f"h.{i}.mlp.c_fc.weight"),
            "w_down": arr(f"h.{i}.mlp.c_proj.weight"),
            "ln1_g": arr(f"h.{i}.ln_1.weight"),
            "ln2_g": arr(f"h.{i}.ln_2.weight"),
        }
        layers.append(layer)
    return {
        "wte": arr("wte.weight")[: cfg.n_vocab],
        "wpe": arr("wpe.weight")[: cfg.n_seq],
        "layers": layers,
    }

"""Multi-chip SPMD engine step: dp x tp sharding via shard_map over a Mesh.

The reference is single-GPU ("How to use multi-gpus" is an unimplemented
TODO, /root/reference/README.md:84-86); this module is the TPU-native
scale-out design, expressed with XLA collectives over ICI rather than NCCL:

  * mesh axes ("dp", "tp");
  * dp shards batch slots AND the KV page pool: each dp group is an
    independent continuous-batching domain (its own page ids, admission,
    preemption) — no cross-dp communication in the step;
  * tp shards attention heads (Megatron-style): wq/wk/wv column-parallel
    (each rank owns n_heads/tp full heads), wo row-parallel (psum),
    FFN up column- / down row-parallel (psum), embeddings + tied LM head
    feature-sharded (embedding all-gather, logits psum);
  * KV pages are [n_pages_local, page_size, D/tp]: the attention DMA
    bandwidth — the decode bottleneck — scales with both dp and tp;
  * scheduler arrays (lengths, last tokens, page table) are replicated
    over tp and sharded over dp; every tp rank computes identical argmax
    decisions (deterministic), so host scheduler state never diverges.

Requires n_heads % tp == 0 and use_output_proj=True (head-sharded
attention needs the output projection to map local heads back to the
full residual stream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import EngineConfig, ModelConfig
from ..models.model import _maybe_layernorm
from ..ops.reference import greedy_next_token, masked_softmax

shard_map = jax.shard_map


def make_mesh(n_devices: int, tp: int) -> Mesh:
    assert n_devices % tp == 0
    dp = n_devices // tp
    devices = np.asarray(jax.devices()[:n_devices]).reshape(dp, tp)
    return Mesh(devices, ("dp", "tp"))


PARAM_SPECS = {
    "wte": P(None, "tp"),
    "wpe": P(None, "tp"),
    "wq": P(None, "tp"),
    "wk": P(None, "tp"),
    "wv": P(None, "tp"),
    "wo": P("tp", None),
    "w_up": P(None, "tp"),
    "w_down": P("tp", None),
    "ln1_g": P(),
    "ln2_g": P(),
}

KV_SPEC = P("dp", None, "tp")  # [n_pages, page_size, D]
SLOT_SPEC = P("dp")            # [n_slots]
TABLE_SPEC = P("dp", None)     # [n_slots, W]
RESULT_SPEC = P("dp", None)    # [n_slots, n_rounds]


def _leaf_name(path_entry) -> str:
    return path_entry.key if hasattr(path_entry, "key") else str(path_entry)


def param_pspecs(params):
    """PartitionSpec pytree matching a params pytree, by leaf name."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: PARAM_SPECS[_leaf_name(path[-1])], params
    )


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        param_pspecs(params),
    )


class ShardedPagedState(NamedTuple):
    # tuples of per-layer global arrays [n_pages, page_size, D], each
    # sharded ("dp", None, "tp")
    k_pages: Tuple[jax.Array, ...]
    v_pages: Tuple[jax.Array, ...]


def init_sharded_state(
    model_cfg: ModelConfig, engine_cfg: EngineConfig, mesh: Mesh
) -> ShardedPagedState:
    shape = (engine_cfg.n_pages, engine_cfg.page_size, model_cfg.emb_dim)
    dtype = engine_cfg.kv_jax_dtype
    sharding = NamedSharding(mesh, KV_SPEC)
    mk = lambda: jax.device_put(jnp.zeros(shape, dtype), sharding)
    return ShardedPagedState(
        tuple(mk() for _ in range(model_cfg.n_layers)),
        tuple(mk() for _ in range(model_cfg.n_layers)),
    )


# ---- per-rank (local-shard) compute -------------------------------------


def _flat_scatter_indices(page_rows, positions, valid, page_size, n_pages_local):
    page = jnp.take_along_axis(
        page_rows, (positions // page_size)[..., None], axis=-1
    )[..., 0]
    flat = page * page_size + positions % page_size
    return jnp.where(valid, flat, n_pages_local * page_size)


def _scatter_tokens(pool, flat_idx, values):
    n_pages, P_, D = pool.shape
    flat = pool.reshape(n_pages * P_, D)
    flat = flat.at[flat_idx].set(values.astype(pool.dtype), mode="drop")
    return flat.reshape(n_pages, P_, D)


def _gather_context(pool, page_table, page_size):
    n_pages, P_, D = pool.shape
    B, W = page_table.shape
    flat = pool.reshape(n_pages * P_, D)
    idx = page_table[:, :, None] * P_ + jnp.arange(P_, dtype=page_table.dtype)[None, None, :]
    return flat[jnp.clip(idx.reshape(B, W * P_), 0, n_pages * P_ - 1)]


def _local_masked_attention(q, kctx, vctx, lengths, n_heads_local):
    """Attention over this rank's local heads (packed in D/tp)."""
    B, L, Dl = kctx.shape
    dh = Dl // n_heads_local
    qh = q.reshape(B, n_heads_local, dh).astype(jnp.float32)
    kh = kctx.reshape(B, L, n_heads_local, dh).astype(jnp.float32)
    vh = vctx.reshape(B, L, n_heads_local, dh).astype(jnp.float32)
    scores = jnp.einsum("bhd,blhd->bhl", qh, kh) * (1.0 / jnp.sqrt(dh))
    mask = jnp.arange(L)[None, None, :] < lengths[:, None, None]
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhl,blhd->bhd", probs, vh)
    return out.reshape(B, Dl).astype(q.dtype)


def _local_causal_attention(q, k, v, lengths, n_heads_local):
    B, S, Dl = q.shape
    dh = Dl // n_heads_local
    qh = q.reshape(B, S, n_heads_local, dh).astype(jnp.float32)
    kh = k.reshape(B, S, n_heads_local, dh).astype(jnp.float32)
    vh = v.reshape(B, S, n_heads_local, dh).astype(jnp.float32)
    scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) * (1.0 / jnp.sqrt(dh))
    row = jnp.arange(S)[None, None, :, None]
    col = jnp.arange(S)[None, None, None, :]
    mask = (col <= row) & (col < lengths[:, None, None, None])
    probs = masked_softmax(scores, mask)
    out = jnp.einsum("bhij,bjhd->bihd", probs, vh)
    return out.reshape(B, S, Dl).astype(q.dtype)


def _dot(x, w):
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _embed_gathered(params, tokens, positions):
    """Feature-sharded embedding gather + tp all-gather -> replicated h."""
    wte_l, wpe_l = params["wte"], params["wpe"]
    safe_t = jnp.clip(tokens, 0, wte_l.shape[0] - 1)
    safe_p = jnp.clip(positions, 0, wpe_l.shape[0] - 1)
    emb_l = wte_l[safe_t] + wpe_l[safe_p]
    return lax.all_gather(emb_l, "tp", axis=emb_l.ndim - 1, tiled=True)


def _tied_logits_psum(h, wte_l):
    """Row-parallel tied LM head: slice h to this rank's features, partial
    matmul, psum over tp -> replicated logits."""
    tp_idx = lax.axis_index("tp")
    d_local = wte_l.shape[1]
    h_l = lax.dynamic_slice_in_dim(h, tp_idx * d_local, d_local, axis=-1)
    partial = jnp.dot(
        h_l.astype(jnp.float32), wte_l.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    return lax.psum(partial, "tp")


def _block_tail(layer, cfg: ModelConfig, h, attn_l):
    """Residual tail of a transformer block: row-parallel wo psum + FFN."""
    attn = lax.psum(
        jnp.dot(attn_l, layer["wo"].astype(h.dtype), preferred_element_type=jnp.float32),
        "tp",
    ).astype(h.dtype)
    h = h + attn
    if cfg.ffn_dim > 0:
        x2 = _maybe_layernorm(h, layer.get("ln2_g"), cfg) if cfg.use_layernorm else h
        up = jax.nn.gelu(
            jnp.dot(x2, layer["w_up"].astype(h.dtype), preferred_element_type=jnp.float32)
        ).astype(h.dtype)
        down = lax.psum(
            jnp.dot(up, layer["w_down"].astype(h.dtype), preferred_element_type=jnp.float32),
            "tp",
        ).astype(h.dtype)
        h = h + down
    return h


def _decode_rounds_local(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    tp: int,
    params,
    k_pages,
    v_pages,
    page_table,
    lengths,
    last_tokens,
):
    P_ = engine_cfg.page_size
    n_pages_local = k_pages[0].shape[0]
    n_heads_local = model_cfg.n_heads // tp

    def round_fn(carry, _):
        k_pages, v_pages, lengths, last = carry
        k_pages, v_pages = list(k_pages), list(v_pages)
        live = lengths > 0
        pos = jnp.maximum(lengths - 1, 0)
        flat_idx = _flat_scatter_indices(page_table, pos, live, P_, n_pages_local)
        h = _embed_gathered(params, last, pos)

        for li, layer in enumerate(params["layers"]):
            x = _maybe_layernorm(h, layer.get("ln1_g"), model_cfg) if model_cfg.use_layernorm else h
            q, k, v = _dot(x, layer["wq"]), _dot(x, layer["wk"]), _dot(x, layer["wv"])
            k_pages[li] = _scatter_tokens(k_pages[li], flat_idx, k)
            v_pages[li] = _scatter_tokens(v_pages[li], flat_idx, v)
            kctx = _gather_context(k_pages[li], page_table, P_)
            vctx = _gather_context(v_pages[li], page_table, P_)
            attn_l = _local_masked_attention(q, kctx, vctx, lengths, n_heads_local)
            h = _block_tail(layer, model_cfg, h, attn_l)

        logits = _tied_logits_psum(h, params["wte"])
        tok, new_lengths = greedy_next_token(
            logits, lengths, model_cfg.n_seq, model_cfg.eof_token_id
        )
        new_last = jnp.where(live, tok, last)
        return (tuple(k_pages), tuple(v_pages), new_lengths, new_last), tok

    (kps, vps, lengths, last), toks = lax.scan(
        round_fn, (tuple(k_pages), tuple(v_pages), lengths, last_tokens), None,
        length=engine_cfg.n_forward_rounds,
    )
    return kps, vps, lengths, last, toks.T


def _prefill_local(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    tp: int,
    params,
    k_pages,
    v_pages,
    prompts,
    prompt_lengths,
    page_rows,
):
    P_ = engine_cfg.page_size
    n_pages_local = k_pages[0].shape[0]
    n_heads_local = model_cfg.n_heads // tp
    M, S = prompts.shape
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (M, S))
    valid = positions < prompt_lengths[:, None]
    rows3 = jnp.broadcast_to(page_rows[:, None, :], (M, S, page_rows.shape[1]))
    flat_idx = _flat_scatter_indices(rows3, positions, valid, P_, n_pages_local).reshape(-1)

    h = _embed_gathered(params, prompts, positions)
    k_pages, v_pages = list(k_pages), list(v_pages)
    n_layers = len(params["layers"])
    for li, layer in enumerate(params["layers"]):
        x = _maybe_layernorm(h, layer.get("ln1_g"), model_cfg) if model_cfg.use_layernorm else h
        k, v = _dot(x, layer["wk"]), _dot(x, layer["wv"])
        Dl = k.shape[-1]
        k_pages[li] = _scatter_tokens(k_pages[li], flat_idx, k.reshape(-1, Dl))
        v_pages[li] = _scatter_tokens(v_pages[li], flat_idx, v.reshape(-1, Dl))
        if li + 1 < n_layers:
            q = _dot(x, layer["wq"])
            attn_l = _local_causal_attention(q, k, v, prompt_lengths, n_heads_local)
            h = _block_tail(layer, model_cfg, h, attn_l)
    return tuple(k_pages), tuple(v_pages)


# ---- jitted shard_map'ped entry points ----------------------------------


@functools.lru_cache(maxsize=None)
def make_sharded_fns(model_cfg: ModelConfig, engine_cfg: EngineConfig, mesh: Mesh):
    """Build jitted (prefill, decode_rounds) shard_map'ped over the mesh."""
    assert model_cfg.use_output_proj, "sharded path needs wo (row-parallel)"
    tp = mesh.shape["tp"]
    assert model_cfg.n_heads % tp == 0, "n_heads must divide by tp"
    nl = model_cfg.n_layers
    kv_specs = tuple(KV_SPEC for _ in range(nl))

    def decode_wrapper(params, k_pages, v_pages, page_table, lengths, last_tokens):
        inner = shard_map(
            functools.partial(_decode_rounds_local, model_cfg, engine_cfg, tp),
            mesh=mesh,
            in_specs=(
                param_pspecs(params), kv_specs, kv_specs,
                TABLE_SPEC, SLOT_SPEC, SLOT_SPEC,
            ),
            out_specs=(kv_specs, kv_specs, SLOT_SPEC, SLOT_SPEC, RESULT_SPEC),
            check_vma=False,
        )
        return inner(params, k_pages, v_pages, page_table, lengths, last_tokens)

    def prefill_wrapper(params, k_pages, v_pages, prompts, prompt_lengths, page_rows):
        inner = shard_map(
            functools.partial(_prefill_local, model_cfg, engine_cfg, tp),
            mesh=mesh,
            in_specs=(
                param_pspecs(params), kv_specs, kv_specs,
                P("dp", None), SLOT_SPEC, TABLE_SPEC,
            ),
            out_specs=(kv_specs, kv_specs),
            check_vma=False,
        )
        return inner(params, k_pages, v_pages, prompts, prompt_lengths, page_rows)

    prefill = jax.jit(prefill_wrapper, donate_argnums=(1, 2))
    decode = jax.jit(decode_wrapper, donate_argnums=(1, 2))
    return prefill, decode

"""Multi-chip SPMD engine step: dp x tp sharding via shard_map over a Mesh.

The reference is single-GPU ("How to use multi-gpus" is an unimplemented
TODO, /root/reference/README.md:84-86); this module is the TPU-native
scale-out design, expressed with XLA collectives over ICI rather than NCCL:

  * mesh axes ("dp", "tp");
  * dp shards batch slots AND the KV page pool: each dp group is an
    independent continuous-batching domain (its own page ids, admission,
    preemption) — no cross-dp communication in the step;
  * tp shards attention heads (Megatron-style): wqkv/wq/wk/wv
    column-parallel (each rank owns n_heads/tp full heads), wo row-parallel
    (psum), FFN up column- / down row-parallel (psum), embeddings + tied LM
    head feature-sharded (embedding all-gather, logits psum);
  * KV pages are [n_pages_local, 2, page_size, D/tp]: the attention DMA
    bandwidth — the decode bottleneck — scales with both dp and tp;
  * int8 per-page scales are the FULL-row absmax (lax.pmax over tp at
    write time), so quantized token streams are exactly equal to
    single-chip int8;
  * scheduler arrays (lengths, last tokens, page table) are replicated
    over tp and sharded over dp; every tp rank computes identical argmax
    decisions (deterministic), so host scheduler state never diverges.

There is NO sharded fork of the model math: the local body of every
shard_map is models/paged.py::_prefill/_decode_rounds — the exact
single-chip functions — run at local shapes with a TpShardCtx supplying
the four tp seams (embed gather, psum, pmax, local head count). Every
single-chip improvement (fused wqkv, int8 KV, the Pallas kernels) is
therefore available on the mesh by construction.

Requires n_heads % tp == 0 and use_output_proj=True (head-sharded
attention needs the output projection to map local heads back to the
full residual stream).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import EngineConfig, ModelConfig
from ..models.paged import PagedKVState, _decode_rounds, _prefill
from ..ops.quant import is_quantized_leaf
from ..ops.reference import tied_logits, token_pos_embed

shard_map = jax.shard_map


def make_mesh(n_devices: int, tp: int) -> Mesh:
    assert n_devices % tp == 0
    dp = n_devices // tp
    devices = np.asarray(jax.devices()[:n_devices]).reshape(dp, tp)
    return Mesh(devices, ("dp", "tp"))


class TpShardCtx:
    """models/model.py::SingleChipCtx overridden at the four tp seams.
    Instances are baked into jitted partials (static), never traced."""

    def __init__(self, tp: int, axis: str = "tp"):
        self.tp = tp
        self.axis = axis

    def psum(self, x):
        return lax.psum(x, self.axis)

    def pmax(self, x):
        return lax.pmax(x, self.axis)

    def embed(self, params, tokens, positions):
        if self.tp == 1:
            return token_pos_embed(
                tokens, positions, params["wte"], params["wpe"]
            )
        # feature-sharded tables: local gather + tp all-gather -> replicated
        wte_l, wpe_l = params["wte"], params["wpe"]
        safe_t = jnp.clip(tokens, 0, wte_l.shape[0] - 1)
        safe_p = jnp.clip(positions, 0, wpe_l.shape[0] - 1)
        emb_l = wte_l[safe_t] + wpe_l[safe_p]
        return lax.all_gather(emb_l, self.axis, axis=emb_l.ndim - 1, tiled=True)

    def logits(self, h, wte_l):
        if self.tp == 1:
            return tied_logits(h, wte_l)
        # row-parallel tied LM head: slice h to this rank's features,
        # partial matmul, psum over tp -> replicated logits
        tp_idx = lax.axis_index(self.axis)
        d_local = wte_l.shape[1]
        h_l = lax.dynamic_slice_in_dim(h, tp_idx * d_local, d_local, axis=-1)
        partial = jnp.dot(
            h_l.astype(jnp.float32), wte_l.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
        return lax.psum(partial, self.axis)

    def local_heads(self, cfg: ModelConfig) -> int:
        assert cfg.n_heads % self.tp == 0
        return cfg.n_heads // self.tp


PARAM_SPECS = {
    "wte": P(None, "tp"),
    "wpe": P(None, "tp"),
    "wq": P(None, "tp"),
    "wk": P(None, "tp"),
    "wv": P(None, "tp"),
    "wqkv": P(None, "tp"),  # per-rank interleaved (fuse_qkv_params(tp=...))
    "wkv": P(None, "tp"),
    "wo": P("tp", None),
    "w_up": P(None, "tp"),
    "w_down": P("tp", None),
    "ln1_g": P(),
    "ln2_g": P(),
}

KV_SPEC = P("dp", None, None, "tp")  # [n_pages, 2, page_size, D]
SCALE_SPEC = P("dp")                 # [n_pages] (replicated over tp via pmax)
SLOT_SPEC = P("dp")                  # [n_slots]
TABLE_SPEC = P("dp", None)           # [n_slots, W] / packed operand
RESULT_SPEC = P("dp", None)          # [n_slots, n_rounds]


def _leaf_name(path_entry) -> str:
    return path_entry.key if hasattr(path_entry, "key") else str(path_entry)


def param_pspecs(params):
    """PartitionSpec pytree matching a params pytree, by leaf name."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: PARAM_SPECS[_leaf_name(path[-1])], params
    )


def shard_params(params, mesh: Mesh):
    flat, _ = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: is_quantized_leaf(x)
    )
    assert not any(is_quantized_leaf(x) for x in flat), (
        "weight-quantized params are a single-chip feature for now"
    )
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        param_pspecs(params),
    )


def state_pspecs(model_cfg: ModelConfig, quantized: bool):
    nl = model_cfg.n_layers
    if quantized:
        return PagedKVState(
            tuple(KV_SPEC for _ in range(nl)),
            tuple(SCALE_SPEC for _ in range(nl)),
            tuple(SCALE_SPEC for _ in range(nl)),
        )
    return PagedKVState(
        tuple(KV_SPEC for _ in range(nl)),
        (None,) * nl,
        (None,) * nl,
    )


def init_sharded_state(
    model_cfg: ModelConfig, engine_cfg: EngineConfig, mesh: Mesh
) -> PagedKVState:
    feat = model_cfg.emb_dim // 2 if engine_cfg.kv_packed else model_cfg.emb_dim
    shape = (engine_cfg.n_pages, 2, engine_cfg.page_size, feat)
    dtype = engine_cfg.kv_jax_dtype
    nl = model_cfg.n_layers
    kv_sharding = NamedSharding(mesh, KV_SPEC)
    kv = tuple(
        jax.device_put(jnp.zeros(shape, dtype), kv_sharding)
        for _ in range(nl)
    )
    if engine_cfg.kv_quantized:
        s_sharding = NamedSharding(mesh, SCALE_SPEC)
        mk = lambda: jax.device_put(
            jnp.zeros((engine_cfg.n_pages,), jnp.float32), s_sharding
        )
        return PagedKVState(
            kv, tuple(mk() for _ in range(nl)), tuple(mk() for _ in range(nl))
        )
    return PagedKVState(kv, (None,) * nl, (None,) * nl)


@functools.lru_cache(maxsize=None)
def make_sharded_fns(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    mesh: Mesh,
    attention_impl: str = "jnp",
):
    """Jitted (prefill, decode_rounds) shard_map'ped over the mesh; the
    local bodies ARE the single-chip paged functions at local shapes."""
    assert model_cfg.use_output_proj, "sharded path needs wo (row-parallel)"
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    assert model_cfg.n_heads % tp == 0, "n_heads must divide by tp"
    assert engine_cfg.n_slots % dp == 0 and engine_cfg.n_pages % dp == 0
    local_cfg = dataclasses.replace(
        engine_cfg,
        n_slots=engine_cfg.n_slots // dp,
        n_pages=engine_cfg.n_pages // dp,
    )
    ctx = TpShardCtx(tp)
    quantized = engine_cfg.kv_quantized
    st_specs = state_pspecs(model_cfg, quantized)

    def decode_wrapper(params, state, sched_packed, lengths, last_tokens):
        inner = shard_map(
            functools.partial(
                _decode_rounds, model_cfg, local_cfg, attention_impl, ctx=ctx
            ),
            mesh=mesh,
            in_specs=(
                param_pspecs(params), st_specs,
                TABLE_SPEC, SLOT_SPEC, SLOT_SPEC,
            ),
            out_specs=(st_specs, SLOT_SPEC, SLOT_SPEC, RESULT_SPEC),
            check_vma=False,
        )
        return inner(params, state, sched_packed, lengths, last_tokens)

    def prefill_wrapper(params, state, prompts, prompt_lengths, page_rows):
        inner = shard_map(
            functools.partial(_prefill, model_cfg, local_cfg, ctx=ctx),
            mesh=mesh,
            in_specs=(
                param_pspecs(params), st_specs,
                P("dp", None), SLOT_SPEC, TABLE_SPEC,
            ),
            out_specs=st_specs,
            check_vma=False,
        )
        return inner(params, state, prompts, prompt_lengths, page_rows)

    prefill = jax.jit(prefill_wrapper, donate_argnums=(1,))
    decode = jax.jit(decode_wrapper, donate_argnums=(1,))
    return prefill, decode

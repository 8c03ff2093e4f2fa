"""Multi-chip continuous-batching engine over a dp x tp mesh.

Drives parallel/sharded.py's shard_map step functions with HOST-side
scheduling per dp group: each group is an independent continuous-batching
domain (its own slots, page pool with LOCAL page ids, admission, growth,
preemption) — the design SURVEY §2 calls "multi-host request sharding".
Scheduler state is tiny and host-resident; tp ranks receive replicated
copies and compute identical greedy decisions, so nothing diverges.

On real hardware this runs over ICI/DCN; in tests it runs on the virtual
CPU mesh (the standard JAX validation path for slice code). Engine-level
outputs are token-identical to the single-chip PagedEngine.
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..metrics import get_global_throughput_counter
from ..runtime.item_storage import (
    ItemStorage,
    ProcessingStorage,
    is_done,
    process_decoder_result,
)
from ..runtime.paged_scheduler import (
    PagePool,
    PageTable,
    allocate_or_free_pages,
    insert_new_items_paged,
)
from .sharded import (
    init_sharded_state,
    make_mesh,
    make_sharded_fns,
    shard_params,
)


class ShardedPagedEngine:
    """Continuous batching over an n-device dp x tp mesh.

    Requires: model with use_output_proj and n_heads % tp == 0;
    n_slots % dp == 0; n_pages % dp == 0. Weights are sharded on entry
    (shard_params); KV pools are device-resident and sharded
    ("dp", None, "tp").
    """

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        n_devices: int | None = None,
        tp: int = 1,
    ):
        model_cfg.validate()
        engine_cfg.validate(model_cfg)
        n_devices = n_devices or len(jax.devices())
        assert n_devices % tp == 0
        self.dp = n_devices // tp
        self.tp = tp
        assert engine_cfg.n_slots % self.dp == 0
        assert engine_cfg.n_pages % self.dp == 0
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        self.mesh = make_mesh(n_devices, tp)
        self.params = shard_params(params, self.mesh)
        self._prefill, self._decode = make_sharded_fns(
            model_cfg, engine_cfg, self.mesh
        )
        self.state = init_sharded_state(model_cfg, engine_cfg, self.mesh)

        B, S = engine_cfg.n_slots, model_cfg.n_seq
        W = engine_cfg.pages_per_slot(S)
        self.W = W
        self.B_loc = B // self.dp
        self.NP_loc = engine_cfg.n_pages // self.dp
        self.prompts = np.zeros((B, S), dtype=np.int32)
        self.lengths = np.zeros(B, dtype=np.int32)
        self.last_tokens = np.zeros(B, dtype=np.int32)
        # per-dp-group schedulers over LOCAL page ids
        self.pools = [PagePool(self.NP_loc) for _ in range(self.dp)]
        self.tables = [PageTable(self.B_loc, W) for _ in range(self.dp)]

    # -- per-group views ---------------------------------------------------
    def _group_slice(self, g):
        return slice(g * self.B_loc, (g + 1) * self.B_loc)

    def _insert_all(self, item_storage, processings) -> List[int]:
        """Admission round-robin over dp groups; returns global slot ids."""
        new_global: List[int] = []
        for g in range(self.dp):
            sl = self._group_slice(g)
            new_local = insert_new_items_paged(
                self.prompts[sl], self.lengths[sl], self.last_tokens[sl],
                item_storage, processings[g], self.pools[g], self.tables[g],
                self.engine_cfg.n_forward_rounds, self.engine_cfg.page_size,
                self.engine_cfg.init_num_pages,
            )
            new_global.extend(g * self.B_loc + s for s in new_local)
        return new_global

    def _global_table(self) -> np.ndarray:
        return np.concatenate([t.table for t in self.tables], axis=0)

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        processings = [ProcessingStorage() for _ in range(self.dp)]
        new_slots = self._insert_all(item_storage, processings)
        counter.start_record()
        while any(p.size() for p in processings) or item_storage.new_count():
            if new_slots:
                self.state = self._run_prefill(new_slots)
            kps, vps, lengths_dev, last_dev, results_dev = self._decode(
                self.params, self.state.k_pages, self.state.v_pages,
                jnp.asarray(self._global_table()),
                jnp.asarray(self.lengths), jnp.asarray(self.last_tokens),
            )
            self.state = type(self.state)(kps, vps)
            self.lengths = np.array(lengths_dev)
            self.last_tokens = np.array(last_dev)
            results = np.asarray(results_dev)
            new_slots = []
            for g in range(self.dp):
                sl = self._group_slice(g)
                finished_local = process_decoder_result(
                    results[sl], item_storage, processings[g],
                    self.model_cfg.n_seq, self.model_cfg.eof_token_id,
                )
                preempted = allocate_or_free_pages(
                    self.tables[g], self.pools[g], processings[g],
                    item_storage, finished_local,
                    self.engine_cfg.n_forward_rounds,
                    self.engine_cfg.page_size,
                )
                for s in preempted:
                    self.lengths[g * self.B_loc + s] = 0
                new_local = insert_new_items_paged(
                    self.prompts[sl], self.lengths[sl], self.last_tokens[sl],
                    item_storage, processings[g], self.pools[g],
                    self.tables[g], self.engine_cfg.n_forward_rounds,
                    self.engine_cfg.page_size, self.engine_cfg.init_num_pages,
                )
                new_slots.extend(g * self.B_loc + s for s in new_local)
        counter.stop_record()

    def _run_prefill(self, new_slots: List[int]):
        """Sharded prefill: the compact [M, S] block is dp-sharded, so each
        group's chunk rows must sit in that group's shard rows. Pad to a
        fixed per-group width for static shapes."""
        M_loc = self.engine_cfg.max_prefill_batch
        S = self.model_cfg.n_seq
        per_group: List[List[int]] = [[] for _ in range(self.dp)]
        for slot in new_slots:
            per_group[slot // self.B_loc].append(slot)
        n_chunks = max(
            (len(v) + M_loc - 1) // M_loc for v in per_group
        ) if new_slots else 0
        state = self.state
        for c in range(n_chunks):
            prompts = np.zeros((self.dp * M_loc, S), np.int32)
            plens = np.zeros(self.dp * M_loc, np.int32)
            rows = np.zeros((self.dp * M_loc, self.W), np.int32)
            for g in range(self.dp):
                chunk = per_group[g][c * M_loc : (c + 1) * M_loc]
                for j, slot in enumerate(chunk):
                    prompts[g * M_loc + j] = self.prompts[slot]
                    plens[g * M_loc + j] = self.lengths[slot]
                    rows[g * M_loc + j] = self.tables[g].table[slot % self.B_loc]
            kps, vps = self._prefill(
                self.params, state.k_pages, state.v_pages,
                jnp.asarray(prompts), jnp.asarray(plens), jnp.asarray(rows),
            )
            state = type(state)(kps, vps)
        return state

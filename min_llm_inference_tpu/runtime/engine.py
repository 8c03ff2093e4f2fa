"""Continuous-batching engine loops.

TPU-native analogue of the reference's L5 inferencer
(src/inferencer.cpp:11-133). Same 4-phase host loop per iteration —
forward / process results / (paged) page realloc / insert — but the whole
per-step device pipeline is ONE jitted call (prefill is a second, separate
jitted call that runs only when new slots were admitted, so steady-state
decode never pays prefill FLOPs). Per iteration only small int arrays cross
the host<->device boundary: decode results + lengths + last tokens D2H, and
staged lengths/last/page-table (+ compact prompts on insert) H2D — the
analogue of the reference's per-iteration staging copies
(item_storage.cpp:106,175-177) with the KV pool living entirely on device.

Backends (mirroring the reference's three engine entry points,
include/inferencer.h:18-32):
  * DenseEngine                          <- start_inference_engine
  * PagedEngine(attention_impl='jnp')    <- start_paged_attention_inference_engine
  * PagedEngine(attention_impl='pallas') <- start_paged_attention_cublas_...
    (the optimized-kernel backend)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..metrics import get_global_throughput_counter
from ..models.dense import init_dense_state, make_dense_fns
from ..models.paged import init_paged_state, make_paged_fns
from .item_storage import (
    ItemStorage,
    ProcessingStorage,
    insert_new_items_dense,
    is_done,
    process_decoder_result,
)
from .paged_scheduler import (
    PagePool,
    PageTable,
    allocate_or_free_pages,
    insert_new_items_paged,
)


class _EngineBase:
    def __init__(self, params, model_cfg: ModelConfig, engine_cfg: EngineConfig):
        model_cfg.validate()
        engine_cfg.validate(model_cfg)
        self.params = params
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        B, S = engine_cfg.n_slots, model_cfg.n_seq
        self.prompts = np.zeros((B, S), dtype=np.int32)
        self.lengths = np.zeros(B, dtype=np.int32)
        self.last_tokens = np.zeros(B, dtype=np.int32)

    def _pull(self, lengths_dev, last_dev, results_dev) -> np.ndarray:
        """D2H sync point of the loop (reference item_storage.cpp:106)."""
        # copies: jax arrays expose read-only buffers, and the scheduler
        # mutates these staging arrays in place
        self.lengths = np.array(lengths_dev)
        self.last_tokens = np.array(last_dev)
        return np.asarray(results_dev)

    def _run_prefill(self, new_slots: List[int]) -> None:
        """Compact prefill over the newly admitted slots, in fixed-size
        buckets of max_prefill_batch (static jit shapes); the analogue of
        the reference prefill kernels gridding only over new items."""
        M = self.engine_cfg.max_prefill_batch
        S = self.model_cfg.n_seq
        for i in range(0, len(new_slots), M):
            chunk = new_slots[i : i + M]
            prompts = np.zeros((M, S), dtype=np.int32)
            plens = np.zeros(M, dtype=np.int32)
            for j, slot in enumerate(chunk):
                prompts[j] = self.prompts[slot]
                plens[j] = self.lengths[slot]
            self.state = self._prefill(
                self.params, self.state, prompts, plens,
                self._prefill_slot_arg(chunk, M),
            )


class DenseEngine(_EngineBase):
    """Contiguous-KV continuous batching (reference src/inferencer.cpp:11-41)."""

    def __init__(self, params, model_cfg: ModelConfig, engine_cfg: EngineConfig):
        super().__init__(params, model_cfg, engine_cfg)
        self.state = init_dense_state(model_cfg, engine_cfg)
        self._prefill, self._decode = make_dense_fns(model_cfg, engine_cfg)

    def _prefill_slot_arg(self, chunk: List[int], M: int) -> np.ndarray:
        # Padding rows point one-past-the-end so the scatter drops them.
        slot_ids = np.full(M, self.engine_cfg.n_slots, dtype=np.int32)
        slot_ids[: len(chunk)] = chunk
        return slot_ids

    def run(self, item_storage: ItemStorage) -> None:
        processing = ProcessingStorage()
        counter = get_global_throughput_counter()
        B = self.engine_cfg.n_slots
        new_slots = insert_new_items_dense(
            list(range(B)), self.prompts, self.lengths, self.last_tokens,
            item_storage, processing,
        )
        counter.start_record()
        while not is_done(item_storage, processing):
            if new_slots:
                self._run_prefill(new_slots)
            self.state, lengths_dev, last_dev, results_dev = self._decode(
                self.params, self.state, self.lengths, self.last_tokens
            )
            results = self._pull(lengths_dev, last_dev, results_dev)
            finished = process_decoder_result(
                results, item_storage, processing,
                self.model_cfg.n_seq, self.model_cfg.eof_token_id,
            )
            new_slots = insert_new_items_dense(
                finished, self.prompts, self.lengths, self.last_tokens,
                item_storage, processing,
            )
        counter.stop_record()


class PagedEngine(_EngineBase):
    """Paged-KV continuous batching with admission control, on-demand page
    growth and recompute-on-preempt (reference src/inferencer.cpp:43-133)."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        attention_impl: str = "jnp",
    ):
        super().__init__(params, model_cfg, engine_cfg)
        self.attention_impl = attention_impl
        self.state = init_paged_state(model_cfg, engine_cfg)
        self._prefill, self._decode = make_paged_fns(
            model_cfg, engine_cfg, attention_impl
        )
        self.pool = PagePool(engine_cfg.n_pages)
        self.page_table = PageTable(
            engine_cfg.n_slots, engine_cfg.pages_per_slot(model_cfg.n_seq)
        )
        self._table_dev = None

    def _insert(self, item_storage: ItemStorage, processing: ProcessingStorage):
        return insert_new_items_paged(
            self.prompts, self.lengths, self.last_tokens,
            item_storage, processing, self.pool, self.page_table,
            self.engine_cfg.n_forward_rounds, self.engine_cfg.page_size,
            self.engine_cfg.init_num_pages,
        )

    def _flush_table(self):
        t = self.page_table.flush()
        if t is not None or self._table_dev is None:
            self._table_dev = jax.device_put(
                np.ascontiguousarray(self.page_table.table)
            )
        return self._table_dev

    def _prefill_slot_arg(self, chunk: List[int], M: int) -> np.ndarray:
        W = self.page_table.table.shape[1]
        rows = np.zeros((M, W), dtype=np.int32)
        for j, slot in enumerate(chunk):
            rows[j] = self.page_table.table[slot]
        return rows

    def run(self, item_storage: ItemStorage) -> None:
        """The hot loop. D2H through the device transport is the expensive
        operation (one RPC round-trip per pulled array), so per iteration
        exactly ONE array — the decode results — is pulled; device
        ``lengths``/``last_tokens`` outputs are fed straight back into the
        next decode call, and the host mirrors them from the results with
        the same deterministic rules. Host staging is re-uploaded only when
        the scheduler actually changed it (inserts / preemptions)."""
        processing = ProcessingStorage()
        counter = get_global_throughput_counter()
        with jax.profiler.TraceAnnotation("paged_engine"):
            new_slots = self._insert(item_storage, processing)
            host_dirty = True  # lengths/last staged by insert must upload
            lengths_dev = last_dev = None
            counter.start_record()
            while not is_done(item_storage, processing):
                if new_slots:
                    with jax.profiler.TraceAnnotation("prefill"):
                        self._run_prefill(new_slots)
                if host_dirty or lengths_dev is None:
                    lengths_in = jnp.asarray(self.lengths)
                    last_in = jnp.asarray(self.last_tokens)
                else:
                    lengths_in, last_in = lengths_dev, last_dev
                with jax.profiler.TraceAnnotation("decode"):
                    self.state, lengths_dev, last_dev, results_dev = self._decode(
                        self.params, self.state, self._flush_table(),
                        lengths_in, last_in,
                    )
                with jax.profiler.TraceAnnotation("process_results"):
                    results = np.asarray(results_dev)  # the one D2H pull
                    finished = process_decoder_result(
                        results, item_storage, processing,
                        self.model_cfg.n_seq, self.model_cfg.eof_token_id,
                    )
                    # Host mirror of device lengths/last (identical rules:
                    # live slot holds its full token count, finished/empty
                    # slots hold 0).
                    for slot in processing.slots():
                        req = processing.get(slot)
                        self.lengths[slot] = len(req.tokens)
                        self.last_tokens[slot] = req.tokens[-1]
                    for slot in finished:
                        if not processing.contains(slot):
                            self.lengths[slot] = 0
                with jax.profiler.TraceAnnotation("schedule"):
                    preempted = allocate_or_free_pages(
                        self.page_table, self.pool, processing, item_storage,
                        finished, self.engine_cfg.n_forward_rounds,
                        self.engine_cfg.page_size,
                    )
                    for slot in preempted:
                        self.lengths[slot] = 0
                    new_slots = self._insert(item_storage, processing)
                    # device lengths differ from the mirror only when the
                    # scheduler wrote it: admissions or preemptions
                    host_dirty = bool(new_slots) or bool(preempted)
            counter.stop_record()

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
from ..models.params import fuse_qkv_params
from ..utils.profiling import phase
from .item_storage import (
    ItemStorage,
    Request,
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
        self.params = fuse_qkv_params(params)
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
        # Quantized KV needs per-page scales; the dense backend has no scale
        # machinery — a bare astype(int8) would silently attend over raw
        # truncated integers (divergent tokens). Paged engines own int8/int4.
        assert not engine_cfg.kv_quantized, (
            f"DenseEngine does not support kv_dtype={engine_cfg.kv_dtype!r}: "
            "quantized KV requires per-page scales (use a paged engine)"
        )
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
                with phase("prefill"):
                    self._run_prefill(new_slots)
            with phase("forward"):
                self.state, lengths_dev, last_dev, results_dev = self._decode(
                    self.params, self.state, self.lengths, self.last_tokens
                )
            with phase("process_results"):
                results = self._pull(lengths_dev, last_dev, results_dev)
                finished = process_decoder_result(
                    results, item_storage, processing,
                    self.model_cfg.n_seq, self.model_cfg.eof_token_id,
                )
            with phase("insert"):
                new_slots = insert_new_items_dense(
                    finished, self.prompts, self.lengths, self.last_tokens,
                    item_storage, processing,
                )
        counter.stop_record()


class PagedEngine(_EngineBase):
    """Paged-KV continuous batching with admission control, on-demand page
    growth and recompute-on-preempt (reference src/inferencer.cpp:43-133).

    The host loop is TWO-DEEP PIPELINED: burst k is dispatched before
    burst k-1's results are pulled, so the (RPC-bound) pull and all host
    scheduling overlap the device's decode compute. This is sound because:

      * device-side liveness is self-consistent one burst ahead — the
        decode kernel zeroes a slot's length at EOF / the n_seq cap itself
        (greedy_next_token), so an in-flight burst handles finishes without
        host help;
      * the host only ever *injects* state: admissions and preemptions ride
        a packed per-slot update column in the next decode call's
        scheduler operand (no full-array rewind of device-chained state);
      * page growth uses a 2-burst horizon (lookahead = 2*n_forward_rounds)
        so the in-flight burst always fits its pages;
      * greedy decode is deterministic, so dropping a preempted slot's
        in-flight tokens is safe — recompute-on-preempt regenerates them
        exactly (the reference's preemption contract, made cheap by
        determinism).

    Per iteration exactly TWO transport round-trips remain: one packed
    int32 [n_slots, 2+W] scheduler upload and one results pull.
    """

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
        W = engine_cfg.pages_per_slot(model_cfg.n_seq)
        self.page_table = PageTable(engine_cfg.n_slots, W)
        # packed scheduler operand: col0 length update (-1 = keep), col1
        # last-token update, cols 2: the page table
        self._packed = np.zeros((engine_cfg.n_slots, 2 + W), dtype=np.int32)
        self.lookahead = 2 * engine_cfg.n_forward_rounds

    def _insert(self, item_storage: ItemStorage, processing: ProcessingStorage):
        return insert_new_items_paged(
            self.prompts, self.lengths, self.last_tokens,
            item_storage, processing, self.pool, self.page_table,
            self.engine_cfg.n_forward_rounds, self.engine_cfg.page_size,
            self.engine_cfg.init_num_pages, self.lookahead,
        )

    def _prefill_slot_arg(self, chunk: List[int], M: int) -> np.ndarray:
        W = self.page_table.table.shape[1]
        rows = np.zeros((M, W), dtype=np.int32)
        for j, slot in enumerate(chunk):
            rows[j] = self.page_table.table[slot]
        return rows

    def _process_results(self, results, item_storage, processing, skip_slots):
        """Pipelined results walk — the shared walker with pipelined skip
        semantics (see item_storage.process_decoder_result)."""
        return process_decoder_result(
            results, item_storage, processing,
            self.model_cfg.n_seq, self.model_cfg.eof_token_id,
            skip_slots=skip_slots, pipelined=True,
        )

    def _schedule(self, item_storage, processing, finished):
        """Page realloc + admission; returns (new_slots, packed operand for
        the NEXT decode dispatch)."""
        preempted = allocate_or_free_pages(
            self.page_table, self.pool, processing, item_storage,
            finished, self.engine_cfg.n_forward_rounds,
            self.engine_cfg.page_size, self.lookahead,
        )
        new_slots = self._insert(item_storage, processing)
        self._packed[:, 0] = -1
        for slot in preempted:
            self._packed[slot, 0] = 0
        for slot in new_slots:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        self._packed[:, 2:] = self.page_table.table
        return new_slots

    def run(self, item_storage: ItemStorage) -> None:
        processing = ProcessingStorage()
        counter = get_global_throughput_counter()
        B = self.engine_cfg.n_slots
        R = self.engine_cfg.n_forward_rounds

        # initial schedule: admissions into an all-dead device state
        new_slots = self._insert(item_storage, processing)
        self._packed[:, 0] = 0  # every slot starts dead...
        self._packed[:, 1] = 0
        for slot in new_slots:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        self._packed[:, 2:] = self.page_table.table
        skip_slots = set()  # first burst runs after prefill: nothing to skip
        if new_slots:
            self._run_prefill(new_slots)
        lengths_dev = jnp.zeros(B, jnp.int32)
        last_dev = jnp.zeros(B, jnp.int32)

        counter.start_record()
        pending = None
        while True:
            dispatched = False
            if processing.size() > 0:
                with phase("forward"):
                    self.state, lengths_dev, last_dev, results_dev = self._decode(
                        self.params, self.state, jnp.asarray(self._packed),
                        lengths_dev, last_dev,
                    )
                dispatched = True
                self._packed[:, 0] = -1  # consumed
            if pending is not None:
                with phase("process_results"):
                    results = np.asarray(pending)  # the one D2H pull
                    finished = self._process_results(
                        results, item_storage, processing, skip_slots
                    )
                    # host mirror for staging/scheduling
                    for slot in processing.slots():
                        req = processing.get(slot)
                        self.lengths[slot] = len(req.tokens)
                        self.last_tokens[slot] = req.tokens[-1]
                with phase("schedule"):
                    new_slots = self._schedule(item_storage, processing, finished)
                skip_slots = set(new_slots)
                if new_slots:
                    # enqueued after the in-flight burst; runs before the
                    # next dispatch reads these pages
                    with phase("prefill"):
                        self._run_prefill(new_slots)
            if not dispatched:
                if is_done(item_storage, processing):
                    break
                # nothing in flight but work still queued (e.g. everything
                # preempted): loop to re-dispatch after scheduling
                pending = None
                continue
            pending = results_dev
        counter.stop_record()


class NativePagedEngine(_EngineBase):
    """PagedEngine with the host scheduler in native C++
    (csrc/scheduler.cpp via runtime/native.py) — the TPU-native analogue of
    the reference's C++ host layer. Same two-deep pipelined loop and packed
    scheduler operand as PagedEngine; all queue/page/result bookkeeping
    runs natively and writes the staging arrays in place. Differentially
    tested against the Python scheduler (tests/test_native_scheduler.py).
    """

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        attention_impl: str = "jnp",
    ):
        from .native import NativeScheduler

        super().__init__(params, model_cfg, engine_cfg)
        self.state = init_paged_state(model_cfg, engine_cfg)
        self._prefill, self._decode = make_paged_fns(
            model_cfg, engine_cfg, attention_impl
        )
        W = engine_cfg.pages_per_slot(model_cfg.n_seq)
        self.W = W
        self.table = np.zeros((engine_cfg.n_slots, W), dtype=np.int32)
        self._packed = np.zeros((engine_cfg.n_slots, 2 + W), dtype=np.int32)
        self.sched = NativeScheduler(
            engine_cfg.n_slots, model_cfg.n_seq, engine_cfg.n_pages,
            W, engine_cfg.page_size, engine_cfg.init_num_pages,
            engine_cfg.n_forward_rounds, model_cfg.eof_token_id,
            lookahead=2 * engine_cfg.n_forward_rounds,
        )

    def _prefill_slot_arg(self, chunk: List[int], M: int) -> np.ndarray:
        rows = np.zeros((M, self.W), dtype=np.int32)
        for j, slot in enumerate(chunk):
            rows[j] = self.table[slot]
        return rows

    def _pack(self, new_slots, preempted):
        self._packed[:, 0] = -1
        for slot in preempted:
            self._packed[slot, 0] = 0
        for slot in new_slots:
            self._packed[slot, 0] = self.lengths[slot]
            self._packed[slot, 1] = self.last_tokens[slot]
        self._packed[:, 2:] = self.table

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        sched = self.sched
        # hand the queue to the native scheduler
        for req in item_storage.pop_new_items(1 << 30):
            counter.note_submit(req.id)
            sched.add_request(req.id, req.tokens)

        B = self.engine_cfg.n_slots
        new_slots = sched.insert_new(
            self.prompts, self.lengths, self.last_tokens, self.table
        )
        self._pack(new_slots, [])
        if new_slots:
            self._run_prefill(new_slots)
        # the initial wave is part of burst 0 — nothing to skip when its
        # results arrive
        sched.clear_last_admitted()
        lengths_dev = jnp.zeros(B, jnp.int32)
        last_dev = jnp.zeros(B, jnp.int32)

        counter.start_record()
        pending = None
        prev_total = 0
        while True:
            dispatched = False
            if sched.processing_count() > 0:
                with phase("forward"):
                    self.state, lengths_dev, last_dev, results_dev = self._decode(
                        self.params, self.state, jnp.asarray(self._packed),
                        lengths_dev, last_dev,
                    )
                dispatched = True
                self._packed[:, 0] = -1
            if pending is not None:
                with phase("process_results"):
                    results = np.asarray(pending)
                    finished = sched.process_results(
                        results, self.lengths, self.last_tokens
                    )
                    total = sched.total_generated()
                    counter.add_record_if_recording(total - prev_total)
                    prev_total = total
                with phase("schedule"):
                    preempted = sched.alloc_or_free(
                        finished, self.table, self.lengths
                    )
                    new_slots = sched.insert_new(
                        self.prompts, self.lengths, self.last_tokens, self.table
                    )
                    self._pack(new_slots, preempted)
                if new_slots:
                    with phase("prefill"):
                        self._run_prefill(new_slots)
            if not dispatched:
                if sched.is_done():
                    break
                pending = None
                continue
            pending = results_dev
        counter.stop_record()
        # surface finished requests back into the item storage
        for rid, tokens, prompt_len in sched.finished_requests():
            counter.note_first_token(rid)
            item_storage.add_finished(
                Request(rid, tokens, prompt_len=prompt_len)
            )

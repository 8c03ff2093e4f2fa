"""Tier-3 scheduler unit tests with fabricated decoder results (no model),
porting the reference's scenarios:
  tests/item_storage_test.cpp      — process/insert with enough / not-enough
  tests/paged_item_storage_test.cpp — fill-all, partial insert,
    free-on-finish, grow-by-one-page, self-preemption, tail-preemption
    with exact free-page accounting.
"""

import numpy as np
import pytest

from min_llm_inference_tpu.constants import (
    DEFAULT_INIT_NUM_BLOCKS,
    DEFAULT_PAGE_SIZE,
    EMPTY_ROW_TOKEN_ID,
    EOF_TOKEN_ID,
)
from min_llm_inference_tpu.runtime.item_storage import (
    ItemStorage,
    ProcessingStorage,
    Request,
    insert_new_items_dense,
    is_done,
    process_decoder_result,
)
from min_llm_inference_tpu.runtime.paged_scheduler import (
    PagePool,
    PageTable,
    allocate_or_free_pages,
    ceil_div,
    insert_new_items_paged,
)

P = DEFAULT_PAGE_SIZE          # 16
INIT = DEFAULT_INIT_NUM_BLOCKS  # 4


def make_items(lengths, rng, start_id=0):
    store = ItemStorage()
    for i, ln in enumerate(lengths):
        store.add_new_item(
            Request(start_id + i, [int(t) for t in rng.integers(0, EOF_TOKEN_ID, ln)])
        )
    return store


class PagedFixture:
    def __init__(self, n_slots, n_pages, n_seq, item_lengths, rng):
        self.n_slots, self.n_seq = n_slots, n_seq
        self.item_storage = make_items(item_lengths, rng)
        self.processing = ProcessingStorage()
        self.pool = PagePool(n_pages)
        self.table = PageTable(n_slots, ceil_div(n_seq, P))
        self.prompts = np.zeros((n_slots, n_seq), dtype=np.int32)
        self.lengths = np.zeros(n_slots, dtype=np.int32)
        self.last = np.zeros(n_slots, dtype=np.int32)

    def insert(self, rounds=1):
        return insert_new_items_paged(
            self.prompts, self.lengths, self.last,
            self.item_storage, self.processing, self.pool, self.table,
            rounds, P, INIT,
        )

    def realloc(self, finished, rounds=1):
        allocate_or_free_pages(
            self.table, self.pool, self.processing, self.item_storage,
            finished, rounds, P,
        )


# ---------- item_storage (contiguous path) ----------

def test_process_decoder_result_basic(rng):
    store = ItemStorage()
    processing = ProcessingStorage()
    n_seq = 32
    for slot, ln in [(0, 3), (1, 4), (2, 5)]:
        processing.put(slot, Request(slot, [1] * ln))
    results = np.array([7, EOF_TOKEN_ID, EMPTY_ROW_TOKEN_ID], dtype=np.int32)
    finished = process_decoder_result(results, store, processing, n_seq)
    # slot 1 finished via EOF (moved), slot 2 empty (freed but not moved)
    assert finished == [1, 2]
    assert processing.contains(0) and not processing.contains(1)
    assert processing.get(0).tokens == [1, 1, 1, 7]
    assert store.finished[1].tokens == [1, 1, 1, 1, EOF_TOKEN_ID]


def test_process_decoder_result_length_cap(rng):
    store = ItemStorage()
    processing = ProcessingStorage()
    processing.put(0, Request(0, [1] * 9))
    finished = process_decoder_result(
        np.array([5], dtype=np.int32), store, processing, n_seq=10
    )
    assert finished == [0]
    assert store.finished[0].tokens == [1] * 9 + [5]


def test_process_decoder_result_multi_round_stops_after_finish(rng):
    store = ItemStorage()
    processing = ProcessingStorage()
    processing.put(0, Request(0, [1, 2]))
    # EOF at round 1; round 2's value must be ignored
    results = np.array([[3, EOF_TOKEN_ID, 9]], dtype=np.int32)
    finished = process_decoder_result(results, store, processing, 100)
    assert finished == [0]
    assert store.finished[0].tokens == [1, 2, 3, EOF_TOKEN_ID]


def test_insert_dense_enough_and_not_enough(rng):
    n_slots, n_seq = 4, 16
    store = make_items([3, 5], rng)
    processing = ProcessingStorage()
    prompts = np.zeros((n_slots, n_seq), np.int32)
    lengths = np.full(n_slots, 99, np.int32)
    last = np.zeros(n_slots, np.int32)
    new_slots = insert_new_items_dense(
        [1, 3, 0], prompts, lengths, last, store, processing
    )
    assert new_slots == [1, 3]
    assert lengths[1] == 3 and lengths[3] == 5 and lengths[0] == 0
    assert lengths[2] == 99  # untouched non-finished slot
    assert processing.contains(1) and processing.contains(3)
    assert last[1] == processing.get(1).tokens[-1]
    assert not is_done(store, processing)


def test_preempt_requeues_at_head(rng):
    store = make_items([3], rng)
    processing = ProcessingStorage()
    processing.put(5, Request(42, [9, 8, 7]))
    processing.move_to_new(5, store)
    assert store.new_count() == 2
    assert store.pop_new_items(1)[0].id == 42  # head of the queue


# ---------- paged scheduler ----------

def test_insert_all_items(rng):
    # InsertAllItemsTest: pool exactly fits n_slots * INIT; 2x items queued
    n_slots = 24
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2,
                       rng.integers(1, P * INIT - 1, n_slots * 2).tolist(), rng)
    item_lens = [len(fix.item_storage._new[i].tokens) for i in range(n_slots)]
    new_slots = fix.insert()
    assert new_slots == list(range(n_slots))
    assert fix.item_storage.new_count() == n_slots
    assert fix.pool.free_count() == 0
    for i in range(n_slots):
        assert fix.lengths[i] == item_lens[i]
        req = fix.processing.get(i)
        assert fix.prompts[i, : len(req.tokens)].tolist() == req.tokens


def test_insert_new_items_partial(rng):
    # InsertNewItemsTest: n_slots-1 items, then add 2 more; only 1 fits
    n_slots = 24
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2,
                       rng.integers(1, P * INIT - 1, n_slots - 1).tolist(), rng)
    assert fix.insert() == list(range(n_slots - 1))
    ln = int(rng.integers(1, P * INIT - 1))
    fix.item_storage.add_new_item(Request(100, [1] * ln))
    fix.item_storage.add_new_item(Request(101, [2] * ln))
    new_slots = fix.insert()
    assert new_slots == [n_slots - 1]
    assert fix.item_storage.new_count() == 1
    assert fix.pool.free_count() == 0
    assert fix.lengths[n_slots - 1] == ln


def test_return_free_blocks_on_finish(rng):
    # ReturnFreeBlocksTest: finish some slots -> their pages return, then
    # exactly that many new items are admitted.
    n_slots = 24
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2,
                       rng.integers(1, P * INIT - 2, n_slots * 2).tolist(), rng)
    fix.insert()
    assert fix.pool.free_count() == 0
    n_fin = 7
    fin_slots = sorted(rng.choice(n_slots, n_fin, replace=False).tolist())
    results = rng.integers(0, EOF_TOKEN_ID - 1, n_slots).astype(np.int32)
    results[fin_slots] = EOF_TOKEN_ID
    finished = process_decoder_result(results, fix.item_storage, fix.processing, fix.n_seq)
    assert finished == fin_slots
    fix.realloc(finished)
    assert fix.pool.free_count() == n_fin * INIT
    assert len(fix.item_storage.finished) == n_fin
    assert fix.insert() == fin_slots


def test_allocate_more_blocks(rng):
    # AllocateMoreBlocksTest: slots at len P*INIT-1 cross a page boundary
    # after one token and get exactly one extra page each.
    n_slots = 24
    n_grow = 5
    lens = rng.integers(1, P * INIT - 2, n_slots // 2).tolist()
    grow_idx = sorted(rng.choice(n_slots // 2, n_grow, replace=False).tolist())
    for i in grow_idx:
        lens[i] = P * INIT - 1
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2, lens, rng)
    fix.insert()
    free0 = fix.pool.free_count()
    assert free0 == n_slots * INIT - (n_slots // 2) * INIT
    results = rng.integers(0, EOF_TOKEN_ID - 1, n_slots).astype(np.int32)
    results[n_slots // 2 :] = EMPTY_ROW_TOKEN_ID  # never-admitted slots
    finished = process_decoder_result(results, fix.item_storage, fix.processing, fix.n_seq)
    assert finished == list(range(n_slots // 2, n_slots))
    fix.realloc(finished)
    assert fix.pool.free_count() == free0 - n_grow


def test_free_the_last_blocks_self_preempt(rng):
    # FreeTheLastBlocksTest: pool exhausted, only the used-list tail needs a
    # page -> it preempts ITSELF; its tokens (incl. the one just decoded)
    # land at the head of the new queue.
    n_slots = 24
    lens = rng.integers(1, P * INIT - 2, n_slots * 2).tolist()
    lens[n_slots - 1] = P * INIT - 1
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2, lens, rng)
    fix.insert()
    assert fix.pool.free_count() == 0
    results = rng.integers(0, EOF_TOKEN_ID - 1, n_slots).astype(np.int32)
    finished = process_decoder_result(results, fix.item_storage, fix.processing, fix.n_seq)
    fix.realloc(finished)
    assert fix.pool.free_count() == INIT
    assert fix.item_storage.new_count() == n_slots + 1
    assert fix.item_storage.head_length() == P * INIT
    head = fix.item_storage.pop_new_items(1)[0]
    assert head.tokens[-1] == int(results[n_slots - 1])


def test_free_blocks_tail_preemption(rng):
    # FreeBlocks: to_fill needy slots vs INIT free pages -> preempt
    # ceil(to_fill/INIT)-1 tail slots; exact page accounting.
    n_slots = 24
    to_fill = 9
    to_free = ceil_div(to_fill, INIT) - 1
    lens = rng.integers(1, P * INIT - 2, n_slots - 1).tolist()
    needy = sorted(rng.choice(n_slots - 1 - to_free, to_fill, replace=False).tolist())
    for i in needy:
        lens[i] = P * INIT - 1
    fix = PagedFixture(n_slots, n_slots * INIT, P * INIT * 2, lens, rng)
    fix.insert()
    assert fix.pool.free_count() == INIT
    results = rng.integers(0, EOF_TOKEN_ID - 1, n_slots).astype(np.int32)
    # slot n_slots-1 was never admitted (only n_slots-1 items) -> EMPTY row
    results[n_slots - 1] = EMPTY_ROW_TOKEN_ID
    finished = process_decoder_result(results, fix.item_storage, fix.processing, fix.n_seq)
    assert finished == [n_slots - 1]
    fix.realloc(finished)
    assert fix.pool.free_count() == INIT * to_free + INIT - to_fill
    assert fix.item_storage.new_count() == to_free


def test_pool_raises_on_exhaustion():
    pool = PagePool(2)
    with pytest.raises(RuntimeError):
        pool.pop_pages(3)

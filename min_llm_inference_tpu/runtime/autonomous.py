"""Device-autonomous continuous batching: the whole scheduler inside jit.

The host engines (engine.py) keep the reference's host-side scheduling
shape — but on this platform every device<->host round-trip is an RPC, and
fetches serialize behind the whole device queue, so even a pipelined host
loop pays ~(burst + RPC) per iteration. This module moves the ENTIRE
continuous-batching loop on device, the logical endpoint of the
reference's direction of travel (its multi-round forward exists to
amortize host trips, inference_model.cpp:56-81):

  * the request queue (padded prompts + lengths) is preloaded to HBM once;
  * each jitted burst does: free dead slots' pages (vectorized stack push)
    -> admit queue-head requests into dead slots (vectorized stack pop,
    full page grant) -> prefill admitted prompts (lax.cond-skipped when
    none) -> n_forward_rounds of greedy decode -> scatter generated tokens
    into a device-resident output buffer;
  * the host dispatches bursts in chunks and fetches only a 3-int status
    (live slots, queue head, free pages) between chunks; generated
    sequences are fetched ONCE at the end.

Admission policy (EngineConfig.overcommit):
  * full grant (default False... set per workload): a slot gets ALL its
    pages_per_slot pages at admission — no growth or preemption, pool must
    hold >= concurrent_slots * pages_per_slot pages.
  * overcommit=True: half-group grants with on-demand growth and
    youngest-first preemption + device retry stack
    (_overcommit_admission) — the reference's core paged-KV behaviors
    (paged_item_storage.cpp:14-60) running entirely on device.
Outputs are token-identical to the host engines either way (greedy decode
is deterministic; scheduling changes only slot assignment and recompute
timing, not per-request math).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..metrics import get_global_throughput_counter
from ..models.model import DEFAULT_CTX, decode_round_tokens, prefill_write_kv
from ..utils.profiling import phase
from ..models.paged import (
    PagedKVState,
    flush_ring_to_pages,
    init_paged_state,
    make_prefill_kv_writer,
    make_ring_round_callbacks,
    make_round_kv_callbacks,
    ring_pad_rows,
)
from .item_storage import ItemStorage, Request


class AutoState(NamedTuple):
    kv: PagedKVState
    page_table: jax.Array   # [B, W] i32
    lengths: jax.Array      # [B] i32 (0 = dead)
    last_tokens: jax.Array  # [B] i32
    rid: jax.Array          # [B] i32 request index per slot
    allocated: jax.Array    # [B] bool — slot holds pages (needs freeing)
    queue_head: jax.Array   # [] i32
    free_top: jax.Array     # [] i32 — stack[0:free_top] are free page GROUPS
    page_stack: jax.Array   # [NP // W] i32 — free-list of W-page group ids
    out_tokens: jax.Array   # [R_total, S] i32 generated tokens by position
    final_lens: jax.Array   # [R_total] i32 (0 = unfinished)
    rng_key: jax.Array | None = None  # PRNG state (sampling mode only)
    # --- overcommit mode only (None under full grant) ---
    grown: jax.Array | None = None       # [B] bool — slot holds 2 halves
    adm_seq: jax.Array | None = None     # [B] i32 admission order (victims)
    seq_ctr: jax.Array | None = None     # [] i32
    retry_stack: jax.Array | None = None  # [R_total] i32 preempted rids
    retry_top: jax.Array | None = None    # [] i32


def init_auto_state(model_cfg: ModelConfig, engine_cfg: EngineConfig, n_requests: int, sample_seed: int | None = None) -> AutoState:
    """Pages are allocated in CONTIGUOUS groups: the free list holds group
    ids, and a slot's page-table row is always consecutive pages within
    each group. Full grant: one group of W = pages_per_slot pages per slot
    (no fragmentation possible). Overcommit: HALF-groups of W/2 pages —
    admission grants one, growth adds a second (each half is contiguous, so
    multi-page run DMAs that divide W/2 stay valid). Contiguity is what
    lets the grouped Pallas kernel fetch multi-page runs with ONE DMA
    (contiguous_pages=True)."""
    B = engine_cfg.n_slots
    W = engine_cfg.pages_per_slot(model_cfg.n_seq)
    NP = engine_cfg.n_pages
    oc = engine_cfg.overcommit
    NG = NP // (W // 2) if oc else NP // W
    return AutoState(
        kv=init_paged_state(model_cfg, engine_cfg),
        page_table=jnp.zeros((B, W), jnp.int32),
        lengths=jnp.zeros(B, jnp.int32),
        last_tokens=jnp.zeros(B, jnp.int32),
        rid=jnp.zeros(B, jnp.int32),
        allocated=jnp.zeros(B, bool),
        queue_head=jnp.zeros((), jnp.int32),
        free_top=jnp.asarray(NG, jnp.int32),
        page_stack=jnp.arange(NG, dtype=jnp.int32),
        out_tokens=jnp.zeros((n_requests, model_cfg.n_seq), jnp.int32),
        final_lens=jnp.zeros(n_requests, jnp.int32),
        rng_key=(None if sample_seed is None
                 else jax.random.PRNGKey(sample_seed)),
        grown=jnp.zeros(B, bool) if oc else None,
        adm_seq=jnp.zeros(B, jnp.int32) if oc else None,
        seq_ctr=jnp.zeros((), jnp.int32) if oc else None,
        retry_stack=jnp.zeros(n_requests, jnp.int32) if oc else None,
        retry_top=jnp.zeros((), jnp.int32) if oc else None,
    )


def _overcommit_admission(engine_cfg: EngineConfig, max_new: int, R: int,
                          st: AutoState, prompts_all, plens_all, n_real):
    """Device-side paged scheduling with overcommit: free dead slots' halves
    -> grow slots about to cross the half boundary (n_forward_rounds
    lookahead) -> preempt the YOUNGEST live slots if the pool is dry
    (reference semantics: tail preempt, self-preempt last,
    /root/reference/src/paged_item_storage.cpp:14-60; re-queue at head ==
    LIFO retry stack) -> admit retry-stack rids then queue-head rids with
    ONE half each (two for prompts a half cannot hold).

    All vectorized jnp on [B]/[max_new] arrays — runs inside the jitted
    burst on device, zero host trips. Granularity is a HALF-group (W/2
    contiguous pages) rather than the reference's single page: contiguity
    is what keeps multi-page run DMAs legal (pages_per_dma divides W/2).

    Greedy determinism makes preemption token-dropping safe: a re-admitted
    request recomputes the identical tokens from its prompt (the invariant
    the host engines already exploit)."""
    B = st.lengths.shape[0]
    W = st.page_table.shape[1]
    Hp = W // 2
    P = engine_cfg.page_size
    NP = engine_cfg.n_pages
    NH = NP // Hp
    R_total = prompts_all.shape[0]
    S_pre = prompts_all.shape[1]
    i32 = jnp.int32
    units = jnp.arange(Hp, dtype=i32)[None, :]

    page_table, lengths = st.page_table, st.lengths
    grown = st.grown
    page_stack, free_top = st.page_stack, st.free_top
    retry_stack, retry_top = st.retry_stack, st.retry_top

    def push_units(stack, top, mask1, units1, mask2, units2):
        ord1 = jnp.cumsum(mask1) - 1
        stack = stack.at[jnp.where(mask1, top + ord1, NH)].set(
            units1, mode="drop")
        top = top + jnp.sum(mask1)
        ord2 = jnp.cumsum(mask2) - 1
        stack = stack.at[jnp.where(mask2, top + ord2, NH)].set(
            units2, mode="drop")
        return stack, top + jnp.sum(mask2)

    h1 = page_table[:, 0] // Hp
    h2 = page_table[:, Hp] // Hp

    # ---- free dead-but-allocated slots' halves ----
    to_free = (lengths == 0) & st.allocated
    page_stack, free_top = push_units(
        page_stack, free_top, to_free, h1, to_free & grown, h2)
    allocated = st.allocated & ~to_free
    grown = grown & ~to_free
    live = lengths > 0

    # ---- growth demand: this burst writes positions up to len + R - 2 ----
    need2 = live & ~grown & (lengths + R - 1 > Hp * P)
    n_need = jnp.sum(need2)

    # ---- preempt the youngest live slots until growth fits ----
    key = jnp.where(live, st.adm_seq, -1)
    order = jnp.argsort(-key)                     # youngest live first
    freed_cum = jnp.cumsum(
        jnp.where(live, 1 + grown.astype(i32), 0)[order])
    need_cum = jnp.cumsum(need2.astype(i32)[order])
    ok = jnp.concatenate([
        (free_top >= n_need).reshape(1),
        free_top + freed_cum >= n_need - need_cum,
    ])
    k_star = jnp.sum(~ok).astype(i32)   # monotone: first-True index
    rank = jnp.zeros(B, i32).at[order].set(jnp.arange(B, dtype=i32))
    preempt = live & (rank < k_star)
    p_ord = jnp.cumsum(preempt) - 1
    retry_stack = retry_stack.at[
        jnp.where(preempt, retry_top + p_ord, R_total)
    ].set(st.rid, mode="drop")
    retry_top = retry_top + jnp.sum(preempt)
    page_stack, free_top = push_units(
        page_stack, free_top, preempt, h1, preempt & grown, h2)
    lengths = jnp.where(preempt, 0, lengths)
    allocated = allocated & ~preempt
    grown = grown & ~preempt
    live = live & ~preempt
    need2 = need2 & ~preempt

    # ---- grow: pop one half per remaining candidate (fits by k_star) ----
    g_ord = jnp.cumsum(need2) - 1
    g_pop = page_stack[jnp.clip(free_top - 1 - g_ord, 0, NH - 1)]
    second = jnp.where(need2, g_pop, h2)[:, None] * Hp + units
    page_table = jnp.where(need2[:, None],
                           jnp.concatenate([page_table[:, :Hp], second],
                                           axis=1),
                           page_table)
    free_top = free_top - jnp.sum(need2)
    grown = grown | need2

    # ---- admission: retry stack first (LIFO = reference re-queue-at-head),
    # then the queue head; one half each, two if the prompt + lookahead
    # cannot fit a half ----
    dead = ~allocated
    n_retry = retry_top
    remaining = jnp.maximum(n_real - st.queue_head, 0)
    j = jnp.arange(max_new, dtype=i32)
    from_retry = j < n_retry
    r_idx = jnp.clip(retry_top - 1 - j, 0, R_total - 1)
    rid_vec = jnp.where(from_retry, retry_stack[r_idx],
                        st.queue_head + j - n_retry)
    # rids are GLOBAL; buffer rows are rid % R_total (ring buffer)
    row_vec = jnp.clip(rid_vec, 0, None) % R_total
    plens_cand = plens_all[row_vec]
    hneed = 1 + (plens_cand + R - 1 > Hp * P).astype(i32)
    hcum = jnp.cumsum(hneed)
    m_basic = jnp.minimum(jnp.minimum(jnp.sum(dead), max_new),
                          n_retry + remaining)
    admit = (j < m_basic) & (hcum <= free_top)   # prefix-closed
    m = jnp.sum(admit).astype(i32)
    slot_ids_all = jnp.nonzero(dead, size=B, fill_value=B)[0]
    slot_ids = jnp.where(admit, slot_ids_all[:max_new], B)  # B = drop
    plens = jnp.where(admit, plens_cand, 0)
    prompts = prompts_all[row_vec]
    off1 = hcum - hneed
    u1 = page_stack[jnp.clip(free_top - 1 - off1, 0, NH - 1)]
    u2 = page_stack[jnp.clip(free_top - hcum, 0, NH - 1)]
    two = hneed == 2
    first = u1[:, None] * Hp + units
    # ungrown slots DUPLICATE the first half in the table's second half:
    # those entries are never read (length-gated below Hp*P until grown)
    # and never written (the prompt + lookahead fits the first half)
    sec = jnp.where(two[:, None], u2[:, None] * Hp + units, first)
    granted = jnp.concatenate([first, sec], axis=1)   # [max_new, W]
    page_table = page_table.at[slot_ids].set(granted, mode="drop")
    free_top = free_top - jnp.sum(jnp.where(admit, hneed, 0))
    n_from_retry = jnp.minimum(m, n_retry)
    retry_top = retry_top - n_from_retry
    queue_head = st.queue_head + (m - n_from_retry)
    lengths = lengths.at[slot_ids].set(plens, mode="drop")
    last_prompt_tok = prompts[j, jnp.clip(plens - 1, 0, S_pre - 1)]
    last_tokens = st.last_tokens.at[slot_ids].set(
        last_prompt_tok, mode="drop")
    rid = st.rid.at[slot_ids].set(rid_vec, mode="drop")
    allocated = allocated | jnp.zeros(B, bool).at[slot_ids].set(
        True, mode="drop")
    grown = grown.at[slot_ids].set(two, mode="drop") if Hp else grown
    adm_seq = st.adm_seq.at[slot_ids].set(st.seq_ctr + j, mode="drop")
    seq_ctr = st.seq_ctr + m

    oc_state = dict(grown=grown, adm_seq=adm_seq, seq_ctr=seq_ctr,
                    retry_stack=retry_stack, retry_top=retry_top)
    return (page_table, lengths, last_tokens, rid, allocated, queue_head,
            free_top, page_stack, granted, plens, prompts, m, slot_ids,
            oc_state)


def _autonomous_burst(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    attention_impl: str,
    max_new: int,
    sampling,       # None = greedy, else (temperature, top_k) static
    ablate,         # frozenset of phase knockouts (profiling only)
    ctx,            # parallel seams (DEFAULT_CTX single-chip; TpShardCtx
                    # inside parallel/autonomous.py's shard_map)
    params,
    st: AutoState,
    prompts_all,   # [R_cap, S_pre] i32 (S_pre: static max-prompt bucket)
    plens_all,     # [R_cap] i32
    n_real,        # [] i32 — actual request count (R_cap is padding)
):
    """One jitted burst: ``subbursts`` trace-unrolled repetitions of the
    admit -> prefill -> decode-scan body. Splitting the rounds across
    sub-bursts refills dead slots every R/subbursts rounds instead of
    every R — the slot-round efficiency fix schedule_sim predicts
    (0.628 -> 0.721 at ref shapes for 16 = 4x4) — while the host still
    pays ONE dispatch and one status fetch per burst.

    Ring flushing (burst_flush=True, the default): ONE ring sized for the
    full burst rides across the sub-bursts and lands in the pages once at
    burst end. Ring columns are indexed by ABSOLUTE round; a slot admitted
    at sub-burst k starts writing at column r0 = k * r_sub (ring_r0,
    threaded to the merge/flush masks). This is what lets sub-burst
    admission pay ZERO extra flushes — the per-sub-burst flush doubled the
    12-layer model's flush cost and ate the schedule win (73.2k -> 66.9k
    tok/s measured, round 4). burst_flush=False keeps the round-4
    fresh-ring-per-sub-burst behavior for A/B."""
    n_sub = engine_cfg.subbursts
    r_sub = engine_cfg.n_forward_rounds // n_sub
    use_ring = engine_cfg.decode_ring and attention_impl == "grouped"
    burst_ring = use_ring and engine_cfg.burst_flush and n_sub > 1

    def run_subbursts(st: AutoState):
        ring_ctx = None
        if burst_ring:
            B = engine_cfg.n_slots
            feat_loc = st.kv.kv_pages[0].shape[-1]
            # int4 pools (feat_loc = D/2 packed): the ring rides UNPACKED
            # (one int8 per feature); the flush packs once per burst
            if engine_cfg.kv_packed:
                feat_loc *= 2
            R_pad = ring_pad_rows(engine_cfg.n_forward_rounds)
            rings = tuple(
                jnp.zeros((B, R_pad, 2 * feat_loc), engine_cfg.kv_jax_dtype)
                for _ in range(model_cfg.n_layers)
            )
            ring_scs = tuple(
                jnp.zeros((B, 128), jnp.float32)
                for _ in range(model_cfg.n_layers)
            ) if engine_cfg.kv_quantized else ()
            # slots live at burst start: first new position = length - 1,
            # first ring column = 0; admissions overwrite their entries
            ring_ctx = (rings, ring_scs,
                        jnp.maximum(st.lengths - 1, 0),
                        jnp.zeros(B, jnp.int32))
        for k in range(n_sub):
            st, status, ring_ctx = _sub_burst(
                model_cfg, engine_cfg, attention_impl, max_new, sampling,
                ablate, ctx, r_sub, k * r_sub, ring_ctx,
                (not burst_ring) or (k == n_sub - 1),
                params, st, prompts_all, plens_all, n_real,
            )
        return st, status

    def skip_burst(st: AutoState):
        return st, _status_of(st)

    # ONE liveness/pending gate around the WHOLE burst (chunked dispatch
    # overshoots past completion by up to chunk-1 bursts; those must cost
    # ~nothing). The gate used to live inside each sub-burst around its
    # decode scan, but threading the burst-wide rings through per-sub-burst
    # cond boundaries broke XLA's in-place reuse of the ring buffers —
    # measured +0.57 ms/round on the 12-layer model with a DRAINED queue
    # (~8 ms/burst of ring copies, the r3 big-carry lesson in cond form).
    # With the single outer gate the rings flow scan -> scan in straight
    # line and update in place. An all-dead MIDDLE sub-burst (possible
    # under extreme under-load, queue pending) now decodes dead rows
    # instead of skipping — masked, correct, and not a steady-state case.
    pending = st.queue_head < n_real
    if engine_cfg.overcommit:
        pending = pending | (st.retry_top > 0)
    return jax.lax.cond(
        jnp.any(st.lengths > 0) | pending, run_subbursts, skip_burst, st,
    )


def _status_of(st: AutoState):
    """The 5-int status vector (live, queue head, free groups, retry
    depth, finished count) computed from a state.

    free groups counts the stack PLUS dead-but-allocated slots' units:
    pages are physically freed at the next burst's admission step, so
    without the freeable term the column under-reports by one burst of
    deaths — and never converges while the engine idles, since the
    whole-burst liveness gate skips the admission step entirely then.
    Status consumers pace/shed on this column; the next real burst can
    always admit against it."""
    dead_alloc = (st.lengths == 0) & st.allocated
    units = dead_alloc.astype(jnp.int32)
    if st.grown is not None:
        # overcommit: a grown dead slot returns two half-group units
        units = units + (dead_alloc & st.grown).astype(jnp.int32)
    return jnp.stack([
        jnp.sum(st.lengths > 0).astype(jnp.int32),
        st.queue_head,
        st.free_top + jnp.sum(units),
        (jnp.zeros((), jnp.int32) if st.retry_top is None
         else st.retry_top),
        jnp.sum(st.final_lens > 0).astype(jnp.int32),
    ])


def _sub_burst(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    attention_impl: str,
    max_new: int,
    sampling,
    ablate,
    ctx,
    R,             # decode rounds THIS sub-burst (n_forward_rounds/subbursts)
    round_offset,  # absolute round of this sub-burst's first decode round
    ring_ctx,      # (rings, ring_scs, ring_start, ring_r0) threaded across
                   # sub-bursts (burst_flush), or None (per-sub-burst ring)
    do_flush,      # flush the ring to pages at the end of this sub-burst
    params,
    st: AutoState,
    prompts_all,
    plens_all,
    n_real,
):
    B = engine_cfg.n_slots
    W = st.page_table.shape[1]
    NP = engine_cfg.n_pages
    P = engine_cfg.page_size
    S = model_cfg.n_seq
    R_total = prompts_all.shape[0]
    S_pre = prompts_all.shape[1]

    if engine_cfg.overcommit:
        # half-grant admission with growth + youngest-first preemption +
        # device retry stack (see _overcommit_admission)
        (page_table, lengths, last_tokens, rid, allocated, queue_head,
         free_top, page_stack, granted, plens, prompts, m, slot_ids, oc) = \
            _overcommit_admission(engine_cfg, max_new, R, st, prompts_all,
                                  plens_all, n_real)
    else:
        # full grant: one W-page group per slot, no growth/preemption
        oc = dict(grown=None, adm_seq=None, seq_ctr=None,
                  retry_stack=None, retry_top=None)
        NG = NP // W

        # ---- 1. free page GROUPS of dead-but-allocated slots
        # (vectorized push; a slot's row is a contiguous group,
        # id = first page // W) ----
        to_free = (st.lengths == 0) & st.allocated
        free_ord = jnp.cumsum(to_free) - 1      # [B] position among freed
        nf = jnp.sum(to_free)
        push_pos = jnp.where(to_free, st.free_top + free_ord, NG)
        page_stack = st.page_stack.at[push_pos].set(
            st.page_table[:, 0] // W, mode="drop"
        )
        free_top = st.free_top + nf
        allocated = st.allocated & ~to_free

        # ---- 2. admission: pop queue head into dead slots, one group
        # each ----
        dead = ~allocated
        remaining = n_real - st.queue_head
        m = jnp.minimum(
            jnp.minimum(jnp.sum(dead), max_new),
            jnp.minimum(remaining, free_top),
        ).astype(jnp.int32)
        slot_ids_all = jnp.nonzero(dead, size=B, fill_value=B)[0]
        admit_mask = jnp.arange(max_new) < m
        slot_ids = jnp.where(admit_mask, slot_ids_all[:max_new], B)
        # rids are GLOBAL request indices; buffer rows are rid % R_total
        # (a ring buffer — StreamingSession recycles rows of collected
        # requests; the one-shot engine never wraps)
        req_ix = st.queue_head + jnp.arange(max_new, dtype=jnp.int32)
        req_ix_c = req_ix % R_total
        plens = jnp.where(admit_mask, plens_all[req_ix_c], 0)
        if engine_cfg.sort_admits:
            # permute the admitted wave by prompt length before slots and
            # page groups are assigned: the admitted SET and the queue
            # advance are unchanged (greedy determinism makes slot/group
            # assignment output-invisible); co-blocked slots then share
            # context width, which is what the dgrid kernel's per-block
            # max-width gate needs (see config.sort_admits)
            key = jnp.where(admit_mask, plens, jnp.int32(1 << 30))
            order = jnp.argsort(key, stable=True)
            req_ix = req_ix[order]
            req_ix_c = req_ix_c[order]
            plens = plens[order]
        prompts = prompts_all[req_ix_c]  # [max_new, S_pre]
        # j-th admitted pops stack[free_top - 1 - j]
        gids = page_stack[
            jnp.clip(free_top - 1 - jnp.arange(max_new), 0, NG - 1)]
        granted = gids[:, None] * W + jnp.arange(W, dtype=jnp.int32)[None, :]
        page_table = st.page_table.at[slot_ids].set(granted, mode="drop")
        free_top = free_top - m
        queue_head = st.queue_head + m
        lengths = st.lengths.at[slot_ids].set(plens, mode="drop")
        last_prompt_tok = prompts[
            jnp.arange(max_new), jnp.clip(plens - 1, 0, S_pre - 1)
        ]
        last_tokens = st.last_tokens.at[slot_ids].set(
            last_prompt_tok, mode="drop")
        rid = st.rid.at[slot_ids].set(req_ix, mode="drop")
        allocated = allocated | jnp.zeros(B, bool).at[slot_ids].set(
            True, mode="drop")

    # ---- 3. prefill admitted prompts (skipped when none) ----
    # Admitted rows are the FIRST m of the max_new block, so the prefill
    # matmuls/scatters only need the first bucket >= m rows: lax.switch
    # picks the smallest static width that fits, instead of always paying
    # the full padded [max_new, S_pre] block (mid-run refills are much
    # smaller than the ramp's full-width admissions).
    kv = st.kv

    scale_reduce = ctx.pmax if ctx.tp > 1 else None

    def prefill_sized(bs):
        def f(kv):
            write_kv_block, finalize = make_prefill_kv_writer(
                kv, granted[:bs], plens[:bs], S_pre, P, NP,
                scale_reduce=scale_reduce,
                n_heads=ctx.local_heads(model_cfg),
            )
            prefill_write_kv(
                params, model_cfg, prompts[:bs], plens[:bs], write_kv_block,
                ctx,
            )
            return finalize()

        return f

    sizes = [s for s in (64, 128, 256) if s < max_new] + [max_new]
    thresholds = [0] + sizes[:-1]
    bucket = sum((m > t).astype(jnp.int32) for t in thresholds)
    kv = jax.lax.switch(
        bucket, [lambda kv: kv] + [prefill_sized(s) for s in sizes], kv
    )

    # ---- 4. decode rounds + on-device result accumulation ----
    # Per-round results are collected as DENSE scan outputs and scattered
    # into the output buffers ONCE per sub-burst: XLA scatter cost is
    # dominated by a per-call fixed term, so one [R*B]-index scatter beats
    # R separate [B]-index scatters (same economics as the page-granular
    # prefill write).

    # Ring decode (grouped kernel only): each round's K/V rows go to a
    # dense per-layer ring (quantized, dynamic-update-slice at column r)
    # instead of a full-page in-kernel write-back; the kernel reads the
    # pool READ-ONLY and folds the ring at grid step i == 0; the pool is
    # updated once per burst (flush_ring_to_pages). ring_start = burst-
    # start length - 1: the first position whose K/V this burst computes
    # (the previous burst's last generated token, or the last prompt
    # token for freshly admitted slots — whose page row the flush then
    # overwrites with the identical bytes prefill wrote).
    use_ring = engine_cfg.decode_ring and attention_impl == "grouped"
    if ring_ctx is not None:
        # burst-wide ring threaded across sub-bursts (burst_flush): mark
        # this sub-burst's admittees — their rows start at THIS sub-burst's
        # first absolute round; pre-admission columns hold a previous
        # occupant's data and are masked by ring_r0 in merge and flush
        assert use_ring
        rings0, ring_scs0, ring_start, ring_r0 = ring_ctx
        ring_start = ring_start.at[slot_ids].set(
            jnp.maximum(plens - 1, 0), mode="drop")
        ring_r0 = ring_r0.at[slot_ids].set(
            jnp.asarray(round_offset, jnp.int32), mode="drop")
        flush_rounds = engine_cfg.n_forward_rounds
    elif use_ring:
        ring_start = jnp.maximum(lengths - 1, 0)
        ring_r0 = None
        feat_loc = kv.kv_pages[0].shape[-1]   # local width under tp
        if engine_cfg.kv_packed:
            feat_loc *= 2   # int4 ring rides unpacked; flush packs
        R_pad = ring_pad_rows(R)
        rings0 = tuple(
            jnp.zeros((B, R_pad, 2 * feat_loc), engine_cfg.kv_jax_dtype)
            for _ in range(model_cfg.n_layers)
        )
        ring_scs0 = tuple(
            jnp.zeros((B, 128), jnp.float32)
            for _ in range(model_cfg.n_layers)
        ) if engine_cfg.kv_quantized else ()
        flush_rounds = R
    else:
        rings0 = ring_scs0 = ()
        ring_r0 = None

    # In ring mode the pools are LOOP-INVARIANT across the decode scan
    # (read-only in the kernel; updated once by the flush) — close over
    # them as scan constants instead of threading them through the carry:
    # a 200MB-per-layer carry that merely passes through still cost a full
    # pool copy per round on hardware (measured: ref 446k -> 234k tok/s,
    # gpt2s 78.6k -> 39.5k — both ~2.5 us per pool-MB per round).
    pools_const = kv.kv_pages if use_ring else None

    def round_fn(carry, r_idx):
        kv, rings, ring_scs, lengths, last, key = carry
        kv_pages = list(pools_const if use_ring else kv.kv_pages)
        k_scales, v_scales = list(kv.k_scales), list(kv.v_scales)
        rings_l, ring_scs_l = list(rings), list(ring_scs)
        live = lengths > 0
        if use_ring:
            write_kv, attend = make_ring_round_callbacks(
                model_cfg, engine_cfg, page_table,
                kv_pages, k_scales, v_scales, rings_l, ring_scs_l, lengths,
                ring_start, r_idx, ring_r0=ring_r0,
                n_heads=ctx.local_heads(model_cfg),
                scale_reduce=scale_reduce,
                contiguous_pages=True,
                ablate=ablate,
            )
        else:
            write_kv, attend = make_round_kv_callbacks(
                model_cfg, engine_cfg, attention_impl, page_table,
                kv_pages, k_scales, v_scales, lengths,
                n_heads=ctx.local_heads(model_cfg), scale_reduce=scale_reduce,
                # the group allocator guarantees every slot's page row is a
                # consecutive HBM range -> multi-page runs move as one DMA
                contiguous_pages=True,
                ablate=ablate,
            )

        if sampling is None:
            ntf = None
        else:
            from ..ops.reference import sample_next_token

            temperature, top_k = sampling
            key, sub = jax.random.split(key)

            def ntf(logits, lens):
                return sample_next_token(
                    logits, lens, S, model_cfg.eof_token_id, sub,
                    temperature, top_k,
                )

        tok, new_lengths = decode_round_tokens(
            params, model_cfg, lengths, last, write_kv, attend, ctx,
            next_token_fn=ntf, ablate=ablate,
        )
        # emitted token's position in its sequence = old length; output
        # rows are rid % R_total (ring buffer, see admission)
        row = rid % R_total
        out_idx = jnp.where(live, row * S + lengths, R_total * S)
        finished = live & (new_lengths == 0)
        fin_rid = jnp.where(finished, row, R_total)
        new_last = jnp.where(live, tok, last)
        kv = PagedKVState(
            () if use_ring else tuple(kv_pages),  # pools are scan constants
            tuple(k_scales), tuple(v_scales),
        )
        return (kv, tuple(rings_l), tuple(ring_scs_l), new_lengths,
                new_last, key), (tok, out_idx, fin_rid, lengths + 1)

    def run_rounds(carry):
        (kv, rings_in, ring_scs_in, lengths, last, key,
         out_tokens, final_lens) = carry
        kv_in = kv._replace(kv_pages=()) if use_ring else kv
        # ring columns: ABSOLUTE round under the burst-wide ring, local
        # round (0-based) when each sub-burst gets a fresh ring
        col_base = round_offset if ring_ctx is not None else 0
        ((kv, rings, ring_scs, lengths, last, key),
         (toks, out_idx, fin_rid, fin_len)) = jax.lax.scan(
            round_fn, (kv_in, rings_in, ring_scs_in, lengths, last, key),
            jnp.arange(col_base, col_base + R, dtype=jnp.int32),
        )
        if use_ring and do_flush:
            from ..ops.ring_flush import ring_flush

            interp = jax.default_backend() == "cpu"
            if "flush" in ablate:   # profiling knockout only
                kvp = pools_const
            else:
                if engine_cfg.kv_packed:
                    from ..models.paged import pack_ring_for_flush

                    rings_fl = tuple(
                        pack_ring_for_flush(
                            rg, ctx.local_heads(model_cfg))
                        for rg in rings
                    )
                else:
                    rings_fl = rings
                kvp = tuple(
                    ring_flush(
                        pool, rg, ring_start, lengths, page_table,
                        n_rounds=flush_rounds, ring_r0=ring_r0,
                        interpret=interp,
                    )
                    for pool, rg in zip(pools_const, rings_fl)
                )
            kv = PagedKVState(kvp, kv.k_scales, kv.v_scales)
        elif use_ring:
            # burst_flush: pools untouched until the final sub-burst's flush
            kv = PagedKVState(pools_const, kv.k_scales, kv.v_scales)
        out_tokens = (
            out_tokens.reshape(-1)
            .at[out_idx.reshape(-1)].set(toks.reshape(-1), mode="drop")
            .reshape(R_total, S)
        )
        final_lens = final_lens.at[fin_rid.reshape(-1)].set(
            fin_len.reshape(-1), mode="drop"
        )
        return (kv, rings, ring_scs, lengths, last, key,
                out_tokens, final_lens)

    # No liveness gate here: _autonomous_burst wraps the WHOLE burst in
    # one lax.cond (see its comment — per-sub-burst conds forced ring
    # copies that cost ~0.57 ms/round on 12-layer models)
    (kv, rings_f, ring_scs_f, lengths, last_tokens, rng_key, out_tokens,
     final_lens) = run_rounds(
        (kv, rings0, ring_scs0, lengths, last_tokens, st.rng_key,
         st.out_tokens, st.final_lens),
    )
    ring_ctx_out = (
        None if ring_ctx is None
        else (rings_f, ring_scs_f, ring_start, ring_r0)
    )

    new_st = AutoState(
        kv, page_table, lengths, last_tokens, rid, allocated,
        queue_head, free_top, page_stack, out_tokens, final_lens, rng_key,
        **oc,
    )
    # status: lets servers gate the (expensive, queue-serialized) poll
    # fetch on actual completions
    return new_st, _status_of(new_st), ring_ctx_out


@functools.lru_cache(maxsize=None)
def make_autonomous_fn(
    model_cfg: ModelConfig,
    engine_cfg: EngineConfig,
    attention_impl: str,
    max_new: int,
    sampling=None,
    ablate: str = "",
):
    """ablate: comma-separated phase knockouts for in-burst A/B timing
    (tools/burst_ablate.py); "" (production) compiles the full burst."""
    return jax.jit(
        functools.partial(
            _autonomous_burst, model_cfg, engine_cfg, attention_impl,
            max_new, sampling,
            frozenset(x for x in ablate.split(",") if x),
            DEFAULT_CTX,
        ),
        donate_argnums=(1,),
    )


@functools.lru_cache(maxsize=None)
def _make_compact_slice(b_new: int):
    """Jitted drain-phase compaction: stable-sort live slots to the front
    and slice the per-slot state down to b_new rows. Only valid once the
    request queue is drained (dead slots dropped from the state can no
    longer free their pages — irrelevant: nothing is admitted again) and
    when at most b_new slots are live (host-checked via the status fetch)."""

    @jax.jit
    def compact(st: AutoState) -> AutoState:
        order = jnp.argsort((st.lengths == 0).astype(jnp.int32), stable=True)
        sel = order[:b_new]
        return st._replace(
            lengths=st.lengths[sel],
            last_tokens=st.last_tokens[sel],
            rid=st.rid[sel],
            allocated=st.allocated[sel],
            page_table=st.page_table[sel],
            grown=None if st.grown is None else st.grown[sel],
            adm_seq=None if st.adm_seq is None else st.adm_seq[sel],
        )

    return compact


class AutonomousEngine:
    """Continuous-batching engine with the scheduler on device.

    Same API as PagedEngine.run(item_storage); requires
    n_pages >= pages needed for the concurrency it should reach (each live
    slot holds all pages_per_slot pages)."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        attention_impl: str = "grouped",
        max_new_per_burst: int = 128,
        bursts_per_chunk: int = 4,
        request_capacity: int | None = None,
        min_drain_slots: int | None = None,
        temperature: float = 0.0,
        top_k: int = 0,
        sample_seed: int = 0,
    ):
        model_cfg.validate()
        engine_cfg.validate(model_cfg)
        from ..models.params import fuse_qkv_params

        self.params = fuse_qkv_params(params)
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        W = engine_cfg.pages_per_slot(model_cfg.n_seq)
        assert engine_cfg.n_pages >= W, (
            "autonomous engine grants full pages_per_slot per slot; pool too small"
        )
        # group allocator: pages beyond the last full W-group are unused
        self.n_groups = engine_cfg.n_pages // W
        self.max_new = min(max_new_per_burst, engine_cfg.n_slots)
        self.chunk = bursts_per_chunk
        self.request_capacity = request_capacity
        self.attention_impl = attention_impl
        # drain downshift floor; None = disabled (measured -12% on the
        # bench workload through the axon transport — executable switching
        # costs more than the smaller grids save there; available for
        # latency-focused drains and tested for token parity)
        self.min_drain_slots = (
            max(8, min_drain_slots) if min_drain_slots
            else engine_cfg.n_slots
        )
        # temperature > 0 switches the decoder to stochastic sampling
        # (ops/reference.sample_next_token) — an AutonomousEngine-only
        # feature: host engines need greedy determinism for preemption
        # recompute and pipelined-result discard
        self.sampling = (float(temperature), int(top_k)) if temperature > 0 else None
        self.sample_seed = sample_seed if self.sampling else None
        self._burst = make_autonomous_fn(
            model_cfg, engine_cfg, attention_impl, self.max_new, self.sampling
        )

    def _burst_for(self, b_exec: int):
        """Burst executable over the first b_exec slots (drain downshift:
        once the queue is empty and liveness has fallen, a half-size
        executable halves the per-round fixed cost — projections, logits,
        argmax run over b_exec rows, and the kernel grid shrinks)."""
        import dataclasses

        if b_exec == self.engine_cfg.n_slots:
            return self._burst
        cfg = dataclasses.replace(self.engine_cfg, n_slots=b_exec)
        return make_autonomous_fn(
            self.model_cfg, cfg, self.attention_impl,
            min(self.max_new, b_exec), self.sampling,
        )

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        S = self.model_cfg.n_seq
        requests: List[Request] = item_storage.pop_new_items(1 << 30)
        n = len(requests)
        if n == 0:
            return
        cap = max(self.request_capacity or 0, n)
        max_plen = max(len(r.tokens) for r in requests)
        # static prompt bucket (next power of two) keeps the in-burst
        # prefill from paying the full n_seq width for short prompts
        s_pre = min(S, 1 << (max_plen - 1).bit_length())
        prompts_all = np.zeros((cap, s_pre), dtype=np.int32)
        plens_all = np.zeros(cap, dtype=np.int32)
        for i, req in enumerate(requests):
            assert len(req.tokens) + 1 <= S
            prompts_all[i, : len(req.tokens)] = req.tokens
            plens_all[i] = len(req.tokens)

        st = init_auto_state(
            self.model_cfg, self.engine_cfg, cap, self.sample_seed
        )
        prompts_dev = jnp.asarray(prompts_all)
        plens_dev = jnp.asarray(plens_all)

        n_real = jnp.asarray(n, jnp.int32)
        counter.start_record()
        done = False
        prev_status = None
        b_exec = self.engine_cfg.n_slots
        while not done:
            burst = self._burst_for(b_exec)
            with phase("burst_dispatch"):
                for _ in range(self.chunk):
                    st, status = burst(
                        self.params, st, prompts_dev, plens_dev, n_real
                    )
            with phase("status_fetch"):
                live, head, free, retry, _fin = (
                    int(x) for x in np.asarray(status))
            pending = (head < n) or retry > 0
            done = live == 0 and not pending
            if not done and not pending:
                # drain: queue + retry empty, nothing to admit — compact
                # live slots to the front and drop to the smallest
                # power-of-two executable that still holds them
                while (
                    b_exec // 2 >= self.min_drain_slots
                    and live <= b_exec // 2
                ):
                    b_exec //= 2
                    st = _make_compact_slice(b_exec)(st)
            # Stall detection needs TWO consecutive no-progress chunks:
            # page freeing happens at the start of the NEXT burst, so a
            # chunk can legitimately end with live==0, work pending and a
            # too-small free count (all admitted slots finished inside the
            # chunk); the follow-up chunk frees their pages and proceeds.
            if live == 0 and pending:
                if (head, free, retry) == prev_status:
                    raise RuntimeError(
                        "autonomous engine stalled: pool exhausted"
                    )
                prev_status = (head, free, retry)
            else:
                prev_status = None
        with phase("drain_fetch"):
            # one fetch, not two: every np.asarray is its own RPC on this
            # transport, so concatenate on device (cheap copy) first. The
            # transfer is byte-bound (~1MB measured 88ms), so ship int16
            # when token ids and lengths fit (vocab and n_seq almost
            # always do) — halves the dominant end-of-run fetch.
            packed = jnp.concatenate(
                [st.out_tokens,
                 st.final_lens[:, None].astype(st.out_tokens.dtype)],
                axis=1,
            )
            if (self.model_cfg.n_vocab <= 32768
                    and self.model_cfg.n_seq < 32767):
                packed = packed.astype(jnp.int16)
            packed = np.asarray(packed).astype(np.int32)
            out_tokens, final_lens = packed[:, :-1], packed[:, -1]
        total = 0
        for i, req in enumerate(requests):
            fl = int(final_lens[i])
            assert fl > 0, f"request {i} unfinished"
            gen = out_tokens[i, plens_all[i] : fl].tolist()
            req.tokens.extend(gen)
            total += len(gen)
            counter.note_first_token(req.id)
            item_storage.add_finished(req)
        counter.add_record_if_recording(total)
        counter.stop_record()

class StreamingSession:
    """Online serving on top of the autonomous burst: submit requests at
    any time, step the engine, poll for completions — the continuous-
    batching analogue of a production serving loop. EXTENSION beyond the
    reference (its engines consume a fixed queue and run to completion,
    src/inferencer.cpp:43-85); the device-side scheduler needs nothing
    new — the prompt queue is a device RING buffer, so a submission is one
    async host->device row upload and a bump of the traced request count.

    CAPACITY RECYCLING + BACKPRESSURE CONTRACT: ``capacity`` bounds the
    number of requests IN FLIGHT (submitted and not yet collected by
    poll()), not the session's lifetime total — buffer rows are reused
    once their previous occupant has been collected. ``free_capacity``
    says how many submissions are currently accepted; ``submit`` raises
    if the caller exceeds it (the caller is the queue of record — shed or
    buffer upstream). Rows recycle in submission order, so one laggard
    uncollected request eventually blocks submission: poll() regularly.

    Greedy determinism guarantee: a request's tokens depend only on its
    prompt and the weights, never on WHEN it was submitted or which slot
    it lands in — tested against the one-shot engine (token-exact).

        sess = StreamingSession(engine, capacity=4096, max_prompt_len=64)
        sess.submit([Request(0, [1, 2, 3])])
        sess.step()                  # dispatch one chunk of bursts
        for req in sess.poll():      # newly finished, tokens filled in
            ...
        sess.close()                 # drain everything still in flight
    """

    def __init__(self, engine: "AutonomousEngine", capacity: int,
                 max_prompt_len: int, observe_lag: int = 2):
        from collections import deque

        S = engine.model_cfg.n_seq
        assert max_prompt_len + 1 <= S
        self.engine = engine
        self.capacity = capacity
        # pipelined observation (dispatch/observe): completions become
        # host-visible observe_lag bursts after they happen, instead of at
        # chunk boundaries — the burst-granular serving path
        self.observe_lag = max(1, observe_lag)
        self._pending = deque()
        # s_pre is the padded BUFFER width (power of two, may exceed
        # max_prompt_len); the user-facing bound stays max_prompt_len —
        # submit() enforces it, since a prompt of length n_seq would make
        # the first decode round's out_tokens scatter index land in the
        # next request's row.
        self.max_prompt_len = max_prompt_len
        self.s_pre = min(S, 1 << (max_prompt_len - 1).bit_length())
        self.st = init_auto_state(
            engine.model_cfg, engine.engine_cfg, capacity,
            engine.sample_seed,
        )
        self.prompts_dev = jnp.zeros((capacity, self.s_pre), jnp.int32)
        self.plens_dev = jnp.zeros((capacity,), jnp.int32)
        self.n_submitted = 0
        self._requests: List[Request] = []
        self._plens: List[int] = []
        self._collected: set = set()
        # all requests with global id < _frontier are collected; rows
        # [_frontier % cap, n_submitted % cap) are live and unreusable
        self._frontier = 0

    @property
    def free_capacity(self) -> int:
        """How many requests submit() currently accepts (rows whose
        previous occupant has been collected)."""
        return self.capacity - (self.n_submitted - self._frontier)

    def _upload_run(self, rows, lens, row0):
        """Upload one contiguous run of prompt rows + reset their
        final_lens (a recycled row must not look finished)."""
        k = rows.shape[0]
        self.prompts_dev = jax.lax.dynamic_update_slice(
            self.prompts_dev, jnp.asarray(rows), (row0, 0)
        )
        self.plens_dev = jax.lax.dynamic_update_slice(
            self.plens_dev, jnp.asarray(lens), (row0,)
        )
        self.st = self.st._replace(
            final_lens=jax.lax.dynamic_update_slice(
                self.st.final_lens, jnp.zeros((k,), jnp.int32), (row0,)
            )
        )

    def submit(self, requests: List[Request]) -> None:
        """Enqueue requests (one or two async row uploads; no
        recompilation for repeated batch sizes). Raises if the batch
        exceeds free_capacity — the documented backpressure contract."""
        if not requests:
            return
        k = len(requests)
        assert k <= self.free_capacity, (
            f"backpressure: {k} submissions > free_capacity="
            f"{self.free_capacity} (capacity {self.capacity}, "
            f"{self.n_submitted - self._frontier} in flight/uncollected); "
            "poll() to collect completions or shed load upstream"
        )
        rows = np.zeros((k, self.s_pre), np.int32)
        lens = np.zeros((k,), np.int32)
        for i, req in enumerate(requests):
            assert 0 < len(req.tokens) <= self.max_prompt_len, (
                f"prompt length {len(req.tokens)} exceeds the session's "
                f"max_prompt_len={self.max_prompt_len}"
            )
            rows[i, : len(req.tokens)] = req.tokens
            lens[i] = len(req.tokens)
        row0 = self.n_submitted % self.capacity
        first = min(k, self.capacity - row0)   # split a wrap-around
        self._upload_run(rows[:first], lens[:first], row0)
        if first < k:
            self._upload_run(rows[first:], lens[first:], 0)
        self.n_submitted += k
        self._requests.extend(requests)
        self._plens.extend(int(x) for x in lens)

    def step(self, n_bursts: int | None = None,
             observe: bool = False) -> dict:
        """Dispatch one chunk of bursts (default: the engine's
        bursts_per_chunk; pass 1 for the finest completion-observation
        granularity at the cost of one status fetch per burst); returns
        {live, queued, free}.

        observe=True fuses the final_lens snapshot into the SAME
        device->host RPC as the status (adds ``fin_lens`` +
        ``n_submitted_at`` to the dict, both directly consumable by
        poll()). Every separate fetch serializes behind the whole device
        queue on this transport, so a server that polls most chunks —
        open-loop arrivals finish requests continuously — halves its
        per-chunk RPCs this way (measured: the unfused open-loop bench
        idled the device ~60%% and delivered 39.8k tok/s at a 143k
        offered load)."""
        eng = self.engine
        for _ in range(n_bursts or eng.chunk):
            self.st, status = eng._burst(
                eng.params, self.st, self.prompts_dev, self.plens_dev,
                jnp.asarray(self.n_submitted, jnp.int32),
            )
        if observe:
            snap = np.asarray(jnp.concatenate(
                [status.astype(jnp.int32), self.st.final_lens]))
            status_h, fin_lens = snap[:5], snap[5:]
        else:
            status_h, fin_lens = np.asarray(status), None
        live, head, free, retry, fin = (int(x) for x in status_h)
        out = {"live": live,
               "queued": self.n_submitted - head + retry,
               "free_groups": free,
               "finished_total": fin}
        if observe:
            out["fin_lens"] = fin_lens
            out["n_submitted_at"] = self.n_submitted
        return out

    def dispatch(self) -> None:
        """Pipelined serving: dispatch ONE burst and start the status +
        final_lens device->host copies asynchronously. The copies execute
        right after this burst on the device stream (later dispatches do
        not delay them), and the host reads them observe_lag bursts later
        (observe()) by which point they have landed — so completion
        observation costs no queue-draining fetch and runs at BURST
        granularity, not chunk granularity (the round-3 serving tail:
        p90 == p99 == one chunk at provisioned capacity).

        final_lens is snapshotted with a device-side copy: the state is
        donated into the next burst, so reading the old state's buffer
        after the next dispatch would be use-after-donate."""
        eng = self.engine
        self.st, status = eng._burst(
            eng.params, self.st, self.prompts_dev, self.plens_dev,
            jnp.asarray(self.n_submitted, jnp.int32),
        )
        # ONE fused d2h snapshot per burst: status and final_lens ride one
        # array, one RPC — every d2h fetch is an RPC on this transport
        # (CLAUDE.md) and two per burst measured 113k tok/s on the serving
        # bench (vs 193k for the chunked loop's one per 6 bursts).
        snap = jnp.concatenate(
            [status.astype(jnp.int32), self.st.final_lens])
        snap.copy_to_host_async()
        # n_submitted rides along: a row recycled AFTER this snapshot may
        # still carry its previous occupant's final length in the snapshot,
        # so polls against it must ignore later submissions
        self._pending.append((snap, self.n_submitted))

    def observe(self, block: bool = False) -> dict | None:
        """Read the oldest in-flight burst's status if it is at least
        observe_lag bursts old (or ``block``). Returns the step() dict plus
        ``fin_lens`` (that burst's final_lens snapshot) or None."""
        if not self._pending or (
            len(self._pending) <= self.observe_lag and not block
        ):
            return None
        snap, n_sub = self._pending.popleft()
        host = np.asarray(snap)
        live, head, free, retry, finc = (int(x) for x in host[:5])
        return {"live": live,
                "queued": self.n_submitted - head + retry,
                "free_groups": free,
                "finished_total": finc,
                "fin_lens": host[5:],
                "n_submitted_at": n_sub}

    def poll(self, fin_lens: np.ndarray | None = None,
             n_submitted_at: int | None = None) -> List[Request]:
        """Fetch completions: returns finished Requests (tokens appended),
        each exactly once. One small fetch ([capacity] final_lens) decides
        which output rows to pull; only those rows move over the wire.
        ``fin_lens``: an observe() snapshot to use instead of fetching the
        latest state (the pipelined path; completions only grow, and a
        finished row's contents are final until recycled, so gathering the
        LATEST out_tokens rows for snapshot-finished requests is exact).

        The row gather is padded to a power-of-two bucket: a gather is a
        fresh executable per index-array SHAPE, and remote compiles are
        seconds each on this transport (CLAUDE.md) — unbucketed, every
        distinct completion count recompiled (measured 17s vs 4s on the
        serving bench)."""
        fl = (np.asarray(self.st.final_lens) if fin_lens is None
              else fin_lens)
        hi = (self.n_submitted if fin_lens is None
              else min(self.n_submitted,
                       n_submitted_at if n_submitted_at is not None
                       else self.n_submitted))
        new = [g for g in range(self._frontier, hi)
               if g not in self._collected and fl[g % self.capacity] > 0]
        if not new:
            return []
        bucket = min(self.capacity, 1 << (len(new) - 1).bit_length())
        idx = np.zeros(bucket, np.int32)
        idx[: len(new)] = [g % self.capacity for g in new]
        rows = np.asarray(self.st.out_tokens[jnp.asarray(idx)])
        out = []
        for j, g in enumerate(new):
            req = self._requests[g]
            row_fl = int(fl[g % self.capacity])
            req.tokens.extend(rows[j, self._plens[g]: row_fl].tolist())
            self._collected.add(g)
            out.append(req)
        while self._frontier in self._collected:
            self._collected.discard(self._frontier)
            self._frontier += 1
        return out

    def close(self) -> List[Request]:
        """Run the engine until every submitted request finishes; returns
        the remaining completions (like poll)."""
        eng = self.engine
        prev = None
        out = []
        # collect anything already observed via the pipelined path, then
        # fall back to blocking steps (fresh statuses) below
        while self._pending:
            s = self.observe(block=True)
            out.extend(self.poll(s["fin_lens"], s["n_submitted_at"]))
        while True:
            s = self.step()
            out.extend(self.poll())
            if s["live"] == 0 and s["queued"] == 0:
                break
            if s["live"] == 0 and s["queued"] > 0:
                key = (s["queued"], s["free_groups"])
                if key == prev:
                    raise RuntimeError("streaming session stalled: "
                                       "pool exhausted")
                prev = key
            else:
                prev = None
        out.extend(self.poll())
        return out

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

Trade-off vs the host engines: admission grants a slot ALL its
pages_per_slot pages upfront (no growth, no preemption), so the pool must
hold >= concurrent_slots * pages_per_slot pages. Overcommit + preemption
remain host-engine features. Outputs are token-identical to the host
engines (greedy decode is deterministic; scheduling changes only slot
assignment, not per-request math).
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
    init_paged_state,
    make_prefill_kv_writer,
    make_round_kv_callbacks,
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


def init_auto_state(model_cfg: ModelConfig, engine_cfg: EngineConfig, n_requests: int, sample_seed: int | None = None) -> AutoState:
    """Pages are allocated in CONTIGUOUS groups of W = pages_per_slot: the
    free list holds group ids, and a slot's page-table row is always
    [g*W, g*W+1, ..., g*W+W-1]. Allocation and freeing both move whole
    groups (the autonomous engine's full-grant model), so no fragmentation
    is possible — and the guaranteed contiguity lets the grouped Pallas
    kernel fetch multi-page runs with ONE DMA (contiguous_pages=True)."""
    B = engine_cfg.n_slots
    W = engine_cfg.pages_per_slot(model_cfg.n_seq)
    NP = engine_cfg.n_pages
    NG = NP // W
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
    )


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
    B = engine_cfg.n_slots
    W = st.page_table.shape[1]
    NP = engine_cfg.n_pages
    P = engine_cfg.page_size
    S = model_cfg.n_seq
    R_total = prompts_all.shape[0]
    S_pre = prompts_all.shape[1]

    NG = NP // W

    # ---- 1. free page GROUPS of dead-but-allocated slots (vectorized
    # push; a slot's row is a contiguous group, id = first page // W) ----
    to_free = (st.lengths == 0) & st.allocated
    free_ord = jnp.cumsum(to_free) - 1          # [B] position among freed
    nf = jnp.sum(to_free)
    push_pos = jnp.where(to_free, st.free_top + free_ord, NG)
    page_stack = st.page_stack.at[push_pos].set(
        st.page_table[:, 0] // W, mode="drop"
    )
    free_top = st.free_top + nf
    allocated = st.allocated & ~to_free

    # ---- 2. admission: pop queue head into dead slots, one group each ----
    dead = ~allocated
    remaining = n_real - st.queue_head
    m = jnp.minimum(
        jnp.minimum(jnp.sum(dead), max_new),
        jnp.minimum(remaining, free_top),
    ).astype(jnp.int32)
    slot_ids_all = jnp.nonzero(dead, size=B, fill_value=B)[0]
    admit_mask = jnp.arange(max_new) < m
    slot_ids = jnp.where(admit_mask, slot_ids_all[:max_new], B)  # B = drop
    req_ix = st.queue_head + jnp.arange(max_new, dtype=jnp.int32)
    req_ix_c = jnp.clip(req_ix, 0, R_total - 1)
    plens = jnp.where(admit_mask, plens_all[req_ix_c], 0)
    prompts = prompts_all[req_ix_c]  # [max_new, S_pre]
    # j-th admitted pops stack[free_top - 1 - j]
    gids = page_stack[jnp.clip(free_top - 1 - jnp.arange(max_new), 0, NG - 1)]
    granted = gids[:, None] * W + jnp.arange(W, dtype=jnp.int32)[None, :]
    page_table = st.page_table.at[slot_ids].set(granted, mode="drop")
    free_top = free_top - m
    queue_head = st.queue_head + m
    lengths = st.lengths.at[slot_ids].set(plens, mode="drop")
    last_prompt_tok = prompts[
        jnp.arange(max_new), jnp.clip(plens - 1, 0, S_pre - 1)
    ]
    last_tokens = st.last_tokens.at[slot_ids].set(last_prompt_tok, mode="drop")
    rid = st.rid.at[slot_ids].set(req_ix_c, mode="drop")
    allocated = allocated | jnp.zeros(B, bool).at[slot_ids].set(True, mode="drop")

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
    # into the output buffers ONCE per burst: XLA scatter cost is dominated
    # by a per-call fixed term, so one [R*B]-index scatter beats
    # n_forward_rounds separate [B]-index scatters (same economics as the
    # page-granular prefill write).
    R = engine_cfg.n_forward_rounds

    def round_fn(carry, _):
        kv, lengths, last, key = carry
        kv_pages = list(kv.kv_pages)
        k_scales, v_scales = list(kv.k_scales), list(kv.v_scales)
        live = lengths > 0
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
        # emitted token's position in its sequence = old length
        out_idx = jnp.where(live, rid * S + lengths, R_total * S)
        finished = live & (new_lengths == 0)
        fin_rid = jnp.where(finished, rid, R_total)
        new_last = jnp.where(live, tok, last)
        kv = PagedKVState(
            tuple(kv_pages), tuple(k_scales), tuple(v_scales)
        )
        return (kv, new_lengths, new_last, key), (tok, out_idx, fin_rid, lengths + 1)

    def run_rounds(carry):
        (kv, lengths, last, key, out_tokens, final_lens) = carry
        (kv, lengths, last, key), (toks, out_idx, fin_rid, fin_len) = jax.lax.scan(
            round_fn, (kv, lengths, last, key), None, length=R
        )
        out_tokens = (
            out_tokens.reshape(-1)
            .at[out_idx.reshape(-1)].set(toks.reshape(-1), mode="drop")
            .reshape(R_total, S)
        )
        final_lens = final_lens.at[fin_rid.reshape(-1)].set(
            fin_len.reshape(-1), mode="drop"
        )
        return (kv, lengths, last, key, out_tokens, final_lens)

    # chunked dispatch overshoots past completion by up to chunk-1 bursts;
    # skip the whole decode scan when no slot is live so those cost ~nothing
    (kv, lengths, last_tokens, rng_key, out_tokens, final_lens) = jax.lax.cond(
        jnp.any(lengths > 0),
        run_rounds,
        lambda c: c,
        (kv, lengths, last_tokens, st.rng_key, st.out_tokens, st.final_lens),
    )

    new_st = AutoState(
        kv, page_table, lengths, last_tokens, rid, allocated,
        queue_head, free_top, page_stack, out_tokens, final_lens, rng_key,
    )
    status = jnp.stack([
        jnp.sum(lengths > 0).astype(jnp.int32),
        queue_head,
        free_top,
    ])
    return new_st, status


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
                live, head, free = (int(x) for x in np.asarray(status))
            done = live == 0 and head >= n
            if not done and head >= n:
                # drain: queue empty, nothing to admit — compact live
                # slots to the front and drop to the smallest power-of-two
                # executable that still holds them
                while (
                    b_exec // 2 >= self.min_drain_slots
                    and live <= b_exec // 2
                ):
                    b_exec //= 2
                    st = _make_compact_slice(b_exec)(st)
            # Stall detection needs TWO consecutive no-progress chunks:
            # page freeing happens at the start of the NEXT burst, so a
            # chunk can legitimately end with live==0, head<n and a
            # too-small free count (all admitted slots finished inside the
            # chunk); the follow-up chunk frees their pages and proceeds.
            if live == 0 and head < n:
                if (head, free) == prev_status:
                    raise RuntimeError(
                        "autonomous engine stalled: pool exhausted"
                    )
                prev_status = (head, free)
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
    new — the prompt queue is a device buffer with spare capacity, so a
    submission is one async host->device row upload and a bump of the
    traced request count.

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
                 max_prompt_len: int):
        S = engine.model_cfg.n_seq
        assert max_prompt_len + 1 <= S
        self.engine = engine
        self.capacity = capacity
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

    def submit(self, requests: List[Request]) -> None:
        """Enqueue requests (one async upload; no recompilation)."""
        if not requests:
            return
        k = len(requests)
        assert self.n_submitted + k <= self.capacity, "session capacity"
        rows = np.zeros((k, self.s_pre), np.int32)
        lens = np.zeros((k,), np.int32)
        for i, req in enumerate(requests):
            assert 0 < len(req.tokens) <= self.max_prompt_len, (
                f"prompt length {len(req.tokens)} exceeds the session's "
                f"max_prompt_len={self.max_prompt_len}"
            )
            rows[i, : len(req.tokens)] = req.tokens
            lens[i] = len(req.tokens)
        self.prompts_dev = jax.lax.dynamic_update_slice(
            self.prompts_dev, jnp.asarray(rows), (self.n_submitted, 0)
        )
        self.plens_dev = jax.lax.dynamic_update_slice(
            self.plens_dev, jnp.asarray(lens), (self.n_submitted,)
        )
        self.n_submitted += k
        self._requests.extend(requests)
        self._plens.extend(int(x) for x in lens)

    def step(self) -> dict:
        """Dispatch one chunk of bursts; returns {live, queued, free}."""
        eng = self.engine
        for _ in range(eng.chunk):
            self.st, status = eng._burst(
                eng.params, self.st, self.prompts_dev, self.plens_dev,
                jnp.asarray(self.n_submitted, jnp.int32),
            )
        live, head, free = (int(x) for x in np.asarray(status))
        return {"live": live, "queued": self.n_submitted - head,
                "free_groups": free}

    def poll(self) -> List[Request]:
        """Fetch completions: returns finished Requests (tokens appended),
        each exactly once. One small fetch ([capacity] final_lens) decides
        which output rows to pull; only those rows move over the wire.

        The row gather is padded to a power-of-two bucket: a gather is a
        fresh executable per index-array SHAPE, and remote compiles are
        seconds each on this transport (CLAUDE.md) — unbucketed, every
        distinct completion count recompiled (measured 17s vs 4s on the
        serving bench)."""
        fl = np.asarray(self.st.final_lens)
        new = [i for i in range(self.n_submitted)
               if fl[i] > 0 and i not in self._collected]
        if not new:
            return []
        bucket = min(self.capacity, 1 << (len(new) - 1).bit_length())
        idx = np.zeros(bucket, np.int32)
        idx[: len(new)] = new
        rows = np.asarray(self.st.out_tokens[jnp.asarray(idx)])
        out = []
        for j, i in enumerate(new):
            req = self._requests[i]
            req.tokens.extend(rows[j, self._plens[i]: int(fl[i])].tolist())
            self._collected.add(i)
            out.append(req)
        return out

    def close(self) -> List[Request]:
        """Run the engine until every submitted request finishes; returns
        the remaining completions (like poll)."""
        eng = self.engine
        prev = None
        while True:
            s = self.step()
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
        return self.poll()

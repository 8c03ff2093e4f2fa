"""Engine and model configuration.

The reference has no config layer — every knob is either a compile-time
constant (/root/reference/include/constants.h) or a positional function
parameter (include/inferencer.h:18-32). Here the same knobs live in two
frozen dataclasses so they can parameterize jit-compiled step functions
(static hashable config) and the host scheduler alike.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from .constants import DEFAULT_INIT_NUM_BLOCKS, DEFAULT_PAGE_SIZE, EOF_TOKEN_ID


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shape of the model.

    The reference model (include/inference_model.h:8-74) is a single
    self-attention block: token+pos embedding -> one single-head attention
    -> weight-tied argmax decoder. ``n_layers``/``n_heads``/``ffn_dim``
    generalize it to a real multi-layer transformer; with
    ``n_layers=1, n_heads=1, ffn_dim=0, use_output_proj=False`` this is
    exactly the reference architecture.
    """

    n_vocab: int = 1024
    emb_dim: int = 64
    n_seq: int = 64  # max sequence length (prompt + generated), incl. cap
    n_layers: int = 1
    n_heads: int = 1
    ffn_dim: int = 0  # 0 = no FFN block (reference parity mode)
    use_output_proj: bool = False  # attention output projection Wo
    use_layernorm: bool = False  # pre-LN around attention/FFN
    dtype: str = "float32"  # compute/weight dtype: float32 | bfloat16
    eof_token_id: int = EOF_TOKEN_ID

    @property
    def head_dim(self) -> int:
        assert self.emb_dim % self.n_heads == 0
        return self.emb_dim // self.n_heads

    @property
    def jax_dtype(self):
        return jnp.dtype(self.dtype)

    def validate(self) -> None:
        assert self.n_vocab > 0 and self.emb_dim > 0 and self.n_seq > 0
        assert self.emb_dim % self.n_heads == 0
        assert 0 <= self.eof_token_id < self.n_vocab


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Shape of the continuous-batching engine.

    Mirrors the runtime parameters of the reference engine entry points
    (include/inferencer.h:18-32): ``n_slots`` = n_batch_size (batch slots),
    ``n_seq`` comes from ModelConfig, ``n_forward_rounds`` = device decode
    rounds per host step, plus the paged-KV pool geometry
    (paged_item_storage.h:10-44).
    """

    n_slots: int = 32
    n_forward_rounds: int = 1
    # --- paged KV pool ---
    page_size: int = DEFAULT_PAGE_SIZE
    n_pages: int = 256  # total pages in the device pool
    init_num_pages: int = DEFAULT_INIT_NUM_BLOCKS
    # KV cache dtype may differ from compute dtype: float32 | bfloat16 |
    # int8 (per-page scales) | int4 (per-page scales, two nibbles packed
    # per int8 byte — the pool's feature width is emb_dim/2).
    kv_dtype: str = "float32"
    # Max new requests prefilled per jitted prefill call; n_new is padded up
    # to this (static shape), larger batches loop. Keeps one compilation.
    max_prefill_batch: int = 32
    # Pages moved per DMA in the grouped kernel's contiguous mode (None =
    # whole compute block). Smaller runs gate fetches at finer length
    # granularity (fewer over-fetched bytes), larger runs issue fewer DMAs.
    pages_per_dma: int | None = None
    # Grouped-kernel slots per grid step (None = auto VMEM-budget chooser).
    # Trades grid-step count against per-step VMEM: wider groups batch more
    # page DMAs per step but cap pages_per_compute_block.
    attn_group_size: int | None = None
    # Ring decode (AutonomousEngine + grouped kernel): per-burst dense KV
    # ring with a single per-burst page flush instead of a full-page
    # write-back every round. Token-exact vs the fused-write path; False
    # keeps the per-round fused write (A/B + fallback).
    decode_ring: bool = True
    # Ring-mode attention formulation: False (default) = the per-slot
    # grouped kernel's partial mode; True = the flat cross-slot kernel
    # (ops/paged_attention_flat.py). The flat kernel was built to attack
    # the per-slot Mosaic op-issue cost (~0.56us/slot/layer, 5.96 of 7.89
    # ms/round attend on the 12-layer bench model) but MEASURED WORSE end
    # to end (ref 442k -> 308k, gpt2s 78k -> 64k tok/s): its constant op
    # count costs ~3 extra full-width elementwise passes over [G*bk, D]
    # f32 tensors per grid step (broadcast-q materialization, probs
    # expansion), which swamp the issue savings. Kept for A/B and for
    # shapes where bk is small.
    attn_flat: bool = False
    # Ring-mode attention formulation, round-4 attack on the same per-slot
    # op floor: the DENSE-VIEW XLA attend (ops/paged_attention_dense.py).
    # Full-grant group rows make the pool reshape to [NG, W, 2, P, D] for
    # free; the page partial becomes batched elementwise+reduce with a
    # device-side page-count bucket — zero per-slot ops. Engages only on
    # the contiguous-pages (autonomous) path; requires overcommit off
    # (half-group grants break the dense view). Wins at 1-2 page contexts
    # (gpt2s); the grouped kernel stays better at long contexts.
    attn_dense: bool = False
    # Ring-mode attention formulation, round-4 second attack on the op
    # floor: the DENSE-GRID Pallas kernel (ops/paged_attention_dgrid.py).
    # Grids over contiguous group blocks of the full-grant pool view with
    # regular BlockSpec pipelining (one block DMA per Gb slots instead of
    # per-slot copy chains), constant-op selector-dot compute per block,
    # and a scalar-prefetched per-block page-width gate. Engages only on
    # the contiguous-pages (autonomous) path; requires overcommit off and
    # unpacked KV (int8/float).
    attn_dgrid: bool = False
    # dgrid group-block rows per grid step (None = auto, largest of
    # 32/16/8/4/2/1 dividing the group count). Smaller blocks tighten the
    # per-block max-width gate (fewer wasted page reads at mixed context
    # lengths) at the cost of more grid steps.
    dgrid_block: int | None = None
    # AutonomousEngine sub-bursts: run the admit->prefill->decode->flush
    # body this many times INSIDE one jitted burst (n_forward_rounds must
    # divide evenly). Finer admission granularity without extra host
    # dispatches or status fetches: schedule_sim predicts slot-round
    # efficiency 0.628 -> 0.721 at ref shapes for 16 rounds split 4x4
    # (dead slots wait at most R/subbursts-1 rounds for a refill instead
    # of R-1). Costs: the burst traces the body subbursts times (compile
    # time), and the ring flush + admission block run per sub-burst.
    subbursts: int = 1
    # Ring mode x sub-bursts: True (default) sizes ONE ring for the whole
    # burst and flushes it ONCE at burst end — per-slot ring_r0 (the
    # absolute round a slot's occupant was admitted) masks pre-admission
    # ring columns, so sub-burst admission no longer multiplies the
    # per-layer flush cost (measured 73.2k -> 66.9k tok/s on the 12-layer
    # model at subbursts=2 when the flush ran per sub-burst). False = the
    # round-4 behavior: a fresh ring + flush per sub-burst (A/B fallback).
    # No effect at subbursts=1 (one sub-burst IS the burst).
    burst_flush: bool = True
    # Sort each admission wave by prompt length before assigning slots and
    # page groups (full-grant path only). Greedy determinism makes the
    # slot/group permutation output-invisible; the point is LENGTH
    # CLUSTERING: the dgrid kernel gates page streaming per group BLOCK at
    # the block's max context width, so a wave of random-length prompts
    # scattered across blocks makes every block pay the widest slot's
    # reads forever (and keeps blocks half-alive through the drain).
    # Sorted admission gives width-homogeneous blocks that also die
    # together. No effect on the grouped kernel's per-slot gating.
    sort_admits: bool = False
    # AutonomousEngine overcommit: admit with HALF a slot's pages (a
    # half-group of pages_per_slot/2 contiguous pages), grow on demand with
    # an n_forward_rounds lookahead, preempt the YOUNGEST live slots when
    # the pool runs dry (re-queued on a device retry stack; greedy
    # determinism makes recompute token-exact). False = full grant (a slot
    # gets all its pages at admission; no growth or preemption).
    overcommit: bool = False

    @property
    def kv_jax_dtype(self):
        # int4 KV is stored packed two-per-byte in an int8 pool (the int4
        # dtype itself does not materialize on this toolchain)
        if self.kv_dtype == "int4":
            return jnp.dtype(jnp.int8)
        return jnp.dtype(self.kv_dtype)

    @property
    def kv_packed(self) -> bool:
        return self.kv_dtype == "int4"

    @property
    def kv_quantized(self) -> bool:
        return self.kv_dtype in ("int8", "int4")

    def pages_per_slot(self, n_seq: int) -> int:
        """Width of a page-table row (reference: n_sequence/PAGE_BLOCK_SIZE,
        paged_item_storage.cpp:158-162)."""
        return math.ceil(n_seq / self.page_size)

    def validate(self, model: ModelConfig) -> None:
        assert self.n_slots > 0 and self.n_pages > 0
        assert self.kv_dtype in ("float32", "bfloat16", "int8", "int4"), (
            f"unsupported kv_dtype {self.kv_dtype!r}"
        )
        # int4 packs two values per byte within each head's feature block
        assert not (self.kv_packed and model.head_dim % 2), (
            "int4 KV needs an even head_dim (two features pack per byte)"
        )
        # Reference asserts 0 < n_forward_rounds <= PAGE_BLOCK_SIZE so at most
        # one page per slot must be grown per host round
        # (paged_item_storage.cpp:21).
        assert 0 < self.n_forward_rounds <= self.page_size
        assert self.init_num_pages > 0
        assert self.max_prefill_batch > 0
        # A pool smaller than one admission grant can never admit anything —
        # reject at construction rather than stalling at runtime.
        assert self.n_pages >= self.init_num_pages, (
            f"n_pages={self.n_pages} < init_num_pages={self.init_num_pages}: "
            "pool can never admit a request"
        )
        assert self.n_pages >= self.pages_per_slot(model.n_seq), (
            f"n_pages={self.n_pages} cannot hold one full sequence "
            f"({self.pages_per_slot(model.n_seq)} pages)"
        )
        if self.overcommit:
            W = self.pages_per_slot(model.n_seq)
            assert W >= 2, "overcommit needs >= 2 pages per slot (half-grants)"
            half = W // 2
            # contiguous-run DMAs must stay inside one half-group
            assert (self.pages_per_dma or 1) <= half, (
                "pages_per_dma must fit a half-group under overcommit"
            )
            assert not (self.attn_dense or self.attn_dgrid), (
                "attn_dense/attn_dgrid need full-grant contiguous group "
                "rows; overcommit grants half-groups"
            )
        assert self.attn_dense + self.attn_flat + self.attn_dgrid <= 1, (
            "attn_dense, attn_flat and attn_dgrid are mutually exclusive "
            "ring formulations"
        )
        assert not (self.attn_dense or self.attn_dgrid) or self.decode_ring, (
            "attn_dense/attn_dgrid implement the ring partial contract only"
        )
        assert not (self.attn_dgrid and self.kv_packed), (
            "attn_dgrid does not support packed int4 KV (per-head nibble "
            "planes defeat the whole-block selector dot)"
        )
        assert self.subbursts >= 1 and (
            self.n_forward_rounds % self.subbursts == 0
        ), "subbursts must divide n_forward_rounds"
        if self.decode_ring and self.kv_quantized:
            # ring scale columns live in a [B, 128] buffer: cols r = K,
            # 64 + r = V — the ring span is capped at 64 rounds
            span = (self.n_forward_rounds
                    if (self.burst_flush and self.subbursts > 1)
                    else self.n_forward_rounds // self.subbursts)
            assert span <= 64, (
                f"ring span {span} rounds exceeds the 64-round scale-column "
                "buffer (split with subbursts or disable burst_flush)"
            )

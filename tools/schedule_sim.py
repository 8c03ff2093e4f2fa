"""Host simulation of the AutonomousEngine schedule at bench shapes.

The bench workload is fully deterministic (EOF-biased random weights run
every sequence to the n_seq cap), so the admission/decode schedule can be
replayed on the host exactly: this reports rounds executed, the liveness
trajectory, prefill invocations, and the ideal-vs-actual slot-round
efficiency — the data that decides whether the next optimization is the
kernel, the prefill, or the engine-loop structure.

Usage: python tools/schedule_sim.py [--rounds 16] [--max-new 256]
       [--chunk 24] [--per-round-admission]
"""

from __future__ import annotations

import argparse

import numpy as np


def simulate(n_req=2048, n_slots=1024, n_seq=128, max_prompt=64,
             rounds=16, max_new=256, chunk=24, seed=0,
             per_round_admission=False, verbose=True):
    rng = np.random.default_rng(seed)
    plens = rng.integers(1, max_prompt + 1, n_req)
    # decode rounds needed: from len=plen to len=n_seq -> n_seq - plen tokens
    need = n_seq - plens

    slot_left = np.zeros(n_slots, np.int64)   # remaining tokens per slot
    head = 0
    live_rounds = 0          # slot-rounds that produced a token
    exec_rounds = 0          # rounds where the decode scan actually ran
    noop_bursts = 0
    bursts = 0
    prefill_events = 0
    prefill_rows = 0         # admitted rows (cost ~ padded max_new though)
    liveness = []

    def admit():
        nonlocal head, prefill_events, prefill_rows
        dead = np.flatnonzero(slot_left == 0)
        m = min(len(dead), max_new, n_req - head)
        if m > 0:
            slot_left[dead[:m]] = need[head:head + m]
            head += m
            prefill_events += 1
            prefill_rows += m

    done = False
    while not done:
        for _ in range(chunk):
            bursts += 1
            if not per_round_admission:
                admit()
            if slot_left.sum() == 0 and head >= n_req:
                noop_bursts += 1
                continue
            for _ in range(rounds):
                if per_round_admission:
                    admit()
                live = int((slot_left > 0).sum())
                if live == 0:
                    continue
                exec_rounds += 1
                live_rounds += live
                liveness.append(live)
                np.subtract(slot_left, 1, out=slot_left,
                            where=slot_left > 0)
        done = slot_left.sum() == 0 and head >= n_req
    total_tokens = int(need.sum())
    ideal_rounds = -(-total_tokens // n_slots)
    if verbose:
        print(f"requests={n_req} tokens={total_tokens} "
              f"rounds/burst={rounds} max_new={max_new} chunk={chunk} "
              f"per_round_admission={per_round_admission}")
        print(f"bursts={bursts} (noop {noop_bursts})  "
              f"exec_rounds={exec_rounds}  ideal_rounds={ideal_rounds}")
        print(f"slot-round efficiency: {total_tokens / (exec_rounds * n_slots):.3f}"
              f"  (ideal {total_tokens / (ideal_rounds * n_slots):.3f})")
        print(f"mean live while executing: {np.mean(liveness):.1f} / {n_slots}")
        print(f"prefill events={prefill_events} rows={prefill_rows} "
              f"(padded cost ~ {prefill_events} x [{max_new} x 64] blocks)")
    return dict(bursts=bursts, exec_rounds=exec_rounds,
                ideal_rounds=ideal_rounds, total_tokens=total_tokens,
                prefill_events=prefill_events, liveness=liveness)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--per-round-admission", action="store_true")
    args = ap.parse_args()
    simulate(rounds=args.rounds, max_new=args.max_new, chunk=args.chunk,
             per_round_admission=args.per_round_admission)


if __name__ == "__main__":
    main()



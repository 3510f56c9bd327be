#!/usr/bin/env python
"""K-dispatch coverage over the reference's full 130k-step schedule.

VERDICT r4 weak 7: `_k_window_ok` falls back to single-step dispatch around
every milestone / split / compaction boundary, and the fraction of steps
that actually run inside a K=8 scanned window over a REAL schedule was
unreported.  This simulates the dispatcher loop with the exact predicate
conditions from ``GFNerfPipeline._k_window_ok``
(gfnerf_tpu/pipelines/pipeline.py) at the reference schedule
(/root/reference/gfnerf/config.py:43-58: 30k init + 10 splits x 10k focal,
compaction every 1000 steps, subdivision milestones 2k..10k).

The live counters (`trainer` prints "K-dispatch coverage" at run end) report
the same quantity measured; this gives the schedule-level expectation
without needing a 130k-step run.
"""

from __future__ import annotations

import json

K = 8
INIT = 30_000
N_SPLITS = 10
SPLIT_STEPS = 10_000
TOTAL = INIT + N_SPLITS * SPLIT_STEPS
COMPACT_FREQ = 1_000
MILESTONES = [2_000, 4_000, 6_000, 8_000, 10_000]


def stage_of(step: int) -> int:
    return 0 if step < INIT else 1


def cur_split_idx(step: int) -> int:
    return 0 if step < INIT else (step - INIT) // SPLIT_STEPS


def window_ok(step: int, milestones: list) -> bool:
    # mirrors GFNerfPipeline._k_window_ok condition for condition
    if step + K > TOTAL:
        return False
    if len({stage_of(step + i) for i in range(K)}) > 1:
        return False
    if stage_of(step) == 1:
        if len({cur_split_idx(step + i) for i in range(K)}) > 1:
            return False
    else:
        if milestones and milestones[0] <= step + K - 1:
            return False
        if any((step + i) > 0 and (step + i) % COMPACT_FREQ == 0
               for i in range(K)):
            return False
    return True


def main():
    milestones = list(MILESTONES)
    step = scanned = fallback = dispatches = 0
    while step < TOTAL:
        while milestones and step > milestones[0]:
            milestones.pop(0)
        if window_ok(step, milestones):
            scanned += K
            step += K
        else:
            fallback += 1
            step += 1
            if milestones and step > milestones[0]:
                milestones.pop(0)
        dispatches += 1
    out = {
        "schedule": f"{INIT} init + {N_SPLITS}x{SPLIT_STEPS} focal",
        "K": K,
        "total_steps": TOTAL,
        "steps_scanned": scanned,
        "steps_single": fallback,
        "dispatches": dispatches,
        "coverage": scanned / TOTAL,
        "dispatch_reduction": TOTAL / dispatches,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

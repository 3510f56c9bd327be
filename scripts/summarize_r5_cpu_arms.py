#!/usr/bin/env python
"""Summarize the round-5 CPU-scale quality arms into one table.

Arms (scripts launched per QUALITY.md finding 9): packed residual base,
anchored layout (packed-vs-anchored delta, VERDICT r3/r4 ask 6), finetune,
finetune+trust. Usage: python scripts/summarize_r5_cpu_arms.py
"""

import json
from pathlib import Path

ARMS = [
    ("residual base (packed)", "results/q_r5_packed_cpu.json"),
    ("anchored layout", "results/q_r5_anchored_cpu.json"),
    ("finetune", "results/q_r5_finetune_cpu.json"),
    ("finetune + trust 10", "results/q_r5_finetune_trust_cpu.json"),
]


def main():
    rows = []
    for name, path in ARMS:
        p = Path(path)
        if not p.exists():
            rows.append((name, None))
            continue
        d = json.loads(p.read_text())
        ai = d.get("after_init", {})
        fi = d.get("final", {})
        rows.append((name, {
            "after_init_psnr": ai.get("psnr"),
            "final_psnr": fi.get("psnr"),
            "delta": (fi.get("psnr") - ai.get("psnr")
                      if ai.get("psnr") is not None
                      and fi.get("psnr") is not None else None),
            "after_init_ssim": ai.get("ssim"),
            "final_ssim": fi.get("ssim"),
            "minutes": d.get("minutes"),
            "baselines": d.get("baselines"),
        }))
    print("| arm | after_init PSNR | final (routed) PSNR | delta | minutes |")
    print("|---|---|---|---|---|")
    for name, r in rows:
        if r is None:
            print(f"| {name} | (pending) | | | |")
            continue
        f = lambda v, n=2: ("" if v is None else f"{v:.{n}f}")
        print(f"| {name} | {f(r['after_init_psnr'])} | {f(r['final_psnr'])} "
              f"| {f(r['delta'])} | {f(r['minutes'], 1)} |")
    for name, r in rows:
        if r and r.get("baselines"):
            print(f"\ntrivial baselines: {r['baselines']}")
            break


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Summarize focal-fix ablation JSONs (quality_run outputs) into one table.

Usage: python scripts/summarize_focal_ablations.py results/q_*  [--out FILE]

Each input is a quality_run --diag JSON; the table reports after_init vs the
final routed/shared/per-block PSNRs and the verdict column the round-4 bar
cares about: routed final - after_init (positive = the focal stage helps).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def row(path: Path) -> dict:
    d = json.loads(path.read_text())
    after = d.get("after_init", {})
    final = d.get("final", {})
    routed = final.get("routed", final) if isinstance(final, dict) else {}
    out = {
        "name": path.stem,
        "after_init": after.get("psnr"),
        "routed_final": routed.get("psnr"),
        "shared_final": (final.get("shared_only") or {}).get("psnr")
        if isinstance(final, dict) else None,
        "mean_baseline": (d.get("baselines") or {}).get("mean_psnr"),
    }
    blocks = sorted(k for k in (final or {}) if k.startswith("block"))
    for b in blocks:
        out[b] = final[b].get("psnr")
    if out["after_init"] is not None and out["routed_final"] is not None:
        out["delta"] = round(out["routed_final"] - out["after_init"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", type=Path)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()
    rows = [row(p) for p in args.paths if p.exists()]
    cols = ["name", "after_init", "routed_final", "delta", "shared_final",
            "mean_baseline"]
    extra = sorted({k for r in rows for k in r} - set(cols))
    cols += extra
    fmt = lambda v: ("" if v is None else
                     f"{v:.2f}" if isinstance(v, float) else str(v))
    widths = [max(len(c), *(len(fmt(r.get(c))) for r in rows))
              for c in cols]
    print("  ".join(c.ljust(w) for c, w in zip(cols, widths)))
    for r in rows:
        print("  ".join(fmt(r.get(c)).ljust(w)
                        for c, w in zip(cols, widths)))
    if args.out:
        args.out.write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()

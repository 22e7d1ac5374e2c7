"""Assemble QUALITY.md — the committed quality anchor (round-3 VERDICT
next-step #5) — from the gate-chain outputs:

* ``_outputs/gate_summary.md``  (scripts/summarize_gate.py: MOT mean±std
  over >=3 sequences x 2 seeds per candidate config, + SHIPPABLE calls)
* ``_outputs/eval_ap.md``       (scripts/eval_ap.py: per-class AP@0.5 of
  the long-trained detector at bf16 and shipped int8)

plus the checkpoint provenance (training steps from the .step sidecars).
Every future perf lever A/Bs against this file instead of 1000-step demo
nets. Mirrors the reference's csv_eval per-class report + multi-sequence
eval loops (csv_eval.py:156; minimal_3D_track.py:944-1005).

    python scripts/make_quality.py   # writes QUALITY.md at the repo root
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read(path):
    p = os.path.join(ROOT, path)
    return open(p).read() if os.path.exists(p) else None


def main():
    gate = read("_outputs/gate_summary.md")
    ap = read("_outputs/eval_ap.md")
    missing = [n for n, v in [("gate_summary", gate), ("eval_ap", ap)] if v is None]
    if missing:
        print(f"missing inputs: {missing} — run scripts/round4_followup.sh first")
        sys.exit(1)

    det_step = read("_outputs/mc_det.npz.step") or "?"
    crop_step = read("_outputs/mc_crop.npz.step") or "?"

    out = []
    out.append("# QUALITY — committed quality anchor\n")
    out.append(
        f"Generated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())} on the "
        "real TPU from the long-trained gate checkpoints "
        f"(detector {det_step.strip()} steps, crop net {crop_step.strip()} steps; "
        "`_outputs/mc_det.npz` / `_outputs/mc_crop.npz`, resumable sidecars).\n"
    )
    out.append(
        "All MOT rows are mean ± std over fresh sequences × render seeds with "
        "the SAME trained networks (no oracle anywhere); AP rows are a held-out "
        "unaugmented synthetic eval set (seed 1234), 64 frames.\n"
    )
    out.append("## Per-class AP@0.5 (full-frame detector, s2d stem)\n")
    out.append("```\n" + ap.strip() + "\n```\n")
    out.append("## MOT quality gates (candidate ship configs)\n")
    out.append("```\n" + gate.strip() + "\n```\n")
    out.append(
        "## How to regenerate\n\n"
        "1. `bash scripts/gate_cadence.sh` (trains + A/Bs; resumable)\n"
        "2. `bash scripts/round4_followup.sh` (AP eval + summaries)\n"
        "3. `python scripts/make_quality.py`\n"
    )
    with open(os.path.join(ROOT, "QUALITY.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote QUALITY.md")


if __name__ == "__main__":
    main()

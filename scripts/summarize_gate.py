"""Digest the cadence quality-gate logs into one markdown table.

scripts/gate_cadence.sh writes _outputs/gate_<tag>.log per configuration;
each log ends with demo_e2e_mc's aggregate block:

    ... MC e2e metrics over N runs (trained det + crop nets, d=3, s=1,
        size_nudge=False): mean +- std
      Recall      : 0.901 +- 0.012
      ...

This parses every gate log, prints per-run lines and the mean±std table
side by side, and emits the BENCHMARKS.md-ready markdown.

  python scripts/summarize_gate.py [_outputs]
"""

import glob
import os
import re
import sys

KEYS = ["Recall", "Precision", "MOTA", "ID switches"]


def parse_log(path):
    text = open(path).read()
    header = re.findall(
        r"MC e2e metrics over (\d+) runs \((.*?)\): mean \+- std", text, re.S
    )
    if not header:
        return None
    n_runs, cfg = header[-1]
    stats = {}
    # the aggregate block is the last occurrence of each key line
    for k in KEYS:
        m = re.findall(
            rf"^\s*{re.escape(k)}\s*:\s*(-?[\d.]+) \+- ([\d.]+)", text, re.M
        )
        if m:
            stats[k] = (float(m[-1][0]), float(m[-1][1]))
    runs = re.findall(
        r"seq seed=(\d+) render=(\d+): recall ([-\d.]+) precision ([-\d.]+) "
        r"MOTA ([-\d.]+) IDs ([-\d.]+)",
        text,
    )
    return {"n": int(n_runs), "cfg": " ".join(cfg.split()), "stats": stats, "runs": runs}


def verdict_vs_base(base, cand, tol=0.02):
    """(verdict, dMOTA, sem, paired) for a candidate gate vs the baseline.

    Gate runs use FIXED (scene seed, render seed) pairs precisely so A/B
    runs are comparable; when the candidate ran the same pairs, the paired
    per-scene MOTA differences isolate the cadence effect from scene
    difficulty (seed 47 is simply a harder scene than seed 99 — unpaired,
    that scene spread lands in the sem and drowns the signal). Falls back
    to the unpaired mean/sem comparison when the run keys do not align.
    """
    b_runs = {(ss, rs): float(mota) for ss, rs, _, _, mota, _ in base["runs"][-base["n"]:]}
    c_runs = {(ss, rs): float(mota) for ss, rs, _, _, mota, _ in cand["runs"][-cand["n"]:]}
    common = sorted(set(b_runs) & set(c_runs))
    if len(common) >= 3 and len(common) == len(b_runs) == len(c_runs):
        diffs = [c_runs[k] - b_runs[k] for k in common]
        n = len(diffs)
        delta = sum(diffs) / n
        var = sum((d - delta) ** 2 for d in diffs) / n
        sem = (var / n) ** 0.5
        paired = True
    else:
        b_mu, b_sd = base["stats"]["MOTA"]
        mu, sd = cand["stats"]["MOTA"]
        delta = mu - b_mu
        sem = (b_sd ** 2 / max(base["n"], 1) + sd ** 2 / max(cand["n"], 1)) ** 0.5
        paired = False
    if delta - sem >= -tol:
        verdict = "SHIPPABLE"
    elif delta >= -tol:
        verdict = "MARGINAL"
    else:
        verdict = "blocked"
    return verdict, delta, sem, paired


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "_outputs"
    rows = []
    for path in sorted(glob.glob(os.path.join(outdir, "gate_*.log"))):
        tag = os.path.basename(path)[5:-4]
        if tag.startswith("cadence"):
            continue
        parsed = parse_log(path)
        if parsed is None:
            print(f"{tag}: no aggregate block yet ({path})")
            continue
        rows.append((tag, parsed))
        print(f"== {tag}: {parsed['cfg']} ({parsed['n']} runs)")
        for ss, rs, rec, prec, mota, ids in parsed["runs"][-parsed["n"]:]:
            print(
                f"   seed={ss} render={rs}: recall {rec} precision {prec} "
                f"MOTA {mota} IDs {ids}"
            )

    if not rows:
        return
    print("\n| Config | Recall | Precision | MOTA | ID switches |")
    print("|---|---|---|---|---|")
    for tag, parsed in rows:
        cells = []
        for k in KEYS:
            mu_sd = parsed["stats"].get(k)
            cells.append("—" if mu_sd is None else f"{mu_sd[0]:.3f} ± {mu_sd[1]:.3f}")
        print(f"| {tag} ({parsed['cfg']}) | " + " | ".join(cells) + " |")

    # ship decision: a candidate may replace the d3 default only if its mean
    # MOTA drop is within SHIP_TOL even after allowing one standard error of
    # the difference (so the call is not made on noise):
    #   SHIPPABLE  delta - sem >= -SHIP_TOL   (drop bounded even pessimistically)
    #   MARGINAL   delta >= -SHIP_TOL but the sem-adjusted bound fails
    #              (point estimate passes; add runs to tighten sem)
    #   blocked    delta < -SHIP_TOL
    SHIP_TOL = 0.02
    by_tag = dict(rows)
    base = by_tag.get("d3")
    if base is None or "MOTA" not in base["stats"]:
        return
    b_mu, b_sd = base["stats"]["MOTA"]
    print(f"\nShip decision vs d3 baseline (MOTA {b_mu:.3f} ± {b_sd:.3f}, tol {SHIP_TOL}):")
    for tag, parsed in rows:
        if tag == "d3" or "MOTA" not in parsed["stats"]:
            continue
        verdict, delta, sem, paired = verdict_vs_base(base, parsed, SHIP_TOL)
        if verdict == "MARGINAL":
            verdict = "MARGINAL (within tol but not beyond noise; add runs)"
        kind = "paired" if paired else "unpaired"
        print(f"  {tag:>22}: dMOTA {delta:+.3f} ({kind} sem {sem:.3f}) -> {verdict}")


if __name__ == "__main__":
    main()

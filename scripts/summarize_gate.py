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
    b_n = max(base["n"], 1)
    print(f"\nShip decision vs d3 baseline (MOTA {b_mu:.3f} ± {b_sd:.3f}, tol {SHIP_TOL}):")
    for tag, parsed in rows:
        if tag == "d3" or "MOTA" not in parsed["stats"]:
            continue
        mu, sd = parsed["stats"]["MOTA"]
        n = max(parsed["n"], 1)
        delta = mu - b_mu
        # standard error of the difference of the two run-means
        sem = (b_sd**2 / b_n + sd**2 / n) ** 0.5
        if delta - sem >= -SHIP_TOL:
            verdict = "SHIPPABLE"
        elif delta >= -SHIP_TOL:
            verdict = "MARGINAL (within tol but not beyond noise; add runs)"
        else:
            verdict = "blocked"
        print(f"  {tag:>18}: dMOTA {delta:+.3f} (sem {sem:.3f}) -> {verdict}")


if __name__ == "__main__":
    main()

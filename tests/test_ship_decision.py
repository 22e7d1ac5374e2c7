"""Ship-decision automation: gate verdicts + candidate fps -> bench_config.json.

The round-4 close-the-loop piece: scripts/ship_decision.py must pick the
fastest quality-SHIPPABLE cadence candidate from the gate/bench logs and
bench.py must honor bench_config.json as its default knobs (env overrides).
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ship = _load("ship_decision", os.path.join(REPO, "scripts", "ship_decision.py"))


def _gate_log(path, cfg, runs):
    """Write a demo_e2e_mc-style gate log with the aggregate block."""
    import numpy as np

    lines = []
    for i, (rec, prec, mota, ids) in enumerate(runs):
        lines.append(
            f"seq seed={99 + i} render={5 + i}: recall {rec:.3f} "
            f"precision {prec:.3f} MOTA {mota:.3f} IDs {ids}"
        )
    motas = np.array([r[2] for r in runs])
    recs = np.array([r[0] for r in runs])
    lines.append(
        f"MC e2e metrics over {len(runs)} runs ({cfg}): mean +- std"
    )
    lines.append(f"  Recall      : {recs.mean():.3f} +- {recs.std():.3f}")
    lines.append(f"  Precision   : 0.900 +- 0.010")
    lines.append(f"  MOTA        : {motas.mean():.3f} +- {motas.std():.3f}")
    lines.append(f"  ID switches : 1.000 +- 0.500")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def _bench_log(path, entries):
    with open(path, "w") as fh:
        for tag, fps in entries:
            fh.write(f"--- {tag}: BENCH_STUFF=1 (date)\n")
            fh.write(json.dumps({
                "metric": "detect_track_fps_1080p_resnet50",
                "value": fps, "unit": "frames/sec/chip",
                "vs_baseline": fps / 500.0,
            }) + "\n")


def test_picks_fastest_shippable(tmp_path):
    out = str(tmp_path)
    base_runs = [(0.9, 0.9, 0.80, 1), (0.9, 0.9, 0.79, 1), (0.9, 0.9, 0.80, 0)]
    _gate_log(os.path.join(out, "gate_d3.log"), "d=3, s=1", base_runs)
    # d6 within tolerance, d6s2 clearly blocked
    _gate_log(os.path.join(out, "gate_d6_nudge.log"), "d=6, s=1",
              [(0.9, 0.9, 0.79, 1), (0.9, 0.9, 0.80, 1), (0.9, 0.9, 0.79, 2)])
    _gate_log(os.path.join(out, "gate_d6s2_nudge.log"), "d=6, s=2",
              [(0.7, 0.8, 0.60, 5), (0.7, 0.8, 0.58, 6), (0.7, 0.8, 0.61, 7)])
    _bench_log(os.path.join(out, "bench_candidates.log"),
               [("d3_shipped", 386.0), ("d6_nudge", 508.0), ("d6s2_nudge", 745.0)])

    cfg, report, msg = ship.decide(out)
    assert cfg is not None, msg
    assert cfg["tag"] == "d6_nudge"  # d6s2 faster but quality-blocked
    assert cfg["knobs"] == {"BENCH_DET_STEP": "6", "BENCH_SIZE_NUDGE": "1"}
    assert report["verdicts"]["d6s2_nudge"]["verdict"] == "blocked"
    assert cfg["quality_gate"]["verdict"] == "SHIPPABLE"


def test_paired_verdict_isolates_scene_difficulty(tmp_path):
    """High scene-to-scene MOTA spread with a tiny uniform candidate delta:
    unpaired sem (~0.18) would drown the comparison to MARGINAL, but the
    gates run fixed scene/render seeds, so the paired per-scene differences
    (uniformly -0.01) certify SHIPPABLE."""
    out = str(tmp_path)
    # hard scene 0.35, medium 0.62, easy 0.87 — like the real d3 gate
    base_runs = [(0.9, 0.9, 0.87, 0), (0.9, 0.9, 0.62, 1), (0.8, 0.8, 0.35, 3)]
    cand_runs = [(0.9, 0.9, 0.86, 0), (0.9, 0.9, 0.61, 1), (0.8, 0.8, 0.34, 3)]
    _gate_log(os.path.join(out, "gate_d3.log"), "d=3, s=1", base_runs)
    _gate_log(os.path.join(out, "gate_d6_nudge.log"), "d=6, s=1", cand_runs)
    _bench_log(os.path.join(out, "bench_candidates.log"),
               [("d3_shipped", 386.0), ("d6_nudge", 508.0)])
    cfg, report, msg = ship.decide(out)
    assert report["verdicts"]["d6_nudge"]["verdict"] == "SHIPPABLE"
    assert abs(report["verdicts"]["d6_nudge"]["dMOTA"] + 0.01) < 1e-6
    assert report["verdicts"]["d6_nudge"]["sem"] < 0.005  # paired, not 0.2
    assert cfg is not None and cfg["tag"] == "d6_nudge"


def test_no_shippable_keeps_d3(tmp_path):
    out = str(tmp_path)
    _gate_log(os.path.join(out, "gate_d3.log"), "d=3",
              [(0.9, 0.9, 0.80, 1), (0.9, 0.9, 0.80, 1)])
    _gate_log(os.path.join(out, "gate_d6.log"), "d=6",
              [(0.7, 0.9, 0.70, 3), (0.7, 0.9, 0.71, 4)])
    cfg, report, msg = ship.decide(out)
    assert cfg is None
    assert "d3 default stands" in msg


def test_no_evidence(tmp_path):
    cfg, report, msg = ship.decide(str(tmp_path))
    assert cfg is None
    assert "no gate evidence" in msg


def test_candidate_slower_than_baseline_keeps_d3(tmp_path):
    out = str(tmp_path)
    _gate_log(os.path.join(out, "gate_d3.log"), "d=3",
              [(0.9, 0.9, 0.80, 1), (0.9, 0.9, 0.80, 1)])
    _gate_log(os.path.join(out, "gate_d6.log"), "d=6",
              [(0.9, 0.9, 0.80, 1), (0.9, 0.9, 0.80, 1)])
    _bench_log(os.path.join(out, "bench_candidates.log"),
               [("d3_shipped", 400.0), ("d6", 390.0)])
    cfg, report, msg = ship.decide(out)
    assert cfg is None and "d3 default stands" in msg


def test_bench_knob_reads_ship_config(tmp_path, monkeypatch):
    bench = _load("bench_mod", os.path.join(REPO, "bench.py"))
    cfg_path = str(tmp_path / "bench_config.json")
    with open(cfg_path, "w") as fh:
        json.dump({"tag": "d6_nudge",
                   "knobs": {"BENCH_DET_STEP": "6", "BENCH_SIZE_NUDGE": "1"}}, fh)
    monkeypatch.setattr(bench, "_SHIP_CONFIG_PATH", cfg_path)
    monkeypatch.setattr(bench, "_ship_knobs", None)
    monkeypatch.delenv("BENCH_DET_STEP", raising=False)
    assert bench._knob("BENCH_DET_STEP", "3") == "6"
    assert bench._knob("BENCH_SIZE_NUDGE", "0") == "1"
    assert bench._knob("BENCH_CROP_SLOTS", "32") == "32"  # untouched default
    monkeypatch.setenv("BENCH_DET_STEP", "12")  # env wins
    assert bench._knob("BENCH_DET_STEP", "3") == "12"

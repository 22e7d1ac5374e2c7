"""Capture a device profile of the shipped clip step (VERDICT r3 #1).

Tries jax.profiler trace capture through the axon tunnel; if xplane/trace
artifacts appear, summarizes the top device ops. Independently prints the
compiled HLO cost analysis and the largest fusions of the clip program —
attribution for the 0.42 ms in-scan crop delta and the detect-step tail.

Run exclusively (one TPU process):  python scripts/profile_clip.py
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from playground3d_tpu.data.video import pack_s2d
    from playground3d_tpu.data.toy_cameras import register_bench_camera
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.models.quant import quantize_detector
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.config import TrackerConfig

    H, W = 1080, 1920
    reg, _ = register_bench_camera(image_hw=(H, W))

    # same knobs as bench.py so any candidate ship config can be traced
    # (e.g. PROFILE_DET_STEP=6 PROFILE_CROP_SLOTS=16 for the d=6 slot study)
    cfg = TrackerConfig(
        max_tracks=64, max_dets=48, pre_topk=512, x_range=(300.0, 800.0),
        det_step=int(os.environ.get("PROFILE_DET_STEP", "3")),
        skip_step=int(os.environ.get("PROFILE_SKIP_STEP", "1")),
        crop_slots=int(os.environ.get("PROFILE_CROP_SLOTS", "32")),
        cd_max=8, cs=112,
        estimate_ts_bias=False, approx_topk=True,
        size_nudge=os.environ.get("PROFILE_SIZE_NUDGE", "0") == "1",
    )
    kfp = default_params()
    bank = bank_from_registry(reg)
    centers = jnp.asarray(np.array([[565.0, 60.0]], np.float32))
    det_params = retinanet_init(jax.random.PRNGKey(0), num_classes=8, depth=50, stem="s2d")
    crop_params = retinanet_init(
        jax.random.PRNGKey(1), num_classes=8, depth=18, stem="s2d",
        tower_depth=2, shared_tower=True,
    )
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    packed = pack_s2d(raw)
    det_params = quantize_detector(det_params, packed[None], 50, stem="s2d")
    crop_calib = rng.integers(0, 256, (4, 28, 28, 48), dtype=np.uint8)
    crop_params = quantize_detector(crop_params, crop_calib, 18, stem="s2d")

    clip = make_mc_clip_step(
        det_params, 50, bank, centers, kfp, cfg,
        crop_params=crop_params, crop_depth=18, stem="s2d", crop_stem="s2d",
    )
    T_CLIP = 24
    frames = jnp.asarray(np.broadcast_to(packed[None, None], (T_CLIP, 1) + packed.shape).copy())
    times = jnp.asarray(np.arange(T_CLIP, dtype=np.float32)[:, None] / 30.0)
    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((1,), jnp.float32)

    print("devices:", jax.devices(), flush=True)
    # warm/compile
    st, tb, snaps = clip(state0, bias0, frames, times, jnp.int32(0))
    jax.block_until_ready(snaps.states7)
    print("warm done", flush=True)

    # ---- attempt trace capture ----------------------------------------------
    import shutil
    log_dir = "/tmp/pg3d_profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    ok = False
    try:
        with jax.profiler.trace(log_dir):
            for i in range(3):
                st, tb, snaps = clip(st, tb, frames, times, jnp.int32(i * T_CLIP))
            jax.block_until_ready(snaps.states7)
        arts = glob.glob(log_dir + "/**/*", recursive=True)
        files = [a for a in arts if os.path.isfile(a)]
        print("trace artifacts:", files, flush=True)
        ok = any("xplane" in a or "trace" in a for a in files)
    except Exception as e:
        print("trace capture failed:", repr(e), flush=True)

    if ok:
        tj = sorted(glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)[-1:]
        if tj:
            with gzip.open(tj[0], "rt") as fjs:
                trace = json.load(fjs)
            evs = [
                e for e in trace.get("traceEvents", [])
                if e.get("ph") == "X" and e.get("dur", 0) > 0
            ]
            agg = {}
            for e in evs:
                agg.setdefault(e["name"], [0, 0.0])
                agg[e["name"]][0] += 1
                agg[e["name"]][1] += e["dur"]
            top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
            print("top trace events (name, count, total us):", flush=True)
            for name, (cnt, dur) in top:
                print(f"  {dur:10.0f} us  x{cnt:<5} {name[:110]}", flush=True)

    # ---- HLO cost analysis ---------------------------------------------------
    try:
        lowered = jax.jit(
            clip.__wrapped__ if hasattr(clip, "__wrapped__") else clip
        ).lower(state0, bias0, frames, times, jnp.int32(0))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        keys = ["flops", "bytes accessed", "optimal_seconds", "utilization operand 0 {}"]
        print("cost_analysis keys sample:", {k: v for k, v in list(ca.items())[:12]}, flush=True)
        print("flops:", ca.get("flops"), "bytes accessed:", ca.get("bytes accessed"), flush=True)
        mem = compiled.memory_analysis()
        print("memory:", mem, flush=True)
    except Exception as e:
        print("cost analysis failed:", repr(e), flush=True)


if __name__ == "__main__":
    main()

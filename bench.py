"""Benchmark: 1080p detect+track throughput on one TPU chip.

Runs the flagship fused multi-camera crop-tracker pipeline — ResNet-50
directional RetinaNet full-frame detection every ``d`` frames, MXU crop
re-detection (resnet18 crop net over s2d crops) in between, parse +
association + Kalman update + lifecycle — as ONE device program per clip
(``make_mc_clip_step``: lax.scan over frames with a detect/crop switch), over
synthetic 1080p frames staged in HBM as uint8 s2d-packed tensors.

Measurement: the device is reached through a network tunnel where dispatch
is asynchronous (block_until_ready does not bound execution), so the clip is
iterated inside ONE jitted fori_loop with the tracker state chained through
iterations and synchronized by a scalar fetch; a 1-iteration run is
differenced out to remove the round-trip overhead. This reports true
on-device throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; baseline is
the driver's 500 frames/sec/chip north star (BASELINE.json).

Tunnel-proofing: the axon TPU is reached through a network tunnel that can
drop for hours, and jax initialization HANGS (never fails) while it is down.
Round 3 lost its headline capture to exactly this (BENCH_r03 rc=1).  The
__main__ path therefore (1) probes the device in a subprocess under a hard
timeout until it answers a real jitted matmul (bounded by
BENCH_TPU_WAIT_SECS), (2) runs the measurement itself in a watchdogged
subprocess (BENCH_RUN_TIMEOUT) so a mid-run tunnel drop cannot hang the
driver, and (3) on exhaustion emits a parseable JSON failure record on
stdout and exits 0 instead of stack-tracing.  With the tunnel up the output
is byte-identical to the direct run.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

METRIC = "detect_track_fps_1080p_resnet50"
UNIT = "frames/sec/chip"
BASELINE_FPS = 500.0  # BASELINE.json north star
# Plausibility window for a single-chip 1080p detect+track fps sample.
# Anything outside is a measurement artifact (tunnel jitter flipped the
# tN-t1 difference negative in round 4), never a real result.
FPS_SANE_LO, FPS_SANE_HI = 50.0, 2000.0

# Shipped configuration: scripts/ship_decision.py writes bench_config.json
# from the gate-certified results (quality SHIPPABLE + fastest measured fps)
# so the benched default IS the shipped default. Env vars always override.
_SHIP_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_config.json"
)
_ship_knobs = None


def _knob(name: str, default: str) -> str:
    """Knob lookup: environment > bench_config.json > built-in default."""
    global _ship_knobs
    if name in os.environ:
        return os.environ[name]
    if _ship_knobs is None:
        try:
            with open(_SHIP_CONFIG_PATH) as fh:
                _ship_knobs = {k: str(v) for k, v in json.load(fh)["knobs"].items()}
        except (OSError, ValueError, KeyError):
            _ship_knobs = {}
    return _ship_knobs.get(name, default)


def _tpu_probe(timeout_s: float = 120.0) -> bool:
    """True iff a non-CPU jax backend answers a jitted matmul in time.

    Must run in a subprocess: a hung in-process jax init is unrecoverable.
    """
    code = (
        "import jax\n"
        "assert jax.devices()[0].platform != 'cpu'\n"
        "import jax.numpy as jnp\n"
        "jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128))).block_until_ready()\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the probe must see the real backend
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _fail_record(reason: str) -> None:
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": UNIT,
                "vs_baseline": 0.0,
                "error": reason,
            }
        )
    )


_CHAIN_LEASE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_outputs", "chain_active"
)


def _kill_pid_tree(root: int) -> None:
    """kill(root + live descendants), children first, by explicit /proc walk.

    Never kills by name pattern; only the exact PID tree rooted at the chain
    process that registered itself in the lease file.
    """
    children = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as fh:
                ppid = int(fh.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
        children.setdefault(ppid, []).append(int(entry))
    order = []
    stack = [root]
    while stack:
        p = stack.pop()
        order.append(p)
        stack.extend(children.get(p, []))
    for sig in (15, 9):
        for p in reversed(order):  # children first
            try:
                os.kill(p, sig)
            except (ProcessLookupError, PermissionError):
                pass
        if sig == 15:
            time.sleep(5.0)


def _evict_chain_lease() -> None:
    """Free the chip from a still-running gate/training chain.

    The round-end driver capture runs `python bench.py` while a long
    self-resuming certification chain may still hold the TPU (training is
    checkpoint-resumable, so killing it is always safe; time-sharing the
    chip would depress the recorded headline instead — the round-4 failure
    mode). The chain registers its root PID in _outputs/chain_active and
    bench.py's outer guard evicts that exact PID tree before measuring.
    Chain-internal candidate benches set CHAIN_BENCH=1 to skip eviction.
    """
    if os.environ.get("CHAIN_BENCH") == "1":
        return
    try:
        with open(_CHAIN_LEASE) as fh:
            pid = int(fh.read().strip())
    except (OSError, ValueError):
        return
    if pid > 1 and os.path.isdir(f"/proc/{pid}"):
        sys.stderr.write(f"bench: evicting chain lease pid={pid}\n")
        _kill_pid_tree(pid)
    try:
        os.unlink(_CHAIN_LEASE)
    except OSError:
        pass


def _run_guarded() -> None:
    """Wait (bounded) for the TPU, then run main() in a watchdogged child."""
    _evict_chain_lease()
    wait_budget = float(os.environ.get("BENCH_TPU_WAIT_SECS", "1800"))
    run_timeout = float(os.environ.get("BENCH_RUN_TIMEOUT", "1800"))
    deadline = time.time() + wait_budget
    attempts = 0
    while True:
        if not _tpu_probe(min(120.0, max(10.0, deadline - time.time()))):
            if time.time() >= deadline:
                _fail_record(
                    f"tpu_unreachable: no device answer within {wait_budget:.0f}s "
                    f"({attempts} measurement attempts)"
                )
                return
            time.sleep(min(60.0, max(1.0, deadline - time.time())))
            continue
        # device is up: run the measurement in a child so a mid-run tunnel
        # drop becomes a retry, not a hang
        attempts += 1
        env = dict(os.environ)
        env["BENCH_INNER"] = "1"
        # the probe stripped JAX_PLATFORMS to see the real backend; the
        # measurement child must run on the SAME backend, or a cpu override
        # in the caller's env would record a silently bogus cpu fps
        env.pop("JAX_PLATFORMS", None)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                timeout=run_timeout,
                env=env,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            r = None
        if r is not None and r.returncode == 0:
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if isinstance(rec, dict) and rec.get("metric") == METRIC:
                    # Round 4's official record was -403.93 fps: tunnel
                    # jitter made the (tN-t1) difference negative and this
                    # guard accepted it. A record is a RESULT only if it is
                    # physically plausible; anything else is a failed
                    # attempt and we retry.
                    try:
                        v = float(rec.get("value", 0.0))
                    except (TypeError, ValueError):
                        v = 0.0
                    if "error" not in rec and FPS_SANE_LO <= v <= FPS_SANE_HI:
                        print(line)
                        return
                    sys.stderr.write(
                        f"bench: rejecting implausible record {line.strip()}\n"
                    )
                    break
        if r is not None and r.stderr:
            sys.stderr.write(r.stderr[-4000:])
        if attempts >= 3 or time.time() >= deadline:
            _fail_record(
                f"measurement_failed: {attempts} attempts "
                + ("timed out" if r is None else f"last rc={r.returncode}")
            )
            return


def main() -> None:
    import jax

    if jax.devices()[0].platform == "cpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        # this metric is frames/sec/CHIP; a cpu number must never pass as it
        _fail_record("wrong_backend: jax resolved to cpu (set BENCH_ALLOW_CPU=1 to force)")
        return

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from playground3d_tpu.data.video import pack_s2d
    from playground3d_tpu.geometry.homography import CameraRegistry
    from playground3d_tpu.models import retinanet_init
    from playground3d_tpu.pipeline.camera_bank import bank_from_registry
    from playground3d_tpu.pipeline.multi_cam import make_mc_clip_step
    from playground3d_tpu.pipeline.tracker_state import init_track_state
    from playground3d_tpu.track.kf import default_params
    from playground3d_tpu.utils.config import TrackerConfig

    H, W = 1080, 1920
    DEPTH = 50
    CROP_DEPTH = 18
    # host-packed space-to-depth: no [H,W,3] lane padding on device.
    # conv7 (reference-parity stem on raw [H,W,3] frames) is measurable
    # via BENCH_STEM=conv7 for the design comparison.
    STEM = _knob("BENCH_STEM", "s2d")
    DET_STEP = int(_knob("BENCH_DET_STEP", "3"))
    T_CLIP = 24  # frames per device call (multiple of DET_STEP)
    N_ITERS = 12  # clips per timed device loop
    # sweep knobs (defaults = the shipped configuration)
    FEATURE_SIZE = int(_knob("BENCH_FEATURE_SIZE", "256"))
    TOWER_DEPTH = int(_knob("BENCH_TOWER_DEPTH", "4"))
    SHARED_TOWER = _knob("BENCH_SHARED_TOWER", "0") == "1"
    # measured on v5e: the in-scan detect (261 fps) slightly beats the
    # hoisted batch-8 detect (248 fps) at parity heads — bigger activation
    # working set loses more than batching gains; keep the scan form
    BATCH_DETECTS = _knob("BENCH_BATCH_DETECTS", "0") == "1"
    # int8 (w8a8 PTQ, backbone + fpn/heads) and approx_max_k candidate
    # pooling are quality-validated defaults: on the e2e trained-detector
    # harness (demo_e2e A/B at 1000 steps) int8 costs 0.011 MOTA
    # (0.152 vs 0.163) with identical ID switches, approx_topk is
    # quality-neutral; together 261 -> 302 fps on v5e
    INT8 = _knob("BENCH_INT8", "1") == "1"
    APPROX_TOPK = _knob("BENCH_APPROX_TOPK", "1") == "1"
    # 3 = reference anchor parity; 4 drops the stride-8 pyramid level
    # (scale-band deployment knob, see cfg.det_min_level)
    MIN_LEVEL = int(_knob("BENCH_MIN_LEVEL", "3"))
    # straight-line clip (no scan/switch; requires clip-aligned frame0).
    # Measured neutral on v5e (337.9 vs 341.5 scan) — the conditional
    # boundary is NOT where the in-scan overhead lives; kept as a knob.
    UNROLL = _knob("BENCH_UNROLL", "0") == "1"
    TS_BIAS = _knob("BENCH_TS_BIAS", "0") == "1"
    # candidate pool 512: quality-identical to 1024 on the e2e A/B
    # (348.3 vs 341.5 fps); 256 adds only +1.8 fps and risks truncating
    # dense multi-camera scenes (the pool is shared across cameras)
    PRE_TOPK = int(_knob("BENCH_PRE_TOPK", "512"))
    # crop-candidate pool per object. Measured sweep (MC e2e quality with
    # the same trained nets / bench fps): 16 -> MOTA 0.573 / 349.9;
    # 8 -> 0.794 / 354.4; 4 -> 0.849 / 357.5. Smaller pools are BETTER on
    # the harness (junk rank-9+ candidates occasionally win best-box
    # selection and corrupt updates); ship 8 for margin on real scenes
    # (the reference uses 50 on real I-24 data).
    CD_MAX = int(_knob("BENCH_CD_MAX", "8"))
    # crop cadence: re-detect crops only on frames where i % skip_step == 0
    # (reference skip_step, MC3D_crop_tracker.py:78-79); frames matching
    # neither cadence are passthrough snapshots (~0.03 ms/frame)
    SKIP_STEP = int(_knob("BENCH_SKIP_STEP", "1"))
    # class-size KF nudge (measurement model 3) in the crop branch — the
    # drift counter that quality-gates long detection gaps (d>=6)
    SIZE_NUDGE = _knob("BENCH_SIZE_NUDGE", "0") == "1"
    # skip crop KF updates below sigma_c (occlusion drift counter; the
    # reference updates unconditionally) — fps-neutral by construction
    # (same program shape), measured for completeness
    CROP_CONF_GATE = _knob("BENCH_CROP_CONF_GATE", "0") == "1"
    # failed re-detection attempts before track death (reference f_max=5).
    # At d>=6 the reference default kills a track whose crops miss within
    # ONE detection gap; the d>=6 ship candidates raise it to ~2 gaps.
    # Threshold compare only — program shape (and fps) unchanged.
    F_MAX = int(_knob("BENCH_F_MAX", "5"))
    # output burn-in: report a track only once age > f_init (reference
    # "frames before permanent"). Output-mask compare only — fps-neutral.
    # The d>=4/s=2 candidates raise it so junk tracks that survive a
    # detection gap never reach the output CSV.
    F_INIT = int(_knob("BENCH_F_INIT", "5"))  # 5 = TrackerConfig default (what every prior bench ran)
    # tentative-kill: first failed attempt while age <= this is fatal
    # (junk-track suppressor for the fast cadences; 0 = reference rule).
    # Mask/compare only — program shape unchanged, fps-neutral.
    TENTATIVE_AGE = int(_knob("BENCH_TENTATIVE_AGE", "0"))
    # crop measurement noise scale on the l,w,h components (KFParams.R2);
    # >1 de-weights crop-derived sizes (the low-information part of the
    # crop measurement). Constant fold only — program shape unchanged.
    CROP_R2_SIZE = float(_knob("BENCH_CROP_R2_SIZE", "1"))
    # live slots cropped per crop frame (stale-first priority). The crop
    # step's cost scales with this pool, and at d>=6 crop frames dominate
    # the clip (5 of every 6), so 16 vs 32 is a first-order fps lever for
    # scenes with <=16 concurrent tracks per camera.
    CROP_SLOTS = int(_knob("BENCH_CROP_SLOTS", "32"))
    # pool capacities (fixed device shapes). The fused design's cost is
    # shape-static — fps does not depend on how many slots are LIVE, only
    # on these capacities — so reference-scale track counts (18 cameras,
    # dozens-to-hundreds of objects, MC3D:1489-1509) are benched by
    # sweeping the pool: scripts/bench_scale.sh.
    MAX_TRACKS = int(_knob("BENCH_MAX_TRACKS", "64"))
    MAX_DETS = int(_knob("BENCH_MAX_DETS", "48"))
    # ghost re-identification window (0 = off/reference). Adds one [N,K]
    # distance matrix per detect frame — measured for the ship decision.
    GHOST_FRAMES = int(_knob("BENCH_GHOST_FRAMES", "0"))

    # synthetic camera registry (geometry constants only)
    rng = np.random.default_rng(7)
    f, cx, cy = 2000.0, 960.0, 540.0
    cam_pos = np.array([250.0, 60.0, -30.0])

    def project(p3):
        d = p3 - cam_pos
        yaw, pitch = np.deg2rad(4.0), np.deg2rad(6.0)
        Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(pitch), -np.sin(pitch)], [0, np.sin(pitch), np.cos(pitch)]])
        cam = np.stack([d[:, 1], -d[:, 2], d[:, 0]], 1) @ Ry.T @ Rx.T
        return np.stack([f * cam[:, 0] / cam[:, 2] + cx, f * cam[:, 1] / cam[:, 2] + cy], 1)

    sp = np.stack([rng.uniform(450, 680, 24), rng.uniform(0, 120, 24)], 1)
    im = project(np.concatenate([sp, np.zeros((24, 1))], 1))
    vp_z = project(np.array([[550.0, 60.0, -1e7]]))[0]
    reg = CameraRegistry()
    reg.add_camera("p1c1", im, sp, np.array([[1e6, cy], [cx, 1e6], vp_z]))

    cfg = TrackerConfig(
        max_tracks=MAX_TRACKS, max_dets=MAX_DETS, pre_topk=PRE_TOPK, x_range=(300.0, 800.0),
        det_step=DET_STEP, skip_step=SKIP_STEP, crop_slots=CROP_SLOTS, cd_max=CD_MAX, cs=112,
        f_max=F_MAX, f_init=F_INIT, tentative_age=TENTATIVE_AGE,
        estimate_ts_bias=TS_BIAS, approx_topk=APPROX_TOPK, det_min_level=MIN_LEVEL,
        size_nudge=SIZE_NUDGE, crop_conf_gate=CROP_CONF_GATE,
        ghost_frames=GHOST_FRAMES,
    )
    kfp = default_params()
    if CROP_R2_SIZE != 1.0:
        r2 = np.asarray(kfp.R2).copy()
        r2[2:, 2:] *= CROP_R2_SIZE
        kfp = kfp._replace(R2=jnp.asarray(r2))
    bank = bank_from_registry(reg)
    centers = jnp.asarray(np.array([[565.0, 60.0]], np.float32))
    det_params = retinanet_init(
        jax.random.PRNGKey(0), num_classes=8, depth=DEPTH, stem=STEM,
        feature_size=FEATURE_SIZE, tower_depth=TOWER_DEPTH, shared_tower=SHARED_TOWER,
    )
    crop_params = retinanet_init(
        jax.random.PRNGKey(1), num_classes=8, depth=CROP_DEPTH, stem=STEM,
        tower_depth=2, shared_tower=True,
    )
    # uint8 s2d frames (4x less HBM + transfer than f32; normalized on device)
    raw = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    packed = pack_s2d(raw) if STEM == "s2d" else raw

    if INT8:
        from playground3d_tpu.models.quant import quantize_detector

        det_params = quantize_detector(det_params, packed[None], DEPTH, stem=STEM)
        crop_shape = (4, 28, 28, 48) if STEM == "s2d" else (4, 112, 112, 3)
        crop_calib = rng.integers(0, 256, crop_shape, dtype=np.uint8)
        crop_params = quantize_detector(crop_params, crop_calib, CROP_DEPTH, stem=STEM)

    clip = make_mc_clip_step(
        det_params, DEPTH, bank, centers, kfp, cfg,
        crop_params=crop_params, crop_depth=CROP_DEPTH, stem=STEM, crop_stem=STEM,
        batch_detects=BATCH_DETECTS, unroll=UNROLL,
    )
    frames = jnp.asarray(
        np.broadcast_to(packed[None, None], (T_CLIP, 1) + packed.shape).copy()
    )
    base_times = jnp.asarray(np.arange(T_CLIP, dtype=np.float32)[:, None] / 30.0)

    state0 = init_track_state(cfg.max_tracks)
    bias0 = jnp.zeros((1,), jnp.float32)

    def make_loop(n_iters):
        @jax.jit
        def loop(state, bias, frames, base_times):
            def body(i, carry):
                # frames ride the carry and get one pixel poked per
                # iteration: detection depends only on pixels, so with
                # loop-invariant frames XLA hoists the (batched) detector
                # out of the fori_loop and the bench measures nothing
                st, tb, fr = carry
                fr = jax.lax.dynamic_update_slice(
                    fr,
                    (i % 251).astype(fr.dtype).reshape((1,) * fr.ndim),
                    (0,) * fr.ndim,
                )
                t = base_times + (i * T_CLIP).astype(jnp.float32) / 30.0
                st2, tb2, snaps = clip(st, tb, fr, t, i * T_CLIP)
                return st2, tb2, fr

            st, tb, fr = jax.lax.fori_loop(0, n_iters, body, (state, bias, frames))
            # scalar dependency on the final state forces full execution
            return jnp.sum(st.kf.x) + jnp.sum(tb) + jnp.sum(fr[0, 0, 0, 0]).astype(jnp.float32)

        return loop

    loop1, loopN = make_loop(1), make_loop(N_ITERS)
    float(loop1(state0, bias0, frames, base_times))  # compile + warm
    float(loopN(state0, bias0, frames, base_times))

    # Round-4 postmortem: a single (tN - t1) difference is one tunnel
    # hiccup away from garbage (the official r04 record was -403.93 fps).
    # Take k paired samples, difference each pair, keep only physically
    # plausible per-clip times, and report the MEDIAN. Interleaving the
    # 1-iter and N-iter runs within each sample keeps the pair exposed to
    # the same network conditions, so their difference cancels round-trip
    # overhead under drift too.
    k = int(os.environ.get("BENCH_REPEATS", "5"))
    samples = []
    for _ in range(2 * k):  # allow up to k rejections before giving up
        t0 = time.time()
        float(loop1(state0, bias0, frames, base_times))
        t1 = time.time() - t0
        t0 = time.time()
        float(loopN(state0, bias0, frames, base_times))
        tN = time.time() - t0
        per_clip = (tN - t1) / (N_ITERS - 1)
        if per_clip > 0 and FPS_SANE_LO <= T_CLIP / per_clip <= FPS_SANE_HI:
            samples.append(per_clip)
        if len(samples) >= k:
            break
    if not samples:
        _fail_record("no_plausible_sample: all timing pairs rejected")
        return
    fps = T_CLIP / float(np.median(samples))
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(fps, 2),
                "unit": UNIT,
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        main()
    else:
        _run_guarded()

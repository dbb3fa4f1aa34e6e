"""Benchmark: tracked frames/sec/chip on 640x480 monocular SLAM.

Runs the full System (ORB extraction -> two-pass tracking -> keyframe
insertion + triangulation + Schur local BA) over a synthetic 640x480
sequence with known ground truth, on whatever accelerator JAX exposes
(the driver runs it on one real TPU chip). Prints ONE JSON line:

    {"metric": "tracked_fps_640x480_mono", "value": N,
     "unit": "frames/sec/chip", "vs_baseline": N/30}

Baseline: the reference's implied real-time target — 30 fps capture
with the backend pacing to the inter-frame interval
(send_slam/lib/send_slam/application.ex:51-54,
orbslam3_mono_networked.cc:618-624). BASELINE.md codifies this as
">= 30 fps on 1x TPU v5e" with no published reference numbers to beat.

Env knobs: SLAM_BENCH_FRAMES (default 90), SLAM_BENCH_WARMUP (default
15), SLAM_BENCH_CPU=1 forces the CPU backend (smoke-testing),
SLAM_WORLD_SEED (default 11) picks the rendered world,
SLAM_BENCH_SWEEP_SEEDS="23,42,71,..." additionally replays the scenario
on each listed seed (reusing the compiled programs) and reports the
ATE DISTRIBUTION (median/worst) in the JSON — per the repo's own
doctrine that single-seed ATE is a basin sample, the distribution is
the official accuracy number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    # Persistent XLA compilation cache: repeat runs (and the driver's
    # runs after ours) skip the multi-minute compile phase entirely.
    # The cache directory is COMMITTED (round 5): the round-4 official
    # bench ran from a fresh checkout where the gitignored cache did
    # not exist and paid a cold 1591.9 s warmup against the remote
    # compile service (BENCH_r04; the same programs had compiled in
    # 351 s earlier that round — service-side variance is ~4x, so no
    # structural consolidation can guarantee the <300 s target on a
    # cache miss). Shipping the TPU-compiled executables keyed by HLO
    # fingerprint makes the fresh-checkout warmup a deserialization
    # pass instead. Entries are invalidated automatically by any
    # program-affecting code change — re-populate by running the bench
    # once on the target backend before shipping.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    if os.environ.get("SLAM_BENCH_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # The remote-accelerator tunnel can be DOWN outright (not just
        # blipping mid-handshake): backend init then fails on the first
        # jnp call, before the warmup retry loop can help, and the run
        # produces NO artifact. Probe the backend in a SUBPROCESS (a
        # failed in-process init is cached by jax and cannot be
        # retried) and wait up to SLAM_BENCH_WAIT_BACKEND_S for the
        # tunnel to come back before constructing the engine.
        import subprocess
        import time as _time
        wait_s = float(os.environ.get("SLAM_BENCH_WAIT_BACKEND_S", "1800"))
        deadline = _time.time() + wait_s
        while True:
            try:
                # A down tunnel often HANGS the handshake rather than
                # erroring — bound each probe.
                probe = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    capture_output=True, timeout=600)
                ok, err = probe.returncode == 0, probe.stderr.decode()
            except subprocess.TimeoutExpired:
                ok, err = False, "probe timed out (hung handshake)"
            if ok:
                break
            if _time.time() > deadline:
                print("# backend still unavailable after "
                      f"{wait_s:.0f}s; aborting without a bogus artifact",
                      file=sys.stderr)
                print(err[-500:], file=sys.stderr)
                raise SystemExit(3)
            print("# backend unavailable; retrying in 60s",
                  file=sys.stderr)
            _time.sleep(60)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from send_slam_tpu.config import (
        CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
    )
    from send_slam_tpu.io.evaluate import ate_rmse
    from send_slam_tpu.models.system import System
    from send_slam_tpu.utils.synth import SyntheticWorld

    # SLAM_BENCH_LONG=1: the flagship-capacity long session — 1000
    # frames over a multi-lap trajectory at the PRODUCTION capacities
    # (max_keyframes=256, max_landmarks=16384), with loop closures,
    # keyframe culling and table compaction active. Proves the
    # unbounded-session axis (VERDICT r3 next-round #2), not just the
    # 90-frame sprint.
    long_mode = os.environ.get("SLAM_BENCH_LONG") == "1"
    n_frames = int(os.environ.get("SLAM_BENCH_FRAMES",
                                  "1000" if long_mode else "90"))
    warmup = int(os.environ.get("SLAM_BENCH_WARMUP", "15"))
    seed = int(os.environ.get("SLAM_WORLD_SEED", "11"))
    laps = float(os.environ.get("SLAM_BENCH_LAPS", "6"))

    def make_world(s):
        return SyntheticWorld(n_points=900, width=640, height=480,
                              fx=520.0, fy=520.0, seed=s)

    world = make_world(seed)
    depth = int(os.environ.get("SLAM_BENCH_PIPELINE_DEPTH", "6"))
    stretch = int(os.environ.get("SLAM_BENCH_PIPELINE_STRETCH", "2"))
    # Diagnostic overrides: SLAM_TR_<tracking_field>=value.
    import dataclasses
    tr_kwargs = dict(init_min_matches=50, pipeline_depth=depth,
                     pipeline_stretch=stretch)
    ftypes = {f.name: type(getattr(TrackingConfig(), f.name))
              for f in dataclasses.fields(TrackingConfig)}
    otypes = {f.name: type(getattr(OrbConfig(), f.name))
              for f in dataclasses.fields(OrbConfig)}
    orb_kwargs = {}

    def _cast(cast, v):
        if cast is bool:
            return v.lower() in ("1", "true", "yes")
        if cast is tuple:
            return tuple(int(x) for x in v.split(","))
        return cast(v)

    for k, v in os.environ.items():
        if k.startswith("SLAM_TR_"):
            name = k[len("SLAM_TR_"):].lower()
            tr_kwargs[name] = _cast(ftypes[name], v)
            print(f"# override tracking.{name} = {tr_kwargs[name]}",
                  file=sys.stderr)
        elif k.startswith("SLAM_ORB_"):
            name = k[len("SLAM_ORB_"):].lower()
            orb_kwargs[name] = _cast(otypes[name], v)
            print(f"# override orb.{name} = {orb_kwargs[name]}",
                  file=sys.stderr)
    map_cfg = (MapConfig()  # flagship defaults: 256 KF / 16384 LM
               if long_mode else
               MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8))
    cfg = EngineConfig(
        orb=OrbConfig(**orb_kwargs),
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=map_cfg,
        tracking=TrackingConfig(**tr_kwargs),
    )
    def render_seq(w):
        if long_mode:
            ts, Rs, tls = w.trajectory_laps(n_frames=n_frames, laps=laps)
        else:
            ts, Rs, tls = w.trajectory(n_frames=n_frames)
        # uint8 frames: what a real camera delivers, and 4x less
        # host->device transfer than f32 (the engine converts on device).
        frames = [np.round(w.render(Rs[k], tls[k])).astype(np.uint8)
                  for k in range(n_frames)]
        return ts, Rs, tls, frames

    ts, Rs, tls, frames = render_seq(world)

    def run_seq(sys_, ts, Rs, tls, frames):
        """Track one rendered sequence; return the per-run stats.

        Per-run diagnostics (init attempts, commit timestamp, loop
        attempts/applied) are SNAPSHOTTED here, before any sweep
        reset() mutates the System — BENCH_r04 printed a cross-seed
        cumulative attempt count and a None commit-ts two lines under
        a timeline that tracked 36 frames (VERDICT r4 weak #3)."""
        t_track = []          # all post-warmup frame times (throughput)
        t_track_ok = []       # post-warmup frames that emitted a pose
        est_ts, est_pos = [], []
        states = []
        inl_series = []
        n_ok = 0
        t_first_ok = None
        a0 = sys_.init_attempts
        l0 = len(sys_.loop_attempts)
        la0 = sys_.session_loops_applied
        t_seq0 = time.perf_counter()
        for k in range(n_frames):
            t0 = time.perf_counter()
            out = sys_.track_monocular(frames[k], float(ts[k]))
            dt = time.perf_counter() - t0
            states.append(out.tracking_state)
            inl_series.append(out.n_inliers)
            if k >= warmup:
                t_track.append(dt)
                if out.tracking_state == 2:
                    t_track_ok.append(dt)
            if out.tracking_state == 2:
                n_ok += 1
                if t_first_ok is None:
                    t_first_ok = time.perf_counter() - t_seq0
                est_ts.append(out.timestamp)
                est_pos.append(out.position)
            # Late-emitted poses of EARLIER frames (init-commit
            # backfill + collapse-probe hold flushes): real measured
            # poses of real frames, counted toward coverage/ATE.
            for bts, bpos, _bq in out.backfill:
                n_ok += 1
                est_ts.append(bts)
                est_pos.append(bpos)
        # Shutdown drain: the last pipeline_depth frames are still in
        # flight when the sequence ends; their poses are real (the
        # reference's shutdown dump flushes everything it processed).
        # Counted toward coverage/ATE, not toward frame timing.
        for out in sys_._flush_pipeline(final=True):
            if out.tracking_state == 2:
                n_ok += 1
                est_ts.append(out.timestamp)
                est_pos.append(out.position)
            for bts, bpos, _bq in out.backfill:
                n_ok += 1
                est_ts.append(bts)
                est_pos.append(bpos)
        gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
        if est_ts:   # backfill poses arrive late: restore time order
            order = np.argsort(np.asarray(est_ts), kind="stable")
            est_ts = [est_ts[i] for i in order]
            est_pos = [est_pos[i] for i in order]
        ate = (ate_rmse(est_ts, np.asarray(est_pos), ts, np.asarray(gt_pos))
               if len(est_pos) >= 3 else float("inf"))
        kts, kpos, _ = sys_.keyframe_poses()
        ate_kf = (ate_rmse(kts, kpos, ts, np.asarray(gt_pos))
                  if len(kts) >= 3 else float("inf"))
        return dict(t_track=t_track, t_track_ok=t_track_ok, states=states,
                    inl=inl_series, n_ok=n_ok, t_first_ok=t_first_ok,
                    ate=ate, ate_kf=ate_kf,
                    init_attempts=sys_.init_attempts - a0,
                    init_commit_ts=sys_.init_commit_ts,
                    loop_attempts=len(sys_.loop_attempts) - l0,
                    loops_applied=sys_.session_loops_applied - la0)

    sys_ = System(cfg)
    t0_compile = time.perf_counter()
    # The axon remote-compile tunnel can drop mid-handshake
    # (UNAVAILABLE: .../remote_compile: Connection refused) — retry
    # with backoff rather than dying before a single frame; if it
    # stays down, proceed unwarmed (compiles land lazily mid-run:
    # slow, but a measured run beats no artifact).
    # block=True: the official bench measures the FULL system — loop
    # closing / reloc / polish available from frame 0. Round 4's
    # non-blocking warmup silently benched an engine whose loop tail
    # was still compiling (0 loop attempts on a cold cache — VERDICT
    # r4 weak #4). The warmup cost stays visible in warmup_s /
    # warmup_tail_s; set SLAM_WARMUP_BLOCK=0 to measure the
    # pipelined-startup path instead.
    wblock = os.environ.get("SLAM_WARMUP_BLOCK", "1") != "0"
    for attempt in range(4):
        try:
            sys_.warmup(image_dtype=np.uint8, block=wblock)
            break
        except Exception as e:  # noqa: BLE001 — backend transport
            print(f"# warmup attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            if attempt == 3:
                print("# proceeding without warmup", file=sys.stderr)
            else:
                time.sleep(90)
    t_compile = time.perf_counter() - t0_compile
    tail_s = sys_.warmup_tail_s
    run = run_seq(sys_, ts, Rs, tls, frames)
    t_track, states = run["t_track"], run["states"]
    n_ok, t_first_ok = run["n_ok"], run["t_first_ok"]
    # Streamed per-frame ATE keeps every pose's historical drift;
    # ate_kf is the TUM-benchmark convention (reference:
    # orbslam3_mono_networked.cc saves the KEYFRAME trajectory at
    # shutdown): ATE of the BA-corrected keyframe poses.
    ate, ate_kf = run["ate"], run["ate_kf"]

    print("# state timeline:       "
          + "".join(str(s) for s in states), file=sys.stderr)
    if os.environ.get("SLAM_BENCH_VERBOSE") == "1":
        # Per-frame inlier counts (lagged summaries) — the decay
        # leading into a tracking loss is the diagnostic.
        print("# inliers: " + " ".join(str(i) for i in run["inl"]),
              file=sys.stderr)
    med = float(np.median(t_track)) if t_track else float("inf")
    mean = float(np.mean(t_track)) if t_track else float("inf")
    # The headline metric is named tracked_fps and is now computed
    # over TRACKED (pose-emitting) post-warmup frames, matching the
    # name; busy-throughput over ALL post-warmup frames (incl. init
    # attempts — what "value" meant through round 4) is reported
    # alongside as throughput_fps (VERDICT r4 weak #3).
    mean_ok = (float(np.mean(run["t_track_ok"]))
               if run["t_track_ok"] else float("inf"))
    fps = 1.0 / mean_ok if mean_ok > 0 else 0.0
    throughput_fps = 1.0 / mean if mean > 0 else 0.0

    # Optional seed sweep: replay the exact scenario on more worlds,
    # reusing the compiled programs (reset clears the map; the atlas
    # must not leak frozen maps across worlds).
    # Default ON (VERDICT r3 item 7): the official bench number is the
    # DISTRIBUTION, per the repo's own single-seed doctrine. "none"
    # (or long mode, where one run is 1000 frames) disables.
    sweep_env = os.environ.get(
        "SLAM_BENCH_SWEEP_SEEDS",
        "" if long_mode else "17,23,29,42,57,71,88,93,104")
    if sweep_env.strip().lower() == "none":
        sweep_env = ""
    sweep_seeds = [int(s) for s in sweep_env.split(",") if s.strip()]
    ate_by_seed = {seed: (ate, ate_kf, n_ok)}
    for s in sweep_seeds:
        if s == seed:
            continue
        w = make_world(s)
        ts_s, Rs_s, tls_s, frames_s = render_seq(w)
        sys_.reset()
        sys_.atlas.clear()
        sys_._collapse_resets = 0   # fresh world, fresh reset budget
        r = run_seq(sys_, ts_s, Rs_s, tls_s, frames_s)
        ate_by_seed[s] = (r["ate"], r["ate_kf"], r["n_ok"])
        print(f"# sweep seed {s:4d}: ATE {r['ate']:.4f} m, "
              f"kf {r['ate_kf']:.4f} m, tracked {r['n_ok']}/{n_frames}",
              file=sys.stderr)
        if os.environ.get("SLAM_BENCH_VERBOSE") == "1":
            print(f"# seed {s} timeline:    "
                  + "".join(str(st) for st in r["states"]),
                  file=sys.stderr)

    # Shutdown stats like the reference backend (…cc:656-664). All
    # per-run numbers are the PRIMARY seed's own snapshot (run dict),
    # taken before the sweep mutated the System.
    print(f"# warmup compile time:  {t_compile:.1f} s "
          f"(tail {tail_s:.1f} s, block={int(wblock)})", file=sys.stderr)
    print(f"# time to first track:  "
          f"{-1.0 if t_first_ok is None else t_first_ok:.2f} s",
          file=sys.stderr)
    # Init cost (VERDICT r2 item 9): how many multi-ref init frames
    # were scored and which sequence timestamp the committed pair
    # carries — for THIS run, not the sweep cumulative.
    commit_ts = run["init_commit_ts"]
    print(f"# init attempts:        {run['init_attempts']}",
          file=sys.stderr)
    print(f"# init committed at:    "
          f"{-1.0 if commit_ts is None else commit_ts:.3f} s (seq time)",
          file=sys.stderr)
    print(f"# loop attempts/applied:{run['loop_attempts']}/"
          f"{run['loops_applied']}", file=sys.stderr)
    print(f"# median tracking time: {med*1e3:.2f} ms", file=sys.stderr)
    print(f"# mean tracking time:   {mean*1e3:.2f} ms "
          f"(tracked-only {mean_ok*1e3:.2f} ms)", file=sys.stderr)
    print(f"# tracked frames:       {n_ok}/{n_frames}", file=sys.stderr)
    print(f"# ATE RMSE (synthetic): {ate:.4f} m", file=sys.stderr)
    print(f"# ATE RMSE (kf traj):   {ate_kf:.4f} m", file=sys.stderr)
    print(f"# backend: {jax.default_backend()} {jax.devices()[0].device_kind}",
          file=sys.stderr)

    # MFU-ish device-utilization scalar (VERDICT r4 missing #3): the
    # compiled frame_step's XLA FLOP estimate executed in the median
    # frame time, against the chip's bf16 MXU peak (TPU v5e: 197
    # TFLOP/s). A compass for perf headroom, not a precise MFU — the
    # frame step is gather/bandwidth-heavy by design, so low values
    # mean "latency-bound", not "wasted".
    mfu = -1.0
    frame_gflops = -1.0
    if jax.default_backend() != "cpu":
        try:
            import jax.numpy as jnp
            lowered = sys_._frame_step.lower(
                sys_.map, sys_._st, jnp.asarray(frames[0]), 0.0,
                jnp.asarray(False))
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", -1.0))
            if fl > 0 and np.isfinite(med) and med > 0:
                frame_gflops = fl / 1e9
                mfu = fl / med / 197e12
            print(f"# frame_step flops:     {frame_gflops:.2f} GF "
                  f"-> mfu {mfu:.4f} @ median", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — diagnostic only
            print(f"# mfu estimation failed: {e}", file=sys.stderr)

    record = {
        "metric": ("tracked_fps_640x480_mono_long" if long_mode
                   else "tracked_fps_640x480_mono"),
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 30.0, 3),
        # Accuracy + latency context (VERDICT r3 weak items 5 and 8):
        # fps alone hides init latency and single-seed basin luck.
        "ate_m": round(ate, 4),
        "ate_kf_m": round(ate_kf, 4),
        "tracked": f"{n_ok}/{n_frames}",
        "median_ms": round(med * 1e3, 2),
        "mean_ms": round(mean * 1e3, 2),
        # value = pose-emitting post-warmup frames only (matches the
        # metric name); throughput_fps = ALL post-warmup frames incl.
        # init attempts (what "value" meant through round 4).
        "throughput_fps": round(throughput_fps, 2),
        "warmup_s": round(t_compile, 1),
        # Subsystem availability (VERDICT r4 weak #4): when the tail
        # finished compiling (-1 = warmup never ran/failed) and what
        # loop closing actually did on the primary run — a loop-free
        # run can no longer masquerade as a full-system number.
        "warmup_tail_s": round(tail_s, 1),
        "warmup_blocked": wblock,
        "loops_attempted": run["loop_attempts"],
        "loops_applied": run["loops_applied"],
        "init_attempts": run["init_attempts"],
        "init_commit_s": round(-1.0 if run["init_commit_ts"] is None
                               else run["init_commit_ts"], 3),
        "time_to_first_track_s":
            round(-1.0 if t_first_ok is None else t_first_ok, 2),
        "mfu_median_frame": round(mfu, 4),
        "frame_step_gflops": round(frame_gflops, 2),
        "world_seed": seed,
    }
    if long_mode:
        # Capacity-event evidence: the fps number is only meaningful
        # if the session actually exercised culling/compaction/loops.
        tt = np.asarray(t_track)
        print(f"# loop attempts: {sys_.loop_attempts}", file=sys.stderr)
        print(f"# loops_applied: {sys_.session_loops_applied}  welds: "
              f"{sys_.welds_done}  resets: {sys_.session_resets}  "
              f"atlas_maps: {len(sys_.atlas)}",
              file=sys.stderr)
        record.update({
            # Session-cumulative (survive mid-run resets): a long run
            # that re-initialized must still show its mapping work.
            "kf_inserted_total": sys_.session_kf_inserted,
            "kf_slots_used": sys_._slots_used,
            "resets": sys_.session_resets,
            "kf_capacity": cfg.map.max_keyframes,
            "lm_capacity": cfg.map.max_landmarks,
            "loops_applied": sys_.session_loops_applied,
            "loop_attempts": len(sys_.loop_attempts),
            "p99_ms": round(float(np.percentile(tt, 99)) * 1e3, 2)
                      if len(tt) else -1.0,
            "max_ms": round(float(tt.max()) * 1e3, 2) if len(tt) else -1.0,
        })
        # SLAM_BENCH_TIMELINE=path: per-frame forensics for the tail
        # (dt series + states + inliers + KF/loop event timestamps) —
        # correlate p99/max spikes with insert/polish/loop events.
        tl_path = os.environ.get("SLAM_BENCH_TIMELINE")
        if tl_path:
            np.savez(tl_path,
                     dt_ms=np.asarray(run["t_track"]) * 1e3,
                     states=np.asarray(run["states"]),
                     inliers=np.asarray(run["inl"]),
                     kf_ts=np.asarray([k[0] for k in sys_._kf_trajectory]),
                     loop_kf_slot=np.asarray(
                         [a[0] for a in sys_.loop_attempts]
                         if sys_.loop_attempts else []))
            print(f"# timeline -> {tl_path}", file=sys.stderr)
    if len(ate_by_seed) > 1:
        ates = sorted(v[0] for v in ate_by_seed.values())
        kfs = sorted(v[1] for v in ate_by_seed.values())
        record.update({
            # [stream ATE, KF-traj ATE, tracked frames]: a sparsely
            # tracked run's ATE covers only its tracked tail — the
            # coverage column keeps the distribution honest.
            "ate_seeds": {str(k): [round(a, 4), round(b, 4), c]
                          for k, (a, b, c) in ate_by_seed.items()},
            "tracked_min": min(v[2] for v in ate_by_seed.values()),
            "tracked_median": int(np.median(
                [v[2] for v in ate_by_seed.values()])),
            "ate_median_m": round(float(np.median(ates)), 4),
            "ate_worst_m": round(ates[-1], 4),
            "ate_kf_median_m": round(float(np.median(kfs)), 4),
            "ate_kf_worst_m": round(kfs[-1], 4),
        })
    print(json.dumps(record))


if __name__ == "__main__":
    main()

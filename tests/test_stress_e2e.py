"""Stress e2e tier (VERDICT r3 next-round #5): the harder realism
proxies for real-video ATE under zero egress — photometric nuisance
(sensor noise, auto-exposure gain drift, optical blur, lens
vignetting) plus a rolling occlusion schedule and a revisit (multi-lap)
trajectory, all at once. Bars measured on this harness; they are the
honest substitute for a TUM fr1 run until real data is reachable.

The reference's workload (ORB-SLAM3) validates on TUM/EuRoC
(orbslam3_mono_networked.cc:594,670); these scenarios stand in for the
nuisance factors those sequences carry.
"""

import numpy as np
import pytest

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import TexturedWorld


def _run(world, cfg, ts, Rs, tls):
    sys_ = System(cfg)
    est_ts, est_pos = [], []
    n_ok = 0

    def collect(out):
        nonlocal n_ok
        if out.tracking_state == 2 and out.position is not None:
            n_ok += 1
            est_ts.append(out.timestamp)
            est_pos.append(out.position)
        # Late-emitted poses of earlier frames (init-commit backfill +
        # collapse-probe hold flushes): real measured poses of real
        # frames, counted toward coverage/ATE like the bench does.
        for bts, bpos, _bq in out.backfill:
            n_ok += 1
            est_ts.append(bts)
            est_pos.append(bpos)

    for k in range(len(ts)):
        img = np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
        collect(sys_.track_monocular(img, float(ts[k])))
    for out in sys_.shutdown():   # final drain: pipeline + probe holds
        collect(out)
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
    if est_ts:   # backfill poses arrive late: restore time order
        order = np.argsort(np.asarray(est_ts), kind="stable")
        est_ts = [est_ts[i] for i in order]
        est_pos = [est_pos[i] for i in order]
    err = (ate_rmse(est_ts, np.asarray(est_pos), ts, np.asarray(gt_pos))
           if len(est_pos) >= 3 else float("inf"))
    return n_ok, err, sys_


def _small_cfg(**tr_kwargs):
    return EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                            cx=160.0, cy=120.0),
        map=MapConfig(max_keyframes=32, max_landmarks=4096, ba_window=6),
        tracking=TrackingConfig(init_min_matches=40, pipeline_stretch=1,
                                **tr_kwargs),
    )


@pytest.mark.slow
def test_stress_full_nuisance_with_occlusion():
    """Everything at once: noise + gain drift + blur + vignetting +
    a panel sweeping across the view every 4 s. Tracking must survive
    the occluder crossings (feature dropout up to ~30% of the image)
    and hold the clean-scenario accuracy class."""
    world = TexturedWorld(seed=3, width=320, height=240,
                          fx=260.0, fy=260.0,
                          noise_sigma=3.0, gain_jitter=0.05,
                          blur_sigma=0.6, vignette=0.35, occluder=0.3)
    n = 80   # occluder crossing covers frames 30-69
    ts, Rs, tls = world.trajectory(n_frames=n)
    n_ok, err, _ = _run(world, _small_cfg(), ts, Rs, tls)
    # Measured (round 5, CPU, backfill-counting): 62/80, err 0.164.
    assert n_ok > 45, n_ok
    assert err < 0.25, err


@pytest.mark.slow
def test_stress_revisit_laps_under_nuisance():
    """Multi-lap (out-and-back) trajectory under photometric nuisance:
    the return pass revisits mapped territory under different gain and
    occluder phase — matching must hold against the aged map, and the
    end-to-end ATE must stay bounded across the turnaround."""
    world = TexturedWorld(seed=5, width=320, height=240,
                          fx=260.0, fy=260.0,
                          noise_sigma=2.0, gain_jitter=0.04,
                          blur_sigma=0.4, vignette=0.25, occluder=0.22)
    n = 90
    ts, Rs, tls = world.trajectory_laps(n_frames=n, laps=1.0)
    n_ok, err, sys_ = _run(world, _small_cfg(), ts, Rs, tls)
    # Measured (round 5, CPU, backfill-counting): 89/90, err 0.157.
    assert n_ok > 60, n_ok
    assert err < 0.25, err
    # The lap actually revisited: the map did not balloon to one KF
    # per frame (revisit = mostly tracked against existing structure).
    assert sys_._n_kf_host < n // 2, sys_._n_kf_host


@pytest.mark.slow
def test_stress_rolling_shutter_exposure_steps_depth_edges():
    """Round-5 realism escalation (VERDICT r4 next #7): rolling
    shutter at 70% of the frame interval (rendered exactly — per-band
    ray casting at interpolated poses, not a post-hoc shear), auto-
    exposure STEP events every 25 frames on top of the drift walk,
    foreground boxes cutting parallax discontinuities into the scene,
    and a wider occluder panel (45% of the image), plus the usual
    noise/blur/vignetting. TUM fr1-style nuisance statistics, all at
    once."""
    world = TexturedWorld(seed=7, width=320, height=240,
                          fx=260.0, fy=260.0,
                          noise_sigma=3.0, gain_jitter=0.04,
                          blur_sigma=0.5, vignette=0.3, occluder=0.45,
                          exposure_step_every=25, exposure_step=0.22,
                          rolling_shutter=0.7, rs_bands=8, fg_boxes=3)
    n = 80
    ts, Rs, tls = world.trajectory(n_frames=n)
    n_ok, err, _ = _run(world, _small_cfg(), ts, Rs, tls)
    # Measured on this build (round 5, CPU, backfill-counting):
    # n_ok 72/80, err 0.050, 10 KFs — bars at ~1.4x coverage / ~4x
    # error headroom (stress bars stay looser than clean-scenario
    # ones; single-draw basins move, the VERDICT-r4 ratchet direction
    # is recorded by the measurement).
    assert n_ok > 50, n_ok
    assert err < 0.20, err


@pytest.mark.slow
def test_stress_flagship_lap_640x480():
    """Flagship-resolution (640x480 uint8, 1250 features) multi-lap
    stress run under the full nuisance stack — the closest zero-egress
    proxy to a TUM fr1 sequence at the production configuration
    (VERDICT r4 next #7). The return pass revisits the aged map under
    different gain/occluder phase."""
    world = TexturedWorld(seed=11, width=640, height=480,
                          fx=520.0, fy=520.0,
                          noise_sigma=2.5, gain_jitter=0.03,
                          blur_sigma=0.5, vignette=0.25, occluder=0.3,
                          exposure_step_every=30, exposure_step=0.18,
                          rolling_shutter=0.5, rs_bands=8, fg_boxes=2)
    n = 120
    ts, Rs, tls = world.trajectory_laps(n_frames=n, laps=1.0)
    cfg = EngineConfig(
        orb=OrbConfig(),   # flagship: 1250 features, 8 levels
        camera=CameraConfig(width=640, height=480, fx=520.0, fy=520.0,
                            cx=320.0, cy=240.0),
        map=MapConfig(max_keyframes=64, max_landmarks=8192, ba_window=8),
        tracking=TrackingConfig(init_min_matches=50, pipeline_stretch=1),
    )
    n_ok, err, sys_ = _run(world, cfg, ts, Rs, tls)
    # Measured (round 5, CPU, backfill-counting): 120/120, err 0.109,
    # 14 KFs.
    assert n_ok > 90, n_ok
    assert err < 0.15, err
    assert sys_._n_kf_host < n // 2, sys_._n_kf_host

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
    for k in range(len(ts)):
        img = np.round(world.render(Rs[k], tls[k])).astype(np.uint8)
        out = sys_.track_monocular(img, float(ts[k]))
        if out.tracking_state == 2 and out.position is not None:
            n_ok += 1
            est_ts.append(out.timestamp)
            est_pos.append(out.position)
    gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
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
    assert n_ok > 45, n_ok
    assert err < 0.30, err


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
    assert n_ok > 60, n_ok
    assert err < 0.30, err
    # The lap actually revisited: the map did not balloon to one KF
    # per frame (revisit = mostly tracked against existing structure).
    assert sys_._n_kf_host < n // 2, sys_._n_kf_host

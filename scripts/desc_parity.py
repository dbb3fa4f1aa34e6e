"""Descriptor parity TPU-vs-CPU, per pyramid octave.

The round-3 hunt (CLAUDE.md) left one suspect for the TPU-only match
shedding: jax.image.resize (pyramid levels >= 1) lowers to matmuls, so
upper-level pixels differ in last ULPs between backends; on smooth
sprite ramps many BRIEF pairs compare near-equal values, so ULP noise
flips descriptor bits and inflates Hamming distances. This dumps
features for one bench frame per backend and reports, per octave, the
fraction of position-matched keypoints and their Hamming distances.

Usage:
    python scripts/desc_parity.py --dump /tmp/desc_tpu.npz
    python scripts/desc_parity.py --dump /tmp/desc_cpu.npz --cpu
    python scripts/desc_parity.py --compare /tmp/desc_cpu.npz /tmp/desc_tpu.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump(path, force_cpu):
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import send_slam_tpu  # noqa: F401
    from send_slam_tpu.config import OrbConfig
    from send_slam_tpu.ops.orb import extract_orb
    from send_slam_tpu.utils.synth import SyntheticWorld
    import jax.numpy as jnp

    world = SyntheticWorld(n_points=900, width=640, height=480,
                           fx=520.0, fy=520.0)
    ts, Rs, tls = world.trajectory(n_frames=90)
    img = np.round(world.render(Rs[20], tls[20])).astype(np.uint8)
    cfg = OrbConfig(subpixel=True)
    f = extract_orb(jnp.asarray(img, jnp.float32), cfg)
    np.savez(path, uv=np.asarray(f.uv), desc=np.asarray(f.desc),
             octave=np.asarray(f.octave), valid=np.asarray(f.valid))
    print("wrote", path)


def compare(pa, pb):
    a = np.load(pa)
    b = np.load(pb)
    for lvl in range(int(a["octave"].max()) + 1):
        sa = a["valid"] & (a["octave"] == lvl)
        sb = b["valid"] & (b["octave"] == lvl)
        uva, uvb = a["uv"][sa], b["uv"][sb]
        da, db = a["desc"][sa], b["desc"][sb]
        if len(uva) == 0 or len(uvb) == 0:
            continue
        d2 = ((uva[:, None, :] - uvb[None, :, :]) ** 2).sum(-1)
        j = d2.argmin(1)
        ok = d2[np.arange(len(uva)), j] < 0.25
        if ok.sum() == 0:
            print(f"L{lvl}: no position matches")
            continue
        x = da[ok].astype(np.uint32) ^ db[j[ok]].astype(np.uint32)
        ham = np.unpackbits(x.view(np.uint8), axis=1).sum(1)
        print(f"L{lvl}: n={len(uva)} pos-matched={ok.mean():.3f} "
              f"hamming mean={ham.mean():.2f} median={np.median(ham):.0f} "
              f"p90={np.percentile(ham, 90):.0f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compare", nargs=2)
    args = ap.parse_args()
    if args.dump:
        dump(args.dump, args.cpu)
    else:
        compare(*args.compare)

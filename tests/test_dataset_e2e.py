"""Dataset-path integration: synthesize a CARMEN log on disk, parse it
(native C++ if available), run the tiny preset on it, and check the result
against the known ground truth — the full offline-user workflow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam_constructor_tpu.models import tiny
from slam_constructor_tpu.ops.geometry import compose
from slam_constructor_tpu.utils import datagen, dataset, evaluate


def write_carmen_log(path, scans, gt_poses, bearings, odom_noise, key):
    """Emit FLASER records: ranges + noisy odometry poses."""
    rng = np.random.default_rng(int(key))
    ranges = np.asarray(scans.ranges)
    n, r = ranges.shape
    # integrate noisy odometry into poses (what a robot's odometer reports)
    odo = np.array(gt_poses[0])
    lines = []
    for t in range(n):
        if t > 0:
            from slam_constructor_tpu.ops.geometry import between

            d = np.array(between(gt_poses[t - 1], gt_poses[t]))
            d += rng.normal(0, odom_noise, 3)
            odo = np.array(compose(jnp.asarray(odo), jnp.asarray(d)))
        vals = " ".join(f"{v:.4f}" for v in ranges[t])
        lines.append(
            f"FLASER {r} {vals} {odo[0]:.6f} {odo[1]:.6f} {odo[2]:.6f} "
            f"{odo[0]:.6f} {odo[1]:.6f} {odo[2]:.6f} {100.0 + t * 0.1:.3f} h {100.0 + t * 0.1:.3f}\n"
        )
    with open(path, "w") as f:
        f.writelines(lines)


@pytest.fixture(scope="module")
def carmen_run(tmp_path_factory):
    occ, origin, scale = datagen.cecum_world()
    gt = datagen.corridor_trajectory(25)
    # CARMEN FLASER convention: 180-degree front-facing fan
    bearings = jnp.linspace(-np.pi / 2, np.pi / 2, 180).astype(jnp.float32)
    scans, _, _ = datagen.synth_sequence(
        occ, origin, scale, gt, bearings, jax.random.PRNGKey(0)
    )
    path = tmp_path_factory.mktemp("data") / "synth.clf"
    write_carmen_log(str(path), scans, gt, bearings, 0.01, 3)
    return str(path), gt


def test_parse_and_track(carmen_run):
    path, gt = carmen_run
    log = dataset.read_carmen(path)
    assert log.ranges.shape[0] == 25
    scans, odom, ts = dataset.to_sequence(log, max_range=14.0)
    # default FLASER bearings assumption: [-pi/2, pi/2)
    e = tiny.make_engine(mc_batch=48, mc_rounds=12)
    e.state = e.state.replace(pose=gt[0])
    traj, probs = e.run(scans, odom)
    ate = float(evaluate.ate(traj, gt, align=False))
    assert ate < 0.25, ate
    assert ts[0] == pytest.approx(100.0)

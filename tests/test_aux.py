"""Aux subsystems: viz, multihost scaffolding, properties presets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.parallel import mesh as meshlib, multihost
from slam_constructor_tpu.utils import config, viz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_render_and_save(tmp_path):
    occ = np.random.default_rng(0).uniform(size=(40, 40)).astype(np.float32)
    traj = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
    rgb = viz.render_map_rgb(occ, traj, origin=(-2.0, -2.0), scale=0.1)
    assert rgb.shape == (40, 40, 3)
    # trajectory pixel painted red
    assert tuple(rgb[20, 20]) == (220, 0, 0)
    p = str(tmp_path / "map.ppm")
    viz.save_ppm(p, rgb)
    assert open(p, "rb").read(2) == b"P6"
    viz.save_map_yaml(str(tmp_path / "map.yaml"), "map.pgm", (-2.0, -2.0), 0.1)
    assert "resolution: 0.1" in open(tmp_path / "map.yaml").read()


def test_multihost_initialize_single_process():
    info = multihost.initialize()
    assert info["num_processes"] == 1
    assert info["devices"] >= 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_heartbeat():
    m = meshlib.make_mesh(n_hosts=2, n_chips=4)
    assert multihost.heartbeat(m, "hosts", timeout_s=60.0)


def test_recovery_loop(tmp_path):
    from slam_constructor_tpu.models import engine as eng, tiny

    cfg = tiny.tiny_config(map_size=64)
    path = str(tmp_path / "state")
    loop = multihost.RecoveryLoop(path, save_every=2)
    state, resumed = loop.restore_or(eng.init_state(cfg), lambda: eng.init_state(cfg))
    assert not resumed
    state = state.replace(pose=jnp.array([1.0, 0.0, 0.0]))
    loop.tick(state)
    loop.tick(state)  # -> snapshot written
    state2, resumed2 = multihost.RecoveryLoop(path).restore_or(
        eng.init_state(cfg), lambda: eng.init_state(cfg)
    )
    assert resumed2
    assert float(state2.pose[0]) == 1.0


def test_properties_presets_load_and_build():
    for name in ("tiny", "viny", "viny_m3rsm", "gmapping"):
        p = config.load_properties(os.path.join(REPO, "configs", f"{name}.properties"))
        if name == "gmapping":
            cfg = config.gmapping_config_from(p)
            assert cfg.n_particles == 30
        else:
            cfg = config.engine_config_from(p)
            from slam_constructor_tpu.models import engine as eng

            eng.init_state(cfg)

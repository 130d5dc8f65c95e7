"""Determinism-row tests (SURVEY.md §5 "race detection / determinism"):
fixed-order cross-shard reductions and the buffer-donation aliasing audit.

The reference is single-threaded C++ — deterministic by construction. Our
two new risks are (1) XLA all-reduce association order across shards and
(2) donated-buffer aliasing inside jit. Both are pinned down here on the
8-device CPU mesh.
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.models import engine as eng
from slam_constructor_tpu.models import gmapping, tiny
from slam_constructor_tpu.ops import resample
from slam_constructor_tpu.parallel import mesh as meshlib
from slam_constructor_tpu.utils import datagen, determinism

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _seq(n_scans=4, n_beams=40):
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(n_beams)
    poses = datagen.corridor_trajectory(n_scans)
    return datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(7)
    )


def test_ladder_psum_is_sequential_fold():
    """ladder_psum == the index-order fold, bitwise, on every shard."""
    m = meshlib.flat_mesh("p")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16)) * 1e3

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    got = shard_map(
        lambda v: determinism.ladder_psum(v, "p"),
        mesh=m, in_specs=P("p"), out_specs=P("p"),
    )(x)
    # the claim: every shard holds ((x0 + x1) + x2) + ... in index order
    want = x[0]
    for i in range(1, 8):
        want = want + x[i]
    for s in range(8):
        np.testing.assert_array_equal(np.asarray(got[s]), np.asarray(want))


def test_deterministic_normalize_reproducible_across_device_order():
    """Same values, two meshes with REVERSED device order: bitwise-equal
    normalized weights — the property plain psum does not contract for."""
    devs = jax.devices()
    m_fwd = meshlib.flat_mesh("particles", devices=devs)
    m_rev = meshlib.flat_mesh("particles", devices=devs[::-1])
    logw = jax.random.normal(jax.random.PRNGKey(3), (32,)) * 5.0

    a = np.asarray(determinism.deterministic_normalize_log_weights(logw, m_fwd))
    b = np.asarray(determinism.deterministic_normalize_log_weights(logw, m_rev))
    np.testing.assert_array_equal(a, b)
    # and it is still a correct normalization
    np.testing.assert_allclose(
        a, np.asarray(resample.normalize_log_weights(logw)), atol=1e-5
    )


def test_deterministic_normalize_run_to_run_bitwise():
    m = meshlib.flat_mesh("particles")
    logw = jax.random.normal(jax.random.PRNGKey(4), (64,)) * 3.0
    a = np.asarray(determinism.deterministic_normalize_log_weights(logw, m))
    b = np.asarray(determinism.deterministic_normalize_log_weights(logw, m))
    np.testing.assert_array_equal(a, b)


def test_donation_audit_engine_run_sequence():
    """run_sequence's donate_argnums=1 introduces no aliasing hazard: the
    donated run is bitwise-identical to the undonated run."""
    scans, odom, _ = _seq()
    cfg = tiny.tiny_config(map_size=96)
    state = eng.init_state(cfg)
    fn = eng.run_sequence.__wrapped__  # the un-jitted step underneath

    out = determinism.audit_donation(
        fn, (1,), cfg, state, scans, odom, static_argnums=(0,)
    )
    assert np.isfinite(np.asarray(out[1])).all()


def test_donation_audit_gmapping_run_sequence():
    scans, odom, _ = _seq()
    cfg = gmapping.GMappingConfig(n_particles=8, map_height=96, map_width=96)
    state = gmapping.init_state(cfg)
    fn = gmapping.run_sequence.__wrapped__

    out = determinism.audit_donation(
        fn, (1,), cfg, state, scans, odom, static_argnums=(0,)
    )
    assert np.isfinite(np.asarray(out[1])).all()


def test_donating_entry_points_registry():
    """Every dotted name in the registry resolves — the audit list cannot
    silently rot as code moves."""
    for dotted in determinism.DONATING_ENTRY_POINTS:
        mod_name, attr = dotted.rsplit(".", 1)
        mod = importlib.import_module(mod_name)
        assert hasattr(mod, attr), dotted

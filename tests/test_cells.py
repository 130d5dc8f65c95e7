import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells


def one_cell(model, belief=None):
    b = jnp.asarray(belief if belief is not None else model.init_belief(), jnp.float32)
    return b.reshape(1, 1, -1)


def upd(model, belief, n_prev, w, s):
    out = model.update(
        belief,
        jnp.full((1, 1), float(n_prev)),
        jnp.full((1, 1), float(w)),
        jnp.full((1, 1), float(s)),
    )
    return out


def test_bayes_base_matches_sequential():
    m = cells.BayesBaseCell(quality=0.5)
    # k=3 sequential updates toward occupancy 1.0
    p = 0.5
    for _ in range(3):
        p = 0.5 * p + 0.5 * 1.0
    b = upd(m, one_cell(m), 0.0, 3.0, 3.0)
    assert float(b[0, 0, 0]) == pytest.approx(p, abs=1e-6)


def test_bayes_base_no_observation_is_noop():
    m = cells.BayesBaseCell()
    b = upd(m, one_cell(m, [0.7]), 5.0, 0.0, 0.0)
    assert float(b[0, 0, 0]) == pytest.approx(0.7)


def test_bayes_avg_running_mean():
    m = cells.BayesAvgCell()
    b = one_cell(m, [0.0])
    b = upd(m, b, 0.0, 1.0, 1.0)  # obs 1.0  -> but p0=0.0 with n=0: mean = 1.0
    assert float(b[0, 0, 0]) == pytest.approx(1.0)
    b = upd(m, b, 1.0, 1.0, 0.0)  # obs 0.0 -> mean of [1, 0]
    assert float(b[0, 0, 0]) == pytest.approx(0.5)
    b = upd(m, b, 2.0, 2.0, 2.0)  # two obs of 1.0 -> mean of [1,0,1,1]
    assert float(b[0, 0, 0]) == pytest.approx(0.75)


def test_tbm_masses_partition_of_unity():
    m = cells.TBMCell(quality=0.4)
    b = one_cell(m)
    for w, s in [(1, 1), (2, 0), (1, 0.5), (3, 3)]:
        b = upd(m, b, 0.0, w, s)
        assert float(b.sum()) == pytest.approx(1.0, abs=1e-5)


def test_tbm_occupied_evidence_raises_occupancy():
    m = cells.TBMCell(quality=0.4)
    b = one_cell(m)
    p0 = float(m.occupancy(b)[0, 0])
    b = upd(m, b, 0.0, 2.0, 2.0)  # two hits
    p1 = float(m.occupancy(b)[0, 0])
    assert p1 > p0
    b2 = upd(m, one_cell(m), 0.0, 2.0, 0.0)  # two misses
    assert float(m.occupancy(b2)[0, 0]) < p0


def test_tbm_conflict_from_contradiction():
    m = cells.TBMCell(quality=0.8, conflict_decay=0.0)
    b = one_cell(m)
    b = upd(m, b, 0.0, 1.0, 1.0)  # strong occupied
    b = upd(m, b, 1.0, 1.0, 0.0)  # strong empty -> conflict mass appears
    assert float(b[0, 0, 3]) > 0.1


def test_tbm_conflict_decay_moves_to_unknown():
    m_decay = cells.TBMCell(quality=0.8, conflict_decay=0.5)
    b = one_cell(m_decay)
    b = upd(m_decay, b, 0.0, 1.0, 1.0)
    b = upd(m_decay, b, 1.0, 1.0, 0.0)
    m_keep = cells.TBMCell(quality=0.8, conflict_decay=0.0)
    bk = one_cell(m_keep)
    bk = upd(m_keep, bk, 0.0, 1.0, 1.0)
    bk = upd(m_keep, bk, 1.0, 1.0, 0.0)
    assert float(b[0, 0, 3]) < float(bk[0, 0, 3])


def test_fractional_weight_is_smooth():
    m = cells.BayesBaseCell(quality=0.5)
    ps = [float(upd(m, one_cell(m), 0, w, w)[0, 0, 0]) for w in (0.5, 1.0, 1.5)]
    assert ps[0] < ps[1] < ps[2]

    t = cells.TBMCell(quality=0.4)
    os_ = [
        float(t.occupancy(upd(t, one_cell(t), 0, w, w))[0, 0])
        for w in (0.5, 1.0, 1.5)
    ]
    assert os_[0] < os_[1] < os_[2]


def test_registry():
    assert set(cells.CELL_MODELS) == {"bayes_base", "bayes_avg", "tbm"}


def test_tbm_forgets_dynamic_objects_faster_than_avg():
    """vinySLAM's headline property: when a mapped obstacle disappears, the
    TBM cell's conflict mechanism clears it within ~1 contradicting scan,
    while the running-average Bayes cell clings to stale evidence."""
    import jax.numpy as jnp

    from slam_constructor_tpu.ops import grid, raycast
    from slam_constructor_tpu.utils import datagen

    occ_with, origin, scale = datagen.box_world(8.0, 0.1, obstacles=0)
    occ_with = occ_with.at[45:50, 38:42].set(1.0)  # box 0.5m ahead
    occ_without, _, _ = datagen.box_world(8.0, 0.1, obstacles=0)
    bearings = datagen.default_bearings(180)
    pose = jnp.zeros(3)

    after = {}
    for name, model in [
        ("avg", cells.BayesAvgCell()),
        ("tbm", cells.TBMCell(quality=0.5, conflict_decay=0.2)),
    ]:
        gm = grid.make_grid_map(model, 80, 80, 0.1)
        cfg = raycast.BeamConfig()
        for _ in range(8):  # obstacle present
            s = raycast.cast_rays(occ_with, origin, scale, pose, bearings)
            gm = raycast.insert_scan(gm, model, pose, s, cfg)
        assert float(grid.occupancy_plane(gm, model)[45, 39]) > 0.9
        for _ in range(2):  # obstacle gone
            s = raycast.cast_rays(occ_without, origin, scale, pose, bearings)
            gm = raycast.insert_scan(gm, model, pose, s, cfg)
        after[name] = float(grid.occupancy_plane(gm, model)[45, 39])

    assert after["tbm"] < 0.5, after  # cleared
    assert after["avg"] > 0.7, after  # still clinging
    assert after["tbm"] < after["avg"] - 0.2


def test_tbm_large_weight_exact_vs_sequential_rounds():
    """The closed-form w-fold TBM update must equal w sequential conjunctive
    rounds (+ one decay + renorm) for w far beyond the old 4-round cap —
    near-sensor cells collect w >> 4 free-space crossings per scan."""
    model = cells.TBMCell(quality=0.4, conflict_decay=0.1)
    belief = jnp.array([[0.2, 0.3, 0.4, 0.1]])
    for w_int, o in [(16, 0.0), (16, 1.0), (7, 0.25), (1, 0.5)]:
        w = jnp.array([float(w_int)])
        s = w * o

        # reference: w sequential single conjunctive rounds
        q = model.quality
        oo, ee, uu = q * o, q * (1.0 - o), 1.0 - q
        m = np.asarray(belief)[0]
        for _ in range(w_int):
            mo, me, mu, mx = m
            m = np.array([
                mo * (oo + uu) + mu * oo,
                me * (ee + uu) + mu * ee,
                mu * uu,
                mx * (oo + ee + uu) + mo * ee + me * oo,
            ])
        mo, me, mu, mx = m
        mu = mu + model.conflict_decay * mx
        mx = mx * (1.0 - model.conflict_decay)
        m = np.array([mo, me, mu, mx])
        m = m / m.sum()

        got = np.asarray(model.update(belief, jnp.zeros(1), w, s))[0]
        np.testing.assert_allclose(got, m, atol=1e-5, err_msg=f"w={w_int} o={o}")


def test_tbm_fractional_weight_partial_round():
    """w = k + f applies k closed-form rounds plus one round at quality q*f."""
    model = cells.TBMCell(quality=0.5, conflict_decay=0.0)
    belief = jnp.array([[0.1, 0.2, 0.6, 0.1]])
    o = 1.0
    w = jnp.array([2.7])
    got = np.asarray(model.update(belief, jnp.zeros(1), w, w * o))[0]

    q = model.quality
    m = np.asarray(belief)[0]
    for qi in [q, q, q * 0.7]:
        oo, ee, uu = qi * o, qi * (1.0 - o), 1.0 - qi
        mo, me, mu, mx = m
        m = np.array([
            mo * (oo + uu) + mu * oo,
            me * (ee + uu) + mu * ee,
            mu * uu,
            mx * (oo + ee + uu) + mo * ee + me * oo,
        ])
    m = m / m.sum()
    np.testing.assert_allclose(got, m, atol=1e-5)

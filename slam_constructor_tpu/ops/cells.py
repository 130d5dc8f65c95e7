"""Grid-cell belief models: Bayesian (tinySLAM) and Transferable Belief
Model (vinySLAM).

Parity with the reference's cell-model layer (SURVEY.md §2.3/§2.6:
``GridCell``/``Occupancy`` in ``src/core/maps/grid_cell.h``; ``BaseTinyCell``
/ ``AvgTinyCell`` in ``src/slams/tiny/tiny_grid_cell.h``; the TBM cell of
``src/slams/viny/viny_grid_cell.h`` [unverified]).

Re-design for TPU: the reference updates one heap-allocated cell object per
beam via virtual ``operator+=``; here a whole scan's observations are first
scatter-accumulated into two dense planes — per-cell observation weight
``w`` and weight-summed observed occupancy ``s`` — and the model then applies
a closed-form *w-fold* update to every cell at once (fused elementwise, VPU
friendly). For homogeneous per-cell observations within one scan this is
exactly k sequential reference updates; mixed free/hit observations of one
cell in one scan are merged through their weighted mean, which is the scheme's
only (benign, sub-resolution) approximation.

Models are static (hashable) Python dataclasses — config-chosen at trace
time, zero runtime dispatch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-9


def _mean_obs(w: Array, s: Array) -> Array:
    return s / jnp.maximum(w, _EPS)


@dataclasses.dataclass(frozen=True)
class BayesBaseCell:
    """tinySLAM's base cell: exponential smoothing toward the observation,
    ``p <- (1-q) p + q p_obs`` (reference ``BaseTinyCell``). A weight-w
    batch of identical observations folds to
    ``p <- (1-q)^w p + (1 - (1-q)^w) mean_obs`` (exact for integer w)."""

    quality: float = 0.5

    n_channels: int = dataclasses.field(default=1, init=False)

    def init_belief(self):
        return (0.5,)

    def update(self, belief: Array, n_prev: Array, w: Array, s: Array) -> Array:
        keep = jnp.power(1.0 - self.quality, w)
        p = keep * belief[..., 0] + (1.0 - keep) * _mean_obs(w, s)
        p = jnp.where(w > 0, p, belief[..., 0])
        return p[..., None]

    def occupancy(self, belief: Array) -> Array:
        return belief[..., 0]


@dataclasses.dataclass(frozen=True)
class BayesAvgCell:
    """tinySLAM's averaging cell (reference ``AvgTinyCell``): running
    weighted mean of observed occupancy, exact for fractional weights:
    ``p <- (p n + s) / (n + w)``."""

    n_channels: int = dataclasses.field(default=1, init=False)

    def init_belief(self):
        return (0.5,)

    def update(self, belief: Array, n_prev: Array, w: Array, s: Array) -> Array:
        p = (belief[..., 0] * n_prev + s) / jnp.maximum(n_prev + w, _EPS)
        p = jnp.where(n_prev + w > 0, p, belief[..., 0])
        return p[..., None]

    def occupancy(self, belief: Array) -> Array:
        return belief[..., 0]


@dataclasses.dataclass(frozen=True)
class TBMCell:
    """vinySLAM's Transferable-Belief-Model cell: belief masses over the
    frame {occupied, empty} — channels ``[m_occ, m_emp, m_unknown,
    m_conflict]`` — combined per observation with the unnormalized
    conjunctive (Dempster) rule; conflict mass absorbs dynamic objects.

    An observation with estimated occupancy ``o`` and sensor quality ``q``
    induces the simple mass function ``(q·o, q·(1-o), 1-q, 0)``. Fractional
    observation weight w is applied as ceil(w) conjunctive rounds with the
    last round's quality scaled by the fractional part (smooth in w).
    ``conflict_decay`` moves a fraction of conflict mass back to unknown
    after each update (vinySLAM's dynamic-object forgetting).
    Occupancy readout is the pignistic transform with conflict split evenly.
    """

    quality: float = 0.4
    conflict_decay: float = 0.1
    max_rounds: int = 4

    n_channels: int = dataclasses.field(default=4, init=False)

    def init_belief(self):
        return (0.0, 0.0, 1.0, 0.0)

    def update(self, belief: Array, n_prev: Array, w: Array, s: Array) -> Array:
        o = _mean_obs(w, s)
        m = belief  # [..., 4] = (O, E, U, X)

        def round_i(i, m):
            qi = self.quality * jnp.clip(w - i, 0.0, 1.0)
            oo, ee, uu = qi * o, qi * (1.0 - o), 1.0 - qi
            mo, me, mu, mx = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
            # unnormalized conjunctive combination on {∅, O, E, Θ}
            no = mo * oo + mo * uu + mu * oo
            ne = me * ee + me * uu + mu * ee
            nu = mu * uu
            nx = mx * (oo + ee + uu) + mo * ee + me * oo
            return jnp.stack([no, ne, nu, nx], axis=-1)

        m = jax.lax.fori_loop(0, self.max_rounds, round_i, m)
        # conflict forgetting
        mo, me, mu, mx = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
        mu = mu + self.conflict_decay * mx * (w > 0)
        mx = mx * jnp.where(w > 0, 1.0 - self.conflict_decay, 1.0)
        m = jnp.stack([mo, me, mu, mx], axis=-1)
        # renormalize (guards fp drift; masses stay a partition of unity)
        m = m / jnp.maximum(m.sum(-1, keepdims=True), _EPS)
        return jnp.where((w > 0)[..., None], m, belief)

    def occupancy(self, belief: Array) -> Array:
        mo, mu, mx = belief[..., 0], belief[..., 2], belief[..., 3]
        return mo + 0.5 * mu + 0.5 * mx


#: registry for the config system (reference: init_utils factories choosing
#: the cell type from a properties key — SURVEY.md §2.7/§2.8)
CELL_MODELS = {
    "bayes_base": BayesBaseCell,
    "bayes_avg": BayesAvgCell,
    "tbm": TBMCell,
}

"""Full SLAM pipeline: grid tracking + keyframe pose graph + loop closure.

This is BASELINE config[3] ("full pipeline with pose-graph loop closure"):
the single-hypothesis tracker (tiny/viny style) runs per scan; keyframes are
gated by travel distance; each new keyframe is matched against old nearby
keyframes for loop closures; when a loop closes, the SE(2) Gauss-Newton
solver re-optimizes the keyframe graph, the tracker pose is re-anchored, and
the map is regenerated from optimized keyframes.

Host/device split (the PP axis of SURVEY.md §2.9): per-scan tracking is one
jitted step; keyframe/loop/optimize work runs at keyframe rate in separate
jitted functions — the low-rate "bundle-adjustment stage" overlapping the
high-rate tracking stage.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import grid as gridlib
from ..ops.geometry import between, compose
from ..ops.scan import LaserScan
from . import posegraph as pg
from .engine import EngineConfig, SlamState, init_state, slam_step
from .tiny import tiny_config


@dataclasses.dataclass(frozen=True)
class FullConfig:
    tracking: EngineConfig = None  # default filled in __post_init__
    graph: pg.PoseGraphConfig = pg.PoseGraphConfig()
    #: re-optimize + regenerate map every time this many loops accumulate
    optimize_every_loops: int = 1
    #: before each optimize, run ``posegraph.densify_loops`` this many times
    #: (each pass proposes up to graph.max_candidates new pair constraints
    #: between mid-trajectory keyframes; 0 disables)
    densify_rounds: int = 1
    #: after each optimize, polish every keyframe pose against the dense
    #: leave-one-out occupancy consensus (``posegraph.joint_refine``;
    #: 0 disables — it costs ~K map rasterizations per round)
    joint_refine_rounds: int = 0

    def __post_init__(self):
        if self.tracking is None:
            object.__setattr__(self, "tracking", tiny_config())


class FullSlamEngine:
    """Host driver for the loop-closing pipeline."""

    def __init__(self, cfg: FullConfig | None = None, n_beams: int = 360, key=None):
        self.cfg = cfg or FullConfig()
        t = self.cfg.tracking
        self.state: SlamState = init_state(t, key)
        self.graph: pg.PoseGraphState = pg.init_state(self.cfg.graph, n_beams)
        self.pending_loops = 0
        self.total_loops = 0
        self.trajectory: list = []
        #: per trajectory entry: (anchor keyframe idx, body-frame delta from
        #: that keyframe's estimate at record time) — lets loop closures
        #: retro-correct the whole history (reference only corrects the live
        #: map->odom transform; correcting history improves full-run ATE)
        self._anchors: list = []

        model = t.cell_model
        self._track = jax.jit(partial(slam_step, t))
        #: host-side copy of the last keyframe pose: the keyframe gate is
        #: 4 flops — running it on host avoids a device sync per scan (the
        #: tracking step stays fully async-dispatched between keyframes)
        self._last_kf_pose_host = None
        self._rejit()

    def _rejit(self):
        """(Re)build the graph-rate jitted functions against the current
        graph config — called at init and after every capacity growth."""
        t = self.cfg.tracking
        model = t.cell_model
        self._add_kf = jax.jit(partial(pg.add_keyframe, self.cfg.graph))
        self._detect = jax.jit(partial(pg.detect_loops, self.cfg.graph, model))
        self._densify = jax.jit(partial(pg.densify_loops, self.cfg.graph, model))
        self._optimize = jax.jit(partial(pg.optimize, self.cfg.graph))
        self._regen = jax.jit(
            partial(
                pg.regenerate_map, self.cfg.graph, model, beam=t.beam
            )
        )

    def _ensure_capacity(self):
        """Grow the graph (2x) BEFORE an add would saturate — the host-side
        re-shard event mirroring blockmap's contract, so long runs never
        silently stop building the graph (keyframes past the old capacity
        would previously be dropped and the regenerated map frozen)."""
        g = self.cfg.graph
        # worst case per keyframe: 1 odometric edge + max_candidates loop
        # edges + densify passes of max_candidates each
        edge_budget = 1 + g.max_candidates * (1 + self.cfg.densify_rounds)
        need_kf = int(self.graph.n_kf) + 1 > g.max_keyframes
        need_edges = int(self.graph.n_edges) + edge_budget > g.max_edges
        if not (need_kf or need_edges):
            return
        new_cfg, self.graph = pg.grow(
            g, self.graph,
            max_keyframes=2 * g.max_keyframes if need_kf else g.max_keyframes,
            max_edges=2 * g.max_edges if need_edges else g.max_edges,
        )
        self.cfg = dataclasses.replace(self.cfg, graph=new_cfg)
        self._rejit()

    def handle_scan(self, scan: LaserScan, odom_delta) -> jax.Array:
        self.state = self._track(self.state, scan, odom_delta)
        pose = self.state.pose

        if self._should_add_host(pose):
            import numpy as np

            self._last_kf_pose_host = np.asarray(pose)
            self._ensure_capacity()
            self.graph = self._add_kf(self.graph, pose, scan)
            self.graph, n_loops = self._detect(self.graph, scan, pose)
            self.pending_loops += int(n_loops)
            self.total_loops += int(n_loops)
            if self.pending_loops >= self.cfg.optimize_every_loops:
                self._close_loops()
                self.pending_loops = 0

        self.trajectory.append(self.state.pose)
        kf_idx = max(int(self.graph.last_kf), 0)
        anchor_pose = self.graph.kf_poses[kf_idx]
        self._anchors.append(
            (kf_idx, between(anchor_pose, self.state.pose))
        )
        return self.state.pose

    def _should_add_host(self, pose) -> bool:
        import numpy as np

        if self._last_kf_pose_host is None:
            return True
        p = np.asarray(pose)
        d = p - self._last_kf_pose_host
        ang = (d[2] + np.pi) % (2 * np.pi) - np.pi
        dist = float(
            np.sqrt(d[0] ** 2 + d[1] ** 2
                    + (self.cfg.graph.keyframe_angle_weight * ang) ** 2)
        )
        return dist > self.cfg.graph.keyframe_distance

    def _close_loops(self):
        """Optimize the graph, re-anchor the tracker, regenerate the map."""
        last = self.graph.last_kf
        before = self.graph.kf_poses[last]
        for _ in range(self.cfg.densify_rounds):
            self.graph, n_new = self._densify(self.graph)
            self.total_loops += int(n_new)
            if int(n_new) == 0:
                break
        self.graph = self._optimize(self.graph)
        if self.cfg.joint_refine_rounds > 0:
            t = self.cfg.tracking
            small = gridlib.make_grid_map(
                t.cell_model, t.map_height, t.map_width, t.map_scale
            )
            self.graph = jax.jit(
                partial(
                    pg.joint_refine, self.cfg.graph, t.cell_model,
                    gm_template=small, beam=t.beam,
                    rounds=self.cfg.joint_refine_rounds,
                )
            )(self.graph)
        after = self.graph.kf_poses[last]
        # re-anchor tracking pose: keep the offset from the last keyframe
        new_pose = compose(after, between(before, self.state.pose))
        fresh = gridlib.make_grid_map(
            self.cfg.tracking.cell_model,
            self.cfg.tracking.map_height,
            self.cfg.tracking.map_width,
            self.cfg.tracking.map_scale,
        )
        gm = self._regen(self.graph, fresh)
        self.state = self.state.replace(gm=gm, pose=new_pose)
        import numpy as np

        self._last_kf_pose_host = np.asarray(self.graph.kf_poses[last])

    def corrected_trajectory(self) -> jax.Array:
        """Trajectory history re-anchored to the CURRENT (optimized)
        keyframe estimates — the post-loop-closure trajectory."""
        if not self._anchors:
            return jnp.zeros((0, 3))
        idx = jnp.asarray([a[0] for a in self._anchors], jnp.int32)
        deltas = jnp.stack([a[1] for a in self._anchors])
        return compose(self.graph.kf_poses[idx], deltas)

    def run(self, scans: LaserScan, odom):
        n = odom.shape[0]
        for i in range(n):
            self.handle_scan(jax.tree.map(lambda a: a[i], scans), odom[i])
        return self.corrected_trajectory()

    @property
    def keyframe_poses(self):
        n = int(self.graph.n_kf)
        return self.graph.kf_poses[:n]

    @property
    def occupancy(self):
        return gridlib.occupancy_plane(self.state.gm, self.cfg.tracking.cell_model)

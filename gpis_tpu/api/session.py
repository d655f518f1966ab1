"""ObjectModelSession — the user-facing orchestrator (rebuild of reference
component C7, SURVEY.md §3 C7: the `GaussianProcessNode` ROS node).

The reference exposes three ROS services plus marker topics; the rebuild is
middleware-free — the same verbs become methods (SURVEY.md §3 C8):

    reference service          session method
    -----------------          --------------
    start_process              start(points)            (§4.1 call stack)
    get_next_best_path         next_best_path()         (§4.4)
    update  (touch points)     update(points)           (§4.5)
    (RViz markers)             extract_surface() / export_* (viz/)

World-frame in, world-frame out: the session owns the normalization Frame
and converts at the boundary, like the node did with its TF handling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpis_tpu.config import ExploreConfig, MeshConfig, ModelConfig
from gpis_tpu.data import gpis, voxel
from gpis_tpu.explore import planner
from gpis_tpu.gp import hyperopt as ho
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf
from gpis_tpu.surface import grid as grid_mod
from gpis_tpu.surface import marching, projection
from gpis_tpu.utils import checkpoint as ckpt
from gpis_tpu.gp.kinds import model_kind
from gpis_tpu.utils import compile_cache as _compile_cache
from gpis_tpu.utils.logging import get_logger

__all__ = ["ObjectModelSession"]

log = get_logger("session")


def _joint_obs(ts, normals, points, cfg):
    """Gradient-observation arrays for a joint fit: unit-normalized cloud
    normals scattered onto the SURFACE rows of the training set (internal/
    external label points observe values only — pad_noise gradients), and
    the matching gradient-noise vector (noise_surface * 10, the calibrated
    normals-noise heuristic).  One definition for all three joint fit
    paths (in-core, sharded, out-of-core)."""
    normals = np.asarray(normals, cfg.dtype)
    if normals.shape != points.shape:
        raise ValueError("normals must match the point cloud shape")
    n_s = ts.n_surface
    c = ts.x.shape[0]
    nrm_full = jnp.zeros((c, 3), ts.x.dtype).at[:n_s].set(
        jnp.asarray(normals / np.linalg.norm(normals, axis=1, keepdims=True))
    )
    noise_g = jnp.full((c,), cfg.pad_noise, ts.x.dtype).at[:n_s].set(
        jnp.asarray(cfg.noise_surface * 10.0, ts.x.dtype)
    )
    return nrm_full, noise_g


class ObjectModelSession:
    """Fit / query / update / explore loop over one object model."""

    def __init__(self, config: ModelConfig | None = None,
                 explore: ExploreConfig | None = None,
                 mesh: MeshConfig | None = None):
        # Session construction (not library import) arms the persistent
        # compile cache — still before the first compile it should serve,
        # without mutating process-wide JAX config for applications that
        # merely import gpis_tpu (GPIS_COMPILE_CACHE=0 opts out).
        _compile_cache.enable()
        self.config = config or ModelConfig()
        self.explore_config = explore or ExploreConfig()
        # Sharded fitting is opt-in: only an explicitly-passed MeshConfig
        # with n_devices > 1 routes start() to the distributed pipeline.
        self.mesh_config = mesh
        self.model = None
        self.frame = None
        self.training = None
        # Wall-clock of the last fit/query/update/explore calls (SURVEY.md §6
        # metrics/observability: machine-readable stage timings).
        self.stats: dict[str, float] = {}

    # ------------------------------------------------------------ start/fit

    def start(self, points, *, normals=None, params=None,
              out_of_core: bool = False, experts: int = 0,
              expert_gate: int = 0, expert_beta: str = "rbcm"):
        """Reference `start_process` (§4.1): downsample, normalize, label,
        fit.  `points` is an (N,3) world-frame cloud.  With `normals`
        (N,3), surface orientation becomes first-class derivative
        observations (config 2) and the model switches to the joint system
        (`gpis_tpu.gp.derivative`).

        `out_of_core=True` fits through the panel-streamed factorization
        (`linalg.outofcore`) whose Gram never has to fit HBM — the 100k+
        single-chip path.  The resulting session serves the full
        exploration loop — query / evaluate_grid / extract_surface /
        is_done / next_best_path / tactile update() (bordering with one
        W-panel stream per batch) / save() (W panels land in
        `path + ".w/"`) — note each variance query streams the spilled
        part of W, so exploration at 100k wants a fast host link; only
        hyperopt needs an in-core or sharded model.  `bench/ooc_staged.py`
        runs the process-split 100k pipeline with crash resume."""
        import time as _time

        _t0 = _time.perf_counter()
        # A live backend exists from here on: drop the persistent compile
        # cache if JAX actually fell back to CPU (ADVICE r3 — stale CPU
        # executables are machine-feature-unsafe across hosts).
        _compile_cache.guard_cpu_backend()
        points = np.asarray(points, dtype=self.config.dtype)
        if points.ndim != 2 or points.shape[1] != 3 or len(points) == 0:
            raise ValueError(
                f"expected a non-empty (N, 3) point cloud, got shape {points.shape}"
            )
        cfg = self.config
        if cfg.voxel_leaf > 0:
            if normals is not None:
                points, normals = voxel.voxel_downsample_with_normals(
                    points, normals, cfg.voxel_leaf
                )
                points = points.astype(cfg.dtype)
            else:
                points = voxel.voxel_downsample(points, cfg.voxel_leaf).astype(cfg.dtype)
        ts = gpis.build_training_set(points, cfg)
        self.training = ts
        self.frame = ts.frame
        params = params or kf.kernel_params(cfg.lengthscale, cfg.signal_variance)
        if experts:
            # Local-expert committee (the EP axis, gp.experts): E balanced
            # spatial experts combined by (r)BCM — an approximate posterior
            # that fits 100k-class clouds in-core on one chip in seconds.
            # With normals= each expert is a local JOINT GP (config 2 × EP:
            # per-expert (4B)² factors are in-core at any committee scale).
            if out_of_core:
                raise ValueError(
                    "experts= is the in-core committee path; it does not "
                    "compose with out_of_core= (the committee exists so the "
                    "factor never exceeds HBM — use one or the other)"
                )
            if self.mesh_config is not None and self.mesh_config.n_devices > 1:
                raise ValueError(
                    "experts= and mesh= are separate scaling axes; shard an "
                    "expert model with gp.experts.shard_experts/"
                    "predict_sharded directly"
                )
            from gpis_tpu.gp import experts as gpe

            kw = dict(
                n_experts=int(experts),
                n_shared_tail=ts.n_internal + ts.n_external,
                block=cfg.block, touch_capacity=cfg.touch_capacity,
                pad_noise=cfg.pad_noise, beta=expert_beta,
                gate=int(expert_gate),
            )
            if normals is not None:
                nrm_full, noise_g = _joint_obs(ts, normals, points, cfg)
                # Kept for the hyperopt refit (the stacked per-expert
                # normals are not trivially un-partitionable).
                self._joint_expert_obs = (nrm_full, noise_g)
                self.model = gpe.fit_experts_joint(
                    cfg.kernel, ts.x, ts.y, nrm_full, ts.noise, noise_g,
                    params, **kw)
            else:
                self.model = gpe.fit_experts(
                    cfg.kernel, ts.x, ts.y, ts.noise, params, **kw)
            self.stats["fit_s"] = _time.perf_counter() - _t0
            log.info("fit(experts%s): %d pts -> %d experts x capacity %d "
                     "(%s, %s) in %.3fs",
                     ", joint" if normals is not None else "",
                     len(points), self.model.n_experts,
                     self.model.capacity, cfg.kernel, expert_beta,
                     self.stats["fit_s"])
            return self
        if out_of_core:
            if (self.mesh_config is not None
                    and self.mesh_config.n_devices > 1):
                raise ValueError(
                    "out_of_core is the single-chip beyond-HBM path; "
                    "use the sharded pipeline (config 5) on a mesh"
                )
            from gpis_tpu.linalg import outofcore as ooc

            n = ts.x.shape[0]
            if normals is not None:
                # Joint out-of-core (config 2 beyond HBM): J = 4C factor
                # rows, so the panel heuristic keys off the JOINT size.
                nrm_full, noise_g = _joint_obs(ts, normals, points, cfg)
                j_est = 4 * n
                panel = 4096 if j_est > 20480 else (
                    1024 if j_est > 2048 else 256)
                self.model = ooc.ooc_fit_joint(
                    cfg.kernel, ts.x, ts.y, nrm_full, ts.noise, noise_g,
                    params, panel=panel, pad_noise=cfg.pad_noise,
                )
            else:
                panel = 4096 if n > 20480 else (1024 if n > 2048 else 256)
                self.model = ooc.ooc_fit(
                    cfg.kernel, ts.x, ts.y, ts.noise, params, panel=panel,
                    pad_noise=cfg.pad_noise,
                )
            # A session's lifetime is query-heavy (exploration, is_done,
            # meshes) and the factorization's HBM working set is gone —
            # pin spilled W panels back on device so repeated queries stop
            # re-streaming them over the link (no-op when nothing spilled).
            promoted = self.model.promote_for_serving()
            self.stats["fit_s"] = _time.perf_counter() - _t0
            log.info("fit(out-of-core): %d pts -> capacity %d (panel %d) "
                     "in %.3fs%s", len(points), self.model.capacity, panel,
                     self.stats["fit_s"],
                     f", promoted {promoted >> 20} MB for serving"
                     if promoted else "")
            return self
        if normals is not None:
            from gpis_tpu.gp import derivative as gpd

            nrm_full, noise_g = _joint_obs(ts, normals, points, cfg)
            if self.mesh_config is not None and self.mesh_config.n_devices > 1:
                # Config 2 x config 5: distributed joint fit.
                from gpis_tpu.gp import sharded_joint as gsj

                self.model = gsj.fit_sharded_joint(
                    cfg.kernel, ts.x, ts.y, nrm_full, ts.noise, noise_g,
                    params, n_devices=self.mesh_config.n_devices,
                    block=self.mesh_config.block, pad_noise=cfg.pad_noise,
                    touch_capacity=cfg.touch_capacity,
                )
            else:
                self.model = gpd.fit_with_normals(
                    cfg.kernel, ts.x, ts.y, nrm_full, ts.noise, noise_g, params,
                    block=cfg.block, pad_noise=cfg.pad_noise,
                    touch_capacity=cfg.touch_capacity,
                )
                if 4 * self.model.capacity >= 1024:
                    self.model = gpd.with_linv_joint(self.model)
        elif self.mesh_config is not None and self.mesh_config.n_devices > 1:
            # Distributed fit (config 5): the cloud is too big for one HBM,
            # or the user asked for the mesh explicitly.
            import jax

            from gpis_tpu.gp import sharded_model as gsm

            if len(jax.devices()) < self.mesh_config.n_devices:
                raise RuntimeError(
                    f"mesh requests {self.mesh_config.n_devices} devices but "
                    f"only {len(jax.devices())} are visible"
                )
            self.model = gsm.fit_sharded(
                cfg.kernel, ts.x, ts.y, ts.noise, params,
                n_devices=self.mesh_config.n_devices,
                block=self.mesh_config.block, pad_noise=cfg.pad_noise,
                touch_capacity=cfg.touch_capacity,
            )
        elif cfg.touch_capacity == 0:
            # Query-only session: the one-matrix-peak inference path (W
            # attached, chol aliases W — ~49k+ points fit one chip).
            self.model = gpr.fit_inference(
                cfg.kernel, ts.x, ts.y, ts.noise, params,
                block=cfg.block, pad_noise=cfg.pad_noise,
            )
        else:
            self.model = gpr.fit(
                cfg.kernel, ts.x, ts.y, ts.noise, params,
                block=cfg.block, touch_capacity=cfg.touch_capacity,
                pad_noise=cfg.pad_noise,
            )
            if self.model.capacity >= 512:
                # Attach W = L^{-1}: every posterior query (grids, planner
                # candidate sweeps) becomes a GEMM / fused-kernel instead of
                # an XLA triangular solve (which runs ~1 TFLOP/s on TPU and
                # OOMs at 16k+); update() carries W through the bordering.
                self.model = gpr.with_linv(self.model)
        self.stats["fit_s"] = _time.perf_counter() - _t0
        log.info("fit: %d surface pts -> capacity %d (%s%s) in %.3fs",
                 ts.n_surface, self.model.capacity, cfg.kernel,
                 ", +normals" if normals is not None else "", self.stats["fit_s"])
        return self

    def _require_model(self):
        if self.model is None:
            raise RuntimeError("no model fitted yet; call start(points) first")

    # --------------------------------------------------------------- query

    def query(self, points_world):
        """Posterior (mean, variance) at world-frame points (§4.2)."""
        self._require_model()
        q = self.frame.to_normalized(jnp.asarray(np.asarray(points_world, self.config.dtype)))
        mean, var = gpr.predict(self.model, q)
        return np.asarray(mean), np.asarray(var)

    def evaluate_grid(self, resolution=None, extent=None):
        """Dense posterior grid in the normalized frame (config 4)."""
        self._require_model()
        r = resolution or self.config.grid_resolution
        e = extent or self.config.grid_extent
        mean, var, axis = grid_mod.evaluate_grid(self.model, r, e)
        return np.asarray(mean), np.asarray(var), np.asarray(axis)

    def extract_surface(self, resolution=None, extent=None, *, world_frame=True):
        """Isosurface mesh + per-vertex variance (the RViz marker replacement).
        Returns (verts, faces, variance)."""
        mean, var, axis = self.evaluate_grid(resolution, extent)
        verts, faces = marching.marching_tetrahedra(mean, axis)
        verts_n = jnp.asarray(verts.astype(self.config.dtype))
        if len(verts):
            # Chunked: an isosurface easily has tens of thousands of
            # vertices, and an unchunked (M, 4C) cross-covariance against a
            # joint model OOMs a 16 GB chip in eager temps.
            _, vvar = grid_mod.evaluate_points_chunked(self.model, verts_n)
            vvar = np.asarray(vvar)
        else:
            vvar = np.zeros((0,))
        if world_frame:
            verts = np.asarray(self.frame.to_world(verts_n))
        return verts, faces, vvar

    def surface_points(self, seeds_world=None, n: int = 256):
        """Sample points on the estimated surface (projection of seeds)."""
        self._require_model()
        if seeds_world is None:
            seeds = jnp.asarray(
                gpis.fibonacci_sphere(n, radius=1.0).astype(self.config.dtype)
            )
        else:
            seeds = self.frame.to_normalized(jnp.asarray(seeds_world))
        pts, ok = projection.project_points(self.model, seeds)
        pts_w = np.asarray(self.frame.to_world(pts))
        return pts_w[np.asarray(ok)], np.asarray(ok)

    # ------------------------------------------------------------- explore

    def next_best_path(self, *, seed_world=None):
        """Reference `get_next_best_path` (§4.4): returns an
        ExplorationResult with world-frame poses."""
        self._require_model()
        seed = None
        if seed_world is not None:
            seed = np.asarray(self.frame.to_normalized(jnp.asarray(seed_world)))
        res = planner.next_best_path(self.model, self.explore_config, seed_point=seed)
        res.path = np.asarray(self.frame.to_world(jnp.asarray(res.path)))
        return res

    def is_done(self, n_probe: int = 256) -> bool:
        """Global termination: surface variance everywhere below threshold."""
        self._require_model()
        probes, ok = projection.project_points(
            self.model,
            jnp.asarray(gpis.fibonacci_sphere(n_probe, 1.0).astype(self.config.dtype)),
        )
        return planner.is_done(self.model, self.explore_config, probes)

    # -------------------------------------------------------------- update

    def update(self, touch_points_world, *, targets=None):
        """Reference `update` service (§4.5): append tactile points (label 0,
        low touch noise) and refit incrementally."""
        self._require_model()
        kind = model_kind(self.model)
        if kind in ("ooc", "ooc_joint"):
            # Out-of-core model: bordering with the factor streamed from the
            # panel store (one W stream per batch, linalg.outofcore
            # .ooc_update) — the in-core tail block holds up to
            # touch_capacity points, then overflows with guidance.
            pts = self.frame.to_normalized(
                jnp.asarray(np.asarray(touch_points_world, self.config.dtype))
            )
            y = (jnp.zeros(pts.shape[0], pts.dtype) if targets is None
                 else jnp.asarray(targets, pts.dtype))
            cap = max(int(self.config.touch_capacity), 64)
            self.model = self.model.update(
                pts, y, self.config.noise_touch, tail_capacity=cap)
            log.info("update(out-of-core): +%d touch points (%d/%d tail "
                     "slots)", pts.shape[0], self.model.n_tail, cap)
            return self
        if kind in ("sharded", "sharded_joint"):
            # Both sharded models (value-only and joint) implement the
            # tail-band bordering update; touch points land in preallocated
            # last-band slots, never a full refactor.
            pts = self.frame.to_normalized(
                jnp.asarray(np.asarray(touch_points_world, self.config.dtype))
            )
            y = (jnp.zeros(pts.shape[0], pts.dtype) if targets is None
                 else jnp.asarray(targets, pts.dtype))
            self.model = self.model.update(pts, y, self.config.noise_touch)
            log.info("update(sharded): +%d touch points (total %d)",
                     pts.shape[0], self.model.n_touch)
            return self
        pts = self.frame.to_normalized(
            jnp.asarray(np.asarray(touch_points_world, self.config.dtype))
        )
        y = (jnp.zeros(pts.shape[0], pts.dtype) if targets is None
             else jnp.asarray(targets, pts.dtype))
        if kind == "experts":
            # Expert committee: each touch is routed to its nearest expert
            # and bordered into that expert's factor only (gp.experts).
            from gpis_tpu.gp import experts as gpe

            self.model = gpe.update(self.model, pts, y, self.config.noise_touch)
            log.info("update(experts): +%d touch points (per-expert totals %s)",
                     pts.shape[0], np.asarray(self.model.n_touch).tolist())
            return self
        if kind == "joint":
            from gpis_tpu.gp import derivative as gpd

            m = self.model
            self._touches = getattr(self, "_touches", [])
            self._touches.append((np.asarray(pts), np.asarray(y)))
            # Incremental path: preallocated joint tail slots take the
            # bordering update (O(T J^2)); overflow falls through to the
            # full refit below, which folds ALL accumulated touches into
            # the core observations and re-arms empty slots.
            if (m.touch_x is not None
                    and int(m.n_touch) + pts.shape[0] <= m.touch_capacity):
                self.model = gpd.update_joint(m, pts, y, self.config.noise_touch)
                log.info("update(joint): +%d touch points (bordering, %d/%d slots)",
                         pts.shape[0], int(self.model.n_touch),
                         self.model.touch_capacity)
                return self
            tx = np.concatenate([t[0] for t in self._touches])
            ty = np.concatenate([t[1] for t in self._touches])
            ts = self.training
            if ts is None:
                raise ValueError(
                    "joint touch slots overflowed in a restored session: the "
                    "original training set is not part of the checkpoint, so "
                    "accumulated touches cannot be folded into the core. "
                    "Restart from the original cloud (start()) or refit with "
                    "a larger touch_capacity; bordering updates within "
                    "capacity work fine after restore()."
                )
            n_s = ts.n_surface
            c0 = ts.x.shape[0]
            x = jnp.concatenate([ts.x, jnp.asarray(tx, ts.x.dtype)])
            yv = jnp.concatenate([ts.y, jnp.asarray(ty, ts.y.dtype)])
            nrm = jnp.concatenate(
                [m.normals[:c0], jnp.zeros((len(tx), 3), ts.x.dtype)]
            )
            noise_f = jnp.concatenate(
                [ts.noise, jnp.full((len(tx),), self.config.noise_touch, ts.x.dtype)]
            )
            noise_g = jnp.concatenate(
                [m.noise_g[:c0], jnp.full((len(tx),), self.config.pad_noise, ts.x.dtype)]
            )
            kernel, params = m.kernel, m.params
            # Release the old joint factors before the refit: holding the
            # previous (4C)^2 chol+W while building the new ones doubles
            # peak HBM and fragments the allocator (observed OOM after a
            # few touches at 5k points on a 16 GB chip).
            del m
            self.model = None
            self.model = gpd.fit_with_normals(
                kernel, x, yv, nrm, noise_f, noise_g, params,
                block=self.config.block, pad_noise=self.config.pad_noise,
                touch_capacity=self.config.touch_capacity,
            )
            if 4 * self.model.capacity >= 1024:
                self.model = gpd.with_linv_joint(self.model)
            log.info("update(joint): +%d touch points (refit, %d total)",
                     pts.shape[0], len(tx))
        else:
            self.model = gpr.update(self.model, pts, y, self.config.noise_touch)
            log.info("update: +%d touch points (total %d)",
                     pts.shape[0], int(self.model.n_touch))
        return self

    def export_exploration(self, html_path: str, resolution: int = 32):
        """One-stop visual: isosurface mesh + atlas charts + next-best path
        into a self-contained HTML viewer (the RViz-panel replacement)."""
        from gpis_tpu.viz.export import export_html

        res = self.next_best_path()
        verts, faces, var = self.extract_surface(resolution=resolution)
        charts = [
            {
                "center": np.asarray(self.frame.to_world(jnp.asarray(c.center, self.config.dtype))).tolist(),
                "normal": c.normal.tolist(),
                "u": c.u.tolist(),
                "v": c.v.tolist(),
                "radius": float(c.radius * float(self.frame.scale)),
            }
            for c in res.charts
        ]
        export_html(html_path, verts, faces, variance=var, charts=charts,
                    best_path=res.path)
        return res

    # ------------------------------------------------------------ hyperopt

    def _replay_joint_touches(self, old) -> None:
        """Re-border the accumulated touch observations of a pre-refit
        sharded-joint model into the freshly refitted one: a hyperopt
        refit from core points alone would silently revert the posterior
        at every touched site (review finding r3c; the OOC branch folds
        its tail for the same reason)."""
        if getattr(old, "n_touch", 0):
            c = old.n0
            self.model = self.model.update(
                old.x[c:c + old.n_touch],
                old.y[4 * c:4 * c + old.n_touch],
                old.noise_f[c:c + old.n_touch],
            )

    def optimize_hyperparameters(self, **kw):
        """MLL optimization (config 3) in place; refits with the optimum.
        Dispatches to the joint objective when the model carries normals."""
        self._require_model()
        m = self.model
        kind = model_kind(m)
        if kind in ("ooc", "ooc_joint"):
            # Out-of-core model: optimize the MLL on a training-set
            # subsample (a few thousand points pin lengthscale/noise; the
            # full objective would need one beyond-HBM factorization per
            # optimizer step), then refit out-of-core with the optimum.
            from gpis_tpu.linalg import outofcore as ooc

            method = kw.pop("method", "subsample")
            if kind == "ooc_joint":
                # Joint out-of-core model: optimize the joint MLL — on a
                # core subsample by default (like the sharded-joint path —
                # a few thousand points pin the kernel), or with full-data
                # streamed exact gradients (method="stream", one beyond-HBM
                # factor + W-pass per step) — then refit out-of-core,
                # folding tactile touches in as value-only observations.
                n = m.n_real
                if method == "stream":
                    from gpis_tpu.gp import ooc_hyperopt as oho

                    kw.pop("subsample", None)
                    res_d = oho.optimize_ooc_joint(
                        m.kernel, m.x[:n], m.y[:n], m.normals[:n],
                        m.noise[:n], m.noise_g[:n], m.params, panel=m.panel,
                        pad_noise=self.config.pad_noise, **kw,
                    )
                    res = ho.HyperoptResult(
                        params=res_d["params"],
                        noise=m.noise[:n] * float(res_d["noise_scale"]),
                        noise_scale=res_d["noise_scale"],
                        noise_scale_g=1.0,  # the stream objective's
                        # value-noise-scale convention (gradient family
                        # fixed, like optimize_sharded_joint)
                        history=res_d["history"], mll=res_d["mll"],
                    )
                    desc = "stream, full data"
                elif method == "subsample":
                    sub = int(kw.pop("subsample", 1024))
                    step = max(1, n // sub)
                    res = ho.optimize_joint(
                        m.kernel, m.x[:n:step], m.y[:n:step],
                        m.normals[:n:step], m.noise[:n:step],
                        m.noise_g[:n:step], m.params,
                        n_real=m.x[:n:step].shape[0], **kw,
                    )
                    desc = f"{m.x[:n:step].shape[0]}-pt subsample"
                else:
                    raise ValueError(
                        f"unknown hyperopt method {method!r} for a joint "
                        "out-of-core model (use 'subsample' or 'stream')"
                    )
                fx = np.asarray(m.x[:n])
                fy = np.asarray(m.y[:n])
                fnrm = np.asarray(m.normals[:n])
                fnf = np.asarray(m.noise[:n]) * float(res.noise_scale)
                fng = np.asarray(m.noise_g[:n]) * float(res.noise_scale_g)
                if m.n_tail:
                    occ = m.n_tail
                    fx = np.concatenate([fx, np.asarray(m.tail_x[:occ])])
                    fy = np.concatenate([fy, np.asarray(m.tail_y[:occ])])
                    fnrm = np.concatenate([fnrm, np.zeros((occ, 3))])
                    fnf = np.concatenate(
                        [fnf, np.asarray(m.tail_noise[:occ])])
                    fng = np.concatenate(
                        [fng, np.full((occ,), self.config.pad_noise)])
                self.model = ooc.ooc_fit_joint(
                    m.kernel, fx, fy, fnrm, fnf, fng, res.params,
                    panel=m.panel, pad_noise=self.config.pad_noise,
                )
                log.info("hyperopt(out-of-core joint, %s): mll=%.4f "
                         "ls=%.4f", desc, res.mll,
                         float(res.params["lengthscale"]))
                return res
            ts = self.training
            if ts is None:
                raise ValueError(
                    "hyperopt on a restored out-of-core session needs the "
                    "original training set (not part of the checkpoint); "
                    "re-start() from the cloud, or optimize before saving"
                )
            if method == "stream":
                # Full-data exact gradients: one out-of-core factor + TRSM
                # + one streamed W-pass per step (gp.ooc_hyperopt) — config
                # 3 with no subsampling at beyond-HBM N.  Expensive by
                # construction (a fit per step); 'subsample' stays the
                # default.
                from gpis_tpu.gp import ooc_hyperopt as oho

                kw.pop("subsample", None)
                res_d = oho.optimize_ooc(
                    m.kernel, jnp.asarray(ts.x), jnp.asarray(ts.y),
                    jnp.asarray(ts.noise), m.params, panel=m.panel,
                    pad_noise=self.config.pad_noise, **kw,
                )
                res = ho.HyperoptResult(
                    params=res_d["params"],
                    noise=jnp.asarray(ts.noise) * float(res_d["noise_scale"]),
                    noise_scale=res_d["noise_scale"],
                    history=res_d["history"], mll=res_d["mll"],
                )
                desc = "stream, full data"
            elif method == "subsample":
                sub = int(kw.pop("subsample", 4096))
                step = max(1, ts.x.shape[0] // sub)
                xs = jnp.asarray(ts.x[::step])
                res = ho.optimize(
                    m.kernel, xs, jnp.asarray(ts.y[::step]),
                    jnp.asarray(ts.noise[::step]), m.params,
                    n_real=xs.shape[0], **kw,
                )
                desc = f"{xs.shape[0]}-pt subsample"
            else:
                raise ValueError(
                    f"unknown hyperopt method {method!r} for an out-of-core "
                    "model (use 'subsample', or 'stream' for full-data "
                    "exact gradients at one factorization per step)"
                )
            scale = float(res.noise_scale)
            # Fold accumulated tactile touches into the refit — they live
            # in-core on the model's tail block, and dropping them would
            # silently revert the posterior at every touched site.  Touch
            # noise keeps its configured value (scale applies to the
            # training-set observations the objective saw).
            fx, fy = ts.x, ts.y
            fnoise = ts.noise * scale
            if m.n_tail:
                occ = m.n_tail
                fx = np.concatenate([np.asarray(fx),
                                     np.asarray(m.tail_x[:occ])])
                fy = np.concatenate([np.asarray(fy),
                                     np.asarray(m.tail_y[:occ])])
                fnoise = np.concatenate([np.asarray(fnoise),
                                         np.asarray(m.tail_noise[:occ])])
            self.model = ooc.ooc_fit(
                m.kernel, fx, fy, fnoise, res.params,
                panel=m.panel, pad_noise=self.config.pad_noise,
            )
            log.info("hyperopt(out-of-core, %s): mll=%.4f "
                     "ls=%.4f noise x%.3f", desc, res.mll,
                     float(res.params["lengthscale"]), scale)
            return res
        if kind == "experts":
            # Expert committee: hyperparameters are global.  Two methods:
            # "subsample" (default) optimizes the exact single-GP MLL on a
            # training-set subsample, like the out-of-core path; "poe"
            # optimizes the full-data product-of-experts objective
            # sum_e MLL_e — the factorized likelihood the committee
            # actually deploys (gp.experts.optimize_experts).  Both then
            # refit the committee and replay routed touches.
            from gpis_tpu.gp import experts as gpe

            method = kw.pop("method", "subsample")
            joint_obs = getattr(self, "_joint_expert_obs", None)
            if method == "poe":
                kw.pop("subsample", None)
                res = gpe.optimize_experts(m, **kw)
            elif method == "subsample":
                ts_sub = self.training
                if ts_sub is None:
                    raise ValueError(
                        "subsample hyperopt on a restored experts session "
                        "needs the original training set (not part of the "
                        "checkpoint); re-start() from the cloud, or use "
                        "method='poe' (optimizes on the committee's own "
                        "stored rows)"
                    )
                sub = int(kw.pop("subsample", 4096))
                step = max(1, ts_sub.x.shape[0] // sub)
                xs = jnp.asarray(ts_sub.x[::step])
                if m.joint:
                    nrm_full, noise_g = joint_obs
                    res = ho.optimize_joint(
                        m.kernel, xs, jnp.asarray(ts_sub.y[::step]),
                        nrm_full[::step], jnp.asarray(ts_sub.noise[::step]),
                        noise_g[::step], m.params, n_real=xs.shape[0], **kw,
                    )
                else:
                    res = ho.optimize(
                        m.kernel, xs, jnp.asarray(ts_sub.y[::step]),
                        jnp.asarray(ts_sub.noise[::step]), m.params,
                        n_real=xs.shape[0], **kw,
                    )
            else:
                raise ValueError(
                    f"unknown hyperopt method {method!r} for an expert "
                    "committee (use 'subsample' or 'poe')"
                )
            ts = self.training
            if ts is None or (m.joint and joint_obs is None):
                raise ValueError(
                    "refitting a restored experts session needs the "
                    "original training set; re-start() from the cloud, or "
                    "optimize before saving"
                )
            scale = float(res.noise_scale)
            old = m
            ekw = dict(
                n_experts=old.n_experts,
                n_shared_tail=ts.n_internal + ts.n_external,
                block=self.config.block,
                touch_capacity=self.config.touch_capacity,
                pad_noise=self.config.pad_noise, beta=old.beta,
                gate=old.gate,
            )
            if m.joint:
                nrm_full, noise_g = joint_obs
                scale_g = float(getattr(res, "noise_scale_g", 1.0) or 1.0)
                self.model = gpe.fit_experts_joint(
                    m.kernel, ts.x, ts.y, nrm_full, ts.noise * scale,
                    noise_g * scale_g, res.params, **ekw)
            else:
                self.model = gpe.fit_experts(
                    m.kernel, ts.x, ts.y, ts.noise * scale, res.params,
                    **ekw)
            # Replay the routed touch observations from the old slots
            # (re-routing against the fresh centroids is fine — routing is
            # a locality heuristic, the bordering math is exact either way).
            occ = np.asarray(old.n_touch)
            if occ.any():
                if old.joint:
                    slots = [(old.touch_x[e, :k], old.touch_y[e, :k],
                              old.touch_noise[e, :k])
                             for e, k in enumerate(occ) if k]
                else:
                    n0 = old.n0
                    slots = [(old.x[e, n0:n0 + k], old.y[e, n0:n0 + k],
                              old.noise[e, n0:n0 + k])
                             for e, k in enumerate(occ) if k]
                tx = np.concatenate([np.asarray(s[0]) for s in slots])
                ty = np.concatenate([np.asarray(s[1]) for s in slots])
                tn = np.concatenate([np.asarray(s[2]) for s in slots])
                self.model = gpe.update(self.model, tx, ty, tn)
            log.info("hyperopt(experts%s, %s): mll=%.4f ls=%.4f",
                     ", joint" if m.joint else "", method,
                     res.mll, float(res.params["lengthscale"]))
            return res
        if kind == "sharded_joint":
            from gpis_tpu.gp import sharded_joint as gsj

            method = kw.pop("method", "subsample")
            if method == "distributed":
                # True distributed joint hyperopt: exact MLL gradients over
                # the mesh via the assembly-agnostic identities
                # (gp.sharded_hyperopt.optimize_sharded_joint) — no
                # subsampling, no silent downgrade (VERDICT r2 weak 2).
                from gpis_tpu.gp import sharded_hyperopt as sho

                yp = m.y[: m.n0]
                res_d = sho.optimize_sharded_joint(
                    m.kernel, m.x, m.y, m.noise_f, m.noise_g, m.params,
                    m.mesh, c=m.n0, block=m.block, n_real=m.n_real,
                    n_touch=m.n_touch, **kw,
                )
                scale = float(res_d["noise_scale"])
                n = m.n_real
                self.model = gsj.fit_sharded_joint(
                    m.kernel, m.x[:n], yp[:n], m.normals[:n],
                    m.noise_f[:n] * scale, m.noise_g[:n], res_d["params"],
                    mesh=m.mesh, block=m.block,
                    touch_capacity=self.config.touch_capacity,
                    pad_noise=m.pad_noise,
                )
                self._replay_joint_touches(m)
                log.info(
                    "hyperopt(sharded joint, distributed): mll=%.4f ls=%.4f "
                    "noise x%.3f", res_d["mll"],
                    float(res_d["params"]["lengthscale"]), scale,
                )
                return ho.HyperoptResult(
                    params=res_d["params"], noise=m.noise_f[:n] * scale,
                    noise_scale=res_d["noise_scale"],
                    history=res_d["history"], mll=res_d["mll"],
                )
            if method != "subsample":
                raise ValueError(
                    f"unknown hyperopt method {method!r} for a sharded joint "
                    "model (use 'subsample' or 'distributed')"
                )
            # Subsample method: optimize the joint MLL on a single-chip
            # core-point subsample, then refit the sharded joint system.
            sub = int(kw.pop("subsample", 1024))
            n = m.n_real
            step = max(1, n // sub)
            res = ho.optimize_joint(
                m.kernel, m.x[:n:step], m.y[:n:step], m.normals[:n:step],
                m.noise_f[:n:step], m.noise_g[:n:step], m.params,
                n_real=m.x[:n:step].shape[0], **kw,
            )
            # The refit must use the LEARNED noise scale (the reported mll
            # was evaluated at scaled noise) and must not drop accumulated
            # touches (review findings r3c).
            self.model = gsj.fit_sharded_joint(
                m.kernel, m.x[:n], m.y[:n], m.normals[:n],
                m.noise_f[:n] * float(res.noise_scale),
                m.noise_g[:n] * float(res.noise_scale_g),
                res.params, mesh=m.mesh, block=m.block,
                touch_capacity=self.config.touch_capacity,
                pad_noise=m.pad_noise,
            )
            self._replay_joint_touches(m)
            log.info("hyperopt(sharded joint, %d-pt subsample): mll=%.4f ls=%.4f",
                     m.x[:n:step].shape[0], res.mll,
                     float(res.params["lengthscale"]))
            return res
        if kind == "sharded":
            method = kw.pop("method", "subsample")
            if method not in ("subsample", "distributed"):
                raise ValueError(
                    f"unknown hyperopt method {method!r} for a sharded "
                    "model (use 'subsample' or 'distributed')"
                )
        if kind == "sharded" and method == "distributed":
            # True distributed hyperopt: exact MLL gradients over the mesh
            # (gp.sharded_hyperopt, gradient identities — no AD through
            # collectives).  Each step costs one sharded fit; the default
            # subsample method is cheaper when a few thousand points pin
            # the hyperparameters.
            from gpis_tpu.gp import sharded_hyperopt as sho
            from gpis_tpu.gp import sharded_model as gsm

            res_d = sho.optimize_sharded(
                m.kernel, m.x, m.y, m.noise, m.params, m.mesh,
                block=m.block, n_real=m.n_real, **kw,
            )
            scale = float(res_d["noise_scale"])
            n = m.n_real
            self.model = gsm.fit_sharded(
                m.kernel, m.x[:n], m.y[:n], m.noise[:n] * scale,
                res_d["params"], mesh=m.mesh, block=m.block,
                touch_capacity=self.config.touch_capacity,
                pad_noise=self.config.pad_noise,
            )
            log.info("hyperopt(distributed): mll=%.4f ls=%.4f noise x%.3f",
                     res_d["mll"], float(res_d["params"]["lengthscale"]), scale)
            return ho.HyperoptResult(
                params=res_d["params"], noise=m.noise[:n] * scale,
                noise_scale=res_d["noise_scale"], history=res_d["history"],
                mll=res_d["mll"],
            )
        if kind == "sharded":
            # Sharded model: optimize the MLL on a single-chip subsample
            # (hyperparameters are global; a few thousand points pin them),
            # then refit the full sharded model with the optimum.
            sub = int(kw.pop("subsample", 2048))
            n = m.n_real
            step = max(1, n // sub)
            xs = m.x[:n:step]
            ys = m.y[:n:step]
            ns = m.noise[:n:step]
            sub_model = gpr.fit(m.kernel, xs, ys, ns, m.params,
                                block=self.config.block, touch_capacity=0,
                                pad_noise=self.config.pad_noise)
            res = ho.optimize(
                m.kernel, sub_model.x, sub_model.y, sub_model.noise,
                m.params, n_real=xs.shape[0], **kw,
            )
            from gpis_tpu.gp import sharded_model as gsm

            # The optimizer learns one multiplicative noise scale for all
            # real rows; apply that scalar (NOT a row-0 ratio, which would
            # mis-scale mixed-noise clouds — ADVICE r1).
            noise_scale = float(res.noise_scale)
            self.model = gsm.fit_sharded(
                m.kernel, m.x[:n], m.y[:n], m.noise[:n] * noise_scale,
                res.params, mesh=m.mesh, block=m.block,
                touch_capacity=self.config.touch_capacity,
                pad_noise=self.config.pad_noise,
            )
            log.info("hyperopt(sharded, %d-pt subsample): mll=%.4f ls=%.4f",
                     xs.shape[0], res.mll, float(res.params["lengthscale"]))
            return res
        bad = kw.pop("method", "subsample")
        if bad != "subsample":
            raise ValueError(
                f"unknown hyperopt method {bad!r} for an in-core model "
                "('distributed' needs a sharded fit, 'stream' an "
                "out-of-core fit)"
            )
        if kind == "joint":
            from gpis_tpu.gp import derivative as gpd

            res = ho.optimize_joint(
                m.kernel, m.x, m.y, m.normals, m.noise_f, m.noise_g,
                m.params, n_real=m.n0, **kw,
            )
            # Refit with the optimum, folding the OCCUPIED touch slots into
            # the core as value-only observations (slots re-arm empty).
            # Slots hold exactly the touches not yet folded by a previous
            # refit, so there is no double counting.
            x, yv = m.x, m.y
            nrm, nf, ng = m.normals, res.noise, res.noise_g
            occ = int(m.n_touch) if getattr(m, "n_touch", None) is not None else 0
            if occ:
                x = jnp.concatenate([x, m.touch_x[:occ]])
                yv = jnp.concatenate([yv, m.touch_y[:occ]])
                nrm = jnp.concatenate([nrm, jnp.zeros((occ, 3), x.dtype)])
                nf = jnp.concatenate([nf, m.touch_noise[:occ]])
                ng = jnp.concatenate(
                    [ng, jnp.full((occ,), self.config.pad_noise, x.dtype)])
            self.model = gpd.fit_with_normals(
                m.kernel, x, yv, nrm, nf, ng,
                res.params, block=self.config.block,
                pad_noise=self.config.pad_noise,
                touch_capacity=self.config.touch_capacity,
            )
            if 4 * self.model.capacity >= 1024:
                self.model = gpd.with_linv_joint(self.model)
        else:
            res = ho.optimize(
                m.kernel, m.x, m.y, m.noise, m.params,
                n_real=m.n0, **kw,
            )
            self.model = gpr.fit_padded(
                m.kernel, m.x, m.y, res.noise, res.params, n0=m.n0
            )
        log.info("hyperopt: mll=%.4f lengthscale=%.4f", res.mll,
                 float(res.params["lengthscale"]))
        return res

    # ------------------------------------------------------- checkpointing

    def save(self, path: str):
        """Checkpoint model + frame (SURVEY.md §6 checkpoint/resume)."""
        self._require_model()
        ckpt.save_model(path, self.model)
        np.savez(path + ".frame.npz",
                 centroid=np.asarray(self.frame.centroid),
                 scale=np.asarray(self.frame.scale))
        return path

    @classmethod
    def load(cls, path: str, config: ModelConfig | None = None, **kw):
        sess = cls(config, **kw)
        return sess.restore(path)

    def restore(self, path: str):
        """Load a checkpoint into THIS session (crash-recovery drill,
        SURVEY.md §6: fit -> touch -> save -> crash -> load -> replay the
        pending touches).  The HTTP node keeps one session object across
        its lifetime, so /load routes here; incremental updates continue
        from the checkpointed factor (the W carry is stored), and any
        touch that arrived after the checkpoint is simply replayed through
        update()."""
        self.model = ckpt.load_model(path)
        # Restored out-of-core models come back with every W panel on disk;
        # pin them into the idle HBM like start() does (promotion never
        # touches the checkpoint's files — see TieredPanelStore.promote).
        if model_kind(self.model) in ("ooc", "ooc_joint"):
            self.model.promote_for_serving()
        d = np.load(path + ".frame.npz")
        self.frame = gpis.Frame(
            centroid=jnp.asarray(d["centroid"]), scale=jnp.asarray(d["scale"])
        )
        # Pre-crash bookkeeping does not survive; the joint overflow-refit
        # path re-derives it from the model's slots on the next overflow.
        self.training = None
        self._touches = []
        return self

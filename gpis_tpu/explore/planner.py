"""GPAtlasRRT explorer (rebuild of reference component C6, SURVEY.md §3 C6 /
§4.4).

RRT-style tree of charts grown over the estimated surface toward high
posterior variance; emits the "next best path" a robot finger should trace
to reduce model uncertainty.  Strategies:

* ``single_path``  — greedy chain: always expand the newest chart (the
  reference's single-path strategy).
* ``multi_branch`` — expand the leaf whose best candidate has the highest
  variance (RRT-like frontier selection).

Host-side tree logic + batched device-side GP queries: each expansion round
evaluates *all* candidate points of the frontier in one posterior call
(SURVEY.md §4.4 rebuild note).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gpis_tpu.config import ExploreConfig
from gpis_tpu.explore import atlas as atlas_mod
from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.model import GPModel
from gpis_tpu.surface import projection

__all__ = ["ExplorationResult", "next_best_path", "is_done"]


@dataclasses.dataclass
class ExplorationResult:
    """Pose sequence root->target plus the atlas that produced it."""

    path: np.ndarray  # (K, 3) positions along the surface
    normals: np.ndarray  # (K, 3) outward normals (pose orientation)
    charts: list  # list[Chart], the whole tree
    target_variance: float
    reached_threshold: bool  # True if a variance >= threshold target was found


def is_done(model: GPModel, cfg: ExploreConfig, probe_points) -> bool:
    """Global termination (reference §1 step 5): exploration is complete when
    the posterior variance everywhere on the estimated surface falls below
    the threshold."""
    _, var = gpr.predict(model, jnp.asarray(probe_points))
    return bool(np.max(np.asarray(var)) < cfg.variance_threshold)


def _extract_path(charts, leaf_id):
    chain = []
    cid = leaf_id
    by_id = {c.id: c for c in charts}
    while cid != -1:
        chain.append(by_id[cid])
        cid = by_id[cid].parent
    chain.reverse()
    return (
        np.stack([c.center for c in chain]),
        np.stack([c.normal for c in chain]),
    )


def next_best_path(
    model: GPModel,
    cfg: ExploreConfig,
    *,
    seed_point=None,
) -> ExplorationResult:
    """Grow the atlas from a surface seed toward high variance and return the
    next-best tactile path (reference `getNextBestPath`, §4.4).  Deterministic:
    candidate selection is argmax-variance (the reference's strategy), so
    repeated calls on the same model yield the same path."""

    # Root chart: project the seed (default: the *surface-labeled* training
    # point with the highest posterior variance — internal/external label
    # points and padding rows are not on the surface and must not seed).
    if seed_point is None:
        # model.noise is the value-observation noise over the C core points
        # for every model type; the first C entries of y are the value
        # targets even in the joint layouts ([f(1..C) | gradients | touch]),
        # and the first C rows of x are the core coordinates.
        noise_v = np.asarray(model.noise)
        c_v = noise_v.shape[0]
        on_surface = (np.asarray(model.y)[:c_v] == 0.0) & (noise_v < 1e6)
        cand = np.asarray(model.x)[:c_v][on_surface]
        if len(cand) == 0:
            raise ValueError("model has no surface-labeled training points to seed from")
        _, var0 = gpr.predict(model, jnp.asarray(cand, model.dtype))
        seed_point = cand[int(np.argmax(np.asarray(var0)))]
    seed, _ = projection.project_point(model, jnp.asarray(seed_point, model.dtype))
    charts = atlas_mod.make_charts(model, np.asarray(seed)[None, :], cfg, ids=[0], parents=[-1])

    frontier = [charts[0]]
    best_leaf, best_var = charts[0], charts[0].variance
    reached = charts[0].variance >= cfg.variance_threshold
    next_id = 1
    # Charts whose disc candidates have all failed projection (or are all
    # covered).  disc_samples is deterministic, so retrying such a chart
    # without new neighbours would loop forever — instead the single-path
    # strategy re-seeds from the best *non-exhausted* chart in the tree
    # (VERDICT r2 weak 7: a pathological flat-gradient disc must not end
    # the whole exploration).
    exhausted: set[int] = set()

    def _reseed():
        remaining = [c for c in charts if c.id not in exhausted]
        if not remaining:
            return False
        frontier[:] = [max(remaining, key=lambda c: c.variance)]
        return True

    while not reached and next_id < cfg.max_charts and frontier:
        # Gather every frontier chart's disc candidates into ONE device call.
        cand_blocks = [atlas_mod.disc_samples(c, cfg.n_disc_samples) for c in frontier]
        cands = np.concatenate(cand_blocks, axis=0)
        # Pad the batch to a shape bucket: the frontier size varies per
        # round, and on TPU every fresh shape is a fresh XLA compile (the
        # un-bucketed planner spent ~20 s/call recompiling at 16k).
        bucket = -(-len(cands) // 256) * 256
        qpad = np.zeros((bucket, 3), dtype=cands.dtype)
        qpad[: len(cands)] = cands
        _, var = gpr.predict(model, jnp.asarray(qpad, model.dtype))
        var = np.asarray(var)[: len(cands)]

        # Penalize candidates that fall back inside existing charts (keeps
        # the tree exploring instead of oscillating).
        centers = np.stack([c.center for c in charts])
        radii = np.array([c.radius for c in charts])
        d = np.linalg.norm(cands[:, None, :] - centers[None, :, :], axis=-1)
        covered = (d < 0.8 * radii[None, :]).any(axis=1)
        score = np.where(covered, -np.inf, var)

        def owner(idx):
            # Map flat candidate index back to its frontier chart.
            acc = 0
            for c, blk in zip(frontier, cand_blocks):
                if idx < acc + len(blk):
                    return c
                acc += len(blk)
            return frontier[-1]

        if cfg.strategy == "single_path":
            # Only the newest chart expands; its block is the last one.
            lo = len(cands) - cfg.n_disc_samples
            score = np.where(np.arange(len(score)) >= lo, score, -np.inf)
        if not np.isfinite(score).any():
            if cfg.strategy == "single_path":
                # The active chart's disc is fully covered: re-seed from the
                # next-best chart instead of terminating the exploration.
                exhausted.add(frontier[0].id)
                if _reseed():
                    continue
            break

        # Try candidates best-first: a failed projection (rare: flat
        # gradient) must not orphan good candidates on the same disc, so
        # fall through to the next-best candidate instead of dropping the
        # whole chart (ADVICE r1).  Projection + normal + variance run as
        # ONE device program per attempt (project_and_chart) — the RRT loop
        # is round-trip-latency-bound on remote TPU attachments.
        order = np.argsort(-score)
        new = None
        for cand_idx in order[:8]:
            if not np.isfinite(score[cand_idx]):
                break
            parent = owner(int(cand_idx))
            new = atlas_mod.project_and_chart(
                model, cands[int(cand_idx)], cfg, cid=next_id, parent=parent.id
            )
            if new is not None:
                break
        if new is None:
            if cfg.strategy == "single_path":
                # All retried candidates on this disc failed projection:
                # re-seed from the next-best chart in the tree rather than
                # giving up the whole exploration (VERDICT r2 weak 7).
                exhausted.add(frontier[0].id)
                if _reseed():
                    continue
                break
            # Every retried candidate failed: drop the chart owning the
            # best-scoring one so the round still makes progress.
            bad = owner(int(order[0]))
            exhausted.add(bad.id)
            frontier.remove(bad)
            continue

        charts.append(new)
        next_id += 1
        if cfg.strategy == "single_path":
            frontier = [new]
        else:
            frontier.append(new)
        if new.variance > best_var:
            best_leaf, best_var = new, new.variance
        # Touch target found: a region whose uncertainty exceeds threshold
        # (relative to prior) — the reference's termination for one path.
        if new.variance >= cfg.variance_threshold:
            best_leaf, best_var = new, new.variance
            reached = True

    path, normals = _extract_path(charts, best_leaf.id)
    return ExplorationResult(
        path=path,
        normals=normals,
        charts=charts,
        target_variance=best_var,
        reached_threshold=reached,
    )

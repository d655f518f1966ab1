"""Model-kind dispatch tests (VERDICT r4 weak #3): `model_kind` is the ONE
discriminator for the polymorphic verbs, matching on class names — a dense
model that innocently grows a `mesh`/`wstore`/`centroids` attribute must
still route dense everywhere the old duck-typing would have mis-routed it."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.data import synthetic
from gpis_tpu.gp import regression as gpr
from gpis_tpu.gp.kinds import MODEL_KINDS, model_kind
from gpis_tpu.kernels import functions as kf


def _dense_model(rng, n=96):
    pts, _ = synthetic.sphere_cloud(n, seed=7)
    x = jnp.asarray(pts)
    y = jnp.asarray(rng.normal(size=n) * 0.1)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-3, size=n))
    params = kf.kernel_params(0.9, 1.1)
    return gpr.fit("rbf", x, y, noise, params, block=32, touch_capacity=32)


def test_dense_kind(rng):
    assert model_kind(_dense_model(rng)) == "dense"


def test_unknown_type_raises():
    class Imposter:  # has every duck-typed attribute, no registered name
        mesh = object()
        wstore = object()
        centroids = object()
        normals = object()

    with pytest.raises(TypeError, match="register it"):
        model_kind(Imposter())


def test_stray_attribute_still_routes_dense(rng):
    """The r3 hazard verbatim: a GPModel subclass with a stray `mesh`
    attribute used to be routed to `model.predict(q)` (the sharded branch)
    by the old hasattr dispatch; class-name matching keeps it dense."""
    model = _dense_model(rng)

    meshy = gpr.GPModel(**{f.name: getattr(model, f.name)
                           for f in dataclasses.fields(model)})
    # Frozen dataclasses without __slots__ accept new instance attributes —
    # exactly how a caller could innocently attach one.
    object.__setattr__(meshy, "mesh", object())  # would hijack hasattr dispatch
    object.__setattr__(meshy, "wstore", object())
    assert model_kind(meshy) == "dense"

    q = jnp.asarray(np.random.default_rng(0).normal(size=(17, 3)))
    mean0, var0 = gpr.predict(model, q)
    mean1, var1 = gpr.predict(meshy, q)  # old dispatch: AttributeError/misroute
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var0), rtol=0, atol=0)

    from gpis_tpu.surface import grid

    m0, v0 = grid.evaluate_points_chunked(model, q, chunk=8)
    m1, v1 = grid.evaluate_points_chunked(meshy, q, chunk=8)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=0, atol=0)


def test_every_registered_class_resolves():
    # The registry is the taxonomy; each name maps to exactly one kind.
    seen = {}
    for kind, classes in MODEL_KINDS.items():
        for cls in classes:
            assert cls not in seen, f"{cls} registered twice"
            seen[cls] = kind
    assert set(MODEL_KINDS) == {
        "dense", "joint", "sharded", "sharded_joint", "ooc", "ooc_joint",
        "experts",
    }

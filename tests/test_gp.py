"""C2 GP regression tests: oracle parity of fit/predict (with capacity
padding), bordering update vs full refit, MLL value+gradient parity, and GP
property tests (SURVEY.md §5 items 1, 2, 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpis_tpu.data import synthetic
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf
from gpis_tpu.linalg import cholesky as lin

LS, SV = 0.9, 1.1


def _fixture(rng, n=120, name="rbf"):
    pts, _ = synthetic.sphere_cloud(n, seed=3)
    x = jnp.asarray(pts)
    y = jnp.asarray(rng.normal(size=n) * 0.1)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-3, size=n))
    # Thin-plate `2r^3 - 3Rr^2 + R^3` is conditionally PD: R must exceed the
    # domain diameter (SURVEY.md §8 "hard parts"), so use R=3 > 2.
    ls = 3.0 if name == "thin_plate" else LS
    params = kf.kernel_params(ls, SV)
    return x, y, noise, params, ls


@pytest.mark.parametrize("name", ["rbf", "thin_plate", "laplace", "inverse_multiquadric"])
def test_fit_predict_parity(name, rng):
    x, y, noise, params, ls = _fixture(rng, name=name)
    model = gpr.fit(name, x, y, noise, params, block=64, touch_capacity=64)
    q = jnp.asarray(rng.normal(size=(50, 3)) * 1.2)
    mean, var = gpr.predict(model, q)

    om = oracle.fit(name, np.asarray(x), np.asarray(y), np.asarray(noise), ls, SV)
    omean, ovar = oracle.predict(om, np.asarray(q))
    # 1e-6 parity bar (BASELINE.md row 2); padding rows must not perturb it.
    np.testing.assert_allclose(mean, omean, atol=1e-6)
    np.testing.assert_allclose(var, ovar, atol=1e-6)


def test_padding_is_inert(rng):
    """Same data, different capacities -> same posterior."""
    x, y, noise, params, _ = _fixture(rng, n=50)
    q = jnp.asarray(rng.normal(size=(20, 3)))
    m1 = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)
    m2 = gpr.fit("rbf", x, y, noise, params, block=256, touch_capacity=512)
    mean1, var1 = gpr.predict(m1, q)
    mean2, var2 = gpr.predict(m2, q)
    np.testing.assert_allclose(mean1, mean2, atol=1e-8)
    np.testing.assert_allclose(var1, var2, atol=1e-8)


def test_update_matches_refit(rng):
    """Bordering update (SURVEY.md §4.5) == full refit with appended points."""
    x, y, noise, params, _ = _fixture(rng, n=80)
    model = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)

    tx = jnp.asarray(rng.normal(size=(7, 3)) * 0.9)
    ty = jnp.zeros(7)
    model2 = gpr.update(model, tx, ty, 1e-6)
    # Second batch exercises a non-zero traced start offset.
    tx2 = jnp.asarray(rng.normal(size=(5, 3)) * 0.9)
    model3 = gpr.update(model2, tx2, jnp.zeros(5), 1e-6)

    xa = np.concatenate([np.asarray(x), np.asarray(tx), np.asarray(tx2)])
    ya = np.concatenate([np.asarray(y), np.zeros(7), np.zeros(5)])
    na = np.concatenate([np.asarray(noise), np.full(12, 1e-6)])
    om = oracle.fit("rbf", xa, ya, na, LS, SV)

    q = jnp.asarray(rng.normal(size=(25, 3)))
    mean, var = gpr.predict(model3, q)
    omean, ovar = oracle.predict(om, np.asarray(q))
    np.testing.assert_allclose(mean, omean, atol=1e-6)
    np.testing.assert_allclose(var, ovar, atol=1e-6)
    assert int(model3.n_touch) == 12


def test_update_jits(rng):
    x, y, noise, params, _ = _fixture(rng, n=40)
    model = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)
    upd = jax.jit(gpr.update)
    m2 = upd(model, jnp.ones((3, 3)) * 0.2, jnp.zeros(3), 1e-6)
    m3 = upd(m2, jnp.ones((3, 3)) * 0.4, jnp.zeros(3), 1e-6)  # cache hit
    assert int(m3.n_touch) == 6


def test_mll_parity_and_grad(rng):
    x, y, noise, params, _ = _fixture(rng, n=60)
    n = x.shape[0]
    c = 128
    xp, yp, np_ = gpr._pad_training(x, y, noise, c, 1e10, x.dtype)

    got = gpr.log_marginal_likelihood("rbf", xp, yp, np_, params, n_real=n)
    want = oracle.log_marginal_likelihood(
        "rbf", np.asarray(x), np.asarray(y), np.asarray(noise), LS, SV
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Gradient wrt hyperparams: compare to oracle finite differences.
    def mll(p):
        return gpr.log_marginal_likelihood("rbf", xp, yp, np_, p)

    g = jax.grad(mll)(params)
    eps = 1e-5
    for key, base in [("lengthscale", LS), ("signal_variance", SV)]:
        up = oracle.log_marginal_likelihood(
            "rbf", np.asarray(x), np.asarray(y), np.asarray(noise),
            LS + (eps if key == "lengthscale" else 0.0),
            SV + (eps if key == "signal_variance" else 0.0),
        )
        dn = oracle.log_marginal_likelihood(
            "rbf", np.asarray(x), np.asarray(y), np.asarray(noise),
            LS - (eps if key == "lengthscale" else 0.0),
            SV - (eps if key == "signal_variance" else 0.0),
        )
        np.testing.assert_allclose(g[key], (up - dn) / (2 * eps), rtol=1e-4)


def test_gp_properties(rng):
    """SURVEY.md §5 item 5: variance >= 0; mean interpolates targets as
    noise -> 0."""
    x, y, _, params, _ = _fixture(rng, n=30)
    model = gpr.fit("rbf", x, y, 1e-10 * jnp.ones(30), params, block=32, touch_capacity=32)
    mean, var = gpr.predict(model, x)
    np.testing.assert_allclose(mean, y, atol=1e-4)
    assert np.all(np.asarray(var) >= -1e-9)  # PD kernel: nonneg up to roundoff


def test_kinv_variance_path_matches_solve(rng):
    """GEMM variance path (with_inverse) == triangular-solve path."""
    x, y, noise, params, _ = _fixture(rng, n=50)
    model = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)
    mi = gpr.with_inverse(model)
    q = jnp.asarray(rng.normal(size=(30, 3)))
    m1, v1 = gpr.predict(model, q)
    m2, v2 = gpr.predict(mi, q)
    np.testing.assert_allclose(m2, m1, atol=1e-10)
    np.testing.assert_allclose(v2, v1, atol=1e-8)


def test_batched_multi_object(rng):
    """DP axis: vmapped multi-object fit matches per-object fits."""
    from gpis_tpu.gp import batched as gpb
    from gpis_tpu.data import gpis as gpis_mod

    clouds = [gpis_mod.fibonacci_sphere(40 + 10 * i, radius=0.5 + 0.2 * i)
              for i in range(3)]
    params = kf.kernel_params(0.8, 1.0)
    bm = gpb.fit_batch("rbf", clouds, [0.0] * 3, [1e-4] * 3, params,
                       block=32, dtype=jnp.float64)
    q = jnp.asarray(rng.normal(size=(16, 3)))
    mean_b, var_b = gpb.predict_batch(bm, q)
    assert mean_b.shape == (3, 16)
    for i, cloud in enumerate(clouds):
        x = jnp.asarray(cloud)
        m = gpr.fit("rbf", x, jnp.zeros(x.shape[0]), 1e-4, params,
                    block=32, touch_capacity=0)
        mean_i, var_i = gpr.predict(m, q)
        np.testing.assert_allclose(mean_b[i], mean_i, atol=1e-8)
        np.testing.assert_allclose(var_b[i], var_i, atol=1e-8)


def test_batched_sharded_over_objects(rng):
    """DP sharding: object axis distributed over the virtual mesh."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.gp import batched as gpb
    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.parallel import mesh as pm

    mesh = pm.make_row_mesh(8)
    clouds = [gpis_mod.fibonacci_sphere(30, radius=0.4 + 0.05 * i) for i in range(8)]
    params = kf.kernel_params(0.8, 1.0)
    bm = gpb.fit_batch("rbf", clouds, [0.0] * 8, [1e-4] * 8, params,
                       block=32, dtype=jnp.float64, mesh=mesh)
    q = jnp.asarray(rng.normal(size=(8, 3)))
    mean_b, _ = gpb.predict_batch(bm, q)
    assert mean_b.shape == (8, 8)
    assert np.isfinite(np.asarray(mean_b)).all()


def test_linv_variance_path_matches_solve(rng):
    """W = L^{-1} GEMM variance path == triangular-solve path."""
    x, y, noise, params, _ = _fixture(rng, n=50)
    model = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)
    ml = gpr.with_linv(model, block=64)
    q = jnp.asarray(rng.normal(size=(30, 3)))
    m1, v1 = gpr.predict(model, q)
    m2, v2 = gpr.predict(ml, q)
    np.testing.assert_allclose(m2, m1, atol=1e-10)
    np.testing.assert_allclose(v2, v1, atol=1e-9)


def test_reset_touches(rng):
    """Clearing touch slots returns the posterior to its pre-touch state."""
    x, y, noise, params, _ = _fixture(rng, n=60)
    m0 = gpr.fit("rbf", x, y, noise, params, block=64, touch_capacity=64)
    q = jnp.asarray(rng.normal(size=(20, 3)))
    mean0, var0 = gpr.predict(m0, q)

    m1 = gpr.update(m0, jnp.asarray(rng.normal(size=(5, 3))), jnp.zeros(5), 1e-6)
    mean1, _ = gpr.predict(m1, q)
    assert np.abs(np.asarray(mean1 - mean0)).max() > 1e-8  # touches had effect

    m2 = gpr.reset_touches(m1)
    assert int(m2.n_touch) == 0
    mean2, var2 = gpr.predict(m2, q)
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var0), atol=1e-8)


@pytest.mark.slow
def test_random_parity_sweep(rng):
    """Property sweep: random kernels/hyperparams/clouds stay at the 1e-6
    oracle-parity bar (SURVEY.md §5 item 5 broadened)."""
    kernels = ["rbf", "inverse_multiquadric", "laplace", "thin_plate"]
    for trial in range(12):
        name = kernels[trial % 4]
        n = int(rng.integers(20, 90))
        x = jnp.asarray(rng.normal(size=(n, 3)))
        y = jnp.asarray(rng.normal(size=n) * 0.3)
        if name == "thin_plate":
            # Conditionally PD: R must exceed the diameter and the noise has
            # to absorb the O(1) indefiniteness (same regime the reference's
            # YAML configs live in).
            diam = float(np.linalg.norm(
                np.asarray(x)[:, None] - np.asarray(x)[None, :], axis=-1).max())
            ls = diam * float(rng.uniform(1.5, 2.5))
            noise = jnp.asarray(rng.uniform(1e-3, 1e-2, size=n))
        else:
            ls = float(rng.uniform(0.4, 1.5))
            noise = jnp.asarray(rng.uniform(1e-5, 1e-2, size=n))
        sv = float(rng.uniform(0.5, 2.0))
        params = kf.kernel_params(ls, sv)
        model = gpr.fit(name, x, y, noise, params, block=32, touch_capacity=32)
        q = jnp.asarray(rng.normal(size=(15, 3)) * 1.3)
        mean, var = gpr.predict(model, q)
        om = oracle.fit(name, np.asarray(x), np.asarray(y), np.asarray(noise), ls, sv)
        omean, ovar = oracle.predict(om, np.asarray(q))
        np.testing.assert_allclose(np.asarray(mean), omean, atol=1e-6,
                                   err_msg=f"trial {trial} {name} ls={ls:.2f}")
        np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6,
                                   err_msg=f"trial {trial} {name}")


def test_update_carries_linv(rng):
    """Touch updates keep W = L^{-1} warm and exact."""
    x, y, noise, params, _ = _fixture(rng, n=60)
    m = gpr.with_linv(gpr.fit("rbf", x, y, noise, params, block=64,
                              touch_capacity=64), block=64)
    m2 = gpr.update(m, jnp.asarray(rng.normal(size=(5, 3))), jnp.zeros(5), 1e-6)
    assert m2.linv is not None
    np.testing.assert_allclose(
        np.asarray(m2.linv @ m2.chol), np.eye(m2.capacity), atol=1e-8
    )
    # And the posterior through the carried W matches a fresh solve path.
    q = jnp.asarray(rng.normal(size=(12, 3)))
    import dataclasses as _dc
    m2_solve = _dc.replace(m2, linv=None)
    mean_w, var_w = gpr.predict(m2, q)
    mean_s, var_s = gpr.predict(m2_solve, q)
    np.testing.assert_allclose(np.asarray(mean_w), np.asarray(mean_s), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_w), np.asarray(var_s), atol=1e-8)


@pytest.mark.slow
def test_update_cumulative_overflow_raises(rng):
    """Touch occupancy past capacity must raise on the host path (ADVICE r1:
    dynamic_update_slice clamping silently overwrote earlier touch rows)."""
    x, y, noise, params, _ = _fixture(rng, n=40)
    model = gpr.fit("rbf", x, y, noise, params, block=8, touch_capacity=8)
    t = model.capacity - model.n0
    m1 = gpr.update(model, jnp.asarray(rng.normal(size=(6, 3))), jnp.zeros(6), 1e-6)
    assert int(m1.n_touch) == 6
    with pytest.raises(ValueError, match="cumulative"):
        gpr.update(m1, jnp.asarray(rng.normal(size=(t - 3, 3))),
                   jnp.zeros(t - 3), 1e-6)
    # Under jit the occupancy is traced: overflow must be loud (NaN), not a
    # silent overwrite.
    upd = jax.jit(gpr.update)
    m2 = upd(m1, jnp.asarray(rng.normal(size=(6, 3))), jnp.zeros(6), 1e-6)
    q = jnp.asarray(rng.normal(size=(4, 3)))
    mean, _ = gpr.predict(m2, q)
    assert np.isnan(np.asarray(mean)).all()


@pytest.mark.slow
def test_update_scalar_target_broadcasts(rng):
    """update(model, pts, 0.0, 1e-6) — the documented scalar-y form."""
    x, y, noise, params, _ = _fixture(rng, n=40)
    model = gpr.fit("rbf", x, y, noise, params, block=32, touch_capacity=32)
    tx = jnp.asarray(rng.normal(size=(3, 3)) * 0.9)
    m_scalar = gpr.update(model, tx, 0.0, 1e-6)
    m_vec = gpr.update(model, tx, jnp.zeros(3), 1e-6)
    np.testing.assert_array_equal(np.asarray(m_scalar.y), np.asarray(m_vec.y))


@pytest.mark.slow
def test_reset_touches_full_slots(rng):
    """reset_touches must restore inert padding even when every slot was
    occupied (ADVICE r1: max(noise) inference turned cleared slots into
    strong f(0)=0 observations)."""
    x, y, noise, params, _ = _fixture(rng, n=40)
    m0 = gpr.fit("rbf", x, y, noise, params, block=8, touch_capacity=8)
    t = m0.capacity - m0.n0
    q = jnp.asarray(rng.normal(size=(20, 3)))
    mean0, var0 = gpr.predict(m0, q)
    m1 = gpr.update(m0, jnp.asarray(rng.normal(size=(t, 3)) * 0.9),
                    jnp.zeros(t), 1e-6)  # fill EVERY slot
    m2 = gpr.reset_touches(m1)
    mean2, var2 = gpr.predict(m2, q)
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var2), np.asarray(var0), atol=1e-8)


def test_fit_inference_matches_fit(rng):
    """fit_inference (one-matrix-peak query-only path) == fit + with_linv
    posterior.  On CPU it takes the fallback branch; the TPU branch's
    kernels are covered by -m tpu and the in-place parity tests."""
    from gpis_tpu.data import gpis as gpis_mod

    pts = jnp.asarray(gpis_mod.fibonacci_sphere(120, 1.0))
    params = kf.kernel_params(0.8, 1.0)
    m1 = gpr.fit("rbf", pts, jnp.zeros(120), 1e-4, params, block=32,
                 touch_capacity=0)
    m1 = gpr.with_linv(m1, block=32)
    m2 = gpr.fit_inference("rbf", pts, jnp.zeros(120), 1e-4, params, block=32)
    q = jnp.asarray(np.random.default_rng(5).normal(size=(40, 3)))
    a1, v1 = gpr.predict(m1, q)
    a2, v2 = gpr.predict(m2, q)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-10)


def test_align_capacity_helper():
    """Capacities >= 4096 round to 1024 multiples (fused-kernel tall TI,
    BASELINE.md 2026-08-18: aligned C=17408 beats raw C=16640 by 1.20x);
    small capacities keep exact padding."""
    from gpis_tpu.gp.model import align_capacity

    assert align_capacity(40) == 40
    assert align_capacity(4095) == 4095
    assert align_capacity(4096) == 4096
    assert align_capacity(16640) == 17408
    assert align_capacity(100352) == 100352


def test_small_fit_capacity_unaligned(rng):
    """Below the alignment floor, fit keeps the tight block-multiple
    capacity (tests and tiny models rely on exact shapes)."""
    x, y, noise, params, _ = _fixture(rng, n=40)
    m = gpr.fit("rbf", x, y, noise, params, block=8, touch_capacity=8)
    assert m.capacity == 48


@pytest.mark.slow
def test_fit_capacity_aligned_and_posterior_exact(rng):
    """At >= 4096 total, fit lands on a 1024-multiple capacity and the
    extra pad rows are posterior-inert (same mean/variance as an unaligned
    model of the same data)."""
    import gpis_tpu.gp.regression as gprm

    x, y, noise, params, _ = _fixture(rng, n=3900)
    m = gpr.fit("rbf", x, y, noise, params, block=128, touch_capacity=256)
    # round_up(3900,128)=3968; +256 = 4224 -> aligned 5120
    assert m.capacity == 5120
    assert m.capacity - m.n0 == 1152  # alignment became extra touch slots
    q = jnp.asarray(np.random.default_rng(3).normal(size=(16, 3)))
    mean_a, var_a = gpr.predict(m, q)
    orig, gprm.align_capacity = gprm.align_capacity, lambda t, **k: t
    try:
        m0 = gpr.fit("rbf", x, y, noise, params, block=128,
                     touch_capacity=256)
    finally:
        gprm.align_capacity = orig
    assert m0.capacity == 4224
    mean_0, var_0 = gpr.predict(m0, q)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_0),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_0),
                               atol=1e-8)


@pytest.mark.slow
def test_joint_fit_aligned(rng):
    """fit_with_normals at >= 4096 joint size lands J on a 1024 multiple
    (C on 256) so the fused joint query keeps its tall TI tile."""
    from gpis_tpu.gp import derivative as gpd

    pts = jnp.asarray(np.random.default_rng(0).normal(size=(1100, 3)))
    pts = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    params = kf.kernel_params(0.8, 1.0)
    m = gpd.fit_with_normals("rbf", pts, jnp.zeros(1100), pts, 1e-4, 1e-3,
                             params, block=64, touch_capacity=100)
    # c: round_up(1100,64)=1152 -> 256-aligned 1280; J=5120+t, t aligned so
    # J % 1024 == 0 with t >= 100 -> t=1024, J=6144.
    assert m.capacity == 1280
    assert m.chol.shape[0] % 1024 == 0
    assert m.touch_capacity >= 100

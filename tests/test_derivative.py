"""Config-2 tests: derivative-observation blocks vs jax.jacfwd of the scalar
kernel (SURVEY.md §5 item 3) and joint-GP parity vs the float64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpis_tpu.data import gpis, synthetic
from gpis_tpu.gp import derivative as gpd
from gpis_tpu.kernels import derivative as kd
from gpis_tpu.kernels import functions as kf

LS, SV = 0.9, 1.2


@pytest.mark.parametrize("name", ["rbf", "thin_plate", "inverse_multiquadric"])
def test_blocks_match_autodiff(name, rng):
    """Every joint-Gram block equals AD of the scalar covariance."""
    params = kf.kernel_params(3.0 if name == "thin_plate" else LS, SV)

    def k_scalar(a, b):
        r2 = jnp.sum((a - b) ** 2)
        return kf.k_r2(name, r2, params)

    x = jnp.asarray(rng.normal(size=(5, 3)))
    kg = kd.joint_gram(name, x, params)
    c = 5
    grad_b = jax.jacfwd(k_scalar, argnums=1)
    hess = jax.jacfwd(jax.jacfwd(k_scalar, argnums=0), argnums=1)
    for i in range(c):
        for j in range(c):
            # value-gradient block
            gb = grad_b(x[i], x[j])
            for e in range(3):
                np.testing.assert_allclose(
                    kg[i, c + e * c + j], gb[e], rtol=1e-7, atol=1e-9
                )
            # gradient-gradient block (off-diagonal pairs only: AD of the
            # clamped sqrt is ill-defined exactly at r=0 for thin_plate)
            if i != j:
                hb = hess(x[i], x[j])
                for d in range(3):
                    for e in range(3):
                        np.testing.assert_allclose(
                            kg[c + d * c + i, c + e * c + j], hb[d, e],
                            rtol=1e-6, atol=1e-8,
                        )


def test_gg_diagonal_at_zero():
    """cov(d_d f(x), d_e f(x)) at the same point: -2 dk_dr2(0) δ_de."""
    params = kf.kernel_params(LS, SV)
    x = jnp.zeros((1, 3))
    kg = kd.joint_gram("rbf", x, params)
    expect = float(SV / (LS * LS))  # RBF: -2 * (-sv/(2 ls^2)) = sv/ls^2
    for d in range(3):
        for e in range(3):
            want = expect if d == e else 0.0
            np.testing.assert_allclose(kg[1 + d, 1 + e], want, atol=1e-12)


@pytest.mark.parametrize("name", ["rbf", "thin_plate"])
def test_joint_fit_matches_oracle(name, rng):
    pts, nrm = synthetic.ellipsoid_cloud(40, seed=9)
    x = jnp.asarray(pts)
    y = jnp.zeros(40)
    normals = jnp.asarray(nrm)
    ls = 3.0 if name == "thin_plate" else 0.8
    params = kf.kernel_params(ls, 1.0)

    model = gpd.fit_with_normals(name, x, y, normals, 1e-4, 1e-3, params, block=8)
    q = jnp.asarray(rng.normal(size=(25, 3)))
    mean, var = gpd.predict(model, q)

    om = oracle.fit_joint(name, pts, np.zeros(40), nrm, 1e-4, 1e-3, ls, 1.0)
    omean, ovar = oracle.predict_joint(om, np.asarray(q))
    np.testing.assert_allclose(np.asarray(mean), omean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ovar, atol=1e-6)


def test_normals_shape_surface(rng):
    """With normal observations, the posterior gradient at the data points
    reproduces the observed normals, and the zero set hugs the sphere even
    with FEW points (the practical payoff of config 2)."""
    pts = gpis.fibonacci_sphere(60, radius=1.0)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    params = kf.kernel_params(0.9, 1.0)
    model = gpd.fit_with_normals(
        "rbf", jnp.asarray(pts), jnp.zeros(60), jnp.asarray(normals),
        1e-6, 1e-6, params, block=16,
    )
    g = np.asarray(gpd.predict_gradient(model, jnp.asarray(pts)))
    np.testing.assert_allclose(g, normals, atol=1e-3)

    # Radial crossing accuracy with only 60 points.
    dirs = normals[:20]
    rs = np.linspace(0.8, 1.2, 81)
    q = (dirs[:, None, :] * rs[None, :, None]).reshape(-1, 3)
    f = np.asarray(gpd.predict(model, jnp.asarray(q))[0]).reshape(20, 81)
    crossings = rs[np.argmin(np.abs(f), axis=1)]
    assert np.abs(crossings - 1.0).max() < 0.02


def test_unsupported_kernel_raises():
    params = kf.kernel_params(1.0, 1.0)
    with pytest.raises(ValueError, match="derivative"):
        kd.joint_gram("laplace", jnp.zeros((3, 3)), params)


@pytest.mark.slow
def test_update_joint_matches_refit(rng):
    """Single-chip joint tail-slot bordering (reference §4.5 on the config-2
    model) == from-scratch refit with the touches as value-only points."""
    from gpis_tpu.gp import derivative as gpd
    from gpis_tpu.kernels import functions as kf

    c = 48
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    nrm = jnp.asarray(np.asarray(x))
    params = kf.kernel_params(0.8, 1.0)

    m = gpd.fit_with_normals("rbf", x, jnp.zeros(c), nrm, 1e-4, 1e-3, params,
                             block=16, touch_capacity=8)
    assert m.touch_capacity == 16  # rounded to block
    m = gpd.with_linv_joint(m)

    tx1 = jnp.asarray(rng.normal(size=(3, 3)))
    tx1 = tx1 / jnp.linalg.norm(tx1, axis=1, keepdims=True) * 1.03
    m2 = gpd.update_joint(m, tx1, jnp.zeros(3), 1e-5)
    tx2 = jnp.asarray(rng.normal(size=(2, 3)))
    tx2 = tx2 / jnp.linalg.norm(tx2, axis=1, keepdims=True) * 0.97
    m3 = gpd.update_joint(m2, tx2, jnp.zeros(2), 1e-5)
    assert int(m3.n_touch) == 5

    q = jnp.asarray(rng.normal(size=(32, 3)))
    mean_u, var_u = gpd.predict(m3, q)
    grad_u = gpd.predict_gradient(m3, q)

    # Reference: refit with the SAME slot layout and touches written in
    # (identical K, so parity is exact up to factorization roundoff).
    floor = 4.0 * float(jnp.finfo(m.dtype).eps) * (4 * c + 16)
    mr = gpd.fit_with_normals("rbf", x, jnp.zeros(c), nrm, 1e-4, 1e-3,
                              params, block=16, touch_capacity=8)
    txs = jnp.concatenate([tx1, tx2])
    import dataclasses

    mr = dataclasses.replace(
        mr,
        touch_x=mr.touch_x.at[:5].set(txs.astype(mr.dtype)),
        touch_y=mr.touch_y.at[:5].set(0.0),
        touch_noise=mr.touch_noise.at[:5].set(max(1e-5, floor)),
    )
    # Rebuild chol/alpha for the written slots via one bordering from the
    # clean factor (equivalent to a refit on this K).
    mr = dataclasses.replace(mr, n_touch=jnp.zeros((), jnp.int32))
    mr2 = gpd.update_joint(gpd.with_linv_joint(
        gpd.fit_with_normals("rbf", x, jnp.zeros(c), nrm, 1e-4, 1e-3,
                             params, block=16, touch_capacity=8)),
        txs, jnp.zeros(5), 1e-5)
    mean_r, var_r = gpd.predict(mr2, q)
    np.testing.assert_allclose(np.asarray(mean_u), np.asarray(mean_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_r), atol=1e-9)

    # Also against a plain refit with touches as extra core value points.
    xa = jnp.concatenate([x, txs])
    nrma = jnp.concatenate([nrm, jnp.zeros((5, 3))])
    nfa = jnp.concatenate([jnp.full((c,), 1e-4), jnp.full((5,), max(1e-5, floor))])
    nga = jnp.concatenate([jnp.full((c,), 1e-3), jnp.full((5,), 1e10)])
    mf = gpd.fit_with_normals("rbf", xa, jnp.zeros(c + 5), nrma, nfa, nga,
                              params, block=53)
    mean_f, var_f = gpd.predict(mf, q)
    np.testing.assert_allclose(np.asarray(mean_u), np.asarray(mean_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_f), atol=1e-6)
    assert np.isfinite(np.asarray(grad_u)).all()

    # Overflow guard.
    with pytest.raises(ValueError, match="touch capacity"):
        gpd.update_joint(m3, jnp.zeros((40, 3)), jnp.zeros(40), 1e-5)


@pytest.mark.slow
def test_session_joint_incremental_update():
    """Session joint updates use the bordering while slots last, then fall
    back to the folding refit, with consistent posteriors."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis as gpis_mod

    cfg = ModelConfig(kernel="rbf", lengthscale=0.9, noise_surface=1e-5,
                      n_external=16, block=16, touch_capacity=16)
    sess = ObjectModelSession(cfg)
    pts = gpis_mod.fibonacci_sphere(60, radius=0.5)
    nrm = pts / 0.5
    sess.start(pts, normals=nrm)
    assert sess.model.touch_x is not None

    t = np.array([[0.55, 0.0, 0.0]], np.float64)
    _, v0 = sess.query(t)
    sess.update(t)
    assert int(sess.model.n_touch) == 1  # bordering path
    _, v1 = sess.query(t)
    assert v1[0] < v0[0]
    # Fill beyond capacity: falls back to the folding refit and re-arms.
    rng = np.random.default_rng(2)
    many = rng.normal(size=(20, 3))
    many = many / np.linalg.norm(many, axis=1, keepdims=True) * 0.5
    sess.update(many.astype(np.float64))
    assert int(sess.model.n_touch) == 0  # refit path re-armed empty slots
    _, v2 = sess.query(t)
    assert v2[0] <= v1[0] + 1e-9

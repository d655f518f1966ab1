"""Config-3 tests: MLL hyperparameter optimization recovers sane
hyperparameters and improves the MLL (SURVEY.md §8 step 6)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gpis_tpu.data import gpis
from gpis_tpu.gp import hyperopt as ho
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf


def _padded_gp_sample(rng, n=60, true_ls=0.6):
    """Sample y from a GP with known lengthscale so the optimum is known."""
    x = rng.normal(size=(n, 3))
    k = oracle.gram("rbf", x, true_ls, 1.0, noise=1e-4)
    y = np.linalg.cholesky(k) @ rng.normal(size=n)
    xp, yp, np_ = gpr._pad_training(
        jnp.asarray(x), jnp.asarray(y), jnp.full(n, 1e-4), 128, 1e10, jnp.float64
    )
    return xp, yp, np_, n


def test_optimize_improves_mll(rng):
    xp, yp, np_, n = _padded_gp_sample(rng)
    init = kf.kernel_params(2.5, 1.0)  # deliberately bad lengthscale
    mll0 = float(gpr.log_marginal_likelihood("rbf", xp, yp, np_, init))
    res = ho.optimize("rbf", xp, yp, np_, init, n_real=n, steps=80)
    assert res.mll > mll0 + 1.0
    # Recovered lengthscale within a factor ~1.6 of truth (small-n statistics).
    ls = float(res.params["lengthscale"])
    assert 0.37 < ls < 1.0, f"lengthscale {ls} not near 0.6"
    # History is monotone-ish: best value improves over the run.
    assert max(res.history) >= res.mll - 1e-9


def test_optimize_learns_noise(rng):
    xp, yp, np_, n = _padded_gp_sample(rng)
    init = kf.kernel_params(0.6, 1.0)
    res = ho.optimize("rbf", xp, yp, np_, init, n_real=n, steps=60,
                      learn_noise=True)
    # Padding rows keep their huge noise.
    assert float(res.noise[-1]) == pytest.approx(1e10)
    # Real rows were rescaled by a positive factor.
    assert float(res.noise[0]) > 0


@pytest.mark.slow
def test_optimize_lbfgs(rng):
    xp, yp, np_, n = _padded_gp_sample(rng)
    init = kf.kernel_params(2.0, 1.0)
    res = ho.optimize("rbf", xp, yp, np_, init, n_real=n, steps=40,
                      optimizer="lbfgs", learn_noise=False)
    mll0 = float(gpr.log_marginal_likelihood("rbf", xp, yp, np_, init))
    assert res.mll >= mll0


@pytest.mark.slow
def test_optimize_joint_recovers_lengthscale():
    """Joint-system MLL (config 3 on config 2's model) through the session."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis as gpis_mod

    pts = gpis_mod.fibonacci_sphere(60, radius=0.5)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    # Deliberately wrong initial lengthscale.
    cfg = ModelConfig(kernel="rbf", lengthscale=3.0, noise_surface=1e-5,
                      n_external=16, block=16)
    sess = ObjectModelSession(cfg)
    sess.start(pts, normals=normals)
    mll0 = None
    res = sess.optimize_hyperparameters(steps=60)
    ls = float(res.params["lengthscale"])
    assert 0.2 < ls < 2.5  # moved off the bad init toward data support
    assert res.history[-1] >= res.history[0] - 1e-6
    # The refit model still behaves like a GPIS.
    mean, _ = sess.query(np.array([[0.0, 0.0, 0.0]]))
    assert mean[0] < -0.5


@pytest.mark.slow
def test_optimize_joint_learn_signal():
    """optimize_joint can learn the signal variance too (AD through the
    joint assembly, every block linear in sv)."""
    from gpis_tpu.data import gpis as gpis_mod

    pts = gpis_mod.fibonacci_sphere(48, radius=1.0)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    x = jnp.asarray(pts)
    res = ho.optimize_joint(
        "rbf", x, jnp.zeros(x.shape[0]), jnp.asarray(normals),
        jnp.full((x.shape[0],), 1e-4), jnp.full((x.shape[0],), 1e-4),
        kf.kernel_params(0.8, 0.2), n_real=x.shape[0], steps=40,
        learn_noise=True, learn_signal=True,
    )
    assert np.isfinite(res.mll)
    sv = float(res.params["signal_variance"])
    assert sv > 0 and sv != pytest.approx(0.2)  # actually moved
    assert res.history[-1] >= res.history[0] - 1e-6


@pytest.mark.slow
def test_optimize_joint_learn_noise_g():
    """optimize_joint can learn a gradient-noise scale: with noise_g set
    100x too large the optimizer shrinks it (VERDICT r2 weak 9)."""
    from gpis_tpu.data import gpis as gpis_mod

    pts = gpis_mod.fibonacci_sphere(48, radius=1.0)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    x = jnp.asarray(pts)
    ng0 = jnp.full((x.shape[0],), 1e-1)  # deliberately inflated
    res = ho.optimize_joint(
        "rbf", x, jnp.zeros(x.shape[0]), jnp.asarray(normals),
        jnp.full((x.shape[0],), 1e-4), ng0,
        kf.kernel_params(0.8, 1.0), n_real=x.shape[0], steps=60,
        learn_noise_g=True,
    )
    assert np.isfinite(res.mll)
    sg = float(res.noise_scale_g)
    assert sg < 0.9, f"gradient-noise scale {sg} did not shrink"
    # Returned noise_g reflects the learned scale on real rows.
    assert float(res.noise_g[0]) == pytest.approx(0.1 * sg, rel=1e-5)
    assert res.history[-1] >= res.history[0] - 1e-6


@pytest.mark.slow
def test_session_joint_learn_signal_not_swallowed():
    """The single-chip joint session path forwards learn_signal (it used
    to silently kw.pop it) and refits with the learned noise_g."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis as gpis_mod

    pts = gpis_mod.fibonacci_sphere(48, radius=0.5)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.8, signal_variance=0.2,
                      noise_surface=1e-4, n_external=16, block=16)
    sess = ObjectModelSession(cfg)
    sess.start(pts, normals=normals)
    res = sess.optimize_hyperparameters(steps=30, learn_signal=True)
    sv = float(res.params["signal_variance"])
    assert sv != pytest.approx(0.2), "learn_signal was swallowed"
    assert float(sess.model.params["signal_variance"]) == pytest.approx(sv)

"""Out-of-core full-data hyperopt (gp/ooc_hyperopt.py): the streamed
gradient identities — dK bands via jvp against the stored W panels — must
match jax.grad through the dense MLL objective on the same padded system,
exactly like the distributed optimizer's parity bar (tests/test_sharded.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.gp import ooc_hyperopt as oho
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import outofcore as ooc


@pytest.mark.slow
def test_ooc_mll_and_grad_matches_dense():
    """MLL + all three gradients (log lengthscale via the streamed W trace,
    log noise scale via column norms, log signal variance via the free
    K - D identity) at rtol 1e-7 vs dense jax.grad, on a problem that pads
    (1000 -> 1024) so the pad-row bookkeeping is exercised."""
    rng = np.random.default_rng(17)
    n, panel = 1000, 256
    x = rng.normal(size=(n, 3))
    x = jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))
    y = jnp.asarray(rng.normal(size=n) * 0.2)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=n))
    params = kf.kernel_params(0.7, 1.3)
    scale = 1.4

    mll_o, g = oho.ooc_mll_and_grad(
        "rbf", x, y, noise, params, panel=panel, block=64,
        noise_scale=scale, store="host",
    )

    xp, yp, np_, prm0, c, _, _ = ooc._pad_problem(
        "rbf", x, y, noise, params, panel=panel, pad_noise=1e10,
    )
    real = jnp.arange(c) < n

    def dense_mll(log_ls, log_s, log_sv):
        prm = {"lengthscale": jnp.exp(log_ls),
               "signal_variance": jnp.exp(log_sv)}
        nz = jnp.where(real, np_ * jnp.exp(log_s), np_)
        return gpr.log_marginal_likelihood("rbf", xp, yp, nz, prm, n_real=n)

    args = (jnp.log(prm0["lengthscale"]), jnp.log(jnp.asarray(scale)),
            jnp.log(prm0["signal_variance"]))
    want = dense_mll(*args)
    g_ls, g_s, g_sv = jax.grad(dense_mll, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(mll_o), float(want), rtol=1e-9)
    np.testing.assert_allclose(float(g["log_ls"]), float(g_ls), rtol=1e-7)
    np.testing.assert_allclose(float(g["log_noise_scale"]), float(g_s),
                               rtol=1e-7)
    np.testing.assert_allclose(float(g["log_sv"]), float(g_sv), rtol=1e-7)


@pytest.mark.slow
def test_optimize_ooc_recovers_lengthscale():
    """Full-data out-of-core ascent pulls a 3x-off lengthscale back toward
    the truth a GP sample was drawn with (mirror of the distributed
    optimizer's recovery test)."""
    rng = np.random.default_rng(23)
    n = 256
    x = jnp.asarray(rng.normal(size=(n, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    k = kg.gram_reference("rbf", x, kf.kernel_params(0.5, 1.0), noise=1e-6)
    y = jnp.linalg.cholesky(k) @ jnp.asarray(rng.normal(size=n))
    noise = jnp.full((n,), 1e-4)

    res = oho.optimize_ooc(
        "rbf", x, y, noise, kf.kernel_params(1.5, 1.0), panel=64, block=32,
        steps=25, learning_rate=0.1, store="host",
    )
    ls = float(res["params"]["lengthscale"])
    assert 0.3 < ls < 0.8, ls
    assert res["history"][-1] > res["history"][0]


@pytest.mark.slow
def test_session_ooc_stream_hyperopt():
    """session.optimize_hyperparameters(method='stream') on an out-of-core
    model: runs the full-data optimizer, refits out-of-core with the
    optimum (touches folded in), and the exact full-N MLL of the refit
    matches the optimizer's reported best."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import synthetic

    pts, _ = synthetic.sphere_cloud(600, radius=0.08, seed=3)
    s = ObjectModelSession(ModelConfig(voxel_leaf=0.0)).start(
        np.asarray(pts, np.float64), out_of_core=True,
    )
    assert hasattr(s.model, "wstore")
    # One touch first: the stream refit must preserve it.
    touch_w = s.frame.to_world(np.asarray([[1.3, 0.0, 0.0]]))
    s.update(touch_w)
    assert s.model.n_tail == 1
    ls0 = float(s.model.params["lengthscale"])

    res = s.optimize_hyperparameters(method="stream", steps=3,
                                     learning_rate=0.05)
    assert len(res.history) == 3
    assert float(s.model.params["lengthscale"]) != ls0
    # The touch is folded into the refit's CORE rows (same contract as the
    # subsample method): one extra real row, and the posterior still knows
    # the touch site.
    assert s.model.n_tail == 0
    assert s.model.n_real == s.training.x.shape[0] + 1
    _, var_t = s.query(touch_w)
    assert float(var_t[0]) < 1e-3
    # Exact full-N MLL of a training-set-only refit at the optimum equals
    # the optimizer's reported best (same padded objective, f64).
    base = ooc.ooc_fit(
        s.model.kernel,
        jnp.asarray(s.training.x), jnp.asarray(s.training.y),
        jnp.asarray(s.training.noise) * float(res.noise_scale),
        res.params, panel=s.model.panel, pad_noise=s.config.pad_noise,
    )
    np.testing.assert_allclose(base.log_marginal_likelihood(),
                               max(res.history), rtol=1e-6)

    # Unknown methods still fail fast.
    with pytest.raises(ValueError, match="unknown hyperopt method"):
        s.optimize_hyperparameters(method="distributed")


@pytest.mark.slow
def test_ooc_joint_mll_and_grad_matches_dense():
    """JOINT stream hyperopt (ooc_joint_mll_and_grad): MLL + all three
    gradients at rtol 1e-7 vs dense jax.grad through the joint MLL on the
    same padded system (250 -> 256 pads, so the 4-blocks-per-point pad-row
    bookkeeping is exercised).  The band jvp must differentiate the
    gradient-block DIAGONALS too (they depend on the lengthscale, unlike
    the value path's pinned k(0))."""
    from gpis_tpu.kernels import derivative as kd

    rng = np.random.default_rng(29)
    n, panel = 250, 128
    x = rng.normal(size=(n, 3))
    x = jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))
    nrm = x
    y = jnp.asarray(rng.normal(size=n) * 0.05)
    noise_f = jnp.asarray(rng.uniform(1e-4, 1e-2, size=n))
    noise_g = jnp.asarray(rng.uniform(1e-3, 1e-1, size=n))
    params = kf.kernel_params(0.7, 1.3)
    scale = 1.4

    mll_o, g = oho.ooc_joint_mll_and_grad(
        "rbf", x, y, nrm, noise_f, noise_g, params, panel=panel, block=64,
        noise_scale=scale, store="host",
    )

    (xp, yj, _meta, _nrm, nf, ng, prm0, c, _n,
     _j) = ooc._pad_joint_problem("rbf", x, y, nrm, noise_f, noise_g,
                                  params, panel=panel, pad_noise=1e10)
    real_c = jnp.arange(c) < n
    j_tot = 4 * c
    real_j = np.concatenate([np.arange(c) < n] * 4)
    import math

    def dense_mll(log_ls, log_s, log_sv):
        prm = {"lengthscale": jnp.exp(log_ls),
               "signal_variance": jnp.exp(log_sv)}
        nf_eff = jnp.where(real_c, nf * jnp.exp(log_s), nf)
        k = kd.joint_gram("rbf", xp, prm, noise_f=nf_eff, noise_g=ng)
        l = jnp.linalg.cholesky(k)
        u = jnp.linalg.solve(l, yj)
        n_tot = jnp.concatenate([nf_eff, ng, ng, ng])
        return (-0.5 * jnp.dot(u, u) - jnp.sum(jnp.log(jnp.diagonal(l)))
                - 0.5 * j_tot * math.log(2.0 * math.pi)
                + jnp.sum(jnp.where(jnp.asarray(real_j), 0.0,
                                    0.5 * jnp.log(2.0 * jnp.pi * n_tot))))

    args = (jnp.log(prm0["lengthscale"]), jnp.log(jnp.asarray(scale)),
            jnp.log(prm0["signal_variance"]))
    want = dense_mll(*args)
    g_ls, g_s, g_sv = jax.grad(dense_mll, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(mll_o), float(want), rtol=1e-9)
    np.testing.assert_allclose(float(g["log_ls"]), float(g_ls), rtol=1e-7)
    np.testing.assert_allclose(float(g["log_noise_scale"]), float(g_s),
                               rtol=1e-7)
    np.testing.assert_allclose(float(g["log_sv"]), float(g_sv), rtol=1e-7)


@pytest.mark.slow
def test_optimize_ooc_joint_recovers_lengthscale():
    """Full-data joint out-of-core ascent pulls a 2x-off lengthscale back
    toward the truth a Hermite-GPIS sample was drawn with."""
    from gpis_tpu.kernels import derivative as kd

    rng = np.random.default_rng(31)
    n = 64
    x = jnp.asarray(rng.normal(size=(n, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    k = kd.joint_gram("rbf", x, kf.kernel_params(0.5, 1.0),
                      noise_f=jnp.full(n, 1e-6), noise_g=jnp.full(n, 1e-6))
    yj = jnp.linalg.cholesky(k) @ jnp.asarray(rng.normal(size=4 * n))
    y, nrm = yj[:n], jnp.stack([yj[n:2 * n], yj[2 * n:3 * n],
                                yj[3 * n:]], axis=1)

    res = oho.optimize_ooc_joint(
        "rbf", x, y, nrm, jnp.full(n, 1e-4), jnp.full(n, 1e-3),
        kf.kernel_params(1.0, 1.0), panel=64, block=32, steps=20,
        learning_rate=0.1, store="host",
    )
    ls = float(res["params"]["lengthscale"])
    assert 0.35 < ls < 0.75, ls
    assert res["history"][-1] > res["history"][0]


@pytest.mark.slow
def test_ooc_mll_and_grad_split_phase_matches(tmp_path):
    """Process-split stream step (r5): ooc_factor_phase(defer_alpha=True) +
    ooc_mll_and_grad_solve_phase must reproduce the in-process
    ooc_mll_and_grad exactly (the gradient pass rides the TRSM's on_panel
    hook; alpha accumulates panel-wise; quad runs as a W-free band sweep).
    scale folded into the noise up front: the split step measures the
    gradient AT the factored theta."""
    rng = np.random.default_rng(23)
    n, panel = 1000, 256
    x = rng.normal(size=(n, 3))
    x = jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))
    y = jnp.asarray(rng.normal(size=n) * 0.2)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=n))
    params = kf.kernel_params(0.7, 1.3)

    mll_ref, g_ref = oho.ooc_mll_and_grad(
        "rbf", x, y, noise, params, panel=panel, block=64, store="host",
    )

    sd = str(tmp_path / "step")
    ooc.ooc_factor_phase("rbf", x, y, noise, params, panel=panel,
                         spill_dir=sd, block=64, defer_alpha=True,
                         device_budget=1 << 62)
    mll, g = oho.ooc_mll_and_grad_solve_phase(sd, noise_base=noise,
                                              device_budget=1 << 62)
    np.testing.assert_allclose(float(mll), float(mll_ref), rtol=1e-9)
    for k in g_ref:
        np.testing.assert_allclose(float(g[k]), float(g_ref[k]), rtol=1e-7,
                                   err_msg=k)


@pytest.mark.slow
def test_ooc_mll_and_grad_split_phase_sweep2(tmp_path):
    """trsm_sweep > 1 groups multiple W panels per on_panel callback — the
    group-prefix q sweep must stay exact (zero contributions from
    q > row's own panel)."""
    rng = np.random.default_rng(29)
    n, panel = 1024, 128
    x = rng.normal(size=(n, 3))
    x = jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))
    y = jnp.asarray(rng.normal(size=n) * 0.2)
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=n))
    params = kf.kernel_params(0.8, 1.0)

    mll_ref, g_ref = oho.ooc_mll_and_grad(
        "rbf", x, y, noise, params, panel=panel, block=64, store="host",
    )
    sd = str(tmp_path / "step2")
    ooc.ooc_factor_phase("rbf", x, y, noise, params, panel=panel,
                         spill_dir=sd, block=64, defer_alpha=True,
                         device_budget=1 << 62)
    mll, g = oho.ooc_mll_and_grad_solve_phase(sd, noise_base=noise,
                                              trsm_sweep=3,
                                              device_budget=1 << 62)
    np.testing.assert_allclose(float(mll), float(mll_ref), rtol=1e-9)
    for k in g_ref:
        np.testing.assert_allclose(float(g[k]), float(g_ref[k]), rtol=1e-7,
                                   err_msg=k)

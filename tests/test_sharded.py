"""Distributed-path tests on the 8-device virtual CPU mesh (SURVEY.md §5
item 4): sharded Gram, ICI-distributed Cholesky, distributed solves,
sharded W = L^{-1}, and both sharded posterior query paths — all vs the
single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg
from gpis_tpu.linalg import cholesky as lin
from gpis_tpu.linalg import sharded as sh
from gpis_tpu.parallel import mesh as pm

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

C, B, P = 1024, 64, 8
LS, SV = 0.8, 1.2


@pytest.fixture(scope="module")
def mesh():
    return pm.make_row_mesh(P)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(C, 3)))
    noise = jnp.asarray(rng.uniform(1e-4, 1e-2, size=C))
    y = jnp.asarray(rng.normal(size=C) * 0.3)
    params = kf.kernel_params(LS, SV)
    return x, y, noise, params


def test_sharded_gram(mesh, problem):
    x, y, noise, params = problem
    got = sh.sharded_gram("rbf", x, params, noise, mesh)
    want = kg.gram("rbf", x, params, noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # Output is genuinely row-sharded (spec may normalize trailing None
    # away under the jitted wrapper).
    assert got.sharding.spec in (pm.P("row", None), pm.P("row"))


def test_sharded_cholesky(mesh, problem):
    x, y, noise, params = problem
    a = sh.sharded_gram("rbf", x, params, noise, mesh)
    got = sh.sharded_cholesky(a, mesh, block=B)
    want = jnp.linalg.cholesky(kg.gram("rbf", x, params, noise=noise))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)
    np.testing.assert_allclose(np.triu(np.asarray(got), 1), 0.0, atol=0.0)


def test_sharded_solves(mesh, problem):
    x, y, noise, params = problem
    k = kg.gram("rbf", x, params, noise=noise)
    l = jnp.linalg.cholesky(k)
    lsh = jax.device_put(l, pm.row_sharding(mesh))
    yf = sh.sharded_solve_lower_vec(lsh, y, mesh, block=B)
    np.testing.assert_allclose(np.asarray(l @ yf), np.asarray(y), atol=1e-9)
    yb = sh.sharded_solve_lower_t_vec(lsh, y, mesh, block=B)
    np.testing.assert_allclose(np.asarray(l.T @ yb), np.asarray(y), atol=1e-9)
    alpha = sh.sharded_cho_solve_vec(lsh, y, mesh, block=B)
    np.testing.assert_allclose(np.asarray(k @ alpha), np.asarray(y), atol=1e-8)


def test_sharded_linv_and_alpha(mesh, problem):
    x, y, noise, params = problem
    k = kg.gram("rbf", x, params, noise=noise)
    l = jnp.linalg.cholesky(k)
    lsh = jax.device_put(l, pm.row_sharding(mesh))
    w = sh.sharded_linv(lsh, mesh, block=B)
    np.testing.assert_allclose(
        np.asarray(w) @ np.asarray(l), np.eye(C), atol=1e-8
    )
    alpha = sh.sharded_alpha_from_linv(w, y, mesh)
    np.testing.assert_allclose(np.asarray(k @ alpha), np.asarray(y), atol=1e-7)


@pytest.mark.slow
def test_sharded_predict_paths(mesh, problem):
    """End-to-end sharded fit + both query paths vs single-device predict."""
    rng = np.random.default_rng(3)
    x, y, noise, params = problem
    q = jnp.asarray(rng.normal(size=(512, 3)))

    # Single-device reference.
    k = kg.gram("rbf", x, params, noise=noise)
    l = lin.cholesky(k)
    alpha_ref = lin.cho_solve(l, y)
    kq = kg.cross_cov("rbf", q, x, params)
    mean_ref = kq @ alpha_ref
    v = lin.solve_lower(l, kq.T)
    var_ref = float(kf.k_diag0("rbf", params)) - jnp.sum(v * v, axis=0)

    # Fully sharded pipeline: gram -> cholesky -> linv -> alpha -> query.
    a = sh.sharded_gram("rbf", x, params, noise, mesh)
    lsh = sh.sharded_cholesky(a, mesh, block=B)
    w = sh.sharded_linv(lsh, mesh, block=B)
    alpha = sh.sharded_alpha_from_linv(w, y, mesh)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), atol=1e-7)

    mean1, var1 = sh.sharded_predict_linv("rbf", q, x, params, alpha, w, mesh)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var_ref), atol=1e-8)


@pytest.mark.slow
def test_sharded_update_matches_refit(mesh):
    """Distributed bordering update == full sharded refit with the touches."""
    from gpis_tpu.gp import sharded_model as gsm

    rng = np.random.default_rng(11)
    n = 900
    x = jnp.asarray(rng.normal(size=(n, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    y = jnp.asarray(rng.normal(size=n) * 0.2)
    params = kf.kernel_params(0.7, 1.0)

    m = gsm.fit_sharded("rbf", x, y, 1e-4, params, mesh=mesh, block=32,
                        touch_capacity=64, jitter=0.0)
    tx = jnp.asarray(rng.normal(size=(10, 3)))
    tx = tx / jnp.linalg.norm(tx, axis=1, keepdims=True)
    m2 = m.update(tx, jnp.zeros(10), 1e-5)
    tx2 = jnp.asarray(rng.normal(size=(6, 3)) * 0.9)
    m3 = m2.update(tx2, jnp.zeros(6), 1e-5)
    assert m3.n_touch == 16

    # Reference: refit from scratch on the union (same noise floor logic).
    q = jnp.asarray(rng.normal(size=(64, 3)))
    mean_u, var_u = m3.predict(q)

    floor = 4.0 * float(jnp.finfo(m.dtype).eps) * m.capacity
    xa = jnp.concatenate([x, tx, tx2])
    ya = jnp.concatenate([y, jnp.zeros(16)])
    na = jnp.concatenate([jnp.full((n,), 1e-4), jnp.full((16,), max(1e-5, floor))])
    mr = gsm.fit_sharded("rbf", xa, ya, na, params, mesh=mesh, block=32,
                         touch_capacity=48, jitter=0.0)
    mean_r, var_r = mr.predict(q)
    np.testing.assert_allclose(np.asarray(mean_u), np.asarray(mean_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_r), atol=1e-6)


def test_sharded_update_overflow(mesh):
    from gpis_tpu.gp import sharded_model as gsm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(500, 3)))
    m = gsm.fit_sharded("rbf", x, jnp.zeros(500), 1e-4,
                        kf.kernel_params(0.8, 1.0), mesh=mesh, block=32,
                        touch_capacity=8)
    with pytest.raises(ValueError, match="tail-band"):
        m.update(jnp.zeros((200, 3)), jnp.zeros(200), 1e-5)


@pytest.mark.slow
def test_sharded_cholesky_pallas_panels(mesh):
    """use_pallas=True (k-tile-skipping panel updates) matches the matmul
    variant. C sized so the panel kernel's tiling contract holds per band."""
    rng = np.random.default_rng(5)
    c = 2048
    x = jnp.asarray(rng.normal(size=(c, 3)), jnp.float32)
    noise = jnp.full((c,), 1e-2, jnp.float32)
    params = {k: v.astype(jnp.float32) for k, v in kf.kernel_params(0.8, 1.0).items()}
    a = sh.sharded_gram("rbf", x, params, noise, mesh)
    l1 = sh.sharded_cholesky(a, mesh, block=256)
    l2 = sh.sharded_cholesky(a, mesh, block=256, use_pallas=True)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sharded_joint_matches_dense(mesh):
    """Config 2 x config 5: band-assembled joint Gram == dense assembly,
    and the full sharded joint fit matches the single-device joint model."""
    from gpis_tpu.gp import derivative as gpd
    from gpis_tpu.gp import sharded_joint as gsj
    from gpis_tpu.kernels import derivative as kd

    rng = np.random.default_rng(13)
    c = 256
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    nrm = np.asarray(x)
    params = kf.kernel_params(0.8, 1.0)
    nf = jnp.asarray(rng.uniform(1e-4, 1e-3, size=c))
    ng = jnp.asarray(rng.uniform(1e-4, 1e-3, size=c))

    a_sh = gsj.sharded_joint_gram("rbf", x, params, nf, ng, mesh)
    a_dense = kd.joint_gram_reference("rbf", x, params, noise_f=nf, noise_g=ng)
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_dense), atol=1e-10)

    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), jnp.asarray(nrm),
                              nf, ng, params, mesh=mesh, block=64)
    ref = gpd.fit_with_normals("rbf", x, jnp.zeros(c), jnp.asarray(nrm),
                               nf, ng, params, block=c)
    q = jnp.asarray(rng.normal(size=(64, 3)))
    mean_s, var_s = m.predict(q)
    mean_r, var_r = gpd.predict(ref, q)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r), atol=1e-6)


@pytest.mark.slow
def test_sharded_joint_update_matches_refit(mesh):
    """Joint tail-band bordering (VERDICT r1 item 5): touch updates on the
    sharded joint model match a from-scratch sharded joint refit with the
    touch points as value-only observations."""
    from gpis_tpu.gp import sharded_joint as gsj

    rng = np.random.default_rng(21)
    c = 96
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    nrm = jnp.asarray(np.asarray(x))
    params = kf.kernel_params(0.8, 1.0)

    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), nrm, 1e-4, 1e-3,
                              params, mesh=mesh, block=16, touch_capacity=16)
    assert m.touch_capacity >= 16
    tx = jnp.asarray(rng.normal(size=(5, 3)))
    tx = tx / jnp.linalg.norm(tx, axis=1, keepdims=True) * 1.02
    m2 = m.update(tx, jnp.zeros(5), 1e-5)
    tx2 = jnp.asarray(rng.normal(size=(3, 3)))
    tx2 = tx2 / jnp.linalg.norm(tx2, axis=1, keepdims=True) * 0.98
    m3 = m2.update(tx2, jnp.zeros(3), 1e-5)
    assert m3.n_touch == 8

    q = jnp.asarray(rng.normal(size=(48, 3)))
    mean_u, var_u = m3.predict(q)

    # Reference: single-chip joint fit on the core + the touches as extra
    # value-only points (huge gradient noise), same noise floor.
    from gpis_tpu.gp import derivative as gpd

    floor = 4.0 * float(jnp.finfo(m.dtype).eps) * (4 * m.n0 + m.touch_capacity)
    xa = jnp.concatenate([x, tx, tx2])
    nrma = jnp.concatenate([nrm, jnp.zeros((8, 3))])
    nfa = jnp.concatenate([jnp.full((c,), 1e-4), jnp.full((8,), max(1e-5, floor))])
    nga = jnp.concatenate([jnp.full((c,), 1e-3), jnp.full((8,), m.pad_noise)])
    ref = gpd.fit_with_normals("rbf", xa, jnp.zeros(c + 8), nrma, nfa, nga,
                               params, block=c + 8)
    mean_r, var_r = gpd.predict(ref, q)
    np.testing.assert_allclose(np.asarray(mean_u), np.asarray(mean_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_r), atol=1e-6)

    # Overflow guard.
    with pytest.raises(ValueError, match="touch capacity"):
        m3.update(jnp.zeros((500, 3)), jnp.zeros(500), 1e-5)


@pytest.mark.slow
def test_sharded_joint_session_contract(mesh, tmp_path):
    """ShardedJointModel satisfies the full session contract (ADVICE r1
    medium): save/load roundtrip, planner-visible y/noise aliases, hyperopt."""
    from gpis_tpu.gp import sharded_joint as gsj
    from gpis_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(3)
    c = 64
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), x, 1e-4, 1e-3,
                              kf.kernel_params(0.8, 1.0), mesh=mesh,
                              block=16, touch_capacity=8)
    # Planner-facing aliases.
    assert m.noise.shape == (m.n0,)
    assert m.y.shape[0] == 4 * m.n0 + m.touch_capacity
    assert m.n_real == c

    p = str(tmp_path / "joint.npz")
    ckpt.save_model(p, m)
    m2 = ckpt.load_model(p)
    q = jnp.asarray(rng.normal(size=(16, 3)))
    np.testing.assert_allclose(
        np.asarray(m.predict(q)[0]), np.asarray(m2.predict(q)[0]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m.predict(q)[1]), np.asarray(m2.predict(q)[1]), atol=1e-12
    )


@pytest.mark.slow
def test_sharded_mll_and_grad_matches_dense(mesh):
    """Distributed MLL + exact gradient identities (VERDICT r1 item 8)
    match jax.grad through the dense single-chip objective."""
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.gp import sharded_hyperopt as sho

    rng = np.random.default_rng(17)
    c, n_real = 256, 200
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    y = jnp.zeros((c,)).at[:n_real].set(jnp.asarray(rng.normal(size=n_real) * 0.2))
    noise = jnp.full((c,), 1e10).at[:n_real].set(1e-3)
    params = kf.kernel_params(0.7, 1.3)
    scale = 1.4

    mll_s, g = sho.sharded_mll_and_grad(
        "rbf", x, y, noise, params, mesh, block=32, n_real=n_real,
        noise_scale=scale,
    )

    real = (jnp.arange(c) < n_real)

    def dense_mll(log_ls, log_s):
        prm = dict(params, lengthscale=jnp.exp(log_ls))
        nz = jnp.where(real, noise * jnp.exp(log_s), noise)
        return gpr.log_marginal_likelihood("rbf", x, y, nz, prm, n_real=n_real)

    args = (jnp.log(params["lengthscale"]), jnp.log(jnp.asarray(scale)))
    want = dense_mll(*args)
    g_ls, g_s = jax.grad(dense_mll, argnums=(0, 1))(*args)
    np.testing.assert_allclose(float(mll_s), float(want), rtol=1e-9)
    np.testing.assert_allclose(float(g["log_ls"]), float(g_ls), rtol=1e-7)
    np.testing.assert_allclose(float(g["log_noise_scale"]), float(g_s), rtol=1e-7)


@pytest.mark.slow
def test_optimize_sharded_recovers_lengthscale(mesh):
    """Distributed hyperopt pulls a 3x-off lengthscale back toward truth."""
    from gpis_tpu.data import gpis
    from gpis_tpu.gp import sharded_hyperopt as sho

    rng = np.random.default_rng(23)
    # A GP sample with known lengthscale 0.5 on a sphere-ish cloud.
    # (optimize_sharded expects shardable arrays: n must tile into p*block.)
    n = 256
    x = jnp.asarray(rng.normal(size=(n, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    k = kg.gram_reference("rbf", x, kf.kernel_params(0.5, 1.0), noise=1e-6)
    y = jnp.linalg.cholesky(k) @ jnp.asarray(rng.normal(size=n))
    noise = jnp.full((n,), 1e-4)

    res = sho.optimize_sharded(
        "rbf", x, y, noise, kf.kernel_params(1.5, 1.0), mesh, block=32,
        n_real=n, steps=40, learning_rate=0.1,
    )
    ls = float(res["params"]["lengthscale"])
    assert 0.3 < ls < 0.8, ls
    assert res["history"][-1] > res["history"][0]


def test_sharded_linv_pallas_matches(mesh, problem):
    """use_pallas sharded TRSM (band trailing updates in the Pallas kernel)
    == the masked-GEMM variant on the virtual mesh (interpret mode)."""
    x, y, noise, params = problem
    k = kg.gram("rbf", x, params, noise=noise)
    l = jnp.linalg.cholesky(k)
    lsh = jax.device_put(l, pm.row_sharding(mesh))
    w1 = sh.sharded_linv(lsh, mesh, block=B)
    w2 = sh.sharded_linv(lsh, mesh, block=B, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-9)


def test_sharded_linv_left_looking_matches(mesh, problem):
    """Left-looking distributed TRSM (band-wide GEMMs + psum) == the
    right-looking variant."""
    x, y, noise, params = problem
    k = kg.gram("rbf", x, params, noise=noise)
    l = jnp.linalg.cholesky(k)
    lsh = jax.device_put(l, pm.row_sharding(mesh))
    w1 = sh.sharded_linv(lsh, mesh, block=B)
    w2 = sh.sharded_linv_ll(lsh, mesh, block=B)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(w2) @ np.asarray(l), np.eye(C), atol=1e-8)


# ------------------------------------------------------- ADVICE r2 fixes


def _small_sphere(rng, n):
    x = rng.normal(size=(n, 3))
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


@pytest.mark.slow
def test_sharded_planner_expansion(mesh):
    """ADVICE r2 high #1: project_and_chart on sharded models (plain
    dataclasses, not pytrees) must not be traced through jax.jit."""
    from gpis_tpu.config import ExploreConfig, ModelConfig
    from gpis_tpu.data import gpis
    from gpis_tpu.explore import atlas as atlas_mod
    from gpis_tpu.gp import sharded_model as gsm

    rng = np.random.default_rng(31)
    pts = np.asarray(_small_sphere(rng, 200)) * 0.1
    ts = gpis.build_training_set(pts, ModelConfig(voxel_leaf=0.0))
    m = gsm.fit_sharded("rbf", ts.x, ts.y, ts.noise,
                        kf.kernel_params(0.8, 1.0), mesh=mesh, block=16,
                        touch_capacity=8)
    cfg = ExploreConfig()
    ch = atlas_mod.project_and_chart(m, np.asarray(ts.x[0]) * 1.05, cfg,
                                     cid=0, parent=-1)
    assert ch is not None
    assert abs(np.linalg.norm(ch.normal) - 1.0) < 1e-6
    assert abs(np.linalg.norm(ch.center) - 1.0) < 0.2  # near the unit-sphere frame


@pytest.mark.slow
def test_sharded_session_next_best_path(mesh):
    """Config-5 session exercise of the full GPAtlasRRT loop (the ADVICE r2
    crash repro): next_best_path + is_done on a sharded session."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ExploreConfig, MeshConfig, ModelConfig

    rng = np.random.default_rng(33)
    pts = np.asarray(_small_sphere(rng, 300)) * 0.11
    sess = ObjectModelSession(
        ModelConfig(voxel_leaf=0.0, touch_capacity=8),
        ExploreConfig(max_charts=6, n_disc_samples=8),
        MeshConfig(n_devices=P, block=16),
    )
    sess.start(pts)
    assert hasattr(sess.model, "mesh")
    res = sess.next_best_path()
    assert res.path.shape[0] >= 1
    sess.is_done(n_probe=32)


@pytest.mark.slow
def test_sharded_joint_predict_mean_touch_slots(mesh):
    """ADVICE r2 high #2: predict_mean on a ShardedJointModel with touch
    slots must use the [4C core | T touch] column layout."""
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.gp import sharded_joint as gsj

    rng = np.random.default_rng(37)
    c = 96
    x = _small_sphere(rng, c)
    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), x, 1e-4, 1e-3,
                              kf.kernel_params(0.8, 1.0), mesh=mesh,
                              block=16, touch_capacity=16)
    assert m.touch_capacity > 0
    q = jnp.asarray(rng.normal(size=(24, 3)))
    mean = gpr.predict_mean(m, q)
    mean_ref, _ = m.predict(q)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=1e-9)
    # And after a touch lands in a slot.
    tx = _small_sphere(rng, 3) * 1.01
    m2 = m.update(tx, jnp.zeros(3), 1e-5)
    mean2 = gpr.predict_mean(m2, q)
    mean2_ref, _ = m2.predict(q)
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean2_ref), atol=1e-9)


def test_sharded_joint_predict_no_retrace(mesh):
    """ADVICE r2 medium: repeated joint predicts must hit the jit cache
    (the cross fn is a static argument and needs a stable identity)."""
    from gpis_tpu.gp import sharded_joint as gsj

    rng = np.random.default_rng(41)
    c = 64
    x = _small_sphere(rng, c)
    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), x, 1e-4, 1e-3,
                              kf.kernel_params(0.8, 1.0), mesh=mesh, block=16)
    q = jnp.asarray(rng.normal(size=(16, 3)))
    m.predict(q)
    size0 = sh.sharded_predict_linv._cache_size()
    for _ in range(3):
        m.predict(q)
    assert sh.sharded_predict_linv._cache_size() == size0


def test_sharded_joint_jitter_fold(mesh):
    """ADVICE r2 low: when the fit ladder escalates jitter, the stored
    noise must include it so tail-band borderings recompute K consistent
    with L/W — checked via L L^T == gram(stored noise)."""
    from gpis_tpu.gp import sharded_joint as gsj

    rng = np.random.default_rng(43)
    c = 48
    base = np.asarray(_small_sphere(rng, c // 2))
    # Exact duplicates + near-zero noise: the first (extra=0) attempt is
    # singular, forcing at least one ladder escalation.
    x = jnp.asarray(np.concatenate([base, base]))
    m = gsj.fit_sharded_joint("rbf", x, jnp.zeros(c), x, 1e-18, 1e-18,
                              kf.kernel_params(0.8, 1.0), mesh=mesh,
                              block=16, touch_capacity=16)
    a = gsj.sharded_joint_gram(m.kernel, m.x, m.params, m.noise_f,
                               m.noise_g, mesh, c=m.n0)
    ll = np.asarray(m.l) @ np.asarray(m.l).T
    np.testing.assert_allclose(ll, np.asarray(a), atol=1e-8)


@pytest.mark.slow
def test_sharded_signal_variance_grad_matches_dense(mesh):
    """The free dK/d(log sv) = K - D identity (VERDICT r2 item 4) matches
    jax.grad of the dense objective."""
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.gp import sharded_hyperopt as sho

    rng = np.random.default_rng(23)
    c, n_real = 256, 200
    x = jnp.asarray(rng.normal(size=(c, 3)))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    y = jnp.zeros((c,)).at[:n_real].set(jnp.asarray(rng.normal(size=n_real) * 0.2))
    noise = jnp.full((c,), 1e10).at[:n_real].set(1e-3)
    params = kf.kernel_params(0.7, 1.3)

    _, g = sho.sharded_mll_and_grad(
        "rbf", x, y, noise, params, mesh, block=32, n_real=n_real,
        noise_scale=1.2,
    )
    real = jnp.arange(c) < n_real

    def dense_mll(log_sv):
        prm = dict(params, signal_variance=jnp.exp(log_sv))
        nz = jnp.where(real, noise * 1.2, noise)
        return gpr.log_marginal_likelihood("rbf", x, y, nz, prm, n_real=n_real)

    g_sv = jax.grad(dense_mll)(jnp.log(params["signal_variance"]))
    np.testing.assert_allclose(float(g["log_sv"]), float(g_sv), rtol=1e-7)


def _joint_problem(c, t, n_real, n_touch, seed=31):
    rng = np.random.default_rng(seed)
    xc = rng.normal(size=(c, 3))
    xc /= np.linalg.norm(xc, axis=1, keepdims=True)
    nrm = jnp.zeros((c, 3)).at[:n_real].set(jnp.asarray(xc[:n_real]))
    xc = jnp.zeros((c, 3)).at[:n_real].set(jnp.asarray(xc[:n_real]))
    y = jnp.zeros((c,)).at[:n_real].set(jnp.asarray(rng.normal(size=n_real) * 0.1))
    nf = jnp.full((c,), 1e10).at[:n_real].set(1e-3)
    ng = jnp.full((c,), 1e10).at[:n_real].set(2e-3)
    tx = jnp.zeros((t, 3))
    tnf = jnp.full((t,), 1e10)
    ty = jnp.zeros((t,))
    if n_touch:
        tpts = rng.normal(size=(n_touch, 3))
        tpts /= np.linalg.norm(tpts, axis=1, keepdims=True)
        tx = tx.at[:n_touch].set(jnp.asarray(tpts * 1.02))
        tnf = tnf.at[:n_touch].set(5e-4)
        ty = ty.at[:n_touch].set(0.05)
    x_all = jnp.concatenate([xc, tx]) if t else xc
    nf_all = jnp.concatenate([nf, tnf]) if t else nf
    yj = jnp.concatenate([y, nrm[:, 0], nrm[:, 1], nrm[:, 2], ty]) if t else \
        jnp.concatenate([y, nrm[:, 0], nrm[:, 1], nrm[:, 2]])
    return x_all, yj, nf_all, ng


@pytest.mark.parametrize("c,t,n_touch", [(64, 0, 0), (56, 32, 2)])
@pytest.mark.slow
def test_sharded_joint_mll_and_grad_matches_dense(mesh, c, t, n_touch):
    """Distributed JOINT hyperopt gradients (VERDICT r2 item 4): the
    assembly-agnostic identities over _joint_band_rows match jax.grad
    through the dense joint objective, at rtol 1e-7, with and without
    occupied touch slots."""
    from gpis_tpu.gp import sharded_hyperopt as sho
    from gpis_tpu.kernels import derivative as kd
    from gpis_tpu.linalg import cholesky as lin_mod

    n_real = c - 10
    x_all, yj, nf_all, ng = _joint_problem(c, t, n_real, n_touch)
    params = kf.kernel_params(0.7, 1.3)
    scale = 1.4
    j_tot = 4 * c + t

    mll_s, g = sho.sharded_joint_mll_and_grad(
        "rbf", x_all, yj, nf_all, ng, params, mesh, c=c, block=32,
        n_real=n_real, n_touch=n_touch, noise_scale=scale,
    )

    core_real = jnp.arange(c) < n_real

    def dense_mll(log_ls, log_s, log_sv):
        prm = {"lengthscale": jnp.exp(log_ls),
               "signal_variance": jnp.exp(log_sv)}
        nf_eff = jnp.where(core_real, nf_all[:c] * jnp.exp(log_s), nf_all[:c])
        k = kd.joint_gram_reference("rbf", x_all[:c], prm,
                                    noise_f=nf_eff, noise_g=ng)
        if t:
            b = kd.cross_cov_value("rbf", x_all[c:], x_all[:c], prm)
            d = kg.gram_reference("rbf", x_all[c:], prm, noise=nf_all[c:])
            k = jnp.block([[k, b.T], [b, d]])
        l = jnp.linalg.cholesky(k)
        alpha = lin.cho_solve(l, yj)
        mll = (-0.5 * jnp.dot(yj, alpha) - jnp.sum(jnp.log(jnp.diagonal(l)))
               - 0.5 * j_tot * jnp.log(2.0 * jnp.pi))
        # Same (theta-independent) padding correction the sharded value adds.
        real_j = jnp.concatenate(
            [core_real] * 4 + ([jnp.arange(t) < n_touch] if t else [])
        )
        n_eff_j = jnp.concatenate(
            [nf_eff, ng, ng, ng] + ([nf_all[c:]] if t else []))
        return mll + jnp.sum(jnp.where(
            real_j, 0.0, 0.5 * jnp.log(2.0 * jnp.pi * n_eff_j)))

    args = (jnp.log(params["lengthscale"]), jnp.log(jnp.asarray(scale)),
            jnp.log(params["signal_variance"]))
    want = dense_mll(*args)
    g_ls, g_s, g_sv = jax.grad(dense_mll, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(mll_s), float(want), rtol=1e-8)
    np.testing.assert_allclose(float(g["log_ls"]), float(g_ls), rtol=1e-7)
    np.testing.assert_allclose(float(g["log_noise_scale"]), float(g_s), rtol=1e-7)
    np.testing.assert_allclose(float(g["log_sv"]), float(g_sv), rtol=1e-7)


@pytest.mark.slow
def test_session_sharded_joint_distributed_hyperopt():
    """session.optimize_hyperparameters(method='distributed') on a sharded
    JOINT model runs the true distributed objective (no silent subsample
    downgrade — VERDICT r2 weak 2), refits, and stays queryable; unknown
    methods and unsupported subsample options raise."""
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import MeshConfig, ModelConfig
    from gpis_tpu.data import gpis

    rng = np.random.default_rng(9)
    pts = rng.normal(size=(60, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    nrm = pts.copy()
    cfg = ModelConfig(kernel="rbf", lengthscale=0.9, noise_surface=1e-4,
                      touch_capacity=8)
    s = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=16))
    s.start(pts, normals=nrm)
    assert hasattr(s.model, "mesh") and s.model.normals is not None

    res = s.optimize_hyperparameters(method="distributed", steps=3,
                                     learning_rate=0.05, learn_signal=True)
    assert np.isfinite(res.mll)
    assert float(res.params["lengthscale"]) > 0
    # Refit model still serves queries and updates.
    q = rng.normal(size=(8, 3))
    mean, var = s.query(q)
    assert np.isfinite(np.asarray(mean)).all()
    s.update(np.asarray([[0.0, 0.0, -1.02]]))

    with pytest.raises(ValueError, match="unknown hyperopt method"):
        s.optimize_hyperparameters(method="nope")


@pytest.mark.slow
def test_sharded_joint_hyperopt_preserves_touches():
    """A hyperopt refit on a sharded-joint session must re-border the
    accumulated touches (review finding r3c: both the subsample and
    distributed refits previously dropped them, silently reverting the
    posterior at touched sites), and the subsample refit must use the
    LEARNED noise scale."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import MeshConfig, ModelConfig
    from gpis_tpu.data import gpis

    cfg = ModelConfig(kernel="rbf", lengthscale=0.6, noise_surface=1e-4,
                      n_external=16, n_internal=1, touch_capacity=8)
    sess = ObjectModelSession(cfg, mesh=MeshConfig(n_devices=8, block=32))
    pts = gpis.fibonacci_sphere(120, radius=0.5)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sess.start(pts, normals=nrm)
    assert hasattr(sess.model, "mesh") and sess.model.normals is not None

    touch = np.array([[0.9, 0.0, 0.0]])  # far off-surface: high variance
    _, v_pre = sess.query(touch)
    sess.update(touch)
    _, v_touched = sess.query(touch)
    assert float(v_touched[0]) < 0.5 * float(v_pre[0])

    for method in ("subsample", "distributed"):
        sess.optimize_hyperparameters(method=method, steps=2,
                                      learn_noise=True)
        assert sess.model.n_touch == 1, method
        _, v_post = sess.query(touch)
        assert float(v_post[0]) < 0.5 * float(v_pre[0]), method

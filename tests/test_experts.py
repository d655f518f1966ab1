"""Local-expert committee (EP axis) tests — gp.experts.

Coverage mirrors the other model families (SURVEY.md §5): analytic truth on
the sphere fixture, exact-path parity (E=1 BCM == exact GP), combine-rule
properties (rBCM far-field calibration), gating consistency, touch routing
through the exact bordering update, checkpoint roundtrip, session surface,
and the shard_map committee on the 8-virtual-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpis_tpu.config import ModelConfig
from gpis_tpu.data import gpis, synthetic
from gpis_tpu.gp import experts as ex
from gpis_tpu.gp import regression as gpr
from gpis_tpu.kernels import functions as kf


@pytest.fixture(scope="module")
def fixture64():
    cfg = ModelConfig(dtype="float64")
    pts, _ = synthetic.sphere_cloud(400, seed=0)
    ts = gpis.build_training_set(pts, cfg)
    params = kf.kernel_params(1.0, 1.0)
    return ts, params


def _queries(n=200, seed=3, dtype=jnp.float64):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, 3)), dtype
    )


def test_partition_balanced_and_complete():
    pts = np.random.default_rng(0).normal(size=(1000, 3))
    cent, groups = ex.partition_cloud(pts, 7)
    counts = [len(g) for g in groups]
    assert sum(counts) == 1000
    assert max(counts) <= -(-1000 // 7)  # cap = ceil(N/E)
    all_idx = np.sort(np.concatenate(groups))
    assert np.array_equal(all_idx, np.arange(1000))  # disjoint + complete
    assert cent.shape == (7, 3)


def test_single_expert_bcm_matches_exact_gp(fixture64):
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m1 = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=1,
                        n_shared_tail=shared, beta="bcm")
    exact = gpr.fit("rbf", ts.x, ts.y, ts.noise, params, touch_capacity=64)
    q = _queries()
    me, ve = gpr.predict(exact, q)
    mc, vc = ex.predict(m1, q)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(me), atol=1e-10)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(ve), atol=1e-10)


def test_committee_tracks_exact_on_sphere(fixture64):
    """E=8 rBCM posterior mean must track the exact GP near the surface —
    the committee is approximate, but on the canonical fixture the implicit
    surface it induces should match the exact model's to ~1e-3."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m8 = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=8,
                        n_shared_tail=shared)
    exact = gpr.fit("rbf", ts.x, ts.y, ts.noise, params, touch_capacity=0)
    dirs = np.random.default_rng(5).normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    q = jnp.asarray(dirs)  # on the unit sphere (near data)
    me, _ = gpr.predict(exact, q)
    mc, _ = ex.predict(m8, q)
    # ~50 own points per expert on the 400-pt fixture: the committee error
    # floor is a few 1e-3 here; the user-relevant gate is the session-level
    # surface RMSE test below.
    assert float(jnp.max(jnp.abs(me - mc))) < 5e-3


def test_rbcm_far_field_reverts_to_prior(fixture64):
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared)
    far = jnp.asarray([[25.0, 25.0, 25.0]])
    mean, var = ex.predict(m, far)
    k0 = float(kf.k_diag0("rbf", params))
    assert abs(float(var[0]) - k0) < 1e-6  # variance -> prior
    assert abs(float(mean[0])) < 1e-6  # mean -> prior mean 0


def test_gate_full_matches_ungated_exactly(fixture64):
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared)
    q = _queries(1500, seed=7)
    ma, va = ex.predict(m, q, gate=0)
    mg, vg = ex.predict(m, q, gate=4, chunk=512)  # gated program, all experts
    np.testing.assert_allclose(np.asarray(mg), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(va), atol=1e-12)


def test_gated_surface_queries_match_ungated(fixture64):
    """Near the surface gating to the nearest half of the committee stays
    within a few 1e-2 of the full committee.  GPIS lengthscales are
    object-scale, so cross-sphere experts keep non-trivial rBCM weight —
    gating is a measured speed/accuracy dial here, not free (the session
    e2e test gates at 2-of-4 and still passes the 2e-3 surface-RMSE bar:
    the mean shift moves the zero crossing by shift/|grad|, an order less)."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=8,
                       n_shared_tail=shared)
    dirs = np.random.default_rng(11).normal(size=(600, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    q = jnp.asarray(dirs)
    ma, va = ex.predict(m, q, gate=0)
    mg, vg = ex.predict(m, q, gate=4, chunk=256)
    assert float(jnp.max(jnp.abs(mg - ma))) < 5e-2
    assert float(jnp.max(jnp.abs(vg - va))) < 5e-2


def test_traced_predict_matches_host_path(fixture64):
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared)
    q = _queries(128)
    ma, va = ex.predict(m, q)
    mt, vt = jax.jit(lambda mm, qq: ex.predict(mm, qq))(m, q)
    np.testing.assert_allclose(np.asarray(mt), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vt), np.asarray(va), atol=1e-12)


def test_predict_mean_grad_is_finite(fixture64):
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared)
    g = jax.grad(lambda p: ex.predict_mean(m, p[None, :])[0])(
        jnp.asarray([0.0, 0.0, 0.9])
    )
    assert np.all(np.isfinite(np.asarray(g)))
    # Outward-pointing gradient near the upper surface.
    assert float(g[2]) > 0


@pytest.mark.slow
def test_touch_update_routes_and_matches_refit(fixture64):
    """The routed touch must land in exactly one expert and match a
    from-scratch refit of that expert with the touch row appended (the
    single-model bordering parity, lifted to the committee)."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared, touch_capacity=8)
    tp = jnp.asarray([[0.9, 0.3, 0.2]]) / float(np.linalg.norm([0.9, 0.3, 0.2]))
    mu = ex.update(m, tp, jnp.zeros(1), jnp.full(1, 1e-6))
    occ = np.asarray(mu.n_touch)
    assert occ.sum() == 1
    e = int(occ.argmax())
    # Oracle: single-model update on the same expert view.
    ve = gpr.update(ex.expert_view(m, e), tp, jnp.zeros(1), jnp.full(1, 1e-6))
    np.testing.assert_allclose(np.asarray(mu.alpha[e]), np.asarray(ve.alpha),
                               atol=1e-10)
    q = _queries(64)
    m_up, v_up = ex.predict(mu, q)
    assert np.all(np.isfinite(np.asarray(m_up)))
    # variance at the touch point must not increase
    _, v0 = ex.predict(m, tp)
    _, v1 = ex.predict(mu, tp)
    assert float(v1[0]) <= float(v0[0]) + 1e-12


@pytest.mark.slow
def test_checkpoint_roundtrip(fixture64, tmp_path):
    from gpis_tpu.utils import checkpoint as ckpt

    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared, gate=2)
    tp = jnp.asarray([[0.0, 0.0, 1.0]])
    m = ex.update(m, tp, jnp.zeros(1), jnp.full(1, 1e-6))
    path = str(tmp_path / "experts.npz")
    ckpt.save_model(path, m)
    m2 = ckpt.load_model(path)
    assert type(m2).__name__ == "ExpertGPModel"
    assert m2.beta == m.beta and m2.gate == m.gate and m2.n0 == m.n0
    q = _queries(64)
    ma, va = ex.predict(m, q)
    mb, vb = ex.predict(m2, q)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-12)


def test_sharded_committee_matches_local(fixture64):
    from gpis_tpu.parallel import mesh as pm

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=8,
                       n_shared_tail=shared)
    mesh = pm.make_row_mesh(8, axis_name="expert")
    ms = ex.shard_experts(m, mesh)
    q = _queries(300, seed=1)
    mean_s, var_s = ex.predict_sharded(ms, q, mesh)
    mean_r, var_r = ex.predict(m, q, gate=0)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               atol=1e-12)


# --------------------------------------------------------------- session


@pytest.mark.slow
def test_session_experts_end_to_end():
    from gpis_tpu.api.session import ObjectModelSession

    pts, _ = synthetic.sphere_cloud(
        600, radius=0.08, center=(0.1, 0.2, 0.3), seed=0, dtype=np.float32
    )
    s = ObjectModelSession(ModelConfig(lengthscale=1.0, touch_capacity=64))
    s.start(pts, experts=4, expert_gate=2)
    assert type(s.model).__name__ == "ExpertGPModel"
    mean, var = s.query(pts[:10])
    assert np.abs(mean).max() < 0.05
    verts, faces, vvar = s.extract_surface(resolution=24)
    r = np.linalg.norm(verts - [0.1, 0.2, 0.3], axis=1)
    assert np.sqrt(np.mean((r - 0.08) ** 2)) < 2e-3
    s.update(pts[:1])
    assert int(np.asarray(s.model.n_touch).sum()) == 1
    res = s.next_best_path()
    assert res.path.shape[0] > 0


@pytest.mark.slow
def test_session_experts_hyperopt_refit_replays_touches():
    from gpis_tpu.api.session import ObjectModelSession

    pts, _ = synthetic.sphere_cloud(400, seed=2, dtype=np.float32)
    s = ObjectModelSession(ModelConfig(lengthscale=1.0, touch_capacity=32))
    s.start(pts, experts=4)
    s.update(pts[:2] * 1.0)
    res = s.optimize_hyperparameters(subsample=200, steps=5)
    assert float(res.params["lengthscale"]) > 0
    # touches replayed into the refit committee
    assert int(np.asarray(s.model.n_touch).sum()) == 2


def test_session_experts_rejects_ooc():
    from gpis_tpu.api.session import ObjectModelSession

    pts, _ = synthetic.sphere_cloud(200, seed=0, dtype=np.float32)
    s = ObjectModelSession(ModelConfig())
    # normals= composes with experts= since r4 (fit_experts_joint);
    # out_of_core remains exclusive (the committee IS the in-core answer).
    with pytest.raises(ValueError, match="experts"):
        s.start(pts, out_of_core=True, experts=4)


def test_optimize_experts_poe_matches_exact_mll_at_e1(fixture64):
    """At E=1 the product-of-experts objective IS the exact padded-GP MLL:
    the history's first entry (MLL at the init theta) must match
    log_marginal_likelihood on the same stacked arrays."""
    from gpis_tpu.gp import regression as gpr2

    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m1 = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=1,
                        n_shared_tail=shared)
    res = ex.optimize_experts(m1, steps=1, learn_noise=False)
    direct = float(gpr2.log_marginal_likelihood(
        "rbf", m1.x[0], m1.y[0], m1.noise[0], m1.params))
    np.testing.assert_allclose(res.history[0], direct, rtol=1e-10)


@pytest.mark.slow
def test_optimize_experts_poe_improves_objective(fixture64):
    """Starting from a deliberately wrong lengthscale, the PoE optimizer
    must improve its own objective and move the lengthscale toward the
    fixture's well-fit region."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    bad = kf.kernel_params(3.0, 1.0)
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, bad, n_experts=4,
                       n_shared_tail=shared)
    res = ex.optimize_experts(m, steps=40, learning_rate=0.1)
    assert res.mll > res.history[0]
    ls = float(res.params["lengthscale"])
    assert 0.1 < ls < 3.0  # moved off the bad init
    assert float(res.noise_scale) > 0


@pytest.mark.slow
def test_session_experts_hyperopt_poe_replays_touches():
    from gpis_tpu.api.session import ObjectModelSession

    pts, _ = synthetic.sphere_cloud(400, seed=2, dtype=np.float32)
    s = ObjectModelSession(ModelConfig(lengthscale=1.0, touch_capacity=32))
    s.start(pts, experts=4)
    s.update(pts[:2] * 1.0)
    res = s.optimize_hyperparameters(method="poe", steps=5)
    assert float(res.params["lengthscale"]) > 0
    assert int(np.asarray(s.model.n_touch).sum()) == 2
    with pytest.raises(ValueError, match="unknown hyperopt method"):
        s.optimize_hyperparameters(method="bogus")


@pytest.mark.slow
def test_retain_chol_false_matches_and_updates(fixture64):
    """A chol=None committee (retain_chol=False) predicts identically to
    the retained one, and touch updates work through the on-demand
    expert refactor (`expert_chol`)."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    # touch_capacity pushes b_tot over the want_linv threshold (512) so
    # the lean committee actually drops chol (small fixtures otherwise
    # have no linv and must retain the factor).
    kw = dict(n_experts=4, n_shared_tail=shared, gate=2,
              touch_capacity=448)
    m_full = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params,
                            retain_chol=True, **kw)
    m_lean = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params,
                            retain_chol=False, **kw)
    assert m_full.chol is not None and m_lean.chol is None
    assert m_lean.linv is not None
    q = _queries(128)
    ma, va = ex.predict(m_full, q)
    mb, vb = ex.predict(m_lean, q)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-12)

    # expert_chol reproduces the retained factor (same gram + dispatch).
    l0 = ex.expert_chol(m_lean, 0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(m_full.chol[0]),
                               atol=1e-9)

    tp = jnp.asarray([[0.0, 0.0, 1.0]])
    u_full = ex.update(m_full, tp, jnp.zeros(1), jnp.full(1, 1e-6))
    u_lean = ex.update(m_lean, tp, jnp.zeros(1), jnp.full(1, 1e-6))
    assert u_lean.chol is None
    ma, va = ex.predict(u_full, q)
    mb, vb = ex.predict(u_lean, q)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-9)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-9)


def test_retain_chol_false_checkpoint_roundtrip(fixture64, tmp_path):
    from gpis_tpu.utils import checkpoint as ckpt

    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                       n_shared_tail=shared, retain_chol=False,
                       touch_capacity=448)
    path = str(tmp_path / "lean.npz")
    ckpt.save_model(path, m)
    m2 = ckpt.load_model(path)
    assert m2.chol is None and m2.linv is not None
    q = _queries(64)
    ma, va = ex.predict(m, q)
    mb, vb = ex.predict(m2, q)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-12)


def test_halo_overlap_partition(fixture64):
    """n_halo replicates foreign boundary points into each expert: per-
    expert row counts grow, every point is still owned exactly once, and
    the committee posterior stays accurate on the fixture."""
    ts, params = fixture64
    shared = ts.n_internal + ts.n_external
    m0 = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                        n_shared_tail=shared)
    mh = ex.fit_experts("rbf", ts.x, ts.y, ts.noise, params, n_experts=4,
                        n_shared_tail=shared, n_halo=32)
    # Halo rows are real (finite-noise) extra rows per expert.
    real0 = int((np.asarray(m0.noise[0]) < 1e9).sum())
    realh = int((np.asarray(mh.noise[0]) < 1e9).sum())
    assert realh >= real0 + 16
    q = _queries(128)
    mean_h, _ = ex.predict(mh, q)
    mean_0, _ = ex.predict(m0, q)
    exact = gpr.fit("rbf", ts.x, ts.y, ts.noise, params)
    mean_e, _ = gpr.predict(exact, q)
    # The halo committee must not be WORSE than the plain one on the
    # canonical fixture (both stay close to exact).
    err_h = float(np.abs(np.asarray(mean_h) - np.asarray(mean_e)).max())
    err_0 = float(np.abs(np.asarray(mean_0) - np.asarray(mean_e)).max())
    assert err_h <= err_0 * 1.5 + 1e-6


# ------------------------------------------------------ joint (config-2 x EP)


@pytest.fixture(scope="module")
def joint_fixture():
    """Sphere training set + full-length normals/noise_g arrays in the
    session's _joint_obs layout (unit normals on surface rows, zero
    normals + pad gradient noise on the anchor tail)."""
    cfg = ModelConfig(dtype="float64")
    pts, _ = synthetic.sphere_cloud(400, seed=0)
    ts = gpis.build_training_set(pts, cfg)
    c = ts.x.shape[0]
    n_s = ts.n_surface
    xs = np.asarray(ts.x)
    nrm = np.zeros((c, 3))
    nrm[:n_s] = xs[:n_s] / np.linalg.norm(xs[:n_s], axis=1, keepdims=True)
    noise_g = np.full((c,), cfg.pad_noise)
    noise_g[:n_s] = 1e-2
    params = kf.kernel_params(1.0, 1.0)
    return ts, jnp.asarray(nrm), jnp.asarray(noise_g), params


@pytest.mark.slow
def test_single_joint_expert_matches_dense_joint(joint_fixture):
    """E=1 BCM joint committee == the exact single joint GP."""
    from gpis_tpu.gp import derivative as gpd

    ts, nrm, ng, params = joint_fixture
    shared = ts.n_internal + ts.n_external
    m1 = ex.fit_experts_joint("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                              n_experts=1, n_shared_tail=shared, beta="bcm",
                              touch_capacity=0)
    ref = gpd.fit_with_normals("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                               touch_capacity=0)
    q = _queries(128)
    ma, va = ex.predict(m1, q)
    mr, vr = gpd.predict(ref, q)
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vr), atol=1e-6)


@pytest.mark.slow
def test_joint_committee_tracks_exact(joint_fixture):
    from gpis_tpu.gp import derivative as gpd

    ts, nrm, ng, params = joint_fixture
    shared = ts.n_internal + ts.n_external
    m4 = ex.fit_experts_joint("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                              n_experts=4, n_shared_tail=shared)
    ref = gpd.fit_with_normals("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                               touch_capacity=0)
    # Queries near the surface shell, where the committee deploys.
    q = _queries(200)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True) * 1.1
    ma, _ = ex.predict(m4, q)
    mr, _ = gpd.predict(ref, q)
    assert float(jnp.max(jnp.abs(ma - mr))) < 0.08
    # The posterior gradient (via AD of the committee mean) should point
    # outward near the surface — the whole point of normal observations.
    g = jax.vmap(jax.grad(lambda p: ex.predict_mean(m4, p[None, :])[0]))(q)
    cos = jnp.sum(g * q, axis=1) / (
        jnp.linalg.norm(g, axis=1) * jnp.linalg.norm(q, axis=1))
    assert float(jnp.mean(cos)) > 0.9


@pytest.mark.slow
def test_joint_committee_touch_update(joint_fixture):
    ts, nrm, ng, params = joint_fixture
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts_joint("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                             n_experts=4, n_shared_tail=shared,
                             touch_capacity=8)
    tp = jnp.asarray([[0.0, 0.0, 1.05]])
    _, v0 = ex.predict(m, tp)
    m2 = ex.update(m, tp, jnp.zeros(1), jnp.full(1, 1e-6))
    assert int(np.asarray(m2.n_touch).sum()) == 1
    mean2, v2 = ex.predict(m2, tp)
    assert float(v2[0]) < float(v0[0])  # touching reduces uncertainty
    assert abs(float(mean2[0])) < 0.1   # mean pulled toward the observation


@pytest.mark.slow
def test_joint_committee_checkpoint_roundtrip(joint_fixture, tmp_path):
    from gpis_tpu.utils import checkpoint as ckpt

    ts, nrm, ng, params = joint_fixture
    shared = ts.n_internal + ts.n_external
    m = ex.fit_experts_joint("rbf", ts.x, ts.y, nrm, ts.noise, ng, params,
                             n_experts=4, n_shared_tail=shared,
                             touch_capacity=8)
    m = ex.update(m, jnp.asarray([[0.0, 0.0, 1.05]]), jnp.zeros(1),
                  jnp.full(1, 1e-6))
    path = str(tmp_path / "joint_experts.npz")
    ckpt.save_model(path, m)
    m2 = ckpt.load_model(path)
    assert m2.joint and m2.touch_capacity == m.touch_capacity
    q = _queries(64)
    ma, va = ex.predict(m, q)
    mb, vb = ex.predict(m2, q)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-12)


@pytest.mark.slow
def test_session_joint_experts_end_to_end():
    """session.start(points, normals=..., experts=E): the config-2 x EP
    composition (VERDICT r3 missing #3) — fit, RMSE-gated surface, touch
    update, subsample hyperopt refit with touch replay."""
    from gpis_tpu.api.session import ObjectModelSession

    cfg = ModelConfig(kernel="rbf", lengthscale=0.4, noise_surface=1e-3,
                      block=64, touch_capacity=64)
    pts = np.asarray(gpis.fibonacci_sphere(1500, radius=0.08), np.float64)
    nrm = (pts / np.linalg.norm(pts, axis=1, keepdims=True))
    s = ObjectModelSession(cfg)
    s.start(pts, normals=nrm, experts=4, expert_gate=2)
    assert s.model.joint and s.model.n_experts == 4
    verts, faces, var = s.extract_surface(resolution=32)
    r = np.linalg.norm(verts, axis=1)
    rmse = float(np.sqrt(np.mean((r - 0.08) ** 2))) / 0.08
    assert rmse < 0.01
    s.update(np.asarray([pts[0] * 1.2]))
    res = s.optimize_hyperparameters(steps=3, subsample=256)
    assert np.isfinite(res.mll)
    assert s.model.joint and int(np.asarray(s.model.n_touch).sum()) == 1

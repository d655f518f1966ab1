"""Utils subsystem tests: profiling timers, structured logging, voxel filter
with normals (SURVEY.md §6 aux subsystems)."""

import json
import logging

import pytest

import numpy as np

from gpis_tpu.data import voxel
from gpis_tpu.utils import profiling
from gpis_tpu.utils.logging import enable_json_logs, get_logger


def test_timer_stages():
    t = profiling.Timer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    with t.stage("a"):  # accumulates
        pass
    d = json.loads(t.json())
    assert set(d) == {"a", "b"}
    assert d["a"] >= 0 and d["b"] >= 0


def test_timed_contextmanager():
    out = {}
    with profiling.timed("x", out):
        sum(range(100))
    assert out["x"] > 0


def test_trace_noop():
    with profiling.trace(None):
        pass  # no log dir: must be a clean no-op


def test_json_logging(capsys):
    import io

    buf = io.StringIO()
    enable_json_logs(buf)
    log = get_logger("test")
    log.info("hello %d", 42)
    entry = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert entry["msg"] == "hello 42"
    assert entry["level"] == "INFO"
    # Restore default handler for other tests.
    root = logging.getLogger("gpis_tpu")
    for h in list(root.handlers):
        root.removeHandler(h)


def test_voxel_with_normals(rng):
    pts = np.array([[0.0, 0, 0], [0.02, 0, 0], [1.0, 1, 1]])
    nrm = np.array([[1.0, 0, 0], [0.0, 1, 0], [0, 0, 1.0]])
    p2, n2 = voxel.voxel_downsample_with_normals(pts, nrm, 0.1)
    assert p2.shape == (2, 3) and n2.shape == (2, 3)
    np.testing.assert_allclose(np.linalg.norm(n2, axis=1), 1.0, atol=1e-12)
    # Merged cell normal is the renormalized mean of (1,0,0) and (0,1,0).
    i = int(np.argmin(p2[:, 0]))
    np.testing.assert_allclose(n2[i], [np.sqrt(0.5), np.sqrt(0.5), 0.0], atol=1e-12)


def test_voxel_with_normals_cancellation():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0]])
    nrm = np.array([[1.0, 0, 0], [-1.0, 0, 0]])  # cancel exactly
    p2, n2 = voxel.voxel_downsample_with_normals(pts, nrm, 0.1)
    assert len(p2) == 1
    np.testing.assert_allclose(np.abs(n2[0]), [1.0, 0, 0])  # falls back, unit


@pytest.mark.slow
def test_session_voxel_with_normals():
    from gpis_tpu.api.session import ObjectModelSession
    from gpis_tpu.config import ModelConfig
    from gpis_tpu.data import gpis

    pts = gpis.fibonacci_sphere(300, radius=0.5)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    cfg = ModelConfig(kernel="rbf", lengthscale=0.8, noise_surface=1e-5,
                      n_external=16, block=32, voxel_leaf=0.08)
    sess = ObjectModelSession(cfg).start(pts, normals=nrm)
    assert sess.training.n_surface < 300  # actually downsampled
    mean, _ = sess.query(np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]]))
    assert mean[0] < -0.5 and abs(mean[1]) < 0.05


@pytest.mark.slow
def test_debug_nans_clean_path():
    """SURVEY.md §6 sanitizer analogue: a clean fit/predict runs NaN-free
    under jax_debug_nans (the numerical race detector)."""
    import jax
    import jax.numpy as jnp

    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels import functions as kf

    jax.config.update("jax_debug_nans", True)
    try:
        pts = jnp.asarray(gpis_mod.fibonacci_sphere(60, 1.0))
        params = kf.kernel_params(0.8, 1.0)
        m = gpr.fit("rbf", pts, jnp.zeros(60), 1e-4, params,
                    block=32, touch_capacity=32)
        mean, var = gpr.predict(m, pts[:10])
        m2 = gpr.update(m, pts[:3] * 1.01, jnp.zeros(3), 1e-5)
        gpr.predict(m2, pts[:5])
    finally:
        jax.config.update("jax_debug_nans", False)


def test_checkpoint_roundtrip_fit_inference_alias(tmp_path):
    """fit_inference models alias chol == W; the checkpoint stores the
    matrix once (linv_is_chol) and the loaded model restores the alias and
    the exact posterior."""
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.utils import checkpoint as ckpt

    pts = jnp.asarray(gpis_mod.fibonacci_sphere(96, 1.0))
    m = gpr.fit_inference("rbf", pts, jnp.zeros(96), 1e-4,
                          kf.kernel_params(0.8, 1.0), block=32)
    # Emulate the TPU branch's alias on the CPU fallback too.
    import dataclasses

    m = dataclasses.replace(m, chol=m.linv)
    p = str(tmp_path / "inf.npz")
    ckpt.save_model(p, m)
    import json

    with np.load(p) as d:
        meta = json.loads(str(d["meta"]))
        assert meta.get("linv_is_chol") is True
        assert "linv" not in d.files  # stored once
    m2 = ckpt.load_model(p)
    assert m2.linv is m2.chol
    q = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)))
    np.testing.assert_allclose(np.asarray(gpr.predict(m, q)[1]),
                               np.asarray(gpr.predict(m2, q)[1]), atol=1e-12)


def test_checkpoint_roundtrip_with_linv(tmp_path):
    """A with_linv model's checkpoint restores the fast-query factor, so a
    loaded session answers queries identically (bit-exact) to the saved
    one even on the GEMM path."""
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import regression as gpr
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.utils import checkpoint as ckpt

    pts = jnp.asarray(gpis_mod.fibonacci_sphere(96, 1.0))
    m = gpr.fit("rbf", pts, jnp.zeros(96), 1e-4, kf.kernel_params(0.8, 1.0),
                block=32, touch_capacity=32)
    m = gpr.with_linv(m, block=32)
    p = str(tmp_path / "linv.npz")
    ckpt.save_model(p, m)
    m2 = ckpt.load_model(p)
    assert m2.linv is not None and m2.linv is not m2.chol
    q = jnp.asarray(np.random.default_rng(1).normal(size=(16, 3)))
    for a, b in zip(gpr.predict(m, q), gpr.predict(m2, q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


@pytest.mark.slow
def test_checkpoint_roundtrip_joint_touches(tmp_path):
    """Joint models with occupied tactile slots roundtrip exactly."""
    import jax.numpy as jnp
    import numpy as np

    from gpis_tpu.data import gpis as gpis_mod
    from gpis_tpu.gp import derivative as gpd
    from gpis_tpu.kernels import functions as kf
    from gpis_tpu.utils import checkpoint as ckpt

    pts = jnp.asarray(gpis_mod.fibonacci_sphere(48, 1.0))
    m = gpd.fit_with_normals("rbf", pts, jnp.zeros(48), pts, 1e-4, 1e-3,
                             kf.kernel_params(0.8, 1.0), block=16,
                             touch_capacity=8)
    m = gpd.update_joint(m, pts[:2] * 1.02, jnp.zeros(2), 1e-5)
    p = str(tmp_path / "jt.npz")
    ckpt.save_model(p, m)
    m2 = ckpt.load_model(p)
    assert int(m2.n_touch) == 2 and m2.touch_capacity == m.touch_capacity
    q = jnp.asarray(np.random.default_rng(3).normal(size=(12, 3)))
    for a, b in zip(gpd.predict(m, q), gpd.predict(m2, q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    # And the loaded model accepts further touches.
    m3 = gpd.update_joint(m2, pts[2:3] * 0.98, jnp.zeros(1), 1e-5)
    assert int(m3.n_touch) == 3

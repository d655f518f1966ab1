"""Failure-recovery drill (SURVEY.md §6 failure detection / recovery;
VERDICT r2 item 6): a session that crashes mid-exploration must be
reconstructable from its last checkpoint, and touches that arrived after
the checkpoint must be REPLAYABLE through the normal update path with
posterior parity against an uninterrupted run.  The same story must hold
through the HTTP service (/save, node restart, /load)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from gpis_tpu.api.session import ObjectModelSession
from gpis_tpu.config import ExploreConfig, ModelConfig
from gpis_tpu.data import gpis, synthetic


CFG = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                  touch_capacity=16)


def _cloud():
    pts, _ = synthetic.partial_sphere_cloud(200, radius=1.0, cap_cos=-0.2,
                                            seed=11)
    return pts


TOUCHES = [
    np.array([[0.0, 0.0, -1.02]]),
    np.array([[0.3, 0.0, -0.95]]),
    np.array([[0.0, 0.3, -0.95]]),   # the "pending" touch, post-checkpoint
]


def _probe():
    return gpis.fibonacci_sphere(96, radius=1.0)


@pytest.mark.slow
def test_session_crash_recovery_replays_pending_touch(tmp_path):
    # Interrupted run: fit, two touches, checkpoint ... crash (discard).
    s1 = ObjectModelSession(CFG)
    s1.start(_cloud())
    s1.update(TOUCHES[0]).update(TOUCHES[1])
    ckpt_path = str(tmp_path / "crashed.npz")
    s1.save(ckpt_path)
    del s1  # the crash

    # Recovery: load the checkpoint, replay the touch that was pending at
    # crash time through the NORMAL update path.
    s2 = ObjectModelSession.load(ckpt_path, CFG)
    s2.update(TOUCHES[2])

    # Uninterrupted control run sees all three touches.
    s3 = ObjectModelSession(CFG)
    s3.start(_cloud())
    for t in TOUCHES:
        s3.update(t)

    q = _probe()
    m2, v2 = s2.query(q)
    m3, v3 = s3.query(q)
    np.testing.assert_allclose(m2, m3, atol=1e-8)
    np.testing.assert_allclose(v2, v3, atol=1e-8)
    # And the recovered session keeps exploring: next_best_path works.
    res = s2.next_best_path()
    assert len(res.path) >= 1


@pytest.mark.slow
def test_session_recovery_joint_model(tmp_path):
    """Same drill on the config-2 joint (normals) model: bordering updates
    must continue from the checkpointed factor after restore."""
    pts = _cloud()
    ctr = pts - pts.mean(axis=0)
    normals = ctr / np.linalg.norm(ctr, axis=1, keepdims=True)

    s1 = ObjectModelSession(CFG)
    s1.start(pts, normals=normals)
    s1.update(TOUCHES[0])
    ckpt_path = str(tmp_path / "joint.npz")
    s1.save(ckpt_path)
    del s1

    s2 = ObjectModelSession.load(ckpt_path, CFG)
    s2.update(TOUCHES[1])

    s3 = ObjectModelSession(CFG)
    s3.start(pts, normals=normals)
    s3.update(TOUCHES[0]).update(TOUCHES[1])

    q = _probe()
    m2, v2 = s2.query(q)
    m3, v3 = s3.query(q)
    np.testing.assert_allclose(m2, m3, atol=1e-7)
    np.testing.assert_allclose(v2, v3, atol=1e-7)


@pytest.mark.slow
def test_service_save_restart_load(tmp_path):
    """The HTTP drill: /start + /update + /save, kill the node, start a
    FRESH node, /load, replay the pending /update — posterior parity with
    an uninterrupted service."""
    from gpis_tpu.api.service import make_server

    def call(port, path, payload=None):
        url = f"http://127.0.0.1:{port}{path}"
        if payload is None:
            with urllib.request.urlopen(url, timeout=30) as r:
                return json.loads(r.read())
        req = urllib.request.Request(
            url, json.dumps(payload).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    pts = _cloud().tolist()
    probe = _probe().tolist()
    ckpt_path = str(tmp_path / "service.npz")

    # Node 1: serve, touch, checkpoint, crash.
    srv1 = make_server(ObjectModelSession(CFG), port=0)
    port1 = srv1.server_address[1]
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    try:
        assert call(port1, "/start", {"points": pts})["ok"]
        assert call(port1, "/update", {"points": TOUCHES[0].tolist()})["ok"]
        assert call(port1, "/save", {"path": ckpt_path})["ok"]
    finally:
        srv1.shutdown()  # the crash

    # Node 2 (fresh process analogue): /load, replay the pending touch.
    srv2 = make_server(ObjectModelSession(CFG), port=0)
    port2 = srv2.server_address[1]
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        out = call(port2, "/load", {"path": ckpt_path})
        assert out["ok"] and out["n_touch"] == 1
        assert call(port2, "/update", {"points": TOUCHES[1].tolist()})["n_touch"] == 2
        got = call(port2, "/query", {"points": probe})
    finally:
        srv2.shutdown()

    # Uninterrupted control service.
    srv3 = make_server(ObjectModelSession(CFG), port=0)
    port3 = srv3.server_address[1]
    threading.Thread(target=srv3.serve_forever, daemon=True).start()
    try:
        assert call(port3, "/start", {"points": pts})["ok"]
        call(port3, "/update", {"points": TOUCHES[0].tolist()})
        call(port3, "/update", {"points": TOUCHES[1].tolist()})
        want = call(port3, "/query", {"points": probe})
    finally:
        srv3.shutdown()

    np.testing.assert_allclose(got["mean"], want["mean"], atol=1e-8)
    np.testing.assert_allclose(got["var"], want["var"], atol=1e-8)


@pytest.mark.slow
def test_restored_joint_overflow_raises_clearly(tmp_path):
    """A restored joint session that overflows its touch slots cannot fold
    touches into the core (the training set is not checkpointed) — it must
    say so, not crash with an AttributeError."""
    cfg = ModelConfig(kernel="rbf", lengthscale=0.7, noise_surface=1e-5,
                      block=8, touch_capacity=2)  # rounds up to 8 slots
    pts = _cloud()
    ctr = pts - pts.mean(axis=0)
    normals = ctr / np.linalg.norm(ctr, axis=1, keepdims=True)
    s1 = ObjectModelSession(cfg)
    s1.start(pts, normals=normals)
    p = str(tmp_path / "ovf.npz")
    s1.save(p)
    del s1
    s2 = ObjectModelSession.load(p, cfg)
    cap = s2.model.touch_capacity
    batch = np.concatenate([TOUCHES[0], TOUCHES[1]])
    for _ in range(cap // len(batch)):
        s2.update(batch)  # bordering within capacity works after restore
    with pytest.raises(ValueError, match="restored session"):
        s2.update(np.concatenate([batch, TOUCHES[2]]))

"""JSON service shim (rebuild of reference component C8, SURVEY.md §3 C8:
the `.srv` IDL surface — start-process / get-next-best-path / update).

A stdlib-only HTTP JSON server so robot stacks can drive the session over a
socket the way ROS clients drove the node's services.  No framework deps.

    POST /start            {"points": [[x,y,z],...]}            -> {"ok": true, ...}
    POST /query            {"points": [[x,y,z],...]}            -> {"mean": [...], "var": [...]}
    POST /update           {"points": [[x,y,z],...]}            -> {"ok": true, "n_touch": k}
    GET  /next_best_path                                        -> {"path": [...], "normals": [...]}
    GET  /done                                                  -> {"done": bool}
    GET  /health                                                -> {"ok": true}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from gpis_tpu.api.session import ObjectModelSession
from gpis_tpu.utils.logging import get_logger

__all__ = ["serve", "make_server"]

log = get_logger("service")


def make_server(session: ObjectModelSession, host: str = "127.0.0.1", port: int = 8731):
    lock = threading.Lock()  # one model, serialized service calls (like the node's spin loop)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def log_message(self, fmt, *args):  # route through structured logging
            log.info("%s %s", self.address_string(), fmt % args)

        def do_GET(self):
            try:
                with lock:
                    if self.path == "/health":
                        self._send(200, {"ok": True, "fitted": session.model is not None})
                    elif self.path == "/next_best_path":
                        res = session.next_best_path()
                        self._send(200, {
                            "path": res.path.tolist(),
                            "normals": res.normals.tolist(),
                            "target_variance": res.target_variance,
                            "reached_threshold": res.reached_threshold,
                        })
                    elif self.path == "/done":
                        self._send(200, {"done": session.is_done()})
                    elif self.path == "/stats":
                        self._send(200, dict(session.stats))
                    elif self.path == "/mesh" or self.path.startswith("/mesh?"):
                        from urllib.parse import parse_qs, urlparse

                        qs = parse_qs(urlparse(self.path).query)
                        res_ = int(qs.get("resolution", ["32"])[0])
                        verts, faces, var = session.extract_surface(resolution=res_)
                        self._send(200, {
                            "verts": np.round(verts, 5).tolist(),
                            "faces": faces.tolist(),
                            "variance": np.round(var, 6).tolist(),
                        })
                    else:
                        self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # noqa: BLE001 — service boundary
                self._send(400, {"error": str(e)})

        def do_POST(self):
            try:
                req = self._body()
                with lock:
                    if self.path == "/start":
                        kw = {}
                        if req.get("normals") is not None:
                            kw["normals"] = np.asarray(req["normals"], np.float64)
                        if req.get("out_of_core"):
                            # Panel-streamed 100k+ fit; the node then serves
                            # /query //done /mesh from the live session.
                            kw["out_of_core"] = True
                        if req.get("experts"):
                            # Local-expert committee (fast approximate path).
                            kw["experts"] = int(req["experts"])
                            kw["expert_gate"] = int(req.get("expert_gate", 0))
                        session.start(np.asarray(req["points"], np.float64), **kw)
                        self._send(200, {"ok": True, "capacity": session.model.capacity})
                    elif self.path == "/query":
                        mean, var = session.query(np.asarray(req["points"], np.float64))
                        self._send(200, {"mean": mean.tolist(), "var": var.tolist()})
                    elif self.path == "/update":
                        session.update(np.asarray(req["points"], np.float64))
                        m = session.model
                        # OOCModel counts touches in its tail block; the
                        # expert committee carries a per-expert (E,) vector.
                        n_touch = int(np.sum(getattr(m, "n_touch",
                                                     getattr(m, "n_tail", 0))))
                        self._send(200, {"ok": True, "n_touch": n_touch})
                    elif self.path == "/save":
                        session.save(req["path"])
                        self._send(200, {"ok": True, "path": req["path"]})
                    elif self.path == "/load":
                        # Crash-recovery restart (SURVEY.md §6): reattach a
                        # /save checkpoint to this (possibly fresh) node and
                        # continue serving queries/updates from it.
                        session.restore(req["path"])
                        self._send(200, {
                            "ok": True,
                            "capacity": int(session.model.capacity),
                            "n_touch": int(np.sum(getattr(
                                session.model, "n_touch",
                                getattr(session.model, "n_tail", 0)))),
                        })
                    elif self.path == "/hyperopt":
                        kw = {"steps": int(req.get("steps", 100))}
                        if req.get("method"):  # "distributed" on sharded models
                            kw["method"] = str(req["method"])
                        for flag in ("learn_noise", "learn_noise_g",
                                     "learn_signal"):
                            if flag in req:
                                kw[flag] = bool(req[flag])
                        res = session.optimize_hyperparameters(**kw)
                        self._send(200, {
                            "ok": True, "mll": res.mll,
                            "lengthscale": float(res.params["lengthscale"]),
                        })
                    else:
                        self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # noqa: BLE001 — service boundary
                self._send(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def serve(session: ObjectModelSession, host: str = "127.0.0.1", port: int = 8731):
    srv = make_server(session, host, port)
    log.info("serving on http://%s:%d", host, port)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()

"""Out-of-core GP factorization: the N=100k judge configuration on ONE chip
(BASELINE.md rows 1/3; SURVEY.md §7).

A 100k-point Gram is ~40 GB f32 — 2.5x one v5e HBM — and the v5e-8 that
would shard it is not available in this environment.  This module factors
it anyway by keeping the Cholesky factor OUT OF CORE as trimmed row panels
(panel j = rows [jB, (j+1)B) x cols [0, (j+1)B), the only structurally
nonzero part) in a swappable PanelStore:

* `HostPanelStore`  — panels live in host RAM (125 GB here), streamed over
  the host<->device link per use.  Admits any N that fits host memory.
* `DevicePanelStore` — panels stay in HBM.  The trimmed storage is
  ~0.56 N^2 floats instead of N^2, which together with the TRSM's
  panel-consumption (W_j overwrites L_j's slot) pushes the single-chip
  ceiling well past the dense one-matrix path (~59k measured in r2).

Algorithms (all compute on device; Pallas in-kernel bf16x3 for the GEMMs,
exact XLA trisolves for every triangular solve — two hardware-measured
rules shape this: (a) an explicit Pallas inverse's rounding is amplified by
cond() each time it is multiplied onward, and (b) the XLA-level hi/lo-split
matmul is re-fused into a single-pass bf16 dot by the simplifier when
inlined into larger jits, so only in-kernel splits and HIGHEST dots are
composable):

Cholesky — row-panel bordering (left-looking by panels).  For panel j the
device holds one full-width (B, C) buffer `cur`, initialized to the Gram
row band (generated in-kernel, never stored):

    for k < j:  S_k         = cur[:, kB:(k+1)B] - L_j[:, :kB] @ L_k[:, :kB]^T
                L_j[:, kB:] = S_k L_kk^{-T}      (256-blocked trisolve TRSM)
    S_jj = cur[:, jB:] - L_j[:, :jB] @ L_j[:, :jB]^T ;  L_jj = potrf(S_jj)

The rectangular update runs as `gemm_nt_masked_pallas` (TRACED prefix k0,
operands at fixed full width); the panel solve is `_trsm_right_blocked`.

Compile model (the thing that made or broke this path on the remote
tunnel): every per-panel device step takes FIXED (B, C) full-width
operands with traced offsets, so each Mosaic kernel compiles exactly once
per (panel, capacity) choice.  The earlier static-offset/trimmed-shape
variant compiled O(nb^2) kernel specializations — measured ~20 min of
compile inside a 32k cold fit, and projected to hours at 100k.  Stored
panels stay trimmed (quantized widths, `_store_width`) for host RAM and
link traffic; `_fetch` zero-pads them back to full width on device.

alpha — forward + backward substitution streaming the f32 L panels (two
O(N^2) vector passes).  W never enters the mean path, so the posterior
mean stays at the f32-factorization grade regardless of how W is stored.

TRSM — left-looking W = L^{-1} by row panels (variance only):

    U   = sum_{k<j} L_j[:, kB:(k+1)B] @ W_k         (trimmed-width GEMMs)
    W_j = L_jj^{-1} [-U | I]                         (blocked trisolves)

Step j consumes L panel j (never read again) so W_j can replace it in the
store — peak storage stays one trimmed factor.

Query — mean = K(Q,X) alpha per chunk (HIGHEST GEMV); variance streams
each W panel once TOTAL (not once per chunk) through
`fused_quad_band_pallas`, accumulating quad = ||W kq^T||^2 across panels,
then clamps to [0, k0] (see ooc_predict).

The tiered store keeps panels in HBM under a byte budget and spills the
overflow to host RAM; the axon link is asymmetric (h2d ~1.3 GB/s, d2h
~35 MB/s measured), so minimizing SPILL bytes — not total traffic — is
what matters, and spilled W panels can optionally compress to float16.

Parity: tested at small N on CPU (interpret-mode kernels, f64) against the
dense `linalg.cholesky` / `blocked_linv` / `gp.regression.predict` to 1e-6
(tests/test_outofcore.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpis_tpu.kernels import functions as kf
from gpis_tpu.kernels import gram as kg


def _mmh(a, b):
    """HIGHEST-precision dot — for the VECTOR-shaped contractions (GEMVs in
    the substitutions, kq @ alpha).  These are O(N^2), so the slow HIGHEST
    path costs nothing, and it cannot be degraded by XLA's simplifier the
    way the hi/lo-split matmul can (docs/PERF.md; measured: bf16x3 inlined
    into a larger jit re-fuses to single-pass bf16)."""
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST)

__all__ = ["HostPanelStore", "DevicePanelStore", "TieredPanelStore",
           "DeviceBudget", "plan_sweeps", "link_stats",
           "ooc_cholesky", "ooc_trsm", "ooc_solve_alpha",
           "ooc_alpha_backward", "ooc_factor_phase", "ooc_solve_phase",
           "ooc_predict", "ooc_fit", "ooc_fit_joint", "ooc_update",
           "ooc_residual_check", "OOCModel", "OOCJointModel"]


# ------------------------------------------------- link traffic attribution

_LINK_LOCK = threading.Lock()
_LINK: dict[str, float] = {}


def _link_acct(kind: str, nbytes: int, secs: float) -> None:
    with _LINK_LOCK:
        _LINK[f"{kind}_bytes"] = _LINK.get(f"{kind}_bytes", 0) + int(nbytes)
        _LINK[f"{kind}_s"] = _LINK.get(f"{kind}_s", 0.0) + float(secs)
        _LINK[f"{kind}_n"] = _LINK.get(f"{kind}_n", 0) + 1


def link_stats(reset: bool = False) -> dict:
    """Cumulative host<->device transfer accounting for the out-of-core
    paths: bytes / blocking-seconds / call counts for `h2d` (panel fetches,
    `_chunked_put`) and `d2h` (writebacks and spills, staged through the
    CPU jax device).  The seconds are measured on the prefetch/writeback
    THREADS, so they attribute the link's busy time even when it overlaps
    device compute — the attribution the N=100k wall-clock analysis needs
    (VERDICT r3 weak #1: ~2 ks of the measured 3,695 s was unexplained by
    the refetch model alone; these counters settle where it goes)."""
    with _LINK_LOCK:
        out = dict(_LINK)
        if reset:
            _LINK.clear()
    return out


# ------------------------------------------------- int16 panel quantization
#
# Stored L panels dominate the out-of-core link traffic (refetched once per
# sweep group in phase 1, re-read once by the phase-2 TRSM).  Streaming them
# at 2 bytes/element halves the dominant wall-clock term.  float16 was
# measured UNSAFE for L (entrywise RELATIVE rounding ~5e-4 feeds back into
# later Schur complements amplified by cond(K); broke the posterior mean
# outright — see ooc_fit's docstring).  Blockwise int16 is ~16x tighter at
# the same 2 bytes: q = round(x / s) with one f32 scale per (row, 512-col
# block), so the ABSOLUTE error is bounded by blockmax * 2^-15 ~ 3e-5
# rather than 5e-4 * |entry| at the block max.  Factor consistency is
# automatic: every consumer reads panels through the store, so the object
# in play is one self-consistent perturbed factor L~ with
# ||L~ - L||_inf <= blockmax * 3.05e-5 (measured posterior impact:
# docs/PERF.md round-4 L-quantization section).

_QBLOCK = 512


@functools.partial(jax.jit, static_argnames=("block",))
def _qpack(arr, *, block: int = _QBLOCK):
    """(B, W) float -> (q int16 padded to a block multiple, scales f32
    (B, ceil(W/block))).  Runs ON DEVICE so the d2h leg already moves
    2-byte elements."""
    b, w = arr.shape
    nb = -(-w // block)
    ap = jnp.pad(arr, ((0, 0), (0, nb * block - w)))
    blk = ap.reshape(b, nb, block)
    amax = jnp.max(jnp.abs(blk), axis=2)
    scale = jnp.maximum(amax, jnp.finfo(arr.dtype).tiny) / 32767.0
    q = jnp.round(blk / scale[:, :, None]).astype(jnp.int16)
    return q.reshape(b, nb * block), scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("w", "dtype"))
def _qunpack(q, scale, *, w: int, dtype):
    """Inverse of `_qpack`, on device after the (2-byte) h2d leg."""
    b, wp = q.shape
    nb = scale.shape[1]
    x = q.astype(dtype).reshape(b, nb, wp // nb) * scale[:, :, None].astype(dtype)
    return x.reshape(b, wp)[:, :w]


class _QuantDisk:
    """Disk handle for an int16-quantized panel: `path` holds q (int16,
    width padded to a _QBLOCK multiple), `path + '.scale'` the f32 scales.
    `.dtype` reports int16 so `has_compressed_panels` counts it."""

    __slots__ = ("path", "shape", "scale_shape", "width", "orig_dtype")
    codec = "int16"

    def __init__(self, path, shape, scale_shape, width, orig_dtype):
        self.path = path
        self.shape = tuple(shape)
        self.scale_shape = tuple(scale_shape)
        self.width = int(width)
        self.orig_dtype = np.dtype(orig_dtype)

    @property
    def dtype(self):
        return np.dtype(np.int16)

    def read(self):
        q = np.memmap(self.path, dtype=np.int16, mode="r", shape=self.shape)
        s = np.memmap(self.path + ".scale", dtype=np.float32, mode="r",
                      shape=self.scale_shape)
        return q, s


class _QuantHost:
    """Host-RAM twin of `_QuantDisk` (tiered store without a spill_dir)."""

    __slots__ = ("q", "scale", "width", "orig_dtype")
    codec = "int16"

    def __init__(self, q, scale, width, orig_dtype):
        self.q, self.scale = q, scale
        self.width = int(width)
        self.orig_dtype = np.dtype(orig_dtype)

    @property
    def dtype(self):
        return np.dtype(np.int16)

    def read(self):
        return self.q, self.scale


# ------------------------------------------------------------ panel stores


class _PanelStoreBase:
    """Thread-safe panel dict.  `put` runs on the async-writeback thread and
    `get` on the prefetch thread, and panel j-1's writeback is legitimately
    still in flight when the next iteration's prefetcher asks for it — so
    `get` BLOCKS until the panel lands (a plain dict raced here: the KeyError
    killed the prefetch worker silently and the consumer waited forever)."""

    _GET_TIMEOUT_S = 900.0

    def __init__(self):
        self._p: dict[int, object] = {}
        self._cv = threading.Condition()

    def _store(self, j: int, arr):
        raise NotImplementedError

    def put(self, j: int, arr) -> None:
        v = self._store(j, arr)
        with self._cv:
            self._p[j] = v
            self._cv.notify_all()

    def get(self, j: int):
        with self._cv:
            if not self._cv.wait_for(lambda: j in self._p, self._GET_TIMEOUT_S):
                raise TimeoutError(f"panel {j} never arrived in the store")
            return self._p[j]

    def free(self, j: int) -> None:
        with self._cv:
            self._p.pop(j, None)

    def clear(self) -> None:
        with self._cv:
            keys = list(self._p)
        for j in keys:
            self.free(j)

    def __contains__(self, j):
        with self._cv:
            return j in self._p


def _host_device():
    """A CPU jax device for fast d2h staging, or None off-TPU.

    Measured on the axon tunnel: `np.asarray(tpu_array)` runs ~40 MB/s with a
    multi-minute first-call stall, while `jax.device_put(tpu_array, cpu_dev)`
    sustains ~1.2 GB/s (symmetric with h2d).  All panel writebacks therefore
    stage through a CPU jax array."""
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def _d2h(arr):
    """Stage a device array to host (CPU jax device when available — the
    fast d2h path on the axon link) with link accounting."""
    import time as _time

    t0 = _time.perf_counter()
    cpu = _host_device()
    if cpu is not None:
        out = jax.block_until_ready(jax.device_put(arr, cpu))
    else:
        out = np.asarray(arr)
    _link_acct("d2h", arr.size * arr.dtype.itemsize,
               _time.perf_counter() - t0)
    return out


class HostPanelStore(_PanelStoreBase):
    """Trimmed factor panels in host RAM (CPU jax arrays / numpy)."""

    def _store(self, j: int, arr):
        # d2h copy; arr is a device array (B, (j+1)B).
        return _d2h(arr)


class DevicePanelStore(_PanelStoreBase):
    """Trimmed factor panels resident in HBM (jax arrays)."""

    def _store(self, j: int, arr):
        return jax.block_until_ready(jnp.asarray(arr))

    def free(self, j: int) -> None:
        with self._cv:
            a = self._p.pop(j, None)
        if a is not None:
            a.delete()


class _DiskPanel:
    """Handle for a panel written to a disk file (np.memmap read-back).
    File-backed pages live in the page cache — evictable under memory
    pressure instead of counting against anonymous RSS, which matters
    because the axon client RETAINS the host copy of every h2d transfer
    (measured ~1:1 RSS growth per h2d byte, never freed; see
    docs/PERF.md).  Streaming spilled panels from disk keeps the panel
    STORE out of that anonymous budget entirely."""

    __slots__ = ("path", "shape", "dtype")

    def __init__(self, path, shape, dtype):
        self.path, self.shape, self.dtype = path, shape, np.dtype(dtype)

    def read(self):
        return np.memmap(self.path, dtype=self.dtype, mode="r",
                         shape=self.shape)


class DeviceBudget:
    """HBM byte budget shared by the L and W tiered stores of one fit (the
    TRSM phase frees L panels while W panels grow — one pot keeps their sum
    bounded)."""

    def __init__(self, limit_bytes: int):
        self.limit = int(limit_bytes)
        self._used = 0
        self._lk = threading.Lock()

    def take(self, n: int) -> bool:
        with self._lk:
            if self._used + n <= self.limit:
                self._used += n
                return True
            return False

    def give(self, n: int) -> None:
        with self._lk:
            self._used -= n


class TieredPanelStore(_PanelStoreBase):
    """Panels stay in HBM until the shared budget is exhausted, then spill to
    host RAM.  The asymmetric axon link (h2d ~1.3 GB/s, d2h ~35 MB/s
    measured) makes the SPILL the expensive direction — the budget-first
    policy keeps total d2h to (factor size - budget) instead of the whole
    factor, and reads (h2d) stay cheap either way."""

    def __init__(self, budget: DeviceBudget, spill_dtype=None,
                 device_dtype=None, spill_dir: str | None = None,
                 write_through: bool = False, tag: str | None = None,
                 spill_codec: str | None = None):
        super().__init__()
        self._budget = budget
        # Provenance tag persisted in the manifest: callers that resume from
        # a directory of panel files use it to prove those panels belong to
        # THIS problem (same shapes are not enough — see ooc_solve_phase).
        self.tag = tag
        self._spill_dtype = jnp.dtype(spill_dtype) if spill_dtype else None
        if spill_codec not in (None, "int16"):
            raise ValueError(f"unknown spill_codec {spill_codec!r}")
        if spill_codec is not None and spill_dtype is not None:
            raise ValueError("spill_codec and spill_dtype are exclusive")
        self._spill_codec = spill_codec
        self._device_dtype = jnp.dtype(device_dtype) if device_dtype else None
        self._spill_dir = spill_dir
        # write_through mirrors EVERY panel (device-resident ones included)
        # to a disk file at put time, so the store is durable at any moment
        # — the resumable factor phase checkpoints on top of this.  Costs
        # one extra d2h per device-resident panel; serving still hits HBM.
        self._write_through = bool(write_through and spill_dir)
        if spill_dir is not None:
            import os
            os.makedirs(spill_dir, exist_ok=True)
        self.compute_dtype = None
        self._meta: dict[int, tuple[bool, int]] = {}  # j -> (on_device, bytes)

    def _to_disk(self, j: int, arr):
        import os

        path = os.path.join(self._spill_dir, f"panel_{j}.bin")
        if self._spill_codec == "int16" and arr.dtype.kind == "f":
            # Quantize ON DEVICE so the slow d2h leg moves 2-byte elements.
            q, s = _qpack(jnp.asarray(arr))
            qh, sh = _d2h(q), _d2h(s)
            mm = np.memmap(path, dtype=np.int16, mode="w+", shape=qh.shape)
            mm[:] = np.asarray(qh)
            mm.flush()
            del mm
            sm = np.memmap(path + ".scale", dtype=np.float32, mode="w+",
                           shape=sh.shape)
            sm[:] = np.asarray(sh)
            sm.flush()
            del sm
            return _QuantDisk(path, qh.shape, sh.shape, arr.shape[1],
                              arr.dtype)
        if self._spill_dtype is not None and arr.dtype != self._spill_dtype:
            # Compress on device before the slow d2h leg.
            arr = arr.astype(self._spill_dtype)
        host = _d2h(arr)
        mm = np.memmap(path, dtype=host.dtype, mode="w+", shape=host.shape)
        mm[:] = np.asarray(host)
        mm.flush()
        del mm
        return _DiskPanel(path, host.shape, host.dtype)

    def _store(self, j: int, arr):
        arr = jnp.asarray(arr)
        self.compute_dtype = arr.dtype
        # device_dtype compresses panels IN HBM (float16 halves the budget
        # footprint — the W store uses this: alpha is accumulated from the
        # f32 panel before it lands here, so only the variance quad sees the
        # ~5e-4 rounding).  NEVER use it for the L store: factor panels feed
        # back into later Schur complements and the entrywise rounding is
        # amplified by cond(K) into the posterior mean (measured 0.7
        # absolute on a 1024-point problem).
        if self._device_dtype is not None and arr.dtype != self._device_dtype:
            arr = arr.astype(self._device_dtype)
        size = arr.size * arr.dtype.itemsize
        on_dev = self._budget.take(size)
        with self._cv:
            self._meta[j] = (on_dev, size)
        if on_dev:
            arr = jax.block_until_ready(arr)
            if self._write_through:
                self._to_disk(j, arr)
            return arr
        if self._spill_dir is None:
            if self._spill_codec == "int16" and arr.dtype.kind == "f":
                q, s = _qpack(arr)
                return _QuantHost(_d2h(q), _d2h(s), arr.shape[1], arr.dtype)
            if self._spill_dtype is not None and arr.dtype != self._spill_dtype:
                arr = arr.astype(self._spill_dtype)
            return _d2h(arr)
        return self._to_disk(j, arr)

    def free(self, j: int) -> None:
        import os

        with self._cv:
            a = self._p.pop(j, None)
            on_dev, size = self._meta.pop(j, (False, 0))
        if on_dev:
            self._budget.give(size)
        if isinstance(a, jax.Array):
            a.delete()
            if self._write_through:
                for suffix in ("", ".scale"):
                    try:
                        os.unlink(os.path.join(
                            self._spill_dir, f"panel_{j}.bin{suffix}"))
                    except OSError:
                        pass
        elif isinstance(a, (_DiskPanel, _QuantDisk)):
            for p in ([a.path, a.path + ".scale"]
                      if isinstance(a, _QuantDisk) else [a.path]):
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def has_compressed_panels(self) -> bool:
        """True if any stored panel is NARROWER than the compute dtype.
        The configured _spill_dtype alone is not enough: a store reattached
        via open_dir with a different w_dtype still serves the panels the
        manifest records (e.g. a TRSM resumed with w_dtype=None over an
        f16-spilled prefix), and promote() pins spilled panels on device AT
        their narrow stored dtype — both must keep refusing tactile
        updates (ooc_update)."""
        cd = self.compute_dtype
        if cd is None:
            return False
        w = jnp.dtype(cd).itemsize
        with self._cv:
            return any(np.dtype(v.dtype).itemsize < w
                       for v in self._p.values())

    def put_host(self, j: int, arr) -> None:
        """Write a host array straight to the disk tier — no device round
        trip.  Checkpoint writers use this to persist panels at their
        stored dtype while keeping the on-disk format (panel naming,
        per-panel dtype metadata, manifest) owned by this class."""
        import os

        if self._spill_dir is None:
            raise ValueError("put_host needs a spill_dir-backed store")
        arr = np.asarray(arr)
        path = os.path.join(self._spill_dir, f"panel_{j}.bin")
        mm = np.memmap(path, dtype=arr.dtype, mode="w+", shape=arr.shape)
        mm[:] = arr
        mm.flush()
        del mm
        with self._cv:
            self._p[j] = _DiskPanel(path, arr.shape, arr.dtype)
            self._meta[j] = (False, 0)
            self._cv.notify_all()

    def clear(self) -> None:
        """Free every panel AND the manifest: free() unlinks panel files,
        and a manifest left behind would otherwise make a later open_dir
        claim panels that no longer exist (the resume-from-stale-manifest
        bug: a rerun skipped the whole TRSM and crashed at read time)."""
        super().clear()
        if self._spill_dir is not None:
            import os

            try:
                os.unlink(os.path.join(self._spill_dir, "manifest.json"))
            except OSError:
                pass

    def evict_all(self) -> None:
        """Move every device-resident panel to the spill tier (disk files
        when spill_dir is set).  Used by the phase-split driver to persist
        the factor across a process boundary — the axon client retains
        every h2d byte in anonymous RSS, so the 100k fit runs its
        factorization and its TRSM in SEPARATE processes, each with a
        fresh retention budget (docs/PERF.md)."""
        with self._cv:
            keys = [j for j, (od, _) in self._meta.items() if od]
        old_limit, self._budget.limit = self._budget.limit, 0
        try:
            for j in keys:
                with self._cv:
                    arr = self._p.pop(j)
                    _, size = self._meta.pop(j)
                self._budget.give(size)
                if self._write_through:
                    # The disk mirror already exists: pure metadata swap.
                    import os

                    path = os.path.join(self._spill_dir, f"panel_{j}.bin")
                    if self._spill_codec == "int16":
                        b, w = arr.shape
                        nblk = -(-w // _QBLOCK)
                        dp = _QuantDisk(path, (b, nblk * _QBLOCK), (b, nblk),
                                        w, arr.dtype)
                    else:
                        dp = _DiskPanel(path, arr.shape,
                                        self._spill_dtype or arr.dtype)
                    with self._cv:
                        self._p[j] = dp
                        self._meta[j] = (False, 0)
                        self._cv.notify_all()
                else:
                    # put() re-runs _store, which would overwrite
                    # compute_dtype with this panel's (possibly
                    # device_dtype-compressed) dtype — restore it so later
                    # fetches still widen back to the true compute dtype.
                    cd = self.compute_dtype
                    self.put(j, arr)   # limit 0 -> routes to the spill tier
                    self.compute_dtype = cd
                arr.delete()
        finally:
            self._budget.limit = old_limit

    def promote(self, limit_bonus: int = 0) -> int:
        """Move spilled panels back into HBM (serving mode) and return the
        bytes promoted.  After a fit, the factorization working set is gone
        and its headroom is idle; a long-lived query/exploration session
        re-streams every spilled panel over the ~25-55 MB/s link on EVERY
        predict call, so pinning them device-resident converts minutes-per-
        query into link-free serving.  Panels are promoted at their STORED
        dtype (an f16-spilled store stays f16 on device — same variance
        semantics, half the HBM; `_fetch` widens at read), in ascending
        panel order, until the budget (optionally raised by `limit_bonus`)
        refuses.  Disk files and manifest entries stay — durability and
        resume semantics are unchanged."""
        self._budget.limit += int(limit_bonus)
        dev = _compute_device()
        # Residency comes from the budget metadata, NOT isinstance checks:
        # host-spilled panels are CPU-device jax.Arrays on TPU (see
        # _host_device) and must still promote.
        with self._cv:
            todo = sorted(j for j, (od, _) in self._meta.items() if not od)
        promoted = 0
        for j in todo:
            with self._cv:
                v = self._p.get(j)
                od = self._meta.get(j, (True, 0))[0]
            if v is None or od:
                continue
            if isinstance(v, (_QuantDisk, _QuantHost)):
                # int16-quantized panels are an L-store feature; L is
                # consumed by the TRSM before any serving session exists,
                # so promotion never usefully sees one.  Skip rather than
                # grow a device-side (q, scale) residency mode for a path
                # with no caller.
                continue
            host = v.read() if isinstance(v, _DiskPanel) else v
            size = host.size * host.dtype.itemsize
            if not self._budget.take(size):
                break
            arr = jax.block_until_ready(_chunked_put(host, dev))
            was_disk = isinstance(v, _DiskPanel)
            with self._cv:
                self._p[j] = arr
                self._meta[j] = (True, size)
            # Disk files are NEVER unlinked here: a store reattached via
            # open_dir serves CHECKPOINT-owned panel files (utils/
            # checkpoint.py saves W under path + ".w/"), and promoting a
            # restored model must not destroy the checkpoint it came from.
            # A plain spill store may orphan its tmp files until clear();
            # that is the safe direction.
            if not was_disk and self._write_through:
                self._to_disk(j, arr)
            promoted += size
        return promoted

    def save_manifest(self) -> None:
        """Write panel metadata next to the spilled files so open_dir can
        reattach the store in another process.  Panels must be durable on
        disk: either evicted, or mirrored by write_through (where a
        device-resident panel\'s file already exists)."""
        import json
        import os

        meta = {}
        sp = self._spill_dtype
        with self._cv:
            for j, v in self._p.items():
                if isinstance(v, _QuantDisk):
                    meta[str(j)] = [list(v.shape), "int16",
                                    {"codec": "int16",
                                     "scale_shape": list(v.scale_shape),
                                     "width": v.width,
                                     "orig_dtype": str(v.orig_dtype)}]
                elif isinstance(v, _DiskPanel):
                    meta[str(j)] = [list(v.shape), str(v.dtype)]
                elif self._write_through and isinstance(v, jax.Array):
                    if self._spill_codec == "int16":
                        b, w = v.shape
                        nblk = -(-w // _QBLOCK)
                        meta[str(j)] = [[b, nblk * _QBLOCK], "int16",
                                        {"codec": "int16",
                                         "scale_shape": [b, nblk],
                                         "width": w,
                                         "orig_dtype": str(np.dtype(v.dtype))}]
                    else:
                        meta[str(j)] = [list(v.shape),
                                        str(np.dtype(sp or v.dtype))]
                else:
                    raise ValueError(f"panel {j} is not on disk; evict first")
        doc = {"panels": meta, "compute_dtype": str(np.dtype(self.compute_dtype))}
        if self.tag is not None:
            doc["tag"] = self.tag
        # Atomic replace: a kill mid-write must not truncate the manifest
        # (that would brick the resume this file exists to enable).
        path = os.path.join(self._spill_dir, "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)

    @classmethod
    def open_dir(cls, budget: "DeviceBudget", spill_dir: str,
                 expect_tag: str | None = None, **kw):
        """Reattach a store persisted by save_manifest (fresh process).

        Manifest entries whose backing panel file is missing are SKIPPED —
        clear()/free() unlink files, and a manifest written before a later
        deletion must not claim panels it can no longer serve (a blocked
        get() or FileNotFoundError at read time, depending on timing).
        With `expect_tag`, a manifest whose tag differs raises ValueError —
        the panels belong to a different problem and silently serving them
        would corrupt the posterior."""
        import json
        import os

        st = cls(budget, spill_dir=spill_dir, **kw)
        with open(os.path.join(spill_dir, "manifest.json")) as f:
            doc = json.load(f)
        if expect_tag is not None and doc.get("tag") != expect_tag:
            raise ValueError(
                f"panel store at {spill_dir} was written for a different "
                f"problem (tag {doc.get('tag')!r} != expected {expect_tag!r})"
            )
        st.tag = doc.get("tag")
        st.compute_dtype = jnp.dtype(doc["compute_dtype"])
        with st._cv:
            for j, entry in doc["panels"].items():
                shape, dt = entry[0], entry[1]
                path = os.path.join(spill_dir, f"panel_{int(j)}.bin")
                if not os.path.exists(path):
                    continue
                if len(entry) > 2 and entry[2].get("codec") == "int16":
                    if not os.path.exists(path + ".scale"):
                        continue
                    q = entry[2]
                    st._p[int(j)] = _QuantDisk(
                        path, tuple(shape), tuple(q["scale_shape"]),
                        q["width"], q["orig_dtype"])
                else:
                    st._p[int(j)] = _DiskPanel(path, tuple(shape), dt)
                st._meta[int(j)] = (False, 0)
            st._cv.notify_all()
        return st


def _warm_d2h_async() -> None:
    """Issue a tiny device->host transfer on a background thread.  The
    axon link's FIRST d2h in a process lazily initializes a reverse
    channel and can stall 5-250 s (measured); warming it concurrently
    hides the stall under compile/compute instead of serializing it in
    front of the first panel writeback."""

    def work():
        try:
            cpu = _host_device()
            if cpu is None:
                return
            z = jnp.zeros((8,), jnp.float32)
            jax.block_until_ready(jax.device_put(z, cpu))
        except Exception:
            pass

    threading.Thread(target=work, daemon=True).start()


def _compute_device():
    """The default-backend device — panel fetches target it explicitly
    (the host store holds CPU jax arrays; a bare device_put would leave
    them on CPU and drag the consuming jit off the TPU)."""
    return jax.devices()[0]


_H2D_CHUNK = int(os.environ.get("GPIS_H2D_CHUNK_MB", "16")) << 20


def _chunked_put(v, dev):
    """h2d in ~16 MB row slices + one device concat.  The axon tunnel moves
    SMALL transfers ~3x faster than panel-sized ones (measured,
    bench/link_chunk_sweep.py: one 512 MB put 17-30 MB/s vs 16 MB slices
    46-56 MB/s; parallel streams don't help; d2h shows the OPPOSITE trend,
    so writebacks stay whole).  Device-resident inputs pass through.  Peak
    HBM during a fetch is unchanged: parts+concat = 2x trimmed, which the
    pad-to-full-width step (trimmed+full) already dominates."""
    import time as _time

    if isinstance(v, jax.Array):
        try:
            if dev in v.devices():
                return v
        except Exception:
            pass
    t0 = _time.perf_counter()
    nbytes = getattr(v, "nbytes", 0)
    if _H2D_CHUNK <= 0 or nbytes <= 2 * _H2D_CHUNK or v.ndim != 2:
        out = jax.block_until_ready(jax.device_put(v, dev))
        _link_acct("h2d", nbytes, _time.perf_counter() - t0)
        return out
    host = np.asarray(v)  # zero-copy for CPU jax arrays / memmaps
    rows_per = max(1, _H2D_CHUNK // (host.shape[1] * host.dtype.itemsize))
    parts = [jax.device_put(host[r:r + rows_per], dev)
             for r in range(0, host.shape[0], rows_per)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    out = jax.block_until_ready(out)
    _link_acct("h2d", nbytes, _time.perf_counter() - t0)
    return out


def _fetch(store, j: int, dev, pad_to: int | None = None):
    """device_put a stored panel (in link-friendly chunks), restore the
    store's compute dtype (spilled panels may live in a narrower spill
    dtype), and zero-pad the trimmed panel to the full matrix width —
    every consuming kernel takes fixed (B, C) operands with TRACED
    offsets, so one compile serves every panel (per-width shapes cost
    O(nb^2) remote Mosaic compiles, measured at ~20 min for a 32k fit)."""
    v = store.get(j)
    if isinstance(v, (_QuantDisk, _QuantHost)):
        q, s = v.read()
        qd = _chunked_put(q, dev)
        sd = jax.device_put(np.asarray(s), dev)
        cd = getattr(store, "compute_dtype", None) or v.orig_dtype
        v = _qunpack(qd, sd, w=v.width, dtype=jnp.dtype(cd))
    else:
        if isinstance(v, _DiskPanel):
            v = v.read()
        v = _chunked_put(v, dev)
        cd = getattr(store, "compute_dtype", None)
        if cd is not None and v.dtype != cd:
            v = v.astype(cd)
    if pad_to is not None and v.shape[1] != pad_to:
        v = _pad_full(v, w=pad_to)
    return v


class _Prefetcher:
    """One-deep pipelined fetch: device_put of panel k+1 overlaps the GEMMs
    consuming panel k (the host<->device link is the bottleneck of the host
    store; a single background thread keeps it busy)."""

    def __init__(self, store, order, pad_to: int | None = None):
        self._store = store
        self._dev = _compute_device()
        self._order = list(order)
        self._pad_to = pad_to
        self._fut = None
        self._i = 0
        if self._order:
            self._fut = self._spawn(0)

    def _spawn(self, i):
        box = {}
        ev = threading.Event()

        def work():
            try:
                box["v"] = _fetch(self._store, self._order[i], self._dev,
                                  pad_to=self._pad_to)
            except BaseException as e:  # propagate into the consumer
                box["e"] = e
            finally:
                ev.set()

        threading.Thread(target=work, daemon=True).start()
        return (ev, box)

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self._order):
            raise StopIteration
        ev, box = self._fut
        ev.wait()
        if "e" in box:
            raise box["e"]
        k, arr = self._order[self._i], box["v"]
        self._i += 1
        self._fut = self._spawn(self._i) if self._i < len(self._order) else None
        return k, arr


class _AsyncWriter:
    """d2h writeback thread: the (B, (j+1)B) device->host copy of a finished
    panel overlaps the next panel's compute."""

    def __init__(self, store):
        self._store = store
        self._t = None
        self._err = None

    def put(self, j, dev_arr):
        self.drain()

        def work():
            try:
                self._store.put(j, dev_arr)
            except BaseException as e:
                self._err = e

        self._t = threading.Thread(target=work, daemon=True)
        self._t.start()

    def drain(self):
        if self._t is not None:
            self._t.join()
            self._t = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


# ------------------------------------------------------------ device steps


def _use_pallas_small() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _trace_enabled() -> bool:
    """GPIS_OOC_TRACE=1 prints per-panel stage timings (gram / ksteps /
    diag / writeback) with blocking synchronization — diagnostic only, it
    defeats the async overlap it measures."""
    import os

    return os.environ.get("GPIS_OOC_TRACE", "") == "1"


def _tlog(msg: str) -> None:
    import time

    print(f"[ooc {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _potrf(a, block):
    if a.shape[0] % block == 0 and (a.shape[0] // block) >= 1:
        from gpis_tpu.linalg.pallas_chol import pallas_blocked_cholesky

        return pallas_blocked_cholesky(a, block)
    return jnp.linalg.cholesky(a)


def _trinv(l, block):
    if l.shape[0] % block == 0:
        from gpis_tpu.linalg.pallas_chol import pallas_blocked_linv

        return pallas_blocked_linv(l, block)
    from gpis_tpu.linalg.cholesky import blocked_linv

    return blocked_linv(l, l.shape[0])


def _meta_triple(m):
    """(J, 7) packed joint metadata -> (coords, dirs, flag) views."""
    return m[:, :3], m[:, 3:6], m[:, 6]


@functools.partial(jax.jit, static_argnames=("name",))
def _gram_band(name, x_band, x_full, params, noise_band, row0):
    """(B, C) Gram row band, Pallas on TPU / jnp elsewhere.

    x with 7 columns is PACKED JOINT METADATA [coords | grad dir | value
    flag] (kernels.pallas_joint.joint_meta): the band becomes joint
    covariance rows with per-row observation noise on the diagonal — the
    whole factor/TRSM/alpha machinery is layout-agnostic above this
    dispatch, which is what makes the out-of-core joint fit (config 2 at
    beyond-HBM N) a data change rather than a second pipeline."""
    b, c = x_band.shape[0], x_full.shape[0]
    if x_full.shape[1] == 7:
        from gpis_tpu.kernels import pallas_joint as pj

        rmeta = _meta_triple(x_band)
        cmeta = _meta_triple(x_full)
        # The diagonal noise lands at global columns [row0, row0+B); the
        # kernels take a column-indexed noise vector.
        noise_col = lax.dynamic_update_slice(
            jnp.zeros((c,), x_band.dtype), noise_band, (row0,))
        if _use_pallas_small() and b % 256 == 0 and c % 256 == 0:
            return pj.joint_rows_pallas(name, rmeta, cmeta, params,
                                        noise_col=noise_col, row0=row0)
        return pj.joint_rows_ref(name, rmeta, cmeta, params,
                                 noise_col=noise_col, row0=row0)
    if _use_pallas_small() and b % 256 == 0 and c % 256 == 0:
        from gpis_tpu.kernels.pallas_gram import gram_band_pallas

        return gram_band_pallas(name, x_band, x_full, params, noise_band, row0)
    k_rows = kg.cross_cov(name, x_band, x_full, params)
    rows_g = row0 + lax.broadcasted_iota(jnp.int32, k_rows.shape, 0)
    cols_g = lax.broadcasted_iota(jnp.int32, k_rows.shape, 1)
    k0 = kf.k_diag0(name, params).astype(k_rows.dtype)
    return jnp.where(rows_g == cols_g, k0 + noise_band[:, None], k_rows)


def _trsm_right_blocked(s, l, *, block: int):
    """Solve X L^T = S for X, L (B, B) lower-triangular — 256-blocked
    right-looking: exact XLA trisolves on the diagonal blocks, the masked
    Pallas prefix GEMM for the trailing updates (ONE compiled kernel, c0
    traced).  This replaces `S @ L^{-T}` via an explicit Pallas inverse,
    whose bf16x3 error is amplified by cond(L) (measured 0.06 absolute on a
    512-panel sphere Gram — enough to make every later Schur complement
    indefinite).  The in-core blocked Cholesky made the same call
    (docs/PERF.md: panel solves stay on XLA trisolve)."""
    from gpis_tpu.linalg.pallas_chol import gemm_nt_masked_pallas

    r, b = s.shape
    nb = b // block
    if nb * block != b:
        return lax.linalg.triangular_solve(
            l, s, left_side=False, lower=True, transpose_a=True
        )

    def body(c, x):
        c0 = c * block
        sc = lax.dynamic_slice(s, (0, c0), (r, block))
        lrow = lax.dynamic_slice(l, (c0, 0), (block, b))
        sc = gemm_nt_masked_pallas(x, lrow, sc, c0)
        lcc = lax.dynamic_slice(l, (c0, c0), (block, block))
        xc = lax.linalg.triangular_solve(
            lcc, sc, left_side=False, lower=True, transpose_a=True
        )
        return lax.dynamic_update_slice(x, xc, (0, c0))

    return lax.fori_loop(0, nb, body, jnp.zeros_like(s))


@functools.partial(jax.jit, static_argnames=("size",))
def _dyn_rows(a, j0, *, size: int):
    """Jitted dynamic row slice — eager `x[j0:j0+B]` bakes the offset into
    the HLO, costing one remote compile per panel index."""
    return lax.dynamic_slice(
        a, (j0,) + (0,) * (a.ndim - 1), (size,) + a.shape[1:]
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _mask_cols(a, limit):
    """Zero columns at or beyond `limit` (traced).  Stored L panels must be
    exact zeros beyond their true width: the quantized trim width can exceed
    j0+B, and the substitution/TRSM steps rely on zero-pad semantics instead
    of per-column masks."""
    cols = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return a * (cols < limit).astype(a.dtype)


@jax.jit
def _diag_nan(cur, j0):
    """NaN check of the just-factored diagonal block (traced j0)."""
    b = cur.shape[0]
    d = lax.dynamic_slice(cur, (0, j0), (b, b))
    return jnp.isnan(jnp.diagonal(d)).any()


@jax.jit
def _band_logdiag(cur, j0):
    """sum(log diag L) over the band's diagonal block: local row t of the
    band is global row j0+t, so its diagonal entry sits at cur[t, j0+t].
    Feeds the exact MLL assembled from factorization byproducts
    (`OOCModel.log_marginal_likelihood`) — captured here because the L
    panels are consumed by the TRSM and never streamed again."""
    b = cur.shape[0]
    d = lax.dynamic_slice(cur, (0, j0), (b, b))
    return jnp.sum(jnp.log(jnp.diagonal(d)))


@functools.partial(jax.jit, static_argnames=("block",), donate_argnums=(0,))
def _chol_kstep(cur, lk_full, k0, *, block: int):
    """One bordering step of the current row panel against streamed panel k:
    cur[:, k0:k0+B] <- solve of (cur[:, k0:k0+B] - cur[:, :k0] @ lk[:, :k0]^T)
    against L_kk^T.  k0 is TRACED and lk arrives zero-padded to full width,
    so ONE compile serves every (j, k) pair — the earlier static-k0/trimmed
    variant compiled O(nb^2) Mosaic kernels (~20 min of the 32k cold fit).
    The masked GEMM skips both the MXU work and (index-map aliasing) the
    HBM fetch of tiles beyond k0."""
    from gpis_tpu.linalg.pallas_chol import gemm_nt_masked_pallas

    from gpis_tpu.linalg.pallas_chol import stripe_write_pallas

    p = lk_full.shape[0]
    r = cur.shape[0]  # r = sweep * p when sweep-blocked (outer rows)
    s = lax.dynamic_slice(cur, (0, k0), (r, p))
    s = gemm_nt_masked_pallas(cur, lk_full, s, k0)
    lkk = lax.dynamic_slice(lk_full, (0, k0), (p, p))
    blk = _trsm_right_blocked(s, lkk, block=block)
    # Aliased stripe write, NOT dynamic_update_slice: the dus materialized a
    # second (r, C) buffer on this backend, which OOM'd the planner's
    # sweep=10 at N=100k (see stripe_write_pallas).
    return stripe_write_pallas(cur, blk, k0)


@functools.partial(jax.jit, static_argnames=("block",), donate_argnums=(0,))
def _chol_diag(cur, j0, *, block: int):
    """Finish the row panel: factor its diagonal block (j0 traced — one
    compile serves every panel)."""
    from gpis_tpu.linalg.pallas_chol import (gemm_nt_masked_pallas,
                                             stripe_write_pallas)

    b = cur.shape[0]
    s = lax.dynamic_slice(cur, (0, j0), (b, b))
    s = gemm_nt_masked_pallas(cur, cur, s, j0)
    ld = _potrf(s, block)
    return stripe_write_pallas(cur, ld, j0)


@functools.partial(jax.jit, static_argnames=("w",))
def _pad_full(trim, *, w: int):
    return jnp.pad(trim, ((0, 0), (0, w - trim.shape[1])))


@functools.partial(jax.jit, donate_argnums=(0,))
def _trsm_kstep(u, lj_full, wk_full, k0, wk_width):
    """U += L_j[:, k0:k0+B] @ W_k over output cols < wk_width (all traced;
    U is a full-width (R, C) buffer — R = sweep * B rows when
    sweep-blocked — and W_k a zero-padded full-width (B, C) buffer).
    The masked GEMM skips output tiles beyond wk_width — trimmed FLOPs at
    one compile for every (j, k) pair."""
    from gpis_tpu.linalg.pallas_chol import gemm_nn_acc_masked_pallas

    p = wk_full.shape[0]
    r = u.shape[0]
    ljk = lax.dynamic_slice(lj_full, (0, k0), (r, p))
    return gemm_nn_acc_masked_pallas(u, ljk, wk_full, wk_width)


@functools.partial(jax.jit, static_argnames=("res",))
def _diag_block(lj_full, j0, *, res: int):
    return lax.dynamic_slice(lj_full, (0, j0), (lj_full.shape[0], res))


@functools.partial(jax.jit, static_argnames=("block",), donate_argnums=(1,))
def _trsm_finish(ljj, u, j0, *, block: int):
    """W rows = L_dd^{-1} [-U | I | 0] as a full-width (R, C) buffer (I at
    columns [j0, j0+R), zeros beyond — U's columns >= j0 are exact zeros
    by construction).  ljj is ONLY the (R, R) diagonal block, so the
    caller can free the full-width L rows before this runs — at 100k the
    earlier transposed-system form held m, m^T, x and the result
    simultaneously (~8.4 GB of HLO temps), which did not fit HBM next to
    the tiered store.  This one is a LEFT-blocked trisolve on the carry
    itself: the carry starts as M; step r contracts the solved rows above
    r0 (the diagonal-block operand is masked to columns < r0 so the raw
    rows below never pollute) and solves the 256-row block in place.
    Exact XLA trisolves on the diagonal blocks, masked Pallas GEMMs for
    the updates — the same precision call as everywhere else (an explicit
    inverse's bf16x3 error is amplified by cond, measured ||WL-I||=0.75
    at 4096)."""
    from gpis_tpu.linalg.pallas_chol import (gemm_nn_acc_masked_pallas,
                                             stripe_write_pallas)

    rows = ljj.shape[0]
    eye = jnp.eye(rows, dtype=ljj.dtype)
    m = stripe_write_pallas(-u, eye, j0)
    width = j0 + rows
    nbr = rows // block
    col_idx = jnp.arange(rows)

    def body(rblk, x):
        r0 = rblk * block
        a = lax.dynamic_slice(ljj, (r0, 0), (block, rows))
        a = a * (col_idx[None, :] < r0).astype(a.dtype)
        xr = lax.dynamic_slice(x, (r0, 0), (block, x.shape[1]))
        xr = gemm_nn_acc_masked_pallas(xr, -a, x, width)
        lrr = lax.dynamic_slice(ljj, (r0, r0), (block, block))
        xr = lax.linalg.triangular_solve(lrr, xr, left_side=True, lower=True)
        return lax.dynamic_update_slice(x, xr, (r0, 0))

    return lax.fori_loop(0, nbr, body, m)


@functools.partial(jax.jit, donate_argnums=(0,))
def _alpha_accum(alpha, wj_full, y):
    """alpha += W_j^T (W_j y) — the per-panel piece of alpha = W^T W y.
    W_j's zero pad beyond its true width makes the full-width contraction
    exact."""
    vy = _mmh(wj_full, y)
    return alpha + _mmh(vy, wj_full)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fwd_sub_step(u, lj_full, y, j0):
    """u_j = L_jj^{-1} (y_j - L_j[:, :j0] @ u[:j0]) — forward substitution
    against row panel j.  u[j0:] is still zero and L_j's columns beyond
    j0+B are zero, so the full-width GEMV needs no mask."""
    b = lj_full.shape[0]
    yj = lax.dynamic_slice(y, (j0,), (b,)) - _mmh(lj_full, u)
    ljj = lax.dynamic_slice(lj_full, (0, j0), (b, b))
    uj = lax.linalg.triangular_solve(ljj, yj[:, None], left_side=True,
                                     lower=True)[:, 0]
    return lax.dynamic_update_slice(u, uj, (j0,))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _bwd_sub_step(alpha, acc, lj_full, u, j0):
    """Descending pass of alpha = L^{-T} u: solve alpha_j from the
    accumulated tail contributions, then push panel j's columns onto acc.
    The full-width rank-1 update also writes acc[j0:j0+B] (the diagonal
    block's contribution) — harmless: the descending order never reads
    those entries again."""
    b = lj_full.shape[0]
    rhs = (lax.dynamic_slice(u, (j0,), (b,))
           - lax.dynamic_slice(acc, (j0,), (b,)))
    ljj = lax.dynamic_slice(lj_full, (0, j0), (b, b))
    aj = lax.linalg.triangular_solve(ljj, rhs[:, None], left_side=True,
                                     lower=True, transpose_a=True)[:, 0]
    alpha = lax.dynamic_update_slice(alpha, aj, (j0,))
    acc = acc + _mmh(aj[None, :], lj_full)[0]
    return alpha, acc


def _store_width(j: int, panel: int, c: int, quant: int) -> int:
    """Trim width for stored panel j: the true width j0+B rounded up to a
    multiple of `quant` panels (capped at C).  Quantizing bounds the number
    of distinct trimmed shapes — each distinct width costs one trivial
    remote XLA compile for its pad and trim ops — while keeping the store
    ~trimmed (vs full width: half the host RAM and link traffic)."""
    return min(((j + quant) // quant) * quant * panel, c)


def ooc_solve_alpha(lstore, y, *, panel: int, block: int = 256):
    """alpha = (L L^T)^{-1} y by forward + backward substitution streaming
    the f32 L panels — W never enters, so a compressed (f16) W store cannot
    pollute the posterior MEAN.  Two vector passes, O(N^2) flops."""
    y = jnp.asarray(y)
    c = y.shape[0]
    nb = c // panel
    u = jnp.zeros_like(y)
    for j, lj in _Prefetcher(lstore, range(nb), pad_to=c):
        u = _fwd_sub_step(u, lj, y, j * panel)
    alpha = jnp.zeros_like(y)
    acc = jnp.zeros_like(y)
    for j, lj in _Prefetcher(lstore, range(nb - 1, -1, -1), pad_to=c):
        alpha, acc = _bwd_sub_step(alpha, acc, lj, u, j * panel)
    return jax.block_until_ready(alpha)


def ooc_trsm(lstore, wstore, y, *, panel: int, block: int = 256,
             accumulate_alpha: bool = True, width_quant: int = 2,
             sweep: int = 1, start_panel: int = 0,
             end_panel: int | None = None, progress_cb=None,
             on_panel=None, store_final: bool = True):
    """W = L^{-1} by left-looking row panels, consuming L panels as it goes
    (L panel j is freed once W panel j is computed).  Returns alpha =
    W^T (W y) accumulated per panel — or None with accumulate_alpha=False
    (ooc_fit computes alpha by substitution instead, so a compressed W
    store cannot touch the mean).

    `sweep` processes that many consecutive W row panels per outer step,
    fetching each earlier W panel once per SWEEP instead of once per panel
    (the dominant traffic term, and on the axon link every h2d byte is
    retained in RSS — docs/PERF.md).  The intra-sweep coupling is handled
    exactly by the (R, R) diagonal-block trisolve in _trsm_finish.  Keep
    sweep <= 2 at 100k-class sizes: the u/lj working buffers scale with it
    and must fit HBM next to the device-resident tier.

    Resumability: unlike the factorization, the TRSM carries NO vector
    state between panels when accumulate_alpha=False — the complete W
    panels [0, start_panel) in `wstore` (reattached via open_dir) are the
    whole checkpoint.  `progress_cb(next_j)` fires after each sweep's W
    panels are durably stored; `end_panel` stops after panel range
    [start_panel, end_panel) for chunked runs.  A resumed run needs L
    panels [start_panel, nb) only (earlier ones were consumed)."""
    if accumulate_alpha and (start_panel or end_panel is not None):
        raise ValueError("alpha accumulation cannot run over a panel "
                         "sub-range (the partial sum would silently pose as "
                         "the full alpha); use accumulate_alpha=False "
                         "(substitution alpha)")
    if panel % block:
        # _trsm_finish's blocked trisolve has no ragged-tail fallback (its
        # fori_loop would simply skip the remainder rows, returning raw
        # unsolved W entries) — reject up front.
        raise ValueError(f"panel ({panel}) must be a multiple of "
                         f"block ({block})")
    y = jnp.asarray(y)
    c = y.shape[0]
    nb = c // panel
    nb_stop = nb if end_panel is None else min(int(end_panel), nb)
    dt = y.dtype
    alpha = jnp.zeros((c,), dt) if accumulate_alpha else None
    writer = _AsyncWriter(wstore)
    dev = _compute_device()
    trace = _trace_enabled()
    import time as _time

    j = int(start_panel)
    while j < nb_stop:
        t_start = _time.perf_counter()
        r = min(max(int(sweep), 1), nb_stop - j)
        j0 = j * panel
        rows = r * panel
        if r == 1:
            lj = _fetch(lstore, j, dev, pad_to=c)
        else:
            # Concatenate TRIMMED panels first and pad once: padding each
            # part to full width before the concat transiently held 2x the
            # full-width sweep rows (HBM headroom at 100k).  Widths within
            # a sweep group can straddle a quant boundary — pad parts to
            # the group max.
            parts = [_fetch(lstore, j + rr, dev) for rr in range(r)]
            wmax = max(p.shape[1] for p in parts)
            parts = [p if p.shape[1] == wmax else _pad_full(p, w=wmax)
                     for p in parts]
            lj = jnp.concatenate(parts)
            del parts
            if wmax != c:
                lj = _pad_full(lj, w=c)
        if trace:
            jax.block_until_ready(lj)
            t_fetch = _time.perf_counter()
        u = jnp.zeros((rows, c), dt)
        wk = None
        for k, wk in _Prefetcher(wstore, range(j), pad_to=c):
            u = _trsm_kstep(u, lj, wk, k * panel, (k + 1) * panel)
        del wk  # last padded W panel: (B, C) f32 of HBM
        if trace:
            jax.block_until_ready(u)
            t_kstep = _time.perf_counter()
            _tlog(f"trsm panel {j}..{j + r - 1}/{nb}: Lfetch "
                  f"{t_fetch - t_start:.1f}s ksteps({j}) {t_kstep - t_fetch:.1f}s")
        # Only the (R, R) diagonal block survives into the finish — free
        # the full-width L rows first (HBM headroom at 100k).
        ljj = jax.block_until_ready(_diag_block(lj, j0, res=rows))
        del lj
        writer.drain()          # previous sweep safely stored before we free
        for rr in range(r):
            lstore.free(j + rr)
        wj = _trsm_finish(ljj, u, j0, block=block)
        del u, ljj
        if accumulate_alpha:
            alpha = _alpha_accum(alpha, wj, y)
        if on_panel is not None:
            # Fused consumers (the dense-grid variance quad) see the sweep's
            # full-width W rows while they are still device-resident — the
            # post-hoc query's re-stream of spilled panels disappears.
            on_panel(j0, wj)
        jax.block_until_ready(wj)
        if trace:
            t_fin = _time.perf_counter()
        # The FINAL sweep group's panels are never re-read by this TRSM
        # (left-looking); when the caller's fused consumer replaced the
        # post-hoc query and does not need a durable W (store_final=False),
        # their writeback is pure waste on the slow d2h leg.
        if store_final or j + r < nb_stop:
            for rr in range(r):
                w = _store_width(j + rr, panel, c, width_quant)
                writer.put(j + rr,
                           _dyn_rows(wj, rr * panel, size=panel)[:, :w])
        # The trimmed slices above carry the writeback; the full-width wj
        # must not stay resident through the NEXT sweep's k-steps.
        del wj
        if trace:
            writer.drain()
            _tlog(f"trsm panel {j}..{j + r - 1}: finish "
                  f"{t_fin - t_kstep:.1f}s put {_time.perf_counter() - t_fin:.1f}s")
        j += r
        if progress_cb is not None:
            writer.drain()      # panels durable before the checkpoint says so
            progress_cb(j)
    writer.drain()
    return jax.block_until_ready(alpha) if accumulate_alpha else None


def _value_cross(name, q, x, params):
    """cov(f(q), training columns) for value (C, 3) OR packed joint (J, 7)
    column layouts — the one cross-covariance the out-of-core mean/tail
    paths need."""
    if x.shape[1] == 7:
        from gpis_tpu.kernels import pallas_joint as pj

        m = q.shape[0]
        dt = q.dtype
        rmeta = (q, jnp.zeros((m, 3), dt), jnp.ones((m,), dt))
        cmeta = _meta_triple(x)
        if _use_pallas_small() and x.shape[0] % 256 == 0:
            return pj.joint_rows_pallas(name, rmeta, cmeta, params)
        return pj.joint_rows_ref(name, rmeta, cmeta, params)
    if _use_pallas_small() and x.shape[0] % 256 == 0:
        from gpis_tpu.kernels.pallas_gram import cross_cov_pallas

        return cross_cov_pallas(name, q, x, params)
    return kg.cross_cov(name, q, x, params)


@functools.partial(jax.jit, static_argnames=("name",))
def _quad_band(name, q, x, params, w_full, row0):
    """Per-panel variance contribution ||W_j kq^T||^2 (kq generated in VMEM
    on TPU; jnp fallback elsewhere).  Columns of w_full beyond the trimmed
    width are never read on the Pallas path (tile skip); the fallback sees
    exact zeros from the pad.  x with 7 columns is joint metadata (the
    fused band kernel blends the value-query cross in VMEM)."""
    b, c = w_full.shape
    if x.shape[1] == 7:
        if (_use_pallas_small() and b % 256 == 0 and c % 256 == 0
                and q.shape[0] % 1024 == 0):
            from gpis_tpu.kernels.pallas_joint import (
                fused_joint_quad_band_pallas)

            return fused_joint_quad_band_pallas(
                name, q, _meta_triple(x), params, w_full, row0)
        kq = _value_cross(name, q, x, params)
        v = jnp.dot(w_full, kq.T, precision=lax.Precision.HIGHEST)
        return jnp.sum(v * v, axis=0)
    if (_use_pallas_small() and b % 256 == 0 and c % 256 == 0
            and q.shape[0] % 1024 == 0):
        from gpis_tpu.kernels.pallas_query import fused_quad_band_pallas

        return fused_quad_band_pallas(name, q, x, params, w_full, row0)
    kq = kg.cross_cov(name, q, x, params)
    v = jnp.dot(w_full, kq.T, precision=lax.Precision.HIGHEST)
    return jnp.sum(v * v, axis=0)


@functools.partial(jax.jit, static_argnames=("name",))
def _mean_chunk(name, q, x, params, alpha):
    return _mmh(_value_cross(name, q, x, params), alpha)


@functools.partial(jax.jit, static_argnames=("name",))
def _mean_tail_chunk(name, q, x, params, alpha, tail_x, tail_mask,
                     tail_alpha, tail_a, tail_chol):
    """Mean + tail variance correction for an updated model (one chunk).

    The core kq is materialized once and reused for BOTH the mean GEMV and
    s = kq A — the tail's share of the quadratic form: the bordered
    factor's tail rows act on a query column as Lt^{-1}(kq2 - V^T W kq1),
    and V^T W kq1 = (W^T V)^T kq1 = A^T kq1, so no second W stream is
    needed.  Unused tail slots: masked kq2 columns, zero A columns, and
    Lt's identity pad rows keep them exactly inert.  Returns (mean,
    quad_tail)."""
    kq = _value_cross(name, q, x, params)
    kq2 = kg.cross_cov(name, q, tail_x, params) * tail_mask[None, :]
    mean = _mmh(kq, alpha) + _mmh(kq2, tail_alpha)
    s = _mmh(kq, tail_a)                       # (chunk, T)
    tv = jax.scipy.linalg.solve_triangular(
        tail_chol, (kq2 - s).T, lower=True)    # (T, chunk)
    return mean, jnp.sum(tv * tv, axis=0)


# ----------------------------------------------------------------- phases


def ooc_cholesky(kernel, x, noisep, params, store, *, panel: int,
                 block: int = 256, width_quant: int = 2, sweep: int = 1,
                 y=None, start_panel: int = 0, u0=None, progress_cb=None,
                 end_panel: int | None = None, logdiag0: float = 0.0,
                 stats: dict | None = None):
    """Row-panel bordering Cholesky of K(x) + diag(noise) into `store`
    (trimmed panels at quantized widths, tail-zeroed).  Returns (ok, u):
    ok=False if the factor came back NaN (caller escalates jitter); with
    `y`, u is the forward-substitution vector L^{-1} y accumulated INLINE
    while each row band is still on device (zero extra link traffic — a
    separate ascending pass would re-stream every spilled panel, and on
    the axon link every h2d byte is also permanently retained in host RSS,
    docs/PERF.md).

    `sweep` processes that many consecutive row panels per outer step: the
    earlier stored panels are fetched once per SWEEP instead of once per
    panel, dividing the dominant re-fetch traffic (and its RSS retention)
    by the sweep factor.  The sweep's (sweep*B, sweep*B) diagonal block is
    factored in-core; stored panels stay at B-row granularity so the
    TRSM/alpha/query consumers are unchanged.

    Resumability: `start_panel`/`u0` continue a factorization whose panels
    [0, start_panel) are already in the store (a write-through tiered store
    reattached via open_dir); `progress_cb(next_j, u)` fires after each
    outer sweep is DURABLY stored (writer drained), so the caller can
    checkpoint — the shared TPU tunnel stalls for minutes at a time and a
    100k factorization must survive being killed mid-run.  `end_panel`
    stops after factoring panels [start_panel, end_panel) (chunked /
    salvage runs); the inline u then covers rows < end_panel*panel only.

    With `stats`, the running sum(log diag L) over factored panels lands in
    stats["logdiag_sum"] after every sweep (resume continuation via
    `logdiag0`) — together with u it makes the exact MLL free at fit time
    (`OOCModel.log_marginal_likelihood`); the L panels are consumed by the
    TRSM, so this is the only moment the diagonal exists on device."""
    c = x.shape[0]
    if c % panel:
        raise ValueError(f"capacity {c} must be a multiple of panel {panel}")
    nb = c // panel
    nb_stop = nb if end_panel is None else min(int(end_panel), nb)
    writer = _AsyncWriter(store)
    x = jnp.asarray(x)
    noisep = jnp.asarray(noisep, x.dtype)
    if u0 is not None:
        u = jnp.asarray(u0, x.dtype)
    else:
        u = None if y is None else jnp.zeros((c,), x.dtype)
    ld = float(logdiag0)
    trace = _trace_enabled()
    import time as _time

    j = int(start_panel)
    while j < nb_stop:
        t_start = _time.perf_counter()
        r = min(max(int(sweep), 1), nb_stop - j)
        j0 = j * panel
        rows = r * panel
        cur = _gram_band(kernel, _dyn_rows(x, j0, size=rows), x, params,
                         _dyn_rows(noisep, j0, size=rows), j0)
        if trace:
            jax.block_until_ready(cur)
            t_gram = _time.perf_counter()
        for k, lk in _Prefetcher(store, range(j), pad_to=c):
            cur = _chol_kstep(cur, lk, k * panel, block=block)
        if trace:
            jax.block_until_ready(cur)
            t_kstep = _time.perf_counter()
        cur = _chol_diag(cur, j0, block=block)
        if bool(_diag_nan(cur, j0)):
            writer.drain()
            return False, None
        cur = _mask_cols(cur, j0 + rows)
        if stats is not None:
            # The _diag_nan bool() above already synced this sweep, so the
            # scalar pull adds no pipeline stall.
            ld += float(_band_logdiag(cur, j0))
            stats["logdiag_sum"] = ld
        if u is not None:
            u = _fwd_sub_step(u, cur, y, j0)
        if trace:
            jax.block_until_ready(cur)
            t_diag = _time.perf_counter()
        for rr in range(r):
            w = _store_width(j + rr, panel, c, width_quant)
            writer.put(j + rr, _dyn_rows(cur, rr * panel, size=panel)[:, :w])
        if trace:
            writer.drain()
            t_put = _time.perf_counter()
            _tlog(f"chol panel {j}..{j + r - 1}/{nb}: gram {t_gram - t_start:.1f}s "
                  f"ksteps({j}) {t_kstep - t_gram:.1f}s diag+sub "
                  f"{t_diag - t_kstep:.1f}s put {t_put - t_diag:.1f}s")
        j += r
        if progress_cb is not None:
            writer.drain()  # everything through panel j-1 is durably stored
            progress_cb(j, None if u is None else jax.block_until_ready(u))
    writer.drain()
    return True, (None if u is None else jax.block_until_ready(u))


def ooc_alpha_backward(lstore, u, *, panel: int):
    """alpha = L^{-T} u by backward substitution, one descending pass over
    the stored f32 L panels (the forward half runs inline in
    ooc_cholesky)."""
    u = jnp.asarray(u)
    c = u.shape[0]
    nb = c // panel
    alpha = jnp.zeros_like(u)
    acc = jnp.zeros_like(u)
    for j, lj in _Prefetcher(lstore, range(nb - 1, -1, -1), pad_to=c):
        alpha, acc = _bwd_sub_step(alpha, acc, lj, u, j * panel)
    return jax.block_until_ready(alpha)


def _factor_cols(model):
    """The factor's column carrier: packed joint metadata for the joint
    model, plain coordinates for the value model."""
    meta = getattr(model, "meta", None)
    return model.x if meta is None else meta


def ooc_predict(model: "OOCModel", q, *, chunk: int = 8192):
    """Posterior (mean, var) at q (M, 3), chunked.  W panels stream once
    TOTAL: the panel loop is outermost and every chunk's quad accumulates
    per panel visit."""
    q = jnp.asarray(q, model.dtype)
    m = q.shape[0]
    cols = _factor_cols(model)
    c = cols.shape[0]
    pad = (-m) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0))) if pad else q
    chunks = [qp[i:i + chunk] for i in range(0, qp.shape[0], chunk)]

    if model.n_tail:
        cap = model.tail_v.shape[1]
        mask = (jnp.arange(cap) < model.n_tail).astype(model.dtype)
        pairs = [_mean_tail_chunk(model.kernel, ch, cols, model.params,
                                  model.alpha, model.tail_x, mask,
                                  model.tail_alpha, model.tail_a,
                                  model.tail_chol)
                 for ch in chunks]
        means = [m for m, _ in pairs]
        quads = [qt for _, qt in pairs]
    else:
        means = [_mean_chunk(model.kernel, ch, cols, model.params,
                             model.alpha)
                 for ch in chunks]
        quads = [jnp.zeros((chunk,), model.dtype) for _ in chunks]
    nb = c // model.panel
    for j, w_full in _Prefetcher(model.wstore, range(nb), pad_to=c):
        for i, ch in enumerate(chunks):
            quads[i] = quads[i] + _quad_band(
                model.kernel, ch, cols, model.params, w_full, j * model.panel
            )
        # Bound live w_full buffers to ~2 (this one + the prefetched next).
        jax.block_until_ready(quads[-1])
        del w_full
    k0 = kf.k_diag0(model.kernel, model.params).astype(model.dtype)
    mean = jnp.concatenate(means)[:m]
    # Clamp: the W-quad variance inherits W's bf16x3-recursion error, which
    # concentrates exactly where the true variance is ~0 (near data, ||v||
    # largest) and can undershoot negative; far from data kq (hence the
    # error) is small.  Clamping to [0, k0] restores the operational
    # semantics (exploration argmax, is_done thresholds) without touching
    # the accurate far-field values.
    var = jnp.clip(k0 - jnp.concatenate(quads), 0.0, k0)[:m]
    return mean, var


@dataclasses.dataclass
class OOCModel:
    """Query handle for an out-of-core fit: replicated small state on device,
    W panels in the store.

    Tactile updates (`ooc_update`) border the factor WITHOUT touching the
    panel store: the tail block lives in-core as V = W K(X, X_tail),
    A = W^T V, and the tail Schur factor Lt — see ooc_update for the
    algebra.  `u` (= L^{-1} y, accumulated free during the factorization)
    is required for updates; fits persisted before it existed load with
    u=None and reject update with guidance."""

    kernel: str
    x: jax.Array          # (C, 3)
    y: jax.Array          # (C,)
    noise: jax.Array      # (C,)
    params: dict
    alpha: jax.Array      # (C,)
    wstore: object        # PanelStore of W = L^{-1} trimmed row panels
    panel: int
    n_real: int
    u: jax.Array | None = None       # L^{-1} y from the fit
    logdiag_sum: float | None = None  # sum(log diag L), captured at fit
    alpha0: jax.Array | None = None  # pre-update core alpha (W^T u)
    n_tail: int = 0
    tail_x: jax.Array | None = None      # (T, 3)
    tail_y: jax.Array | None = None      # (T,)
    tail_noise: jax.Array | None = None  # (T,)
    tail_v: jax.Array | None = None      # V = W K(X, X_tail)     (C, T)
    tail_a: jax.Array | None = None      # A = W^T V = K^{-1} K(X, X_tail)
    tail_chol: jax.Array | None = None   # Lt, identity on unused slots
    tail_alpha: jax.Array | None = None  # (T,)

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype

    def predict(self, q, *, chunk: int = 8192):
        return ooc_predict(self, q, chunk=chunk)

    def update(self, new_x, new_y, new_noise, *, tail_capacity: int = 256):
        return ooc_update(self, new_x, new_y, new_noise,
                          tail_capacity=tail_capacity)

    def log_marginal_likelihood(self) -> float:
        """Exact log p(y | X, theta) of the factored system, assembled
        from the fit's byproducts — ||u||^2 (u = L^{-1} y) and
        sum(log diag L), both captured during the factorization — plus the
        in-core tail block for touch-updated models: O(C) work, NO W/L
        panel streaming (reference: the dense
        `gp/regression.log_marginal_likelihood`, config 3).

        Padded-row semantics mirror the dense path: the pad rows'
        0.5*log(2*pi*noise_pad) constant is removed so the value is
        comparable to a dense fit of the same points.  Note the stored
        noise includes any jitter escalation the factorization needed, so
        at high jitter this is the MLL of the regularized system.  Fits
        persisted before logdiag capture raise with guidance (like
        updates on pre-u fits)."""
        import math

        if self.u is None or self.logdiag_sum is None:
            raise ValueError(
                "this out-of-core fit predates the factorization MLL "
                "byproducts (u / logdiag_sum); refit with ooc_fit or "
                "ooc_factor_phase to enable log_marginal_likelihood"
            )
        u = jnp.asarray(self.u)
        mll = (-0.5 * float(jnp.dot(u, u)) - float(self.logdiag_sum)
               - 0.5 * u.shape[0] * math.log(2.0 * math.pi))
        # Pad rows contribute ~ -0.5*log(2*pi*noise_pad) each (y=0, cross
        # terms O(k^2/pad_noise)); remove that constant like the dense MLL.
        mll += self._mll_pad_correction()
        if self.n_tail:
            # Bordered factor [[L, 0], [V^T, Lt]]: the tail adds
            # -0.5||u_t||^2 - sum(log diag Lt) - 0.5 T log 2pi with
            # u_t = Lt^T tail_alpha (tail_alpha = Lt^{-T} u_t; unused
            # slots are exactly inert — identity diag rows, zero alpha).
            ut = jnp.dot(self.tail_chol.T, self.tail_alpha)
            mll += (-0.5 * float(jnp.dot(ut, ut))
                    - float(jnp.sum(jnp.log(jnp.diagonal(self.tail_chol))))
                    - 0.5 * self.n_tail * math.log(2.0 * math.pi))
        return mll

    def _mll_pad_correction(self) -> float:
        """Sum of the pad rows' 0.5*log(2*pi*noise) constants (value
        layout: rows [n_real, C))."""
        noise = np.asarray(self.noise)
        return float(np.sum(0.5 * np.log(2.0 * np.pi * noise[self.n_real:])))

    def promote_for_serving(self, *, reserve_bytes: int | None = None) -> int:
        """Pin spilled W panels into the HBM freed by the finished fit and
        return the bytes promoted.  Every predict/exploration call streams
        the spilled panels over the link (~25-55 MB/s — minutes per query
        batch at 100k); after promotion, queries up to the remaining
        headroom run link-free.  `reserve_bytes` is the headroom kept for
        the query working set (two zero-padded full-width panels, the
        query chunks, and the quad accumulators); default 2 panels + 1 GB.
        No-op for stores without a spill tier.  Precision is unchanged:
        panels keep their stored dtype (see TieredPanelStore.promote)."""
        prom = getattr(self.wstore, "promote", None)
        if prom is None:
            return 0
        if reserve_bytes is None:
            # alpha's length is the factor size for BOTH layouts (C for the
            # value model, J = 4C for the joint one).
            pb = self.panel * self.alpha.shape[0] * jnp.dtype(self.dtype).itemsize
            reserve_bytes = 2 * pb + 1_000_000_000
        budget = self.wstore._budget
        bonus = max(0, _device_limit() - int(reserve_bytes) - budget.limit)
        return prom(limit_bonus=bonus)


@dataclasses.dataclass
class OOCJointModel(OOCModel):
    """Out-of-core JOINT (value + gradient) model — config 2 (derivative
    observations, reference §4.1 normals path) at beyond-HBM N on one chip.

    The factor/TRSM/alpha/query machinery is shared with the value model;
    only the row assembly differs (packed joint metadata, `_gram_band`).
    Field reinterpretation vs the value OOCModel (chosen so the planner /
    projection / session contracts hold uniformly across every joint model
    type — x[:C] core coords, y[:C] value targets, `noise` value-obs
    noise):

        x      (C, 3)  core coordinates
        y      (J,)    joint targets [f(1..C) | d1 | d2 | d3], J = 4C
        noise  (C,)    value-observation noise (incl. fit jitter)
        meta   (J, 7)  packed factor-row metadata [coords | dir | flag]

    Tactile updates append VALUE-only rows through the same in-core tail
    bordering (`ooc_update`); V = W K(rows, x_new) uses the joint cross.
    """

    meta: jax.Array | None = None      # (J, 7)
    normals: jax.Array | None = None   # (C, 3) unit normals (zero pad rows)
    noise_g: jax.Array | None = None   # (C,) gradient-obs noise (incl. jitter)
    n0: int = 0                        # core capacity C

    @property
    def noise_f(self):
        """Alias matching DerivGPModel / ShardedJointModel."""
        return self.noise

    def _mll_pad_correction(self) -> float:
        """Joint layout: each padded point contributes one value row and
        three gradient rows; remove all four constants."""
        nf = np.asarray(self.noise)[self.n_real:]
        ng = np.asarray(self.noise_g)[self.n_real:]
        return float(np.sum(0.5 * np.log(2.0 * np.pi * nf))
                     + 3.0 * np.sum(0.5 * np.log(2.0 * np.pi * ng)))


def ooc_residual_check(model: OOCModel, *, n_blocks: int = 4,
                       block: int = 256, tol: float = 3e-3,
                       tol_y: float = 3e-2) -> dict:
    """Self-guarding residual probe for compressed-panel fits (VERDICT r4
    weak #4): sampled rows of the linear system the factorization claims to
    have solved,  r_S = (K + diag(noise))_S alpha - y_S,  rebuilt straight
    from the coordinates — NO panel streaming, O(n_blocks * block * C) MXU
    work (~4 band Grams + GEMVs, milliseconds at 100k).

    Why this catches the int16 stored-L codec's unsafe regimes: alpha flows
    through every decoded L panel (TRSM bands under defer_alpha,
    substitution otherwise), so a quantization error the problem cannot
    absorb lands in alpha and the residual blows up by the same factor the
    posterior mean would.  On clouds with no RMSE oracle (real scans — the
    codec's measured-UNSAFE territory is exactly non-GPIS-structured data,
    docs/PERF.md r4) this is the only end-to-end check available, which is
    why the staged driver refuses ok=true on failure (bench/ooc_staged.py).

    TWO ratios, because the codec's failure mode is backward-small but
    forward-large (quantization backward error ~LSB is ALWAYS tiny; what
    varies between regimes is the conditioning that amplifies it):

    - `rel_bw` = max_i |r_i| / scale_i with scale_i = sum_j |K_ij||a_j| +
      |y_i| — componentwise backward error, the roundoff unit of the check
      itself.  Fires on gross storage corruption (damaged panel files, bit
      flips, stale mixed-manifest panels) that no quantizer produced.
    - `rel_y`  = max_i |r_i| / ||y||_inf — the residual in OBSERVATION
      units.  r = (deltaK) alpha grows with ||alpha|| exactly when the
      conditioning does, so this ratio tracks the posterior-mean damage
      scale: the measured SAFE structured-GPIS codec runs sit ~1e-4 grade
      (mean delta 5.8e-5, docs/PERF.md r4) while the measured UNSAFE
      random-y/low-noise regime moved the mean 0.28 — four orders apart.

    ok requires rel_bw <= tol AND rel_y <= tol_y (defaults 3e-3 / 3e-2,
    each >=1.5 orders from both measured sides; calibrated numbers in
    BASELINE.md r5).

    Rows are sampled from the REAL value rows [0, n_real) (both layouts put
    them first) — padded rows carry noise ~1e10 whose scale term would
    drown the signal.  Touch tails are ignored (run the check on the fresh
    fit, before updates)."""
    dt = model.dtype
    joint = getattr(model, "meta", None) is not None
    if joint:
        from gpis_tpu.kernels import pallas_joint as pj

        cols = model.meta
        noise_full = pj._joint_noise(model.n0, model.noise, model.noise_g,
                                     None, dt)
    else:
        cols = model.x
        noise_full = model.noise
    nr = int(model.n_real)
    b = min(block, nr)
    n_blocks = max(1, min(n_blocks, nr // max(b, 1)))
    # Evenly spread, deduplicated block starts inside the real rows.
    if n_blocks == 1:
        starts = [0]
    else:
        starts = sorted({round(k * (nr - b) / (n_blocks - 1))
                         for k in range(n_blocks)})
    alpha = jnp.asarray(model.alpha)
    aabs = jnp.abs(alpha)
    # Observation scale over the WHOLE factor target (pad rows are zero so
    # the max ignores them).  Not just the sampled value rows: a config-2
    # GPIS system has f == 0 on every surface point — the signal lives in
    # the gradient rows (normals, O(1)) — and a zero denominator turned
    # rel_y into 1e31 on an exact fit (caught by the joint driver e2e).
    y_scale = float(jnp.max(jnp.abs(model.y)))
    if y_scale == 0.0:
        # All-zero targets: alpha == 0 exactly, any residual is pure
        # roundoff; unit scale keeps the ratio meaningful.
        y_scale = 1.0
    worst_abs, worst_bw = 0.0, 0.0
    for r0 in starts:
        band = _gram_band(model.kernel, cols[r0:r0 + b], cols,
                          model.params, noise_full[r0:r0 + b],
                          jnp.asarray(r0, jnp.int32))
        r = _mmh(band, alpha[:, None])[:, 0] - model.y[r0:r0 + b]
        scale = (_mmh(jnp.abs(band), aabs[:, None])[:, 0]
                 + jnp.abs(model.y[r0:r0 + b]))
        rel = jnp.abs(r) / jnp.maximum(scale, jnp.finfo(dt).tiny)
        worst_abs = max(worst_abs, float(jnp.max(jnp.abs(r))))
        worst_bw = max(worst_bw, float(jnp.max(rel)))
    rel_y = worst_abs / max(y_scale, float(jnp.finfo(dt).tiny))
    ok = worst_bw <= tol and rel_y <= tol_y
    return {"residual": worst_abs, "rel_bw": worst_bw, "rel_y": rel_y,
            "ok": bool(ok), "tol": tol, "tol_y": tol_y,
            "rows": [int(s) for s in starts], "block": int(b)}


def ooc_update(model: OOCModel, new_x, new_y, new_noise, *,
               tail_capacity: int = 256) -> OOCModel:
    """Tactile bordering update of an out-of-core fit (reference §4.5
    `cb_update`, at beyond-HBM scale).

    The bordered factor is  L_full = [[L, 0], [V^T, Lt]]  with
    V = W K(X, X_new) and Lt = chol(K_new + diag(noise) - V^T V): the panel
    store is NEVER rewritten — the tail block stays in-core ((C, T) plus
    (T, T), T = tail_capacity).  ONE streaming pass over the W panels per
    touch batch computes both V's new columns and A = W^T V's (A feeds the
    alpha correction and the query-time tail variance, where
    V^T (W kq^T) = A^T kq^T reuses the mean path's materialized kq —
    queries stay a single W stream).  Posteriors:

        u_t     = Lt^{-1} (y_tail - V^T u),     u = L^{-1} y (from the fit)
        alpha   = alpha0 - A Lt^{-T} u_t        (core rows)
        alpha_t = Lt^{-T} u_t                   (tail rows)

    Cost per batch: one W stream (the same traffic as one predict call) +
    O(C·T) GEMMs.  Overflow past tail_capacity raises — fold the touches
    into a refit at that point (session.update does).  Exact parity with
    the dense bordering tested in tests/test_outofcore.py."""
    if model.u is None:
        raise ValueError(
            "this out-of-core fit predates the stored forward-substitution "
            "vector u; refit (ooc_fit / ooc_factor_phase) to enable updates"
        )
    dt = model.dtype
    new_x = jnp.asarray(new_x, dt)
    t = int(new_x.shape[0])
    new_y = jnp.broadcast_to(jnp.asarray(new_y, dt), (t,))
    # Dtype-aware noise floor, like every in-core/sharded update path: a
    # touch that duplicates an existing observation (e.g. replayed after a
    # hyperopt refit folded it into the core) makes the tail Schur
    # complement ~ noise + O(eps) in f32 — sub-floor noise then NaNs the
    # tail Cholesky.
    floor = (4.0 * float(jnp.finfo(dt).eps) * model.alpha.shape[0]
             * abs(float(kf.k_diag0(model.kernel, model.params))))
    new_noise = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(new_noise, dt), (t,)), floor)
    # Spill-compressed W stores (w_dtype=float16) cannot support bordering:
    # W entries scale like 1/sqrt(noise) (O(1e2) here), so eps_f16 relative
    # rounding is O(1e-1) ABSOLUTE in the spilled rows — tolerable inside
    # the variance quad (squares of a relative error), but V = W K(X, X_B)
    # and A = W^T V feed the posterior-mean correction directly (measured:
    # 0.65 absolute error in A, 0.7 in the updated mean on a 1024-point
    # problem with one spilled panel).  Refuse rather than corrupt.
    sd = getattr(model.wstore, "_spill_dtype", None)
    narrow = sd is not None and jnp.dtype(sd).itemsize < jnp.dtype(dt).itemsize
    if not narrow:
        # The configured spill dtype misses panels a reattached store
        # inherited from an earlier compressed run — check what is
        # actually on disk.
        checker = getattr(model.wstore, "has_compressed_panels", None)
        narrow = bool(checker()) if checker is not None else False
    if narrow:
        raise ValueError(
            "tactile updates need the uncompressed W factor: this fit's W "
            "store holds spill-compressed panels, whose rounding is "
            "amplified into the posterior-mean correction (fine for "
            "variance-only queries).  Refit with w_dtype=None to update."
        )
    occ = int(model.n_tail)
    cap = int(tail_capacity if model.tail_v is None
              else model.tail_v.shape[1])
    if occ + t > cap:
        raise ValueError(
            f"touch tail is full ({occ}+{t} > capacity {cap}); fold the "
            f"tail into a refit (session.update does this automatically "
            f"for in-core models) or raise tail_capacity"
        )
    cols = _factor_cols(model)
    c = cols.shape[0]
    if model.tail_v is None:
        tail_x = jnp.zeros((cap, 3), dt)
        tail_y = jnp.zeros((cap,), dt)
        tail_noise = jnp.ones((cap,), dt)
        tail_v = jnp.zeros((c, cap), dt)
        tail_a = jnp.zeros((c, cap), dt)
        tail_chol = jnp.eye(cap, dtype=dt)
    else:
        tail_x, tail_y, tail_noise = model.tail_x, model.tail_y, model.tail_noise
        tail_v, tail_a, tail_chol = model.tail_v, model.tail_a, model.tail_chol
    alpha0 = model.alpha0 if model.alpha0 is not None else model.alpha

    # One pass over the W panels: rows of v_new land per panel; a_new
    # accumulates the W^T contraction of the same product.  The factor-row
    # cross K(rows, x_new) is the transpose of the value-query cross, which
    # already handles both the value and packed-joint column layouts.
    k_n = _value_cross(model.kernel, new_x, cols, model.params).T  # (C, t)
    v_rows = []
    a_new = jnp.zeros((c, t), dt)
    nb = c // model.panel
    for j, w_full in _Prefetcher(model.wstore, range(nb), pad_to=c):
        g = _mmh(w_full, k_n)            # (panel, t)
        a_new = a_new + _mmh(w_full.T, g)
        v_rows.append(g)
        # Bound live pad-to-full-width buffers to ~2 (this one + the
        # prefetched next): without the barrier, async dispatch keeps every
        # (panel, C) buffer alive until its GEMMs retire — an HBM OOM at
        # exactly the beyond-HBM scale this path exists for (same pattern
        # as ooc_predict's panel loop).
        jax.block_until_ready(a_new)
        del w_full
    v_new = jnp.concatenate(v_rows)      # (C, t)

    # Tail Schur bordering (in-core, occupied slots only — occ is host-side
    # so the slices are static).
    s22 = (kg.gram_reference(model.kernel, new_x, model.params,
                             noise=new_noise)
           - _mmh(v_new.T, v_new))
    if occ:
        lt_occ = tail_chol[:occ, :occ]
        s21 = (kg.cross_cov(model.kernel, new_x, tail_x[:occ], model.params)
               - _mmh(v_new.T, tail_v[:, :occ]))
        b21 = jax.scipy.linalg.solve_triangular(
            lt_occ, s21.T, lower=True).T                       # (t, occ)
        s22 = s22 - _mmh(b21, b21.T)
        tail_chol = tail_chol.at[occ:occ + t, :occ].set(b21)
    l22 = jnp.linalg.cholesky(s22)
    if bool(jnp.isnan(l22).any()):
        raise FloatingPointError(
            "tail bordering Cholesky produced NaN — touch noise too small "
            "for this dtype; raise noise_touch"
        )
    occ2 = occ + t
    tail_chol = tail_chol.at[occ:occ2, occ:occ2].set(l22)
    tail_x = tail_x.at[occ:occ2].set(new_x)
    tail_y = tail_y.at[occ:occ2].set(new_y)
    tail_noise = tail_noise.at[occ:occ2].set(new_noise)
    tail_v = tail_v.at[:, occ:occ2].set(v_new)
    tail_a = tail_a.at[:, occ:occ2].set(a_new)

    # Posterior weights from the bordered factor.
    lt = tail_chol[:occ2, :occ2]
    u_t = jax.scipy.linalg.solve_triangular(
        lt, tail_y[:occ2] - _mmh(tail_v[:, :occ2].T, model.u), lower=True)
    z = jax.scipy.linalg.solve_triangular(lt.T, u_t, lower=False)
    alpha_core = alpha0 - _mmh(tail_a[:, :occ2], z)
    tail_alpha = jnp.zeros((cap,), dt).at[:occ2].set(z)

    return dataclasses.replace(
        model, alpha=jax.block_until_ready(alpha_core), alpha0=alpha0,
        n_tail=occ2, tail_x=tail_x, tail_y=tail_y, tail_noise=tail_noise,
        tail_v=tail_v, tail_a=tail_a, tail_chol=tail_chol,
        tail_alpha=tail_alpha,
    )


def _device_limit(default: int = 15_500_000_000) -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats.get("bytes_limit", default))
    except Exception:
        return default


def _hbm_budget(panel: int, c: int, itemsize: int, sweep: int = 1) -> int:
    """Device bytes available to the tiered panel stores: the backend's
    reported limit minus headroom for the row-band working set — the
    (sweep*B, C) cur buffer, TWO prefetched panels in flight (the consumed
    one plus the incoming one), the zero-pad transient, the async-writer
    slice, and GEMM temps.  Sized from the 100k OOM post-mortem: a 6 GB
    budget with sweep=3 put the peak ~1 GB over the 15.48 GB chip."""
    reserve = int((sweep + 4.5) * panel * c * itemsize) + 500_000_000
    return max(_device_limit() - reserve, 0)


def plan_sweeps(c: int, panel: int, itemsize: int = 4, *,
                limit: int | None = None, w_itemsize: int | None = None,
                l_itemsize: int | None = None,
                width_quant: int = 2, max_sweep: int = 32) -> dict:
    """Pick the factor/TRSM sweep widths that minimize MODELED host->device
    refetch traffic — the term that is ~95% of the out-of-core wall-clock on
    the axon tunnel (measured: the N=100k phase-1 at panel=4096, sweep=2
    moved ~150 GB of L-panel refetches; BASELINE.md).

    Model per phase, for sweep s over nb = c/panel stored panels:

      groups start at j = 0, s, 2s, ...; each group re-fetches the stored
      prefix [0, j) EXCEPT the budget-first device-resident panels, so

          traffic(s) = sum_groups max(0, cum(j) - cum(tier(s)))

      with cum(j) the cumulative trimmed panel bytes (quantized widths,
      `_store_width`) and tier(s) the largest resident prefix under the
      phase's HBM budget:

        factor: budget(s) = limit - ((s + 4.5) B C i + 2 (s B)^2 i + 0.5 GB)
                (ONE (s*B, C) cur row band — every column-block write-back
                 is an aliased Pallas stripe write (`stripe_write_pallas`),
                 NOT a dynamic_update_slice, which materialized a second
                 full-width buffer on this backend and OOM'd sweep=10 at
                 100k (2026-08-19) — plus the in-core (sB, sB) diagonal
                 factor working set, 2 prefetched panels, the pad
                 transient, the writer slice, and GEMM temps)
        TRSM:   budget(s) = limit - ((2 s + 3.5) B C i + 2 (s B)^2 i + 0.5 GB)
                (u and the fetched L sweep rows scale with s; the finish's
                 identity embed and k-step accumulates are alias-in-place
                 Pallas calls, so no second u copy; plus the (sB, sB)
                 diagonal trisolve working set)

      Raising s divides the number of groups but shrinks the device tier
      that absorbs the hottest (earliest, narrowest) panels — the optimum
      is interior and problem-dependent; at 100k/panel=2048 the model picks
      factor s≈8 (~3x less traffic than the measured s=2/panel=4096 run).
      Spilled W panels refetch at `w_itemsize` (float16 spill compression),
      device-resident ones count at the compute itemsize.

    Returns {"factor_sweep", "factor_budget", "factor_traffic",
    "trsm_sweep", "trsm_budget", "trsm_traffic", "nb"}; budgets are the
    DeviceBudget limits consistent with the chosen s (pass them through,
    or the store's tier and the model diverge).  Ties prefer smaller s
    (smaller working set).  `limit` defaults to the live device's
    bytes_limit."""
    if limit is None:
        limit = _device_limit()
    nb = c // panel
    if nb * panel != c:
        raise ValueError(f"c ({c}) must be a multiple of panel ({panel})")
    pb = panel * c * itemsize
    pbk = [panel * _store_width(k, panel, c, width_quant) * itemsize
           for k in range(nb)]
    cum = [0]
    for b in pbk:
        cum.append(cum[-1] + b)

    def tier_panels(budget: int) -> int:
        t = 0
        while t < nb and cum[t + 1] <= budget:
            t += 1
        return t

    def traffic(s: int, budget: int, refetch_scale: float) -> float:
        t = tier_panels(budget)
        vol = 0.0
        for j in range(0, nb, s):
            vol += max(0, cum[j] - cum[min(t, j)]) * refetch_scale
        return vol

    def pick(rows_per_sweep: float, fixed_rows: float, refetch_scale: float,
             tier_scale: float = 1.0):
        slack = int(fixed_rows * pb) + 500_000_000
        best = None
        for s in range(1, min(max_sweep, nb) + 1):
            diag = 2 * (s * panel) ** 2 * itemsize
            budget = limit - int(rows_per_sweep * s * pb) - diag - slack
            if budget < 0:
                break
            # tier_scale < 1: device-resident panels stored narrower than
            # the compute dtype (W device_dtype=f16), so the same budget
            # holds 1/tier_scale more panels (cum[] is in compute bytes).
            vol = traffic(s, int(budget / tier_scale), refetch_scale)
            if best is None or vol < best[2]:
                best = (s, budget, vol)
        if best is None:  # even s=1 doesn't fit the model: degenerate safe pick
            best = (1, 0, traffic(1, 0, refetch_scale))
        return best

    # factor: reserve (s + 4.5) pb + diag;  TRSM: (2 s + 3.5) pb + diag.
    # Spilled L panels refetch at `l_itemsize` (int16 codec = 2 bytes);
    # the device tier still fills at the compute itemsize (resident panels
    # stay uncompressed), which cum[] models.
    lscale = (l_itemsize / itemsize) if l_itemsize else 1.0
    fs, fbudget, fvol = pick(1.0, 4.5, lscale)
    # W panels are f16 BOTH spilled and device-resident (device_dtype):
    # refetch and tier fill at w_itemsize.
    wscale = (w_itemsize / itemsize) if w_itemsize else 1.0
    ts, tbudget, tvol = pick(2.0, 3.5, wscale, tier_scale=wscale)
    return {"nb": nb, "factor_sweep": fs, "factor_budget": fbudget,
            "factor_traffic": int(fvol), "trsm_sweep": ts,
            "trsm_budget": tbudget, "trsm_traffic": int(tvol)}


def _pad_problem(kernel, x, y, noise, params, *, panel: int,
                 pad_noise: float, dtype=None):
    """Pad (x, y, noise) to a panel multiple with inert high-noise rows and
    normalize param dtypes; returns (xp, yp, noisep, params, c, n, jitter)."""
    x = jnp.asarray(x)
    dtype = dtype or x.dtype
    n = x.shape[0]
    c = ((n + panel - 1) // panel) * panel
    xp = jnp.zeros((c, 3), dtype).at[:n].set(x.astype(dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(jnp.asarray(y, dtype))
    np_ = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise, dtype), (n,))
    )
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    eps = float(jnp.finfo(dtype).eps)
    k0v = abs(float(kf.k_diag0(kernel, params)))
    jitter = 4.0 * eps * c * k0v
    return xp, yp, np_, params, c, n, jitter


def _make_store(kind: str, budget, spill_dtype=None, device_dtype=None,
                spill_dir=None, spill_codec=None):
    if kind == "host":
        return HostPanelStore()
    if kind == "device":
        return DevicePanelStore()
    if kind == "tiered":
        return TieredPanelStore(budget, spill_dtype=spill_dtype,
                                device_dtype=device_dtype,
                                spill_dir=spill_dir,
                                spill_codec=spill_codec)
    raise ValueError(f"unknown panel store kind {kind!r}")


def _factor_with_jitter(kernel, cols, noise_vec, params, budget, *, panel,
                        block, store, width_quant, sweep, y, jitter,
                        initial_jitter=None, max_jitter_retries=3,
                        spill_dir=None, l_codec=None):
    """The NaN-escalation jitter ladder around `ooc_cholesky`, shared by
    every one-shot factor site (value/joint fits and both stream-hyperopt
    objectives).  Returns (store, u, stats, extra); `extra` is the jitter
    baked into the factor's diagonal — callers must fold it into their
    stored noises so later tail borderings recompute K consistently with
    L/W."""
    extra = initial_jitter if initial_jitter is not None else 0.0
    for _ in range(max_jitter_retries + 1):
        st = _make_store(store, budget, spill_dir=spill_dir,
                         spill_codec=l_codec)
        stats = {}
        ok, u = ooc_cholesky(kernel, cols, noise_vec + extra, params, st,
                             panel=panel, block=block,
                             width_quant=width_quant, sweep=sweep, y=y,
                             stats=stats)
        if ok:
            return st, u, stats, extra
        st.clear()
        del st
        extra = max(extra * 10.0, jitter)
    raise FloatingPointError(
        f"out-of-core Cholesky failed even with jitter {extra:.2e}")


def ooc_fit(kernel, x, y, noise, params, *, panel: int, block: int = 256,
            store: str = "tiered", pad_noise: float = 1e10, dtype=None,
            max_jitter_retries: int = 3, initial_jitter: float | None = None,
            device_budget: int | None = None, w_dtype=None,
            width_quant: int = 2, sweep: int = 2,
            trsm_sweep: int | None = None,
            spill_dir: str | None = None, l_codec: str | None = None):
    """Out-of-core GP fit: pad to a panel multiple, factor (with the usual
    NaN-escalation jitter ladder), TRSM, alpha.  `store` = "tiered" (HBM
    until full, host spill — the default) | "host" | "device".

    `w_dtype` (e.g. jnp.float16) compresses SPILLED W = L^-1 panels for the
    slow d2h leg; alpha is solved by substitution against the f32 L store,
    so compression can only touch the posterior VARIANCE (at the ~1e-3
    level).  The L store must NOT use a narrower spill DTYPE: per-entry
    RELATIVE f16 rounding feeds back into later Schur complements amplified
    by cond(K) (measured to break the posterior mean outright).
    `l_codec="int16"` is the measured-safe alternative: blockwise int16
    with per-(row, 512-col) f32 scales bounds the ABSOLUTE perturbation at
    blockmax * 3e-5 — 2 bytes/element on the link with posterior parity at
    the 1e-5 level (docs/PERF.md round-4 measurement).  W's padded-row
    entries are ~1/sqrt(pad_noise) — small, so f16-safe.  Returns an
    OOCModel."""
    _warm_d2h_async()
    xp, yp, np_, params, c, n, jitter = _pad_problem(
        kernel, x, y, noise, params, panel=panel, pad_noise=pad_noise,
        dtype=dtype,
    )
    dtype = xp.dtype
    tsw = min(sweep, 2) if trsm_sweep is None else trsm_sweep
    budget = DeviceBudget(
        device_budget if device_budget is not None
        else _hbm_budget(panel, c, jnp.dtype(dtype).itemsize,
                         sweep=max(sweep, tsw + 1))
    )
    st, u, stats, extra = _factor_with_jitter(
        kernel, xp, np_, params, budget, panel=panel, block=block,
        store=store, width_quant=width_quant, sweep=sweep, y=yp,
        jitter=jitter, initial_jitter=initial_jitter,
        max_jitter_retries=max_jitter_retries, spill_dir=spill_dir,
        l_codec=l_codec)
    np_ = np_ + extra
    alpha = ooc_alpha_backward(st, u, panel=panel)
    # W spill-only compression: device-resident W panels stay f32 (the
    # left-looking recursion reads EARLY panels most, and they inherit L's
    # device residency one-for-one since L_j is freed right before W_j is
    # stored), so f16 rounding enters only through the rarely-reread
    # spilled tail — measured to keep the variance at the 1e-3 level where
    # a fully-f16 store compounded to ~3e-2 with negative variances.
    wstore = _make_store(store, budget, spill_dtype=w_dtype,
                         spill_dir=spill_dir)
    ooc_trsm(st, wstore, yp, panel=panel, block=block,
             accumulate_alpha=False, width_quant=width_quant, sweep=tsw)
    return OOCModel(kernel=kernel, x=xp, y=yp, noise=np_, params=params,
                    alpha=alpha, wstore=wstore, panel=panel, n_real=n,
                    u=u, logdiag_sum=stats.get("logdiag_sum"))


def _pad_joint_problem(kernel, x, y, normals, noise_f, noise_g, params, *,
                       panel: int, pad_noise: float, dtype=None):
    """Pad a normals problem to a joint-panel multiple (C to panel/4, so
    J = 4C is a panel multiple) and build the packed factor metadata.
    Returns (xp, yj, meta, nrm, nf, ng, params, c, n, jitter) — shared by
    `ooc_fit_joint` and the full-data joint hyperopt
    (gp.ooc_hyperopt.ooc_joint_mll_and_grad)."""
    from gpis_tpu.kernels import derivative as kd
    from gpis_tpu.kernels import pallas_joint as pj

    if not kf.supports_derivatives(kernel):
        raise ValueError(
            f"kernel {kernel!r} does not support derivative observations")
    if panel % 4:
        raise ValueError(
            f"joint out-of-core needs panel % 4 == 0 (J = 4C must be a "
            f"panel multiple), got {panel}")
    x = jnp.asarray(x)
    dtype = dtype or x.dtype
    n = x.shape[0]
    cq = max(panel // 4, 1)
    c = ((n + cq - 1) // cq) * cq
    xp = jnp.zeros((c, 3), dtype).at[:n].set(x.astype(dtype))
    yp = jnp.zeros((c,), dtype).at[:n].set(jnp.asarray(y, dtype))
    nrm = jnp.zeros((c, 3), dtype).at[:n].set(jnp.asarray(normals, dtype))
    nf = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_f, dtype), (n,)))
    ng = jnp.full((c,), pad_noise, dtype).at[:n].set(
        jnp.broadcast_to(jnp.asarray(noise_g, dtype), (n,)))
    params = {k: jnp.asarray(v, dtype) for k, v in params.items()}
    coords, dirs, flag = pj.joint_meta(xp)
    meta = jnp.concatenate([coords, dirs, flag[:, None]], axis=1)  # (J, 7)
    yj = kd.joint_targets(yp, nrm)                                 # (J,)
    eps = float(jnp.finfo(dtype).eps)
    jitter = 4.0 * eps * 4 * c * abs(float(kf.k_diag0(kernel, params)))
    return xp, yj, meta, nrm, nf, ng, params, c, n, jitter


def ooc_fit_joint(kernel, x, y, normals, noise_f, noise_g, params, *,
                  panel: int, block: int = 256, store: str = "tiered",
                  pad_noise: float = 1e10, dtype=None,
                  max_jitter_retries: int = 3,
                  initial_jitter: float | None = None,
                  device_budget: int | None = None, w_dtype=None,
                  width_quant: int = 2, sweep: int = 2,
                  trsm_sweep: int | None = None,
                  spill_dir: str | None = None,
                  l_codec: str | None = None) -> OOCJointModel:
    """Out-of-core JOINT (value + gradient) GP fit: config 2 at beyond-HBM
    N on one chip.  The joint system has J = 4C rows for C padded core
    points — a 25k-point cloud with normals is already a 100k-row factor —
    so the out-of-core panel machinery matters at much smaller clouds than
    the value path.  Same algorithm as `ooc_fit` (row-panel bordering
    Cholesky, panel-consuming TRSM, inline forward substitution), driven
    through the packed joint metadata `_gram_band` dispatch; the column
    layout is dimension-major [f(1..C) | d1 | d2 | d3]
    (kernels.pallas_joint.joint_meta).  Tactile touches use the in-core
    tail bordering (`ooc_update`) — no preallocated factor slots needed.
    """
    from gpis_tpu.kernels import pallas_joint as pj

    _warm_d2h_async()
    (xp, yj, meta, nrm, nf, ng, params, c, n,
     jitter) = _pad_joint_problem(kernel, x, y, normals, noise_f, noise_g,
                                  params, panel=panel, pad_noise=pad_noise,
                                  dtype=dtype)
    dtype = xp.dtype
    j_tot = 4 * c
    tsw = min(sweep, 2) if trsm_sweep is None else trsm_sweep
    budget = DeviceBudget(
        device_budget if device_budget is not None
        else _hbm_budget(panel, j_tot, jnp.dtype(dtype).itemsize,
                         sweep=max(sweep, tsw + 1))
    )
    noisej = pj._joint_noise(c, nf, ng, None, dtype)
    st, u, stats, extra = _factor_with_jitter(
        kernel, meta, noisej, params, budget, panel=panel, block=block,
        store=store, width_quant=width_quant, sweep=sweep, y=yj,
        jitter=jitter, initial_jitter=initial_jitter,
        max_jitter_retries=max_jitter_retries, spill_dir=spill_dir,
        l_codec=l_codec)
    # Fold the escalated jitter into the stored noises so tail borderings
    # recompute K consistently with L/W.
    nf = nf + extra
    ng = ng + extra
    alpha = ooc_alpha_backward(st, u, panel=panel)
    wstore = _make_store(store, budget, spill_dtype=w_dtype,
                         spill_dir=spill_dir)
    ooc_trsm(st, wstore, yj, panel=panel, block=block,
             accumulate_alpha=False, width_quant=width_quant, sweep=tsw)
    return OOCJointModel(kernel=kernel, x=xp, y=yj, noise=nf, params=params,
                         alpha=alpha, wstore=wstore, panel=panel, n_real=n,
                         u=u, logdiag_sum=stats.get("logdiag_sum"),
                         meta=meta, normals=nrm, noise_g=ng, n0=c)


# ------------------------------------------------- process-split phases


def ooc_factor_phase(kernel, x, y, noise, params, *, panel: int,
                     spill_dir: str, block: int = 256, sweep: int = 2,
                     width_quant: int = 2, pad_noise: float = 1e10,
                     dtype=None, max_jitter_retries: int = 3,
                     initial_jitter: float | None = None,
                     device_budget: int | None = None,
                     resume: bool = True, normals=None,
                     noise_g=None, l_codec: str | None = None,
                     defer_alpha: bool = False) -> None:
    """Phase 1 of the process-split out-of-core fit: factorize, solve
    alpha, persist the L store + problem state under `spill_dir`.

    Why a process split: the axon TPU client retains the host copy of
    EVERY h2d transfer in anonymous RSS (measured 1:1, never freed —
    docs/PERF.md).  A 100k fit streams more panel bytes than the box has
    RAM, but each phase alone fits; running factor and TRSM in separate
    processes resets the retention budget between them.  The factor
    crosses the boundary as disk files (np.memmap), whose pages are
    page-cache — evictable, not anonymous.

    Crash tolerance: the L store runs write-through (every panel mirrored
    to disk at put time) and a progress checkpoint (forward-sub vector u +
    next panel + jitter) lands after every durable sweep; with
    resume=True a rerun reattaches the store and continues from the last
    completed sweep instead of refactoring from scratch (the shared
    tunnel stalls for minutes and sessions get killed — a ~1 h 100k
    factorization must survive both).

    `normals` (+ `noise_g`) switches to the JOINT layout (config 2 at
    beyond-HBM J = 4C): the factor columns become packed joint metadata
    and the persisted state carries normals/noise_f/noise_g so
    `ooc_solve_phase` reconstructs an `OOCJointModel`."""
    import json
    import os

    _warm_d2h_async()
    joint = normals is not None
    if joint:
        from gpis_tpu.kernels import pallas_joint as pj

        (xp, yp, cols, nrm, nf, ng, params, c0, n,
         jitter) = _pad_joint_problem(kernel, x, y, normals, noise, noise_g,
                                      params, panel=panel,
                                      pad_noise=pad_noise, dtype=dtype)
        dtype = xp.dtype
        np_ = pj._joint_noise(c0, nf, ng, None, dtype)
        c = 4 * c0  # factor dimension
    else:
        xp, yp, np_, params, c, n, jitter = _pad_problem(
            kernel, x, y, noise, params, panel=panel, pad_noise=pad_noise,
            dtype=dtype,
        )
        dtype = xp.dtype
        cols = xp
    budget = DeviceBudget(
        device_budget if device_budget is not None
        else _hbm_budget(panel, c, jnp.dtype(dtype).itemsize, sweep=sweep)
    )
    extra = initial_jitter if initial_jitter is not None else 0.0
    ldir = os.path.join(spill_dir, "L")
    prog_path = os.path.join(spill_dir, "progress.npz")

    # The resume gate must prove the checkpointed panels came from THIS
    # Gram: same shape is not enough (a rerun with new hyperparameters or a
    # re-sampled cloud of identical size would splice panels of two
    # different matrices into one "factor").  Hash the padded problem.
    import hashlib

    h = hashlib.sha1()
    h.update(np.asarray(xp).tobytes())
    h.update(np.asarray(yp).tobytes())  # u = L^{-1} y is checkpointed too
    h.update(np.asarray(np_).tobytes())
    if joint:
        h.update(np.asarray(nrm).tobytes())
    for k in sorted(params):
        h.update(k.encode())
        h.update(np.asarray(params[k]).tobytes())
    problem_tag = h.hexdigest()

    start_panel, u0, st0, ld0 = 0, None, None, 0.0
    if resume and os.path.exists(prog_path) and os.path.exists(
            os.path.join(ldir, "manifest.json")):
        try:
            d = np.load(prog_path)
            match = (int(d["c"]) == c and int(d["panel"]) == panel
                     and str(d["kernel"]) == kernel
                     and str(d["problem"]) == problem_tag)
        except Exception:
            match = False  # corrupt/legacy checkpoint: refactor from scratch
        if match:
            start_panel = int(d["next_panel"])
            u0 = jnp.asarray(d["u"], dtype)
            extra = float(d["extra"])
            # Legacy checkpoints predate logdiag capture: a mid-run resume
            # from one has lost the prefix panels' diagonal, so the sum
            # stays invalid (None persisted) rather than silently wrong.
            ld0 = (float(d["logdiag"]) if "logdiag" in d.files
                   else (0.0 if start_panel == 0 else None))
            st0 = TieredPanelStore.open_dir(budget, ldir, write_through=True,
                                            spill_codec=l_codec)
            _tlog(f"resuming factorization at panel {start_panel} "
                  f"(jitter {extra:.1e})")

    def checkpoint(next_j, u_now):
        st_cur.save_manifest()
        # Atomic replace: a kill mid-savez must not leave a truncated
        # progress file that raises on the resume attempt.
        tmp = prog_path + ".tmp.npz"
        extra_keys = {}
        if stats.get("logdiag_sum") is not None and ld0 is not None:
            extra_keys["logdiag"] = stats["logdiag_sum"]
        np.savez(tmp, next_panel=next_j, u=np.asarray(u_now),
                 extra=extra, c=c, panel=panel, kernel=kernel,
                 problem=problem_tag, **extra_keys)
        os.replace(tmp, prog_path)

    for attempt in range(max_jitter_retries + 1):
        st_cur = st0 if st0 is not None else TieredPanelStore(
            budget, spill_dir=ldir, write_through=True, spill_codec=l_codec)
        st0 = None
        stats = {}
        ok, u = ooc_cholesky(kernel, cols, np_ + extra, params, st_cur,
                             panel=panel, block=block,
                             width_quant=width_quant, sweep=sweep, y=yp,
                             start_panel=start_panel, u0=u0,
                             progress_cb=checkpoint,
                             logdiag0=ld0 or 0.0,
                             stats=stats if ld0 is not None else None)
        if ok:
            np_ = np_ + extra
            st = st_cur
            break
        st_cur.clear()
        del st_cur
        start_panel, u0, ld0 = 0, None, 0.0  # NaN factor restarts fresh
        try:
            os.unlink(prog_path)
        except OSError:
            pass
        extra = max(extra * 10.0, jitter)
    else:
        raise FloatingPointError(
            f"out-of-core Cholesky failed even with jitter {extra:.2e}"
        )
    state = {"x": np.asarray(xp), "y": np.asarray(yp),
             "noise": np.asarray(np_),
             "u": np.asarray(u), "kernel": kernel, "panel": panel,
             "n_real": n, "block": block, "width_quant": width_quant}
    if defer_alpha and not joint:
        # alpha = W^T (W y) accumulates FOR FREE from the f32 device-
        # resident W bands during the phase-2 TRSM (ooc_trsm
        # accumulate_alpha — fit_inference-grade accuracy; the f16 W
        # SPILL never enters), so the descending alpha-backward re-stream
        # of every stored L panel (~10 GB h2d at 100k, ~400-600 s on the
        # tunnel) is skipped here.  A phase-2 crash-resume loses the
        # partial accumulation and falls back to substitution against the
        # L panels the driver restores from L_backup (ooc_solve_phase).
        pass
    else:
        state["alpha"] = np.asarray(ooc_alpha_backward(st, u, panel=panel))
    st.evict_all()
    st.save_manifest()
    if joint:
        # extra was folded uniformly into the joint diagonal; the model's
        # per-family noises fold it the same way (tail borderings must
        # recompute K consistently with L/W).
        state["normals"] = np.asarray(nrm)
        state["noise_f"] = np.asarray(nf) + extra
        state["noise_g"] = np.asarray(ng) + extra
    if stats.get("logdiag_sum") is not None:
        state["logdiag_sum"] = stats["logdiag_sum"]
    for k, v in params.items():
        state[f"param_{k}"] = np.asarray(v)
    np.savez(os.path.join(spill_dir, "state.npz"), **state)
    try:
        os.unlink(prog_path)
    except OSError:
        pass


def ooc_solve_phase(spill_dir: str, *, w_dtype=None,
                    trsm_sweep: int = 1,
                    device_budget: int | None = None,
                    resume: bool = True,
                    stop_after: int | None = None,
                    fused_query=None, keep_w: bool = True):
    """Phase 2 of the process-split fit: reattach the persisted L store,
    run the panel-consuming TRSM (W replaces L on disk), and return the
    query-ready OOCModel.  Run in a FRESH process (see ooc_factor_phase).

    Crash tolerance mirrors phase 1's: the W store runs write-through with
    a manifest saved after every durable sweep, and — the TRSM carrying no
    vector state — the contiguous W-panel prefix on disk IS the checkpoint.
    With resume=True a rerun reattaches W and continues at the first
    missing panel (the caller must restore the consumed L panels >= that
    index, e.g. from a hardlink backup — bench/ooc_staged.py does).
    `stop_after` ends the run after that many total W panels and returns
    None (chunked runs / tests); a later call finishes the job.

    `fused_query` (M, 3 coords): accumulate the dense-grid variance quad
    per sweep group WHILE each W band is still device-resident — the
    post-hoc query's re-stream of spilled W panels disappears, and with
    `keep_w=False` the final (widest, never re-read) sweep group skips its
    writeback too.  Returns (model, (mean, var)) in this mode — or
    (model, None) when a mid-TRSM resume already lost earlier bands'
    contributions and the caller must query post-hoc."""
    import os

    _warm_d2h_async()
    d = np.load(os.path.join(spill_dir, "state.npz"), allow_pickle=False)
    kernel = str(d["kernel"])
    panel = int(d["panel"])
    block = int(d["block"])
    width_quant = int(d["width_quant"])
    xp = jnp.asarray(d["x"])
    yp = jnp.asarray(d["y"])
    np_ = jnp.asarray(d["noise"])
    # defer_alpha factor phases skip the alpha-backward L re-stream; the
    # TRSM below accumulates alpha = W^T(W y) from its f32 device bands.
    alpha = jnp.asarray(d["alpha"]) if "alpha" in d.files else None
    params = {k[len("param_"):]: jnp.asarray(d[k])
              for k in d.files if k.startswith("param_")}
    u_vec = jnp.asarray(d["u"]) if "u" in d.files else None
    c = (alpha if alpha is not None else u_vec).shape[0]  # factor dim
    nb = c // panel
    budget = DeviceBudget(
        device_budget if device_budget is not None
        else _hbm_budget(panel, c, xp.dtype.itemsize, sweep=trsm_sweep + 1)
    )
    lst = TieredPanelStore.open_dir(budget, os.path.join(spill_dir, "L"))
    wdir = os.path.join(spill_dir, "W")

    # Resume gate: W panels are only valid for THIS factor.  alpha pins the
    # whole upstream problem (it changes with x, y, noise, params, jitter),
    # so a tag over the solved state proves provenance; phase 1 has the
    # same gate on its progress checkpoint.  A mismatched or file-less
    # manifest falls through to a fresh TRSM instead of silently serving
    # stale W (wrong variance) or skipping to a crash at read time.
    import hashlib

    h = hashlib.sha1()
    # u preferentially: it pins the whole upstream problem exactly like
    # alpha does, and it is STABLE across this function persisting the
    # accumulated alpha into state.npz at the end of a defer_alpha TRSM
    # (an alpha-first tag flipped after persistence and made the very W
    # store that computed the alpha look stale on reattach).
    for arr in (d["x"], d["y"], d["noise"],
                d["u"] if "u" in d.files else d["alpha"]):
        h.update(np.asarray(arr).tobytes())
    h.update(f"{kernel}:{panel}".encode())
    w_tag = h.hexdigest()

    start, wstore = 0, None
    if resume and os.path.exists(os.path.join(wdir, "manifest.json")):
        try:
            wstore = TieredPanelStore.open_dir(
                budget, wdir, expect_tag=w_tag, spill_dtype=w_dtype,
                device_dtype=w_dtype, write_through=True, tag=w_tag)
        except ValueError as e:
            _tlog(f"ignoring stale W store: {e}")
        else:
            while start in wstore:
                start += 1
            if start:
                _tlog(f"resuming TRSM at panel {start}/{nb}")
    if wstore is None:
        # device_dtype too: f16-resident W panels double the HBM tier, so
        # fewer spilled panels re-stream per sweep (plan_sweeps models the
        # tier at w_itemsize).  Same variance-only grade as the f16 spill;
        # alpha accumulates from the f32 bands before storage either way.
        wstore = TieredPanelStore(budget, spill_dtype=w_dtype,
                                  device_dtype=w_dtype,
                                  spill_dir=wdir, write_through=True,
                                  tag=w_tag)
    fused_pair = None
    if start < nb:
        # Fail fast with the fix instead of a 120 s panel-arrival timeout:
        # the TRSM consumes L panels as W replaces them, so a reattach that
        # still needs TRSM work requires those panels to be back on disk
        # (a completed run whose W store was later cleared leaves NEITHER).
        end = nb if stop_after is None else min(nb, stop_after)
        missing = [j for j in range(start, end) if j not in lst]
        if missing:
            raise FileNotFoundError(
                f"TRSM needs L panels {missing[:5]}{'...' if len(missing) > 5 else ''} "
                f"of [{start}, {end}) but they are not in the L store at "
                f"{spill_dir}/L — consumed by an earlier TRSM whose W store "
                "was cleared afterwards (bench/ooc_staged.py phase2 clears W "
                "unless OOC_KEEP_W=1). Restore the panels (phase2 re-links "
                "them from L_backup) or re-run the factor phase."
            )
        on_panel = None
        fused_ok = (fused_query is not None and start == 0
                    and stop_after is None)
        if fused_ok:
            # Column carrier: packed joint metadata when this is a joint
            # factor (normals persisted), else the padded coordinates —
            # same dispatch _quad_band uses.
            if "normals" in d.files:
                from gpis_tpu.kernels import pallas_joint as pj

                coords_j, dirs_j, flag_j = pj.joint_meta(xp)
                cols = jnp.concatenate(
                    [coords_j, dirs_j, flag_j[:, None]], axis=1)
            else:
                cols = xp
            kernel_name = kernel
            q = jnp.asarray(fused_query, xp.dtype)
            mq = q.shape[0]
            chunk = 8192
            padq = (-mq) % chunk
            qpd = jnp.pad(q, ((0, padq), (0, 0))) if padq else q
            chunks = [qpd[i:i + chunk] for i in range(0, qpd.shape[0], chunk)]
            quads = [jnp.zeros((chunk,), xp.dtype) for _ in chunks]

            def on_panel(j0, w_band):
                for i, ch in enumerate(chunks):
                    quads[i] = quads[i] + _quad_band(
                        kernel_name, ch, cols, params, w_band, j0)

        # Deferred alpha (defer_alpha factor phase): a FRESH TRSM
        # accumulates alpha = W^T(W y) from its f32 device bands for free;
        # a mid-TRSM resume lost the partial sum, so substitute against
        # the L panels the driver restored from L_backup instead.
        want_accum = alpha is None and start == 0 and stop_after is None
        if alpha is None and not want_accum:
            _tlog("deferred alpha on a resumed TRSM: substitution fallback")
            alpha = ooc_solve_alpha(lst, yp, panel=panel, block=block)
        out_alpha = ooc_trsm(
            lst, wstore, yp, panel=panel, block=block,
            accumulate_alpha=want_accum, width_quant=width_quant,
            sweep=trsm_sweep, start_panel=start, end_panel=stop_after,
            progress_cb=lambda _j: wstore.save_manifest(),
            on_panel=on_panel, store_final=keep_w or not fused_ok)
        if want_accum:
            alpha = out_alpha
            # Persist the accumulated alpha: the L panels that could
            # re-derive it by substitution were CONSUMED by this TRSM, so
            # a later reattach of the finished fit (serve, checkpoints)
            # would otherwise block forever fetching panels that no longer
            # exist — the defer_alpha serve hang the r5 e2e run caught.
            sp = os.path.join(spill_dir, "state.npz")
            merged = dict(np.load(sp, allow_pickle=False))
            merged["alpha"] = np.asarray(alpha)
            tmp = sp + ".tmp.npz"
            np.savez(tmp, **merged)
            os.replace(tmp, sp)
        if fused_ok:
            means = [_mean_chunk(kernel, ch, cols, params, alpha)
                     for ch in chunks]
            k0 = kf.k_diag0(kernel, params).astype(xp.dtype)
            mean = jnp.concatenate(means)[:mq]
            var = jnp.clip(k0 - jnp.concatenate(quads), 0.0, k0)[:mq]
            fused_pair = (jax.block_until_ready(mean),
                          jax.block_until_ready(var))
    elif fused_query is not None:
        # TRSM already complete (resumed past the end): no bands to fuse
        # into — the caller queries post-hoc through the stored W.
        fused_pair = None
    if alpha is None:
        # Deferred alpha with a TRSM that had nothing left to do (W store
        # complete from a prior run): substitution against restored L.
        # Fail fast when the panels were consumed (same guidance as the
        # TRSM reattach gate) instead of blocking on panel arrival.
        missing = [j for j in range(nb) if j not in lst]
        if missing:
            raise FileNotFoundError(
                f"deferred-alpha reattach needs L panels "
                f"{missing[:5]}{'...' if len(missing) > 5 else ''} but they "
                f"were consumed and state.npz carries no alpha — the fit "
                "predates alpha persistence (re-run phase 2, which now "
                "stores the accumulated alpha) or restore the panels from "
                "L_backup."
            )
        alpha = ooc_solve_alpha(lst, yp, panel=panel, block=block)
    if stop_after is not None and stop_after < nb:
        return None
    common = dict(kernel=kernel, x=xp, y=yp, params=params,
                  alpha=alpha, wstore=wstore, panel=panel,
                  n_real=int(d["n_real"]),
                  u=jnp.asarray(d["u"]) if "u" in d.files else None,
                  logdiag_sum=(float(d["logdiag_sum"])
                               if "logdiag_sum" in d.files else None))
    if "normals" in d.files:
        from gpis_tpu.kernels import pallas_joint as pj

        coords, dirs, flag = pj.joint_meta(xp)
        model = OOCJointModel(
            noise=jnp.asarray(d["noise_f"]),
            meta=jnp.concatenate([coords, dirs, flag[:, None]], axis=1),
            normals=jnp.asarray(d["normals"]),
            noise_g=jnp.asarray(d["noise_g"]), n0=xp.shape[0], **common,
        )
    else:
        model = OOCModel(noise=np_, **common)
    if fused_query is not None:
        return model, fused_pair
    return model

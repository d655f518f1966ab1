"""Characterize the axon tunnel's h2d/d2h rate under PANEL-STREAMING
patterns (the thing that sets the N=100k out-of-core wall-clock —
BASELINE.md round 3: ~25-35 MB/s sustained vs 1.3 GB/s single-transfer).

Hypotheses this measures, one variant each:

  ram        device_put from a RAM-resident, C-contiguous np.ndarray
  memmap     device_put DIRECTLY from a cold np.memmap (the ooc _fetch
             path): page faults interleave with wire serialization, so
             the disk sees a no-readahead demand pattern
  copy+put   np.asarray(memmap) first (bulk sequential read), then
             device_put from RAM
  chunked    RAM source, split into 128 MB device_puts re-assembled
             on device by jnp.concatenate
  overlap    prefetch thread does the memmap->RAM copy of panel k+1
             while the main thread device_puts panel k
  d2h        device_put(tpu_array, cpu_device) (the writeback path)
  h2d+gemm   upload + a consuming Pallas-free matmul per panel, forced
             via a tiny d2h (the deferred-execution trap, PERF.md rule 5)

Run:  python bench/link_patterns.py [panel_mb] [reps]
Each variant prints one line: MB/s and per-rep seconds.  Keep total
upload volume modest: the axon client retains every h2d byte in RSS.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main():
    panel_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    print(f"device={dev} panel={panel_mb} MB reps={reps}", flush=True)

    rows = 4096
    cols = panel_mb * (1 << 20) // 4 // rows
    nbytes = rows * cols * 4

    # warm the channel + compile the forcing op
    z = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(jax.device_put(z, cpu))
    force = jax.jit(lambda a: a[0, :8].sum())

    rng = np.random.default_rng(0)
    host = rng.standard_normal((rows, cols), dtype=np.float32)

    def timed(label, fn, n=reps, vol=nbytes):
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        dt = time.perf_counter() - t0
        print(f"{label:12s} {vol * n / dt / 1e6:8.1f} MB/s   "
              f"{dt / n:6.2f} s/rep   rss={rss_gb():.1f} GB", flush=True)

    # --- ram: plain device_put from RAM, forced each rep
    def ram(i):
        x = jax.device_put(host, dev)
        np.asarray(force(x))
    timed("ram", ram)

    # --- memmap: cold file each rep (write once, drop from cache via
    # direct re-read impossible without root; approximate with a file
    # larger than we re-read and posix_fadvise DONTNEED)
    paths = []
    for i in range(reps):
        p = f"/tmp/linkbench_{i}.bin"
        mm = np.memmap(p, dtype=np.float32, mode="w+", shape=(rows, cols))
        mm[:] = host
        mm.flush()
        del mm
        paths.append(p)

    def drop_cache(path):
        fd = os.open(path, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)

    for p in paths:
        drop_cache(p)

    def memmap_cold(i):
        v = np.memmap(paths[i], dtype=np.float32, mode="r", shape=(rows, cols))
        x = jax.device_put(v, dev)
        np.asarray(force(x))
    timed("memmap-cold", memmap_cold)

    for p in paths:
        drop_cache(p)

    def copy_put(i):
        v = np.memmap(paths[i], dtype=np.float32, mode="r", shape=(rows, cols))
        v = np.asarray(v)  # bulk sequential page-in with readahead
        x = jax.device_put(v, dev)
        np.asarray(force(x))
    timed("copy+put", copy_put)

    # --- memmap warm (page-cache resident)
    def memmap_warm(i):
        v = np.memmap(paths[i], dtype=np.float32, mode="r", shape=(rows, cols))
        x = jax.device_put(v, dev)
        np.asarray(force(x))
    timed("memmap-warm", memmap_warm)

    # --- chunked device_put from RAM
    chunk_rows = max(1, (128 << 20) // 4 // cols)

    def chunked(i):
        parts = [jax.device_put(host[r:r + chunk_rows], dev)
                 for r in range(0, rows, chunk_rows)]
        x = jnp.concatenate(parts)
        np.asarray(force(x))
    timed("chunked", chunked)

    # --- overlap: prefetch thread copies memmap->RAM for rep k+1
    for p in paths:
        drop_cache(p)
    box = {}

    def pre(i):
        v = np.memmap(paths[i], dtype=np.float32, mode="r", shape=(rows, cols))
        box[i] = np.asarray(v)

    def overlap(i):
        t = None
        if i + 1 < reps:
            t = threading.Thread(target=pre, args=(i + 1,))
            t.start()
        v = box.pop(i, None)
        if v is None:
            pre(i)
            v = box.pop(i)
        x = jax.device_put(v, dev)
        np.asarray(force(x))
        if t is not None:
            t.join()
    timed("overlap", overlap)

    # --- d2h writeback path
    xdev = jax.block_until_ready(jax.device_put(host, dev))

    def d2h(i):
        jax.block_until_ready(jax.device_put(xdev, cpu))
    timed("d2h", d2h)

    # --- h2d + consuming GEMM, forced (the real per-panel shape)
    resident = jax.block_until_ready(
        jnp.asarray(rng.standard_normal((rows, rows), dtype=np.float32)))
    gemm = jax.jit(lambda a, b: (b @ a)[0, :8].sum())

    def h2d_gemm(i):
        x = jax.device_put(host, dev)
        np.asarray(gemm(x, resident))
    timed("h2d+gemm", h2d_gemm)

    for p in paths:
        os.unlink(p)


if __name__ == "__main__":
    main()

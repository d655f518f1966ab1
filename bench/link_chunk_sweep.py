"""Follow-up to link_patterns.py: the chunked variant (128 MB pieces) beat
a single 512 MB device_put 26.9 vs 17.1 MB/s — sweep the chunk size and
test parallel streams to find the tunnel's sweet spot.  The winner gets
wired into outofcore._fetch (the N=100k wall-clock is ~95% this link).

Run:  python bench/link_chunk_sweep.py [panel_mb] [reps]
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    panel_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev} panel={panel_mb} MB reps={reps}", flush=True)

    rows = 4096
    cols = panel_mb * (1 << 20) // 4 // rows
    nbytes = rows * cols * 4
    rng = np.random.default_rng(0)
    host = rng.standard_normal((rows, cols), dtype=np.float32)
    force = jax.jit(lambda a: a[0, :8].sum())
    np.asarray(force(jax.device_put(jnp.zeros((8, 8)), dev)))  # warm

    def timed(label, fn, n=reps, vol=nbytes):
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        dt = time.perf_counter() - t0
        print(f"{label:16s} {vol * n / dt / 1e6:8.1f} MB/s   "
              f"{dt / n:6.2f} s/rep", flush=True)

    # --- chunk-size sweep (sequential device_puts, device concat)
    for mb in (16, 32, 64, 128, 256):
        chunk_rows = max(1, (mb << 20) // 4 // cols)

        def chunked(i, cr=chunk_rows):
            parts = [jax.device_put(host[r:r + cr], dev)
                     for r in range(0, rows, cr)]
            x = jnp.concatenate(parts)
            np.asarray(force(x))
        timed(f"seq-{mb}MB", chunked)

    # --- parallel streams: T threads each device_put their own chunk
    for mb, nthreads in ((64, 2), (64, 4), (128, 2), (128, 4), (32, 4)):
        chunk_rows = max(1, (mb << 20) // 4 // cols)
        starts = list(range(0, rows, chunk_rows))

        def par(i, cr=chunk_rows, st=starts, nt=nthreads):
            out = [None] * len(st)

            def work(t):
                for k in range(t, len(st), nt):
                    out[k] = jax.device_put(host[st[k]:st[k] + cr], dev)

            ts = [threading.Thread(target=work, args=(t,)) for t in range(nt)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            x = jnp.concatenate(out)
            np.asarray(force(x))
        timed(f"par-{mb}MBx{nthreads}", par)


if __name__ == "__main__":
    main()

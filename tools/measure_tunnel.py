"""Microbenchmark of the host<->TPU transfer path (axon tunnel).

Measures H2D/D2H bandwidth vs buffer size and D2H concurrency scaling to
inform pipeline transfer-shape decisions (see IMPLEMENTATION.md "Where the
time goes").  Uses device_put/device_get only - no compiled programs, so no
TPU program-load lottery.  Run on an idle host.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    sizes = [1 << 20, 4 << 20, 16 << 20, 64 << 20]
    reps = 3
    results = {}

    for sz in sizes:
        # fresh random bytes each rep (defeat any caching/CSE)
        h2d, d2h = [], []
        bufs = []
        for r in range(reps):
            a = np.random.randint(0, 255, sz, np.uint8)
            t0 = time.perf_counter()
            d = jax.device_put(a, dev)
            d.block_until_ready()
            h2d.append(sz / (time.perf_counter() - t0) / 1e6)
            bufs.append(d)
        for d in bufs:
            t0 = time.perf_counter()
            _ = np.asarray(d)
            d2h.append(sz / (time.perf_counter() - t0) / 1e6)
        results[sz] = (h2d, d2h)
        print("size %4d MB  H2D %s MB/s  D2H %s MB/s" % (
            sz >> 20,
            ["%.1f" % x for x in h2d],
            ["%.1f" % x for x in d2h]), file=sys.stderr)

    # concurrency scaling: fetch N x 2MB in parallel threads
    sz = 2 << 20
    for nthreads in (1, 2, 4):
        bufs = [jax.device_put(np.random.randint(0, 255, sz, np.uint8), dev)
                for _ in range(4)]
        for b in bufs:
            b.block_until_ready()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            list(ex.map(np.asarray, bufs))
        dt = time.perf_counter() - t0
        print("D2H 4x%dMB with %d threads: %.2fs aggregate %.1f MB/s"
              % (sz >> 20, nthreads, dt, 4 * sz / dt / 1e6), file=sys.stderr)

    # per-buffer latency: tiny fetches
    tiny = [jax.device_put(np.zeros(128, np.uint8), dev) for _ in range(20)]
    for b in tiny:
        b.block_until_ready()
    t0 = time.perf_counter()
    for b in tiny:
        np.asarray(b)
    print("tiny-fetch latency: %.2f ms/buffer"
          % ((time.perf_counter() - t0) / len(tiny) * 1e3), file=sys.stderr)


if __name__ == "__main__":
    main()

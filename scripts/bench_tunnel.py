"""Micro-benchmark the host<->TPU transfer tunnel.

Times device_put (upload) and np.asarray / copy_to_host_async (download)
at several payload sizes, sequentially and with both directions in flight,
to find the scheduling that maximises effective link rate for the batched
swap pipeline (pipelines/face_swap.py swap_batch).

Usage: JAX_PLATFORMS=tpu,cpu python scripts/bench_tunnel.py
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import threading
import time

import jax
import numpy as np


def _mb(nbytes: int) -> float:
    return nbytes / 1e6


def time_upload(arr: np.ndarray, iters: int = 4) -> float:
    """Median effective MB/s for a blocking upload (device_put + ready)."""
    rates = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        d.block_until_ready()
        dt = time.perf_counter() - t0
        rates.append(_mb(arr.nbytes) / dt)
        del d
    return float(np.median(rates))


def time_download(arr: np.ndarray, iters: int = 4) -> float:
    d = jax.device_put(arr)
    d.block_until_ready()
    rates = []
    for _ in range(iters):
        t0 = time.perf_counter()
        h = np.asarray(d)
        dt = time.perf_counter() - t0
        rates.append(_mb(h.nbytes) / dt)
    return float(np.median(rates))


def time_duplex(arr: np.ndarray, iters: int = 4):
    """Upload thread + download thread running concurrently."""
    d0 = jax.device_put(arr)
    d0.block_until_ready()
    res = {}

    def up():
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.device_put(arr).block_until_ready()
        res["up"] = _mb(arr.nbytes) * iters / (time.perf_counter() - t0)

    def down():
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(d0)
        res["down"] = _mb(arr.nbytes) * iters / (time.perf_counter() - t0)

    tu = threading.Thread(target=up)
    td = threading.Thread(target=down)
    t0 = time.perf_counter()
    tu.start(); td.start(); tu.join(); td.join()
    wall = time.perf_counter() - t0
    res["combined"] = 2 * _mb(arr.nbytes) * iters / wall
    return res


def time_async_download(arr: np.ndarray, n: int = 4):
    """n buffers: issue copy_to_host_async on all, then np.asarray each —
    does the runtime pipeline the fetches?"""
    devs = [jax.device_put(arr) for _ in range(n)]
    for d in devs:
        d.block_until_ready()
    t0 = time.perf_counter()
    for d in devs:
        try:
            d.copy_to_host_async()
        except Exception:
            pass
    outs = [np.asarray(d) for d in devs]
    dt = time.perf_counter() - t0
    return _mb(arr.nbytes) * n / dt, outs[0].shape


def time_parallel_downloads(arr: np.ndarray, nthreads: int = 2, iters: int = 4):
    """Multiple downloader threads pulling distinct buffers concurrently."""
    devs = [jax.device_put(arr) for _ in range(nthreads * iters)]
    for d in devs:
        d.block_until_ready()

    def pull(lo):
        for d in devs[lo * iters:(lo + 1) * iters]:
            np.asarray(d)

    ts = [threading.Thread(target=pull, args=(i,)) for i in range(nthreads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    return _mb(arr.nbytes) * nthreads * iters / wall


def main():
    rng = np.random.RandomState(0)
    print(json.dumps({"devices": str(jax.devices())}))
    for mb in (3, 12, 25, 50):
        n = int(mb * 1e6)
        arr = rng.randint(0, 256, (n,), dtype=np.uint8).reshape(-1)
        up = time_upload(arr)
        down = time_download(arr)
        duplex = time_duplex(arr)
        async_down, _ = time_async_download(arr)
        par2 = time_parallel_downloads(arr, 2)
        print(json.dumps({
            "payload_mb": mb,
            "upload_MBps": round(up, 1),
            "download_MBps": round(down, 1),
            "duplex": {k: round(v, 1) for k, v in duplex.items()},
            "async_download_MBps": round(async_down, 1),
            "parallel2_download_MBps": round(par2, 1),
        }))


if __name__ == "__main__":
    main()

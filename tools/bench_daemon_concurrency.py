"""Measure daemon search latency/throughput under concurrent clients.

The serving daemon micro-batches concurrent searches into one device
dispatch (cli/serve.py, VERDICT r3 item 9). This bench starts an
embeddings-only daemon over an SQ8 GalleryIndex at serving scale on the
real chip, then drives M single-probe searches first from ONE persistent
client (the no-contention baseline — batching never engages) and then
from C concurrent clients, reporting per-request latency and aggregate
throughput plus the daemon's own dispatch counters.

Usage: python tools/bench_daemon_concurrency.py [--rows 131072] [--dim 512]
           [--clients 4] [--requests 64]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=300)
        self.rfile = self.sock.makefile("r")

    def request(self, obj) -> dict:
        self.sock.sendall((json.dumps(obj) + "\n").encode())
        return json.loads(self.rfile.readline())

    def close(self):
        self.rfile.close()
        self.sock.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 17)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=64,
                    help="single-probe searches per phase (split over clients)")
    args = ap.parse_args()

    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from daliid_tpu.cli import serve as serve_cli

    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(args.rows, args.dim)).astype(np.float32)
    probes = rng.normal(size=(args.requests, args.dim)).astype(np.float32)

    sargs = serve_cli.build_argparser().parse_args(
        ["--port", "0", "--index_quantize", "int8"]
    )
    server = serve_cli.make_server(sargs, extractor=None)
    thread = threading.Thread(target=server.serve_forever,
                              kwargs={"poll_interval": 0.05}, daemon=True)
    thread.start()
    port = server.server_address[1]

    boot = Client(port)
    for i in range(0, args.rows, 1 << 15):  # chunked enroll (JSON size)
        blk = gallery[i: i + (1 << 15)]
        r = boot.request({"op": "enroll", "embeddings": blk.tolist(),
                          "pids": list(range(i, i + len(blk)))})
        assert r["ok"], r
    # warm the jitted search (first dispatch compiles)
    assert boot.request({"op": "search", "embeddings": probes[:1].tolist(),
                         "topk": 10})["ok"]
    base_stats = boot.request({"op": "stats"})

    def run_phase(n_clients):
        clients = [Client(port) for _ in range(n_clients)]
        lat = []
        lock = threading.Lock()

        def worker(ci):
            c = clients[ci]
            for i in range(ci, args.requests, n_clients):
                t0 = time.perf_counter()
                r = c.request({"op": "search",
                               "embeddings": probes[i:i + 1].tolist(),
                               "topk": 10})
                dt = (time.perf_counter() - t0) * 1e3
                assert r["ok"], r
                with lock:
                    lat.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=worker, args=(ci,))
                   for ci in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        for c in clients:
            c.close()
        lat = np.sort(np.asarray(lat))
        return dict(
            mean_ms=float(lat.mean()),
            p50_ms=float(lat[len(lat) // 2]),
            p95_ms=float(lat[int(len(lat) * 0.95)]),
            rps=args.requests / wall,
        )

    seq = run_phase(1)
    mid = boot.request({"op": "stats"})
    con = run_phase(args.clients)
    end = boot.request({"op": "stats"})
    boot.request({"op": "shutdown"})
    boot.close()
    server.server_close()

    d_seq = mid["search_dispatches"] - base_stats["search_dispatches"]
    d_con = end["search_dispatches"] - mid["search_dispatches"]
    print(f"gallery {args.rows}x{args.dim} int8 | {args.requests} single-probe searches")
    print(f"1 client : mean {seq['mean_ms']:.2f} ms  p95 {seq['p95_ms']:.2f} ms  "
          f"{seq['rps']:.1f} req/s  ({d_seq} dispatches)")
    print(f"{args.clients} clients: mean {con['mean_ms']:.2f} ms  p95 {con['p95_ms']:.2f} ms  "
          f"{con['rps']:.1f} req/s  ({d_con} dispatches, "
          f"{args.requests / max(d_con, 1):.1f} req/dispatch)")
    print(f"throughput gain {con['rps'] / seq['rps']:.2f}x")


if __name__ == "__main__":
    main()

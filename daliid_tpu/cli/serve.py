"""Persistent identification service: a TCP daemon over the serving index.

The reference's deployment story stops at batch scripts (``evaluate.py``
re-extracts the gallery on every invocation); the actual serving shape —
a long-lived device-resident gallery with incremental enrollment and
probe queries — is exactly :class:`~daliid_tpu.eval.matcher.GalleryIndex`'s
API. This daemon keeps one extractor + one index alive and exposes them
over a newline-delimited-JSON TCP protocol, so enrollment churn reuses the
jitted search program and the compiled model forward across requests
(amortizing the expensive first compile), and non-Python clients can drive
the service with a plain socket.

Protocol — one JSON object per line, one JSON response line per request::

    {"op": "enroll", "paths": [...], "pids": [...]}        embed + add
    {"op": "enroll", "embeddings": [[...]], "pids": [...]} pre-computed
    {"op": "search", "paths": [...], "topk": 5}
    {"op": "search", "embeddings": [[...]], "topk": 5}
    {"op": "search", ..., "rerank": true, "rerank_depth": 64}  k-reciprocal
    {"op": "remove", "pids": [...]}                        drop identities
    {"op": "stats"}                                        index/model info
    {"op": "save", "path": "..."} / {"op": "load", "path": "..."}
    {"op": "shutdown"}

Responses are ``{"ok": true, ...}`` or ``{"ok": false, "error": "..."}``
(a failed request never kills the daemon). Connections are concurrent
(one handler thread each, so a client holding a persistent connection
never starves the rest); mutating requests serialize on one lock — there
is one device and one jit context. **Concurrent searches micro-batch**:
while one dispatch holds the device, arriving search requests queue, and
the next leader thread drains the whole queue into ONE
``GalleryIndex.search`` call (probes concatenated, depth = the group
max), splitting results per request — amortizing the ~3-RTT dispatch
cost of a tunnel/PCIe hop across clients (BENCH.md §serving). No wait
timer: batches form exactly when there is contention, single clients
keep single-request latency.

Trust model: binds 127.0.0.1 by default; the protocol is unauthenticated
by design (same stance as a local inference socket) — front it with your
deployment's ingress if it must leave the host. ``--data_dir`` jails the
save/load ops' filesystem reach to one directory for untrusted local
clients. Enroll requests must carry ``pids`` iff the index tracks pids
(decided by the first enroll / the warm-start file).

Scope: the daemon serves one host's chips (its mesh = the local devices).
Multi-host galleries (sharded across hosts via ``put_global``,
``tests/test_distributed.py::test_two_process_gallery_search``) are an
SPMD library flow — every process must issue identical GalleryIndex calls
— which a TCP request stream cannot guarantee; shard the identity space
across per-host daemons instead.

Usage::

    python -m daliid_tpu serve --model_name resnet50 --model_path w.npz \
        --port 7788 --index_quantize int8 &
    printf '%s\n' '{"op":"stats"}' | nc 127.0.0.1 7788
"""

from __future__ import annotations

import argparse
import json
import socketserver
import threading

import numpy as np

from daliid_tpu.eval.matcher import GalleryIndex, serving_embedding


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU identification daemon")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7788, help="0 = ephemeral (port is printed)")
    p.add_argument("--model_name", type=str, default="resnet50")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument(
        "--quantize", type=str, default=None, choices=["int8"],
        help="int8 post-training quantization for the extraction forward",
    )
    p.add_argument(
        "--calib_batches", type=int, default=1,
        help="int8 calibration spans the first N extract batches "
             "(running absmax)",
    )
    p.add_argument(
        "--index_quantize", type=str, default=None, choices=["int8", "off"],
        help="'int8' stores the device gallery as per-row symmetric int8 "
             "(4x identities per chip of HBM, MXU double-rate scoring); "
             "'off' forces f32 when --load_index carries a saved int8 mode; "
             "default keeps the saved mode (f32 for fresh galleries)",
    )
    p.add_argument("--topk", type=int, default=10, help="default result depth")
    p.add_argument("--load_index", type=str, default=None, help="warm-start gallery .npz")
    p.add_argument(
        "--data_dir", type=str, default=None,
        help="jail for the save/load ops: request paths must resolve "
             "(realpath) under this directory. Unset = any path the daemon's "
             "uid can touch (the documented 127.0.0.1 trust model); set it "
             "when fronting untrusted local clients",
    )
    return p


class IdentificationService:
    """The op dispatcher; transport-agnostic (the TCP layer below and the
    in-process tests both drive :meth:`handle`)."""

    def __init__(self, extractor, index: GalleryIndex | None, topk: int = 10,
                 index_quantize: str | None = None, model_name: str | None = None,
                 quantize_flag: str | None = None, data_dir: str | None = None):
        self.extractor = extractor
        self.index = index
        self.topk = topk
        self.index_quantize = index_quantize
        self.data_dir = data_dir
        # the operator's literal --index_quantize value (None = unset):
        # distinguishes "no preference, follow saved modes" from an explicit
        # override that runtime {"op": "load"} must also honor
        self._quantize_flag = quantize_flag
        self.model_name = model_name
        self.shutdown_requested = False
        # one device, one jit context: requests serialize here while
        # connections stay concurrent (_Server is a ThreadingTCPServer)
        self._lock = threading.Lock()
        # search micro-batching: entries queue here while the device is
        # busy; the next thread to win _lock serves the whole queue in one
        # index.search dispatch
        self._pending: list = []
        self._pending_lock = threading.Lock()
        self._counters = {
            "requests": 0, "errors": 0, "busy_ms": 0.0,
            "search_requests": 0, "search_dispatches": 0,
        }

    # -- helpers ---------------------------------------------------------
    def _embed(self, req: dict) -> np.ndarray:
        if ("paths" in req) == ("embeddings" in req):
            raise ValueError("provide exactly one of 'paths' or 'embeddings'")
        if "paths" in req:
            if self.extractor is None:
                raise ValueError("daemon started without a model; send 'embeddings'")
            # multi-head models (dual / multipart / JPM) concat to one
            # serving vector — the concat fusion protocol (eval/matcher.py)
            return serving_embedding(self.extractor.extract([str(p) for p in req["paths"]]))
        fvs = np.asarray(req["embeddings"], np.float32)
        if fvs.ndim != 2:
            raise ValueError(f"embeddings must be 2-D, got shape {fvs.shape}")
        return fvs

    # -- ops -------------------------------------------------------------
    def handle(self, req: dict) -> dict:
        import time

        try:
            op = req.get("op")
            fn = getattr(self, f"_op_{op}", None)
            if op is None or fn is None:
                raise ValueError(f"unknown op {op!r}")
            if op == "search":
                # searches micro-batch: they manage the device lock
                # themselves (queue → leader drains → one dispatch)
                return self._search_batched(req)
            with self._lock:
                self._counters["requests"] += 1
                t0 = time.monotonic()
                try:
                    return {"ok": True, **fn(req)}
                finally:
                    self._counters["busy_ms"] += (time.monotonic() - t0) * 1e3
        except Exception as exc:  # a bad request must never kill the daemon
            with self._lock:  # re-acquired: fn's unwind released it
                self._counters["errors"] += 1
            return {"ok": False, "error": f"{type(exc).__name__}: {exc}"}

    def _op_enroll(self, req: dict) -> dict:
        fvs = self._embed(req)
        pids = req.get("pids")
        if pids is not None and len(pids) != len(fvs):
            raise ValueError(f"{len(pids)} pids for {len(fvs)} embeddings")
        if self.index is None:
            # the first enroll decides whether this index tracks pids
            self.index = GalleryIndex(
                fvs,
                gallery_pids=np.asarray(pids) if pids is not None else None,
                quantize=self.index_quantize,
            )
        elif self.index.gallery_pids is None:
            # a pid-less index (bare-embeddings .npz warm start, or a first
            # enroll without pids) cannot grow a pid table mid-flight
            if pids is not None:
                raise ValueError("this index does not track pids; omit 'pids'")
            self.index.add(fvs)
        else:
            # mirror of the pid-less branch: silently assigning a sentinel
            # here would collapse distinct identities onto one pid and let a
            # later remove retire all of them at once (review finding)
            if pids is None:
                raise ValueError("this index tracks pids; 'pids' is required")
            self.index.add(fvs, np.asarray(pids))
        return {"enrolled": int(len(fvs)), "num_gallery": int(self.index.num_gallery)}

    # handle() routes "search" to the batching path below; this stub keeps
    # the op table honest for unknown-op detection
    _op_search = True

    # -- search micro-batching --------------------------------------------
    def _search_batched(self, req: dict) -> dict:
        """Queue the request; whichever waiting thread next wins the device
        lock serves the WHOLE queue in one ``index.search`` (grouped by
        rerank settings, probes concatenated, k = group max, results split
        back per request). No wait timer: batches form exactly under
        contention. Correctness: mutating ops (enroll/remove/load) hold the
        same lock, so a batch never interleaves with an index mutation;
        per-entry failures (bad dims, empty gallery) error only their own
        response."""
        entry = {"req": req, "event": threading.Event(), "result": None}
        with self._pending_lock:
            self._pending.append(entry)
        while not entry["event"].is_set():
            if not self._lock.acquire(timeout=0.05):
                continue
            try:
                with self._pending_lock:
                    batch, self._pending = self._pending, []
                if batch:
                    self._serve_search_batch(batch)
            finally:
                self._lock.release()
        return entry["result"]

    def _serve_search_batch(self, batch: list) -> None:
        import time

        t0 = time.monotonic()
        self._counters["requests"] += len(batch)
        self._counters["search_requests"] += len(batch)

        def fail(e, exc):
            self._counters["errors"] += 1
            e["result"] = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
            e["event"].set()

        groups: dict = {}
        for e in batch:
            try:
                if self.index is None or self.index.num_gallery == 0:
                    raise ValueError("gallery is empty — enroll first")
                fvs = self._embed(e["req"])
                if fvs.shape[1] != self.index._host_buf.shape[1]:
                    raise ValueError(
                        f"probe dim {fvs.shape[1]} != index dim "
                        f"{self.index._host_buf.shape[1]}"
                    )
                k = int(e["req"].get("topk", self.topk))
                # plain searches are exact, so a larger shared k is
                # prefix-identical per request and any mix can share one
                # dispatch at k_max. Reranked results DEPEND on shortlist
                # depth (k-reciprocal neighbor sets change with the
                # candidate set), so rerank requests group only on an
                # identical (depth, k) — a response must not change with
                # whatever else happened to be in flight
                if e["req"].get("rerank", False):
                    key = (True, int(e["req"].get("rerank_depth", 64)), k)
                else:
                    key = (False, 0, 0)
                groups.setdefault(key, []).append((e, fvs, k))
            except Exception as exc:
                fail(e, exc)
        for (rerank, depth, _), entries in groups.items():
            try:
                probes = np.concatenate([fvs for _, fvs, _ in entries])
                k_max = max(k for _, _, k in entries)
                sims, ids, pids = self.index.search(
                    probes, k=k_max, rerank=rerank,
                    rerank_depth=depth if rerank else 64,
                )
                self._counters["search_dispatches"] += 1
                off = 0
                for e, fvs, k in entries:
                    n = fvs.shape[0]
                    s, i = sims[off:off + n, :k], ids[off:off + n, :k]
                    p = pids[off:off + n, :k] if pids is not None else None
                    off += n
                    e["result"] = {
                        "ok": True,
                        "sims": np.round(s, 6).tolist(),
                        "indices": i.tolist(),
                        "pids": p.tolist() if p is not None else None,
                    }
                    e["event"].set()
            except Exception as exc:
                for e, _, _ in entries:
                    if not e["event"].is_set():
                        fail(e, exc)
        self._counters["busy_ms"] += (time.monotonic() - t0) * 1e3

    def _op_remove(self, req: dict) -> dict:
        if self.index is None:
            raise ValueError("gallery is empty")
        if self.index.gallery_pids is None:
            raise ValueError("this index does not track pids; cannot remove by pid")
        pids = np.asarray(req["pids"])
        mask = np.isin(np.asarray(self.index.gallery_pids), pids)
        self.index.remove(np.nonzero(mask)[0])
        return {"removed": int(mask.sum()), "num_gallery": int(self.index.num_gallery)}

    def _op_stats(self, req: dict) -> dict:
        return {
            "num_gallery": int(self.index.num_gallery) if self.index is not None else 0,
            "index_quantize": (self.index.quantize if self.index is not None
                               else self.index_quantize),
            "model": self.model_name,
            "requests": self._counters["requests"],
            "errors": self._counters["errors"],
            "busy_ms": round(self._counters["busy_ms"], 3),
            "search_requests": self._counters["search_requests"],
            "search_dispatches": self._counters["search_dispatches"],
        }

    def _jail(self, path: str) -> str:
        """Enforce the --data_dir jail on file-op paths (review finding:
        the unauthenticated socket otherwise lets any local process make
        the daemon read/overwrite anything its uid can touch)."""
        if self.data_dir is None:
            return path
        import os

        root = os.path.realpath(self.data_dir)
        resolved = os.path.realpath(os.path.join(root, path))
        if resolved != root and not resolved.startswith(root + os.sep):
            raise ValueError(f"path escapes --data_dir: {path!r}")
        return resolved

    def _op_save(self, req: dict) -> dict:
        if self.index is None:
            raise ValueError("gallery is empty")
        path = self._jail(req["path"])
        self.index.save(path)
        return {"path": path}

    def _op_load(self, req: dict) -> dict:
        # same mode contract as startup --load_index: the daemon's explicit
        # --index_quantize flag wins over the saved mode (review finding:
        # 'auto' here could silently quadruple HBM on an int8-sized daemon)
        flag = self._quantize_flag
        self.index = GalleryIndex.load(
            self._jail(req["path"]),
            quantize="auto" if flag is None else (None if flag == "off" else flag),
        )
        self.index_quantize = self.index.quantize
        return {"num_gallery": int(self.index.num_gallery)}

    def _op_shutdown(self, req: dict) -> dict:
        self.shutdown_requested = True
        return {}


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        service: IdentificationService = self.server.service  # type: ignore[attr-defined]
        for raw in self.rfile:
            raw = raw.strip()
            if not raw:
                continue
            try:
                req = json.loads(raw)
            except json.JSONDecodeError as exc:
                resp = {"ok": False, "error": f"bad JSON: {exc}"}
            else:
                resp = service.handle(req)
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()
            if service.shutdown_requested:
                # stop accepting; serve_forever unblocks in the server loop
                self.server.shutdown_later()  # type: ignore[attr-defined]
                return


class _Server(socketserver.ThreadingTCPServer):
    """One handler thread per connection (so a persistent client can't
    starve others); the device serializes at the service lock, not at
    accept. ``shutdown`` must not be called from a handler thread (it
    deadlocks serve_forever), so handlers set a flag the serve loop
    polls in ``service_actions``."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, service: IdentificationService):
        super().__init__(addr, _Handler)
        self.service = service
        self._stop = False

    def shutdown_later(self):
        self._stop = True

    def service_actions(self):
        if self._stop:
            # runs in the serve_forever loop → safe to stop from here
            import threading

            threading.Thread(target=self.shutdown, daemon=True).start()
            self._stop = False


def make_server(args, extractor=None) -> _Server:
    """Build the TCP server (tests call this directly to get the port)."""
    flag = args.index_quantize
    index_quantize = None if flag == "off" else flag
    index = None
    if args.load_index:
        # an explicit --index_quantize overrides the saved mode (same
        # contract as cli/search.py)
        index = GalleryIndex.load(
            args.load_index, quantize="auto" if flag is None else index_quantize
        )
        index_quantize = index.quantize  # later enrolls follow the live index
    service = IdentificationService(
        extractor, index, topk=args.topk, index_quantize=index_quantize,
        model_name=args.model_name if extractor is not None else None,
        quantize_flag=flag, data_dir=getattr(args, "data_dir", None),
    )
    return _Server((args.host, args.port), service)


def main(args):
    from daliid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from daliid_tpu.cli.evaluate import load_bundle
    from daliid_tpu.eval.features import FeatureExtractor

    img_size = (args.img_height, args.img_width)
    bundle = load_bundle(args.model_name, args.model_path, img_size,
                         getattr(jnp, args.compute_dtype))
    extractor = FeatureExtractor(
        bundle, img_size=img_size, batch_size=args.batch_size,
        quantize=args.quantize,
        calib_batches=getattr(args, "calib_batches", 1),
    )
    server = make_server(args, extractor)
    host, port = server.server_address[:2]
    print(f"[serve] listening on {host}:{port} "
          f"(model {args.model_name}, index_quantize {args.index_quantize})",
          flush=True)
    try:
        server.serve_forever(poll_interval=0.1)
    finally:
        server.server_close()
    print("[serve] shut down")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(build_argparser().parse_args()))

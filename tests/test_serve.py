"""TCP identification daemon (cli/serve.py) driven over a real socket.

The daemon is the serving counterpart of the batch CLIs: one long-lived
extractor + GalleryIndex behind a newline-delimited-JSON protocol. These
tests run the actual socketserver on an ephemeral port with a background
serve_forever thread and a plain client socket — transport included, not
just the op dispatcher.
"""

import json
import socket
import threading

import numpy as np
import pytest

from daliid_tpu.cli import serve as serve_cli
from daliid_tpu.data import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("serveroot")
    splits, _ = make_synthetic_dataset(
        str(root), num_ids=4, imgs_per_id_train=2, imgs_per_id_test=3,
        height=32, width=16, with_turbulence=False,
    )
    return splits


class _Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=60)
        self.rfile = self.sock.makefile("r")

    def request(self, obj) -> dict:
        self.sock.sendall((json.dumps(obj) + "\n").encode())
        return json.loads(self.rfile.readline())

    def close(self):
        self.rfile.close()
        self.sock.close()


def _start(args, extractor=None):
    server = serve_cli.make_server(args, extractor)
    thread = threading.Thread(target=server.serve_forever,
                              kwargs={"poll_interval": 0.05}, daemon=True)
    thread.start()
    return server, thread, server.server_address[1]


def test_serve_daemon_image_flow(synth):
    """Full image path flow: enroll the synthetic gallery, search its query
    split, retire an identity, persist, shut down over the socket."""
    import jax
    import jax.numpy as jnp

    from daliid_tpu.eval.features import FeatureExtractor
    from daliid_tpu.models import get_model

    img_size = (32, 16)
    bundle = get_model("tiny_vit_smoke", jax.random.key(0), img_size=img_size,
                       dtype=jnp.float32)
    extractor = FeatureExtractor(bundle, img_size=img_size, batch_size=8)
    args = serve_cli.build_argparser().parse_args(
        ["--port", "0", "--model_name", "tiny_vit_smoke"]
    )
    server, thread, port = _start(args, extractor)
    try:
        c = _Client(port)
        gallery, query = synth["gallery"], synth["query"]

        r = c.request({"op": "stats"})
        assert r["ok"] and r["num_gallery"] == 0 and r["model"] == "tiny_vit_smoke"

        # searching an empty gallery is a clean error, not a dead daemon
        r = c.request({"op": "search", "paths": [str(query.paths[0])]})
        assert not r["ok"] and "enroll" in r["error"]

        r = c.request({
            "op": "enroll",
            "paths": [str(p) for p in gallery.paths],
            "pids": np.asarray(gallery.pids).tolist(),
        })
        assert r["ok"] and r["num_gallery"] == len(gallery)

        r = c.request({
            "op": "search",
            "paths": [str(p) for p in query.paths],
            "topk": 3,
        })
        assert r["ok"]
        top1 = np.asarray(r["pids"])[:, 0]
        acc = float(np.mean(top1 == np.asarray(query.pids)))
        assert acc >= 0.75, acc  # synthetic identities are separable

        # retire one identity: it disappears from the gallery and results
        victim = int(np.asarray(gallery.pids)[0])
        n_victim = int(np.sum(np.asarray(gallery.pids) == victim))
        r = c.request({"op": "remove", "pids": [victim]})
        assert r["ok"] and r["removed"] == n_victim
        assert r["num_gallery"] == len(gallery) - n_victim
        r = c.request({"op": "search", "paths": [str(p) for p in query.paths],
                       "topk": r["num_gallery"]})
        assert r["ok"] and victim not in np.asarray(r["pids"]).ravel()

        # ops counters: every request counted, the one failed search above
        # recorded as an error, device-busy time accumulated
        r = c.request({"op": "stats"})
        assert r["requests"] >= 6 and r["errors"] == 1 and r["busy_ms"] > 0

        r = c.request({"op": "shutdown"})
        assert r["ok"]
        c.close()
        thread.join(timeout=10)
        assert not thread.is_alive()
    finally:
        server.server_close()


def test_serve_daemon_pidless_index(tmp_path, rng):
    """Warm start from a bare-embeddings .npz (no pid table, the legacy
    cli/search.py save format): search answers with pids null, enrolling
    without pids works, and pid-based ops fail cleanly (review finding:
    these crashed on tuple unpacking before)."""
    d = 32
    g = rng.normal(size=(6, d)).astype(np.float32)
    path = str(tmp_path / "bare.npz")
    np.savez(path, embeddings=g)

    args = serve_cli.build_argparser().parse_args(
        ["--port", "0", "--load_index", path]
    )
    server, thread, port = _start(args, extractor=None)
    try:
        c = _Client(port)
        r = c.request({"op": "search", "embeddings": g[:2].tolist(), "topk": 1})
        assert r["ok"] and r["pids"] is None
        assert np.asarray(r["indices"])[:, 0].tolist() == [0, 1]
        r = c.request({"op": "enroll", "embeddings": g[:1].tolist()})
        assert r["ok"] and r["num_gallery"] == 7
        r = c.request({"op": "enroll", "embeddings": g[:1].tolist(), "pids": [3]})
        assert not r["ok"] and "does not track pids" in r["error"]
        r = c.request({"op": "remove", "pids": [3]})
        assert not r["ok"] and "does not track pids" in r["error"]
        assert c.request({"op": "shutdown"})["ok"]
        c.close()
        thread.join(timeout=10)
    finally:
        server.server_close()


def test_serve_daemon_concurrent_clients(rng):
    """Two clients holding persistent connections interleave requests —
    under a single-threaded accept loop the second client would block
    until the first disconnects (this test would time out)."""
    args = serve_cli.build_argparser().parse_args(["--port", "0"])
    server, thread, port = _start(args, extractor=None)
    try:
        a, b = _Client(port), _Client(port)
        d = 16
        g = rng.normal(size=(8, d)).astype(np.float32)
        r = a.request({"op": "enroll", "embeddings": g.tolist(),
                       "pids": list(range(8))})
        assert r["ok"]
        # b sees a's enrollment while a stays connected
        assert b.request({"op": "stats"})["num_gallery"] == 8
        r = b.request({"op": "search", "embeddings": g[:2].tolist(), "topk": 1})
        assert r["ok"] and np.asarray(r["pids"])[:, 0].tolist() == [0, 1]
        # back to a: still live on the same connection
        assert a.request({"op": "stats"})["num_gallery"] == 8
        assert b.request({"op": "shutdown"})["ok"]
        a.close(), b.close()
        thread.join(timeout=10)
        assert not thread.is_alive()
    finally:
        server.server_close()


def test_serve_daemon_embeddings_only(tmp_path, rng):
    """No-model mode: pre-computed embeddings in, SQ8 index, save + reload,
    and protocol-level error handling (daemon survives bad requests)."""
    args = serve_cli.build_argparser().parse_args(
        ["--port", "0", "--index_quantize", "int8"]
    )
    server, thread, port = _start(args, extractor=None)
    try:
        c = _Client(port)
        d = 64
        centers = rng.normal(size=(5, d)).astype(np.float32)
        gallery = np.repeat(centers, 4, axis=0) + 0.05 * rng.normal(
            size=(20, d)
        ).astype(np.float32)
        pids = np.repeat(np.arange(5), 4)

        # image paths without a model → clean error
        r = c.request({"op": "enroll", "paths": ["/nope.jpg"], "pids": [0]})
        assert not r["ok"] and "without a model" in r["error"]
        # malformed JSON → clean error
        c.sock.sendall(b"{not json\n")
        assert not json.loads(c.rfile.readline())["ok"]
        # unknown op → clean error
        assert not c.request({"op": "frobnicate"})["ok"]

        r = c.request({"op": "enroll", "embeddings": gallery.tolist(),
                       "pids": pids.tolist()})
        assert r["ok"] and r["num_gallery"] == 20

        probes = centers + 0.05 * rng.normal(size=(5, d)).astype(np.float32)
        r = c.request({"op": "search", "embeddings": probes.tolist(), "topk": 4})
        assert r["ok"]
        np.testing.assert_array_equal(np.asarray(r["pids"])[:, 0], np.arange(5))

        # k-reciprocal shortlist re-ranking over the wire
        r = c.request({"op": "search", "embeddings": probes.tolist(),
                       "topk": 4, "rerank": True, "rerank_depth": 12})
        assert r["ok"]
        np.testing.assert_array_equal(np.asarray(r["pids"])[:, 0], np.arange(5))

        path = str(tmp_path / "served.npz")
        assert c.request({"op": "save", "path": path})["ok"]
        r = c.request({"op": "load", "path": path})
        assert r["ok"] and r["num_gallery"] == 20
        # the SQ8 mode survives the save/load round trip
        r = c.request({"op": "stats"})
        assert r["ok"] and r["index_quantize"] == "int8"

        assert c.request({"op": "shutdown"})["ok"]
        c.close()
        thread.join(timeout=10)
        assert not thread.is_alive()
    finally:
        server.server_close()

    # --load_index warm start honors the saved mode, and --index_quantize
    # off / int8 override it (same contract as cli/search.py)
    for extra, expect in ([], "int8"), (["--index_quantize", "off"], None):
        args = serve_cli.build_argparser().parse_args(
            ["--port", "0", "--load_index", path, *extra]
        )
        srv = serve_cli.make_server(args)
        try:
            assert srv.service.index.quantize == expect
            assert srv.service.index.num_gallery == 20
        finally:
            srv.server_close()


def test_serve_daemon_pid_required_and_data_dir_jail(tmp_path, rng):
    """Review findings: (a) a pid-tracking index rejects enrolls that omit
    'pids' instead of silently collapsing identities onto a -1 sentinel;
    (b) --data_dir jails save/load paths to one directory."""
    jail = tmp_path / "jail"
    jail.mkdir()
    (tmp_path / "outside.npz").write_bytes(b"")
    args = serve_cli.build_argparser().parse_args(
        ["--port", "0", "--data_dir", str(jail)]
    )
    server, thread, port = _start(args, extractor=None)
    try:
        c = _Client(port)
        d = 16
        g = rng.normal(size=(4, d)).astype(np.float32)
        r = c.request({"op": "enroll", "embeddings": g.tolist(),
                       "pids": [0, 1, 2, 3]})
        assert r["ok"]
        # omitting pids on a pid-tracking index is an error, not pid -1
        r = c.request({"op": "enroll", "embeddings": g[:1].tolist()})
        assert not r["ok"] and "tracks pids" in r["error"]
        assert c.request({"op": "stats"})["num_gallery"] == 4

        # relative path inside the jail: OK, resolved under --data_dir
        r = c.request({"op": "save", "path": "idx.npz"})
        assert r["ok"] and r["path"].startswith(str(jail))
        assert (jail / "idx.npz").exists()
        assert c.request({"op": "load", "path": "idx.npz"})["num_gallery"] == 4
        # escapes (.. traversal, absolute outside) are rejected
        r = c.request({"op": "save", "path": "../escape.npz"})
        assert not r["ok"] and "escapes" in r["error"]
        assert not (tmp_path / "escape.npz").exists()
        r = c.request({"op": "load", "path": str(tmp_path / "outside.npz")})
        assert not r["ok"] and "escapes" in r["error"]

        assert c.request({"op": "shutdown"})["ok"]
        c.close()
        thread.join(timeout=10)
    finally:
        server.server_close()


def test_serve_search_microbatching(rng):
    """Concurrent searches coalesce into fewer device dispatches (VERDICT r3
    item 9): while one dispatch holds the device, queued searches are drained
    by the next leader into ONE GalleryIndex.search — per-request topk still
    honored, per-entry errors isolated, counters exposed via stats."""
    import time

    from daliid_tpu.cli.serve import IdentificationService
    from daliid_tpu.eval.matcher import GalleryIndex

    d = 16
    g = rng.normal(size=(32, d)).astype(np.float32)
    index = GalleryIndex(g, np.arange(32))
    svc = IdentificationService(None, index, topk=3)

    orig_search, calls = index.search, {"n": 0}

    def slow_search(*a, **kw):
        calls["n"] += 1
        time.sleep(0.15)  # hold the device so the queue forms behind us
        return orig_search(*a, **kw)

    index.search = slow_search

    N = 8
    results = [None] * (N + 1)

    def client(i):
        results[i] = svc.handle(
            {"op": "search", "embeddings": [g[i].tolist()], "topk": i % 3 + 1}
        )

    def bad_client():
        results[N] = svc.handle(
            {"op": "search", "embeddings": [[0.0] * (d + 1)], "topk": 1}
        )

    threads = [threading.Thread(target=client, args=(0,))]
    threads[0].start()
    time.sleep(0.05)  # thread 0 is now inside the slow dispatch
    more = [threading.Thread(target=client, args=(i,)) for i in range(1, N)]
    more.append(threading.Thread(target=bad_client))
    for t in more:
        t.start()
    threads += more
    for t in threads:
        t.join(timeout=60)

    for i in range(N):
        r = results[i]
        assert r["ok"], r
        assert r["pids"][0][0] == i            # own row is its best match
        assert len(r["pids"][0]) == i % 3 + 1  # per-request topk honored
    assert not results[N]["ok"] and "dim" in results[N]["error"]
    # batching: the 8 queued searches must NOT have taken 8 dispatches
    assert calls["n"] <= 4, calls["n"]

    stats = svc.handle({"op": "stats"})
    assert stats["search_requests"] == N + 1
    assert stats["search_dispatches"] == calls["n"]
    assert stats["errors"] == 1
    assert stats["requests"] == N + 2  # +1 bad search, +1 this stats call


def test_serve_rerank_inside_microbatched_group(rng):
    """VERDICT r4 item 8: the round-4 additions compose — rerank=true rides
    a contention-formed micro-batch over an SQ8, pid-less index, and every
    response is IDENTICAL to the same request dispatched alone (reranked
    results depend on shortlist depth, so the group key must isolate them;
    a response must not change with whatever else was in flight)."""
    import time

    from daliid_tpu.cli.serve import IdentificationService
    from daliid_tpu.eval.matcher import GalleryIndex

    d = 32
    # identity-margin gallery so SQ8 keeps retrieval decisions exact
    g = np.eye(d, dtype=np.float32)[:24] + 0.01 * rng.normal(size=(24, d)).astype(np.float32)
    index = GalleryIndex(g, gallery_pids=None, quantize="int8")
    svc = IdentificationService(None, index, topk=4)

    reqs = [
        {"op": "search", "embeddings": [g[1].tolist()], "topk": 4,
         "rerank": True, "rerank_depth": 8},
        {"op": "search", "embeddings": [g[2].tolist()], "topk": 4,
         "rerank": True, "rerank_depth": 8},   # same group as #0
        {"op": "search", "embeddings": [g[3].tolist()], "topk": 4,
         "rerank": True, "rerank_depth": 16},  # different depth -> own group
        {"op": "search", "embeddings": [g[4].tolist()], "topk": 3},  # plain
    ]
    # solo baselines: each request on an idle service (no contention)
    solo = [IdentificationService(None, index, topk=4).handle(dict(r)) for r in reqs]

    orig_search = index.search

    def slow_search(*a, **kw):
        time.sleep(0.15)  # hold the device so the queue forms behind us
        return orig_search(*a, **kw)

    index.search = slow_search
    try:
        results = [None] * len(reqs)

        def client(i):
            results[i] = svc.handle(dict(reqs[i]))

        leader = threading.Thread(
            target=lambda: svc.handle(
                {"op": "search", "embeddings": [g[0].tolist()], "topk": 1}
            )
        )
        leader.start()
        time.sleep(0.05)  # leader now holds the device; the rest queue up
        threads = [threading.Thread(target=client, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads + [leader]:
            t.join(timeout=120)
    finally:
        index.search = orig_search

    for i, (got, want) in enumerate(zip(results, solo)):
        assert got is not None and got["ok"], (i, got)
        assert got["indices"] == want["indices"], i
        np.testing.assert_allclose(got["sims"], want["sims"], atol=1e-5,
                                   err_msg=f"request {i}")
        assert got["pids"] is None  # pid-less index serves cleanly
    # own row wins even through SQ8 + rerank
    for i, r in enumerate(results[:3]):
        assert r["indices"][0][0] == i + 1

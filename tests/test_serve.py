"""Serving daemon tests: in-process dispatch + a subprocess JSONL session.

The reference has no serving story (one script run per video —
SURVEY.md §3.1); mimamo_tpu/serve.py keeps weights + compiled programs
warm behind a JSON-lines protocol. These tests pin the protocol
(errors never kill the daemon, ids echo back, stream lifecycle) and
the numerical contract (streamed chunks == StreamingSession directly).
"""

import io
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimamo_tpu import serve
from mimamo_tpu.runner import Mimamo
from mimamo_tpu.streaming import StreamingSession

from test_runner import tiny_config


@pytest.fixture(scope="module")
def server():
    return serve.Server(config=tiny_config(), capacity=3, chunk=4)


def _chunk(seed=0, t=4, s=32):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (t, s, s, 3)).astype(np.float32)


class TestDispatch:
    def test_ping_and_id_echo(self, server):
        r = server.handle({"cmd": "ping", "id": "abc"})
        assert r["ok"] and r["id"] == "abc"
        assert r["capacity"] == 3 and r["chunk"] == 4

    def test_unknown_cmd_is_error_not_crash(self, server):
        r = server.handle({"cmd": "explode"})
        assert not r["ok"] and "unknown cmd" in r["error"]
        r = server.handle({"no_cmd": 1})
        assert not r["ok"]

    def test_stream_lifecycle_and_values(self, server):
        """Values through the protocol == StreamingSession directly."""
        model = Mimamo(tiny_config())
        ref = StreamingSession(model, server.api.variables, capacity=3,
                               chunk=4)
        slot = ref.add_stream()

        r = server.handle({"cmd": "stream_open", "stream": "s1"})
        assert r["ok"]
        c1, c2 = _chunk(1), _chunk(2)
        want = np.concatenate([ref.feed({slot: c1})[slot],
                               ref.feed({slot: c2})[slot]])
        got = []
        for c in (c1, c2):
            r = server.handle({"cmd": "stream_feed", "stream": "s1",
                               "data": c.tolist()})
            assert r["ok"], r
            got.extend(r["values"])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        assert server.handle({"cmd": "stream_close", "stream": "s1"})["ok"]

    def test_stream_errors(self, server):
        assert not server.handle(
            {"cmd": "stream_feed", "stream": "nope", "data": []})["ok"]
        assert not server.handle(
            {"cmd": "stream_close", "stream": "nope"})["ok"]
        server.handle({"cmd": "stream_open", "stream": "dup"})
        r = server.handle({"cmd": "stream_open", "stream": "dup"})
        assert not r["ok"] and "already open" in r["error"]
        # wrong chunk shape -> error, stream still usable
        r = server.handle({"cmd": "stream_feed", "stream": "dup",
                           "data": _chunk(t=3).tolist()})
        assert not r["ok"]
        r = server.handle({"cmd": "stream_feed", "stream": "dup",
                           "data": _chunk().tolist()})
        assert r["ok"]
        server.handle({"cmd": "stream_close", "stream": "dup"})

    def test_feed_from_npy_path(self, server, tmp_path):
        p = str(tmp_path / "c.npy")
        np.save(p, _chunk(5))
        server.handle({"cmd": "stream_open", "stream": "f"})
        r = server.handle({"cmd": "stream_feed", "stream": "f",
                           "crops": p})
        assert r["ok"] and len(r["values"]) == 4
        server.handle({"cmd": "stream_close", "stream": "f"})

    def test_stream_feed_multi_matches_one_session_step(self, server,
                                                        tmp_path):
        """Multi-feed == a single StreamingSession.feed with the same
        slot dict (ONE device step for N streams), mixing npy-path and
        inline chunk sources."""
        model = Mimamo(tiny_config())
        ref = StreamingSession(model, server.api.variables, capacity=3,
                               chunk=4)
        ca, cb = _chunk(21), _chunk(22)
        sa, sb = ref.add_stream(), ref.add_stream()
        want = ref.feed({sa: ca, sb: cb})

        p = str(tmp_path / "m.npy")
        np.save(p, ca)
        server.handle({"cmd": "stream_open", "stream": "ma"})
        server.handle({"cmd": "stream_open", "stream": "mb"})
        r = server.handle({"cmd": "stream_feed_multi",
                           "streams": {"ma": p, "mb": cb.tolist()}})
        assert r["ok"], r
        np.testing.assert_allclose(np.asarray(r["values"]["ma"]),
                                   want[sa], atol=1e-5)
        np.testing.assert_allclose(np.asarray(r["values"]["mb"]),
                                   want[sb], atol=1e-5)

        # error paths: unopened name / empty mapping; daemon survives
        r = server.handle({"cmd": "stream_feed_multi",
                           "streams": {"ma": p, "nope": p}})
        assert not r["ok"] and "nope" in r["error"]
        assert not server.handle({"cmd": "stream_feed_multi",
                                  "streams": {}})["ok"]
        for n in ("ma", "mb"):
            assert server.handle({"cmd": "stream_close", "stream": n})["ok"]

    def test_capacity_exhaustion_is_error(self, server):
        names = [f"cap{i}" for i in range(4)]
        opened = []
        try:
            for n in names:
                r = server.handle({"cmd": "stream_open", "stream": n})
                (opened.append(n) if r["ok"] else None)
            assert len(opened) == 3  # capacity 3; 4th errored, no crash
        finally:
            for n in opened:
                server.handle({"cmd": "stream_close", "stream": n})


class TestUint8Session:
    def test_inline_floats_round_not_truncate(self):
        """uint8 session: client float pixels must round — a 254.9 that
        truncated to 254 would silently diverge from a float session."""
        srv = serve.Server(config=tiny_config(), capacity=2, chunk=4,
                           stream_dtype=np.uint8)
        base = np.full((4, 32, 32, 3), 100.0, np.float32)
        srv.handle({"cmd": "stream_open", "stream": "a"})
        srv.handle({"cmd": "stream_open", "stream": "b"})
        ra = srv.handle({"cmd": "stream_feed", "stream": "a",
                         "data": (base + 0.9).tolist()})
        rb = srv.handle({"cmd": "stream_feed", "stream": "b",
                         "data": (base + 1.0).tolist()})
        assert ra["ok"] and rb["ok"]
        np.testing.assert_allclose(ra["values"], rb["values"])


class TestRunLoop:
    def test_jsonl_loop(self, server):
        fin = io.StringIO(
            '{"cmd": "ping", "id": 1}\n'
            "not json\n"
            "\n"
            '{"cmd": "shutdown"}\n'
            '{"cmd": "ping", "id": "never-reached"}\n')
        fout = io.StringIO()
        serve.run(server, fin, fout)
        lines = [json.loads(x) for x in fout.getvalue().splitlines()]
        assert lines[0]["ok"] and lines[0]["id"] == 1
        assert not lines[1]["ok"] and "bad request" in lines[1]["error"]
        assert lines[2]["shutdown"]
        assert len(lines) == 3   # loop exited on shutdown


class TestConcurrentPredict:
    def test_stream_feeds_not_starved_by_slow_predict(self, monkeypatch):
        """A slow predict must not stall open streams: its response is
        written when done (id-correlated, out of order), while stream
        commands keep flowing on the main thread (VERDICT round 2 weak
        item 1)."""
        import threading
        srv = serve.Server(config=tiny_config(), capacity=2, chunk=4)

        # Deterministic interleave (a wall-clock sleep raced the first
        # stream-program compile): predict blocks until the feed
        # response has actually been WRITTEN (observed on the output
        # stream, not merely handled — the worker could otherwise slip
        # its response in between handle() and emit()). Only async
        # predict can satisfy this; a sync regression times the wait
        # out and fails the order assertion below.
        fed = threading.Event()

        def slow_predict(video, **kw):
            fed.wait(timeout=60)
            return np.zeros((5, 2), np.float32)

        monkeypatch.setattr(srv.api, "predict", slow_predict)

        class FlaggingOut(io.StringIO):
            def write(self, s):
                n = super().write(s)
                if '"id": "f"' in s:
                    fed.set()
                return n

        fin = io.StringIO(
            '{"cmd": "predict", "video": "x.mp4", "id": "P"}\n'
            '{"cmd": "stream_open", "stream": "s", "id": "o"}\n'
            '{"cmd": "stream_feed", "stream": "s", "id": "f", '
            '"data": ' + json.dumps(_chunk().tolist()) + '}\n'
            '{"cmd": "stream_close", "stream": "s", "id": "c"}\n'
            '{"cmd": "shutdown"}\n')
        fout = FlaggingOut()
        serve.run(srv, fin, fout)
        lines = [json.loads(x) for x in fout.getvalue().splitlines()]
        order = [l.get("id") for l in lines]
        # stream commands answered BEFORE the in-flight predict finished
        assert order.index("f") < order.index("P")
        by_id = {l.get("id"): l for l in lines}
        assert by_id["P"]["ok"] and by_id["P"]["frames"] == 5
        assert by_id["o"]["ok"] and by_id["f"]["ok"] and by_id["c"]["ok"]

    def test_sync_mode_keeps_strict_order(self, monkeypatch):
        srv = serve.Server(config=tiny_config(), capacity=2, chunk=4)
        monkeypatch.setattr(
            srv.api, "predict",
            lambda video, **kw: np.zeros((3, 2), np.float32))
        fin = io.StringIO(
            '{"cmd": "predict", "video": "x.mp4", "id": "P"}\n'
            '{"cmd": "ping", "id": "g"}\n'
            '{"cmd": "shutdown"}\n')
        fout = io.StringIO()
        serve.run(srv, fin, fout, predict_async=False)
        ids = [json.loads(x).get("id")
               for x in fout.getvalue().splitlines()]
        assert ids[:2] == ["P", "g"]


class TestAllowedRoot:
    def test_paths_outside_root_rejected(self, tmp_path):
        srv = serve.Server(config=tiny_config(), capacity=2, chunk=4,
                           allowed_root=str(tmp_path))
        r = srv.handle({"cmd": "predict", "video": "/etc/passwd"})
        assert not r["ok"] and "allowed root" in r["error"]
        r = srv.handle({"cmd": "predict",
                        "video": str(tmp_path / ".." / "escape.mp4")})
        assert not r["ok"] and "allowed root" in r["error"]
        # writes are covered too
        r = srv.handle({"cmd": "predict", "video": str(tmp_path / "v"),
                        "out_csv": "/tmp/evil.csv"})
        assert not r["ok"] and "allowed root" in r["error"]
        # inside the root: passes the check (then fails on read — fine)
        srv.handle({"cmd": "stream_open", "stream": "s"})
        p = str(tmp_path / "c.npy")
        np.save(p, _chunk(5))
        assert srv.handle({"cmd": "stream_feed", "stream": "s",
                           "crops": p})["ok"]
        r = srv.handle({"cmd": "stream_feed", "stream": "s",
                        "crops": "/tmp/outside.npy"})
        assert not r["ok"] and "allowed root" in r["error"]
        # the predict 'crops' path goes through the same sandbox
        r = srv.handle({"cmd": "predict", "crops": "/tmp/outside.npy"})
        assert not r["ok"] and "allowed root" in r["error"]


class TestPredictCropsRequest:
    """Round 5: predict from precomputed crops over the protocol —
    same semantics as cli predict --crops."""

    def test_predict_crops_matches_api(self, server, tmp_path):
        rng = np.random.default_rng(11)
        crops = rng.uniform(0, 255, (10, 32, 32, 3)).astype(np.uint8)
        p = str(tmp_path / "crops.npy")
        np.save(p, crops)
        r = server.handle({"cmd": "predict", "crops": p,
                           "series": True})
        assert r["ok"], r
        want = np.asarray(server.api.model.predict_from_crops(
            server.api.variables, crops))
        np.testing.assert_allclose(np.asarray(r["series"]), want,
                                   atol=1e-4)
        assert r["frames"] == 10

    def test_predict_arg_coherence_errors(self, server, tmp_path):
        p = str(tmp_path / "c.npy")
        np.save(p, np.zeros((4, 32, 32, 3), np.uint8))
        r = server.handle({"cmd": "predict"})
        assert not r["ok"] and "exactly one" in r["error"]
        r = server.handle({"cmd": "predict", "crops": p,
                           "video": "x.mp4"})
        assert not r["ok"] and "exactly one" in r["error"]
        r = server.handle({"cmd": "predict", "crops": p, "align": True})
        assert not r["ok"] and "already aligned" in r["error"]


class TestServeCLI:
    def test_subprocess_session(self, tmp_path):
        """Full daemon session through the real CLI: ready banner, ping,
        predict on a synthetic video, stream round, shutdown."""
        import subprocess
        import sys
        import cv2
        vid = str(tmp_path / "v.mp4")
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (12, 48, 64, 3), np.uint8)
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                            (64, 48))
        for f in frames:
            w.write(f)
        w.release()
        crops = str(tmp_path / "c.npy")
        np.save(crops, _chunk(7))

        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo",
                   JAX_COMPILATION_CACHE_DIR=os.environ.get(
                       "MIMAMO_TEST_CACHE",
                       "/tmp/jax_cache_mimamo_tests"),
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
                   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
        reqs = "\n".join([
            json.dumps({"cmd": "ping", "id": "p"}),
            json.dumps({"cmd": "predict", "video": vid, "id": "v",
                        "max_frames": 10, "series": True}),
            json.dumps({"cmd": "stream_open", "stream": "s"}),
            json.dumps({"cmd": "stream_feed", "stream": "s",
                        "crops": crops}),
            json.dumps({"cmd": "shutdown"}),
        ]) + "\n"
        r = subprocess.run(
            [sys.executable, "-m", "mimamo_tpu.cli", "serve",
             "--clip-len", "8", "--stride", "4", "--crop-size", "32",
             "--backbone-size", "32", "--pyramid-height", "2",
             "--phase-size", "16", "--chunk", "4", "--capacity", "2",
             "--cpu"],
            input=reqs, capture_output=True, text=True, env=env,
            cwd="/root/repo", timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [json.loads(x) for x in r.stdout.splitlines()]
        assert lines[0]["ready"]
        by_id = {l.get("id"): l for l in lines[1:]}
        assert by_id["p"]["ok"]
        assert by_id["v"]["ok"] and by_id["v"]["frames"] == 10
        assert len(by_id["v"]["series"]) == 10
        feeds = [l for l in lines if "values" in l]
        assert len(feeds) == 1 and len(feeds[0]["values"]) == 4
        # async predict: its response may legally land after the
        # shutdown ack (in-flight work is drained before exit)
        assert any(l.get("shutdown") for l in lines)

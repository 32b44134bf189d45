"""Long-running serving daemon: JSON-lines protocol over stdin/stdout.

The reference has no serving story — one script invocation per video
(SURVEY.md §3.1), paying OpenFace startup + model load + (on our side
it would be) XLA compilation per video. This daemon keeps the process —
and every compiled program — warm: load weights once, compile once,
then serve an unbounded sequence of requests. JSON-lines over
stdin/stdout keeps it transport-agnostic (wrap it in a socket/HTTP
layer of your choice; nothing here depends on one) and trivially
testable.

Protocol (one JSON object per line; responses echo ``id`` if present):

  {"cmd": "ping"}
      -> {"ok": true, "capacity": C, "active_streams": {...}, ...}
  {"cmd": "predict", "video": PATH | "crops": PATH (precomputed
   aligned crops: packed .npy or image dir — exactly one of the two),
   "align"?: bool, "landmarks"?: PATH, "boxes"?: PATH (video only),
   "max_frames"?: N, "smooth"?: K, "out_csv"?: PATH, "series"?: bool}
      -> {"ok": true, "frames": N, "valence_mean": ..,
          "arousal_mean": .., "series"?: [[v, a], ...]}
  {"cmd": "stream_open", "stream": NAME}
      -> {"ok": true, "slot": i}          # claims a StreamingSession slot
  {"cmd": "stream_feed", "stream": NAME, "crops": PATH.npy | "data": [...]}
      -> {"ok": true, "values": [[v, a], ...]}   # one fixed-size chunk
  {"cmd": "stream_feed_multi", "streams": {NAME: PATH.npy | [...], ...}}
      -> {"ok": true, "values": {NAME: [[v, a], ...]}}  # ONE device step
  {"cmd": "stream_close", "stream": NAME}
      -> {"ok": true}
  {"cmd": "shutdown"}
      -> {"ok": true, "shutdown": true}    # then the loop exits

Errors never kill the daemon: any failed request returns
{"ok": false, "error": "..."} and the loop continues.

Concurrency: ``predict`` (full video decode + inference — seconds to
minutes) executes on a worker thread so ``stream_feed`` latency stays
bounded while a predict is in flight; its response may therefore arrive
AFTER responses to later requests — correlate with ``id``. All other
commands respond strictly in request order (``run(predict_async=False)``
restores global ordering).

Trust model: the protocol dereferences client-supplied filesystem paths
("video", "crops", "boxes", "landmarks", "out_csv") and therefore
assumes a FULLY TRUSTED client (the daemon is a local co-process, like
the reference's script invocations). If you wrap it in a socket/HTTP
layer for untrusted callers, construct the Server with
``allowed_root=DIR`` (CLI: ``--allowed-root``): every request path must
then resolve (symlinks included) under that directory, turning the
file read/write primitives into a sandbox.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional, TextIO

import numpy as np

from .config import MimamoConfig


class Server:
    """Request dispatcher; transport-independent (see :func:`run`)."""

    def __init__(self, config: Optional[MimamoConfig] = None,
                 variables: Optional[Dict[str, Any]] = None,
                 checkpoint_dir: Optional[str] = None,
                 capacity: int = 8, chunk: int = 16,
                 stream_dtype=np.float32, warmup: bool = False,
                 allowed_root: Optional[str] = None):
        import os
        import threading
        from .api import MimamoAPI
        from .streaming import StreamingSession
        self.api = MimamoAPI(config=config, variables=variables,
                             checkpoint_dir=checkpoint_dir)
        self.session = StreamingSession(self.api.model, self.api.variables,
                                        capacity=capacity, chunk=chunk,
                                        dtype=stream_dtype)
        self._streams: Dict[str, int] = {}   # user name -> slot
        self._t0 = time.time()
        self._served = 0
        self._lock = threading.Lock()        # counter; 2 handle() threads
        self.allowed_root = (os.path.realpath(allowed_root)
                             if allowed_root else None)
        if warmup:
            self._warmup()

    def _check_path(self, path: str, kind: str) -> str:
        """Enforce the opt-in path sandbox (see module docstring)."""
        if self.allowed_root is not None:
            import os
            rp = os.path.realpath(str(path))
            root = self.allowed_root
            if rp != root and not rp.startswith(root + os.sep):
                raise ValueError(
                    f"{kind} path {path!r} resolves outside the "
                    f"allowed root {root!r}")
        return path

    def _warmup(self) -> None:
        """Compile the streaming program before the first request."""
        cfg = self.api.model.config.clip
        slot = self.session.add_stream()
        try:
            z = np.zeros((self.session.chunk, cfg.crop_size,
                          cfg.crop_size, 3), self.session.dtype)
            self.session.feed({slot: z})
        finally:
            self.session.remove_stream(slot)

    # -- dispatch -----------------------------------------------------------

    def handle(self, req: Dict[str, Any]) -> Dict[str, Any]:
        """One request -> one response dict (never raises)."""
        rid = req.get("id")
        try:
            cmd = req.get("cmd")
            fn = getattr(self, f"_cmd_{cmd}", None)
            if not isinstance(cmd, str) or fn is None:
                raise ValueError(f"unknown cmd {cmd!r}")
            resp = fn(req)
            resp.setdefault("ok", True)
        except Exception as e:  # noqa: BLE001 — daemon must survive
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if rid is not None:
            resp["id"] = rid
        with self._lock:
            self._served += 1
        return resp

    def _cmd_ping(self, req) -> Dict[str, Any]:
        return {"capacity": self.session.capacity,
                "chunk": self.session.chunk,
                "active_streams": dict(self._streams),
                "served": self._served,
                "uptime_sec": round(time.time() - self._t0, 3)}

    def _cmd_predict(self, req) -> Dict[str, Any]:
        for kind in ("video", "crops", "out_csv", "boxes", "landmarks"):
            if req.get(kind):
                self._check_path(req[kind], kind)
        if bool(req.get("video")) == bool(req.get("crops")):
            raise ValueError(
                "predict takes exactly one of 'video' / 'crops'")
        if req.get("crops"):
            # precomputed aligned crops (two-step workflow) — same
            # validation/semantics as cli predict --crops
            if req.get("align") or req.get("boxes") or \
                    req.get("landmarks"):
                raise ValueError("'crops' are already aligned — "
                                 "align/boxes/landmarks do not apply")
            series = self.api.predict_crops(
                req["crops"], out_csv=req.get("out_csv"),
                max_frames=req.get("max_frames"),
                smooth=int(req.get("smooth", 1)))
        else:
            series = self.api.predict(
                req["video"], out_csv=req.get("out_csv"),
                boxes_path=req.get("boxes"),
                max_frames=req.get("max_frames"),
                align=bool(req.get("align", False)),
                landmarks_path=req.get("landmarks"),
                smooth=int(req.get("smooth", 1)))
        resp = {"frames": int(series.shape[0]),
                "valence_mean": float(series[:, 0].mean()),
                "arousal_mean": float(series[:, 1].mean())}
        if req.get("out_csv"):
            resp["out_csv"] = req["out_csv"]
        if req.get("series"):
            resp["series"] = [[round(float(v), 6), round(float(a), 6)]
                              for v, a in series]
        return resp

    def _cmd_stream_open(self, req) -> Dict[str, Any]:
        name = req["stream"]
        if name in self._streams:
            raise ValueError(f"stream {name!r} already open")
        slot = self.session.add_stream()
        self._streams[name] = slot
        return {"slot": slot}

    def _load_chunk(self, source) -> np.ndarray:
        """Chunk from an npy path (str) or an inline array (list)."""
        if isinstance(source, str):
            frames = np.load(self._check_path(source, "crops"))
        else:
            frames = np.asarray(source, np.float32)
        if (np.issubdtype(self.session.dtype, np.integer)
                and np.issubdtype(frames.dtype, np.floating)):
            # round, don't truncate: a uint8 session must match a float
            # session for clients sending non-integral pixel values
            frames = np.clip(np.rint(frames), 0, 255)
        return frames.astype(self.session.dtype)

    @staticmethod
    def _fmt_values(vals) -> list:
        return [[round(float(v), 6), round(float(a), 6)] for v, a in vals]

    def _cmd_stream_feed(self, req) -> Dict[str, Any]:
        name = req["stream"]
        if name not in self._streams:
            raise ValueError(f"stream {name!r} is not open")
        if "crops" in req:
            frames = self._load_chunk(req["crops"])
        elif "data" in req:
            frames = self._load_chunk(req["data"])
        else:
            raise ValueError("stream_feed needs 'crops' (npy path) "
                             "or 'data' (inline array)")
        out = self.session.feed({self._streams[name]: frames})
        return {"values": self._fmt_values(out[self._streams[name]])}

    def _cmd_stream_feed_multi(self, req) -> Dict[str, Any]:
        """Advance MANY streams in one device step.

        ``{"cmd": "stream_feed_multi", "streams": {name: npy-path |
        inline array, ...}}`` -> ``{"values": {name: [[v, a], ...]}}``.

        The batch-of-streams session always executes a full
        [capacity, ...] step regardless of how many slots advance
        (streaming.py static-shape design), so feeding N streams
        through N ``stream_feed`` requests costs N device steps while
        this costs ONE — the intended operating point of a
        full-capacity server (measured in bench/serve_bench.py).
        """
        streams = req.get("streams")
        if not isinstance(streams, dict) or not streams:
            raise ValueError("stream_feed_multi needs a non-empty "
                             "'streams' {name: chunk} mapping")
        missing = [n for n in streams if n not in self._streams]
        if missing:
            raise ValueError(f"streams not open: {missing}")
        feed = {self._streams[n]: self._load_chunk(src)
                for n, src in streams.items()}
        out = self.session.feed(feed)
        return {"values": {n: self._fmt_values(out[self._streams[n]])
                           for n in streams}}

    def _cmd_stream_close(self, req) -> Dict[str, Any]:
        name = req["stream"]
        if name not in self._streams:
            raise ValueError(f"stream {name!r} is not open")
        self.session.remove_stream(self._streams.pop(name))
        return {}

    def _cmd_shutdown(self, req) -> Dict[str, Any]:
        return {"shutdown": True}


def run(server: Server, fin: Optional[TextIO] = None,
        fout: Optional[TextIO] = None, predict_async: bool = True) -> None:
    """Blocking serve loop: read JSON lines from ``fin``, write responses
    to ``fout`` (defaults: stdin/stdout). Exits on EOF or shutdown.

    With ``predict_async`` (default), ``predict`` requests run on ONE
    worker thread (serialized among themselves — a single device is the
    bottleneck anyway) while the main thread keeps serving stream/ping
    commands; predict responses are written on completion, so they can
    interleave after later responses — clients correlate via ``id``.
    In-flight predicts are drained before the loop returns (EOF or
    shutdown). ``predict_async=False`` restores the strictly ordered
    single-threaded round 2 behavior.
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor
    fin = fin or sys.stdin
    fout = fout or sys.stdout
    wlock = threading.Lock()

    def emit(resp: Dict[str, Any]) -> None:
        with wlock:
            fout.write(json.dumps(resp) + "\n")
            fout.flush()

    pool = ThreadPoolExecutor(max_workers=1) if predict_async else None
    try:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
                if not isinstance(req, dict):
                    raise ValueError("request must be a JSON object")
            except ValueError as e:
                emit({"ok": False, "error": f"bad request line: {e}"})
                continue
            if pool is not None and req.get("cmd") == "predict":
                # server.handle never raises, but emit itself can
                # (broken pipe, non-serializable value): a swallowed
                # worker exception would leave the client blocked
                # forever on its id (round-5 review finding) — surface
                # it with a best-effort error line + stderr log.
                def _done(fut, rid=req.get("id")):
                    exc = fut.exception()
                    if exc is None:
                        return
                    print(f"serve: async predict response failed: "
                          f"{type(exc).__name__}: {exc}",
                          file=sys.stderr, flush=True)
                    try:
                        err = {"ok": False,
                               "error": f"response write failed: {exc}"}
                        if rid is not None:
                            err["id"] = rid
                        emit(err)
                    except Exception:  # noqa: BLE001 - pipe truly dead
                        pass
                pool.submit(
                    lambda r=req: emit(server.handle(r))
                ).add_done_callback(_done)
                continue
            resp = server.handle(req)
            emit(resp)
            if resp.get("shutdown"):
                break
    finally:
        if pool is not None:
            pool.shutdown(wait=True)   # drain in-flight predicts

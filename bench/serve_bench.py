"""Serving-latency benchmark through the JSON-lines daemon.

The reference has no serving story (one script invocation per video —
SURVEY.md §3.1); ours is `mimamo_tpu.cli serve` (serve.py). This
harness measures what a colocated client actually sees through the
daemon: JSON serialization + pipe transport + chunk load + h2d + the
device step + d2h, per request.

Measured:
  * ``stream_feed`` round-trip latency, 1 active stream of
    ``capacity`` slots (p50 / p95 / max ms per chunk);
  * ``stream_feed`` aggregate throughput with ALL slots advanced per
    request (the batch-of-streams design's intended operating point);
  * warm ``predict`` latency on a small synthetic video (decode +
    track + crop + windowed inference + CSV, end to end).

Protocol notes (CLAUDE.md tunnel discipline): the daemon subprocess is
the ONLY TPU client; this harness is pure host. Every chunk is
freshly random per (round, slot) — the axon tunnel caches
identical-arg executions, so repeating one chunk would time the cache,
not the device. Feeds go as .npy paths, not inline JSON, so transport
cost stays realistic (~600 KB binary, not multi-MB text).

    python bench/serve_bench.py [--cpu] [--rounds 30] [--capacity 8]
                                [--chunk 16]

Results recorded in BASELINE.md (round 4).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rpc(proc, req):
    proc.stdin.write(json.dumps(req) + "\n")
    proc.stdin.flush()
    t0 = time.perf_counter()
    line = proc.stdout.readline()
    dt = time.perf_counter() - t0
    if not line:
        raise RuntimeError("daemon died (see its stderr log)")
    resp = json.loads(line)
    if not resp.get("ok", False):
        raise RuntimeError(f"request failed: {resp}")
    return resp, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rounds", type=int, default=30,
                    help="timed stream_feed requests per scenario")
    ap.add_argument("--capacity", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--crop", type=int, default=112)
    ap.add_argument("--backbone-size", type=int, default=224)
    ap.add_argument("--clip-len", type=int, default=48)
    ap.add_argument("--stride", type=int, default=24)
    ap.add_argument("--phase-size", type=int, default=48)
    ap.add_argument("--pyramid-height", type=int, default=3)
    ap.add_argument("--predict-frames", type=int, default=64)
    args = ap.parse_args()
    if args.cpu and args.crop == 112:
        # CPU smoke default: shrink the model or a 1-core host takes
        # tens of minutes (the harness's own correctness is what a CPU
        # run checks; real numbers come from the TPU run)
        args.crop, args.backbone_size = 32, 64
        args.clip_len, args.stride = 6, 3
        args.phase_size, args.pyramid_height = 12, 2
        args.predict_frames = min(args.predict_frames, 16)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    s = args.crop

    def chunk_file(tag):
        path = os.path.join(tmp, f"chunk_{tag}.npy")
        np.save(path, rng.integers(0, 256, (args.chunk, s, s, 3),
                                   dtype=np.uint8))
        return path

    # distinct synthetic predict videos (noise frames -> full-frame
    # fallback box): the tunnel caches identical-arg executions, so
    # repeating one video would time the cache, not the pipeline.
    sys.path.insert(0, REPO)
    from mimamo_tpu.io import decode
    vids = []
    for k in range(4):
        v = os.path.join(tmp, f"clip{k}.mp4")
        decode.write_video(v, rng.integers(
            0, 256, (args.predict_frames, 96, 128, 3), dtype=np.uint8))
        vids.append(v)

    cmd = [sys.executable, "-m", "mimamo_tpu.cli", "serve",
           "--capacity", str(args.capacity), "--chunk", str(args.chunk),
           "--crop-size", str(args.crop),
           "--backbone-size", str(args.backbone_size),
           "--clip-len", str(args.clip_len), "--stride", str(args.stride),
           "--phase-size", str(args.phase_size),
           "--pyramid-height", str(args.pyramid_height),
           "--uint8-streams"]
    if args.cpu:
        cmd.append("--cpu")
    # stderr to a FILE, not a pipe: an undrained 64 KB stderr pipe
    # deadlocks a chatty daemon mid-run (the exact failure mode
    # tests/test_multiprocess.py documents for jax subprocesses).
    errlog = open(os.path.join(tmp, "daemon_stderr.log"), "w")
    proc = subprocess.Popen(cmd, cwd=REPO, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=errlog, text=True)
    try:
        t0 = time.perf_counter()
        ready = json.loads(proc.stdout.readline())
        assert ready.get("ready"), ready
        print(json.dumps({"serve": "startup_incl_warmup",
                          "sec": round(time.perf_counter() - t0, 2)}),
              flush=True)

        # -- scenario 1: single-stream feed latency ----------------------
        _rpc(proc, {"cmd": "stream_open", "stream": "s0"})
        for i in range(3):                                   # warm
            _rpc(proc, {"cmd": "stream_feed", "stream": "s0",
                        "crops": chunk_file(f"warm{i}")})
        lat = []
        for r in range(args.rounds):
            path = chunk_file(f"r{r}")                       # pre-written
            _, dt = _rpc(proc, {"cmd": "stream_feed", "stream": "s0",
                                "crops": path})
            lat.append(dt)
        lat_ms = np.sort(np.array(lat)) * 1e3
        print(json.dumps({
            "serve": "stream_feed_latency_1_of_%d" % args.capacity,
            "chunk_frames": args.chunk,
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
            "max_ms": round(float(lat_ms[-1]), 1)}), flush=True)

        # -- scenario 2: all slots fed per request -----------------------
        for i in range(1, args.capacity):
            _rpc(proc, {"cmd": "stream_open", "stream": f"s{i}"})
        # NOTE each request advances ONE stream; a round = capacity
        # requests. The session still executes a full [capacity, ...]
        # batch per request (idle slots ride along), so per-request
        # latency matches scenario 1 — the aggregate number tells you
        # what a round-robin multiplexer sustains.
        rounds = max(6, args.rounds // args.capacity)
        files = [[chunk_file(f"a{r}_{i}") for i in range(args.capacity)]
                 for r in range(rounds)]
        t0 = time.perf_counter()
        for r in range(rounds):
            for i in range(args.capacity):
                _rpc(proc, {"cmd": "stream_feed", "stream": f"s{i}",
                            "crops": files[r][i]})
        wall = time.perf_counter() - t0
        frames = rounds * args.capacity * args.chunk
        print(json.dumps({
            "serve": "stream_feed_round_robin_%d_slots" % args.capacity,
            "frames_per_sec": round(frames / wall, 1),
            "ms_per_request": round(
                wall / (rounds * args.capacity) * 1e3, 1)}), flush=True)

        # -- scenario 2b: all slots in ONE request/device step ------------
        rounds_m = max(6, args.rounds // 2)
        mfiles = [{f"s{i}": chunk_file(f"m{r}_{i}")
                   for i in range(args.capacity)} for r in range(rounds_m)]
        _rpc(proc, {"cmd": "stream_feed_multi", "streams":
                    {f"s{i}": chunk_file(f"mw_{i}")
                     for i in range(args.capacity)}})          # warm
        lat = []
        t0 = time.perf_counter()
        for r in range(rounds_m):
            _, dt = _rpc(proc, {"cmd": "stream_feed_multi",
                                "streams": mfiles[r]})
            lat.append(dt)
        wall = time.perf_counter() - t0
        frames = rounds_m * args.capacity * args.chunk
        lat_ms = np.sort(np.array(lat)) * 1e3
        print(json.dumps({
            "serve": "stream_feed_multi_%d_slots" % args.capacity,
            "frames_per_sec": round(frames / wall, 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p95_ms": round(float(np.percentile(lat_ms, 95)), 1)}),
            flush=True)

        # -- scenario 3: warm predict (full video -> series) -------------
        _rpc(proc, {"cmd": "predict", "video": vids[0]})     # warm/compile
        lat = []
        for v in vids[1:]:
            _, dt = _rpc(proc, {"cmd": "predict", "video": v})
            lat.append(dt)
        print(json.dumps({
            "serve": "predict_latency_warm",
            "video_frames": args.predict_frames,
            "best_sec": round(min(lat), 2),
            "worst_sec": round(max(lat), 2)}), flush=True)

        _rpc(proc, {"cmd": "shutdown"})
    finally:
        # NEVER leave the daemon alive: an orphaned TPU client wedges
        # the tunnel for every subsequent process (CLAUDE.md).
        try:
            proc.stdin.close()
        except OSError:
            pass
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)
        errlog.close()
        if proc.returncode not in (0, None):
            sys.stderr.write(
                open(os.path.join(tmp, "daemon_stderr.log")).read()[-2000:])
        shutil.rmtree(tmp, ignore_errors=True)   # ~100 MB of chunks/videos


if __name__ == "__main__":
    main()

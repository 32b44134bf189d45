"""Serving-daemon client example: drive ``cli serve`` as a subprocess.

Shows the JSON-lines protocol end to end (docs/SERVING.md §4): start
the daemon, predict a whole video, run a live stream chunk-by-chunk,
shut down. The same request/response framing works over any byte
stream — swap the subprocess pipes for a socket to serve remotely.

    python examples/serve_client.py [--cpu]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class DaemonClient:
    """Minimal blocking client over the daemon's stdin/stdout pipes."""

    def __init__(self, extra_args=(), cwd=None):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "mimamo_tpu.cli", "serve",
             *extra_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            cwd=cwd)
        banner = json.loads(self.proc.stdout.readline())
        assert banner.get("ready"), banner

    def send(self, **req):
        """Fire a request without waiting (pair with :meth:`read` and
        an ``id`` — predict responses can arrive out of order)."""
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()

    def read(self):
        resp = json.loads(self.proc.stdout.readline())
        # surface daemon-side errors instead of a later KeyError on a
        # missing response field
        if not resp.get("ok", False) and not resp.get("shutdown"):
            raise RuntimeError(f"daemon error: {resp.get('error', resp)}")
        return resp

    def request(self, **req):
        self.send(**req)
        return self.read()

    def close(self):
        resp = self.request(cmd="shutdown")
        self.proc.wait(timeout=60)
        return resp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out-dir", default="/tmp/mimamo_serve_demo")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from demo import synthesize_video
    video = os.path.join(args.out_dir, "sample.mp4")
    synthesize_video(video, frames=64)

    # Small config so the demo compiles quickly; drop these flags (and
    # add --ckpt) for the real model.
    extra = ["--clip-len", "16", "--stride", "8", "--crop-size", "32",
             "--backbone-size", "32", "--pyramid-height", "2",
             "--phase-size", "16", "--chunk", "8", "--capacity", "4"]
    if args.cpu:
        extra.append("--cpu")
    client = DaemonClient(extra, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    print("ping:", client.request(cmd="ping"))

    # Async predict + live stream interleaved: the daemon runs predict
    # on a worker thread, so stream chunks keep flowing while the video
    # is processed; responses correlate by "id" and the predict
    # response may arrive after later stream responses.
    client.request(cmd="stream_open", stream="cam0")
    client.send(cmd="predict", video=video, id="vid",
                out_csv=os.path.join(args.out_dir, "preds.csv"))
    rng = np.random.default_rng(0)
    for chunk_idx in range(3):
        crops = rng.uniform(0, 255, (8, 32, 32, 3))
        client.send(cmd="stream_feed", stream="cam0",
                    id=f"chunk{chunk_idx}", data=crops.tolist())
    order = []
    for _ in range(4):                    # 1 predict + 3 feeds
        r = client.read()
        order.append(r.get("id"))
        if r.get("id") == "vid":
            print("predict:", json.dumps(
                {k: r[k] for k in ("frames", "valence_mean",
                                   "arousal_mean") if k in r}))
        else:
            vals = np.asarray(r["values"])
            print(f"{r.get('id')}: v/a mean = "
                  f"{vals[:, 0].mean():+.3f} / "
                  f"{vals[:, 1].mean():+.3f}")
    print("response order (predict interleaves):", order)

    # Full-capacity serving: feed MANY streams in ONE device step.
    # Every feed executes a full [capacity, ...] batch (static shapes),
    # so batching arrivals into stream_feed_multi is capacity-x cheaper
    # than a per-stream round-robin (measured 3.7x at capacity 8 —
    # bench/serve_bench.py).
    client.request(cmd="stream_open", stream="cam1")
    r = client.request(cmd="stream_feed_multi", streams={
        "cam0": rng.uniform(0, 255, (8, 32, 32, 3)).tolist(),
        "cam1": rng.uniform(0, 255, (8, 32, 32, 3)).tolist()})
    for name, vals in sorted(r["values"].items()):
        vals = np.asarray(vals)
        print(f"multi[{name}]: v/a mean = {vals[:, 0].mean():+.3f} / "
              f"{vals[:, 1].mean():+.3f}")
    for name in ("cam0", "cam1"):
        client.request(cmd="stream_close", stream=name)
    print("shutdown:", client.close())


if __name__ == "__main__":
    main()

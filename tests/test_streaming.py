"""Batch-of-streams serving tests: session output == independent
single-stream inference, slot lifecycle, partial feeds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimamo_tpu.runner import Mimamo
from mimamo_tpu.streaming import StreamingSession

from test_runner import tiny_config


@pytest.fixture(scope="module")
def model_vars():
    model = Mimamo(tiny_config())
    return model, model.init_variables(jax.random.PRNGKey(0))


def _video(t, seed, s=32):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (t, s, s, 3)).astype(np.float32)


def _reference_stream(model, variables, video, chunk):
    """Canonical public streaming API (clip-mode first chunk) — the
    session must reproduce this exactly."""
    outs, carries = [], None
    x = jnp.asarray(video)[None]
    for start in range(0, video.shape[0], chunk):
        out, carries = model.predict_stream(
            variables, x[:, start:start + chunk], carries)
        outs.append(np.asarray(out[0]))
    return np.concatenate(outs, axis=0)


class TestStreamingSession:
    def test_matches_independent_streams(self, model_vars):
        model, variables = model_vars
        chunk = 4
        sess = StreamingSession(model, variables, capacity=4, chunk=chunk)
        videos = {sess.add_stream(): _video(12, seed) for seed in (1, 2)}
        got = {slot: [] for slot in videos}
        for start in range(0, 12, chunk):
            feed = {slot: v[start:start + chunk]
                    for slot, v in videos.items()}
            out = sess.feed(feed)
            for slot, o in out.items():
                got[slot].append(o)
        for slot, v in videos.items():
            want = _reference_stream(model, variables, v, chunk)
            np.testing.assert_allclose(
                np.concatenate(got[slot]), want, atol=1e-4)

    def test_staggered_add_remove(self, model_vars):
        """A stream added mid-session gets fresh state, and removing a
        stream frees its slot for reuse with re-zeroed carries."""
        model, variables = model_vars
        chunk = 4
        sess = StreamingSession(model, variables, capacity=2, chunk=chunk)
        a = sess.add_stream()
        va, vb = _video(8, 3), _video(8, 4)
        out_a1 = sess.feed({a: va[:4]})[a]
        b = sess.add_stream()
        sess.feed({a: va[4:], b: vb[:4]})
        sess.remove_stream(a)
        c = sess.add_stream()          # reuses slot a
        assert c == a
        out_c = sess.feed({c: va[:4]})[c]
        # fresh slot c on the same data reproduces the original first
        # chunk — stale carries would leak stream a's state
        np.testing.assert_allclose(out_c, out_a1, atol=1e-5)

    def test_uint8_session_bit_identical(self, model_vars):
        """dtype=uint8 session (4x cheaper transfers) == float session
        on the same integral pixel values."""
        model, variables = model_vars
        rng = np.random.default_rng(7)
        video = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
        outs = {}
        for dt in (np.float32, np.uint8):
            sess = StreamingSession(model, variables, capacity=2,
                                    chunk=4, dtype=dt)
            slot = sess.add_stream()
            outs[dt] = np.concatenate([
                sess.feed({slot: video[:4].astype(dt)})[slot],
                sess.feed({slot: video[4:].astype(dt)})[slot]])
        np.testing.assert_array_equal(outs[np.uint8], outs[np.float32])

    def test_capacity_exhausted(self, model_vars):
        model, variables = model_vars
        sess = StreamingSession(model, variables, capacity=1, chunk=4)
        sess.add_stream()
        with pytest.raises(RuntimeError, match="slots in use"):
            sess.add_stream()

    def test_bad_feed_shapes_rejected(self, model_vars):
        model, variables = model_vars
        sess = StreamingSession(model, variables, capacity=2, chunk=4)
        slot = sess.add_stream()
        with pytest.raises(ValueError, match="expected"):
            sess.feed({slot: _video(3, 0)})
        with pytest.raises(ValueError, match="not active"):
            sess.feed({1: _video(4, 0)})


class TestMeshShardedSession:
    def test_sharded_session_matches_unsharded(self, model_vars):
        """Slot axis sharded over the 8-virtual-device mesh == plain
        session (the serving scale-out path, SURVEY.md §5 long-context
        row): identical outputs per fed slot across multiple chunks."""
        from mimamo_tpu import parallel
        model, variables = model_vars
        mesh = parallel.make_mesh()
        assert mesh.devices.size == 8
        plain = StreamingSession(model, variables, capacity=8, chunk=4)
        shard = StreamingSession(model, variables, capacity=8, chunk=4,
                                 mesh=mesh)
        videos = {0: _video(8, 10), 1: _video(8, 11), 2: _video(8, 12)}
        slots_p = {k: plain.add_stream() for k in videos}
        slots_s = {k: shard.add_stream() for k in videos}
        for start in (0, 4):
            feed = {k: v[start:start + 4] for k, v in videos.items()}
            out_p = plain.feed({slots_p[k]: f for k, f in feed.items()})
            out_s = shard.feed({slots_s[k]: f for k, f in feed.items()})
            for k in videos:
                np.testing.assert_allclose(out_s[slots_s[k]],
                                           out_p[slots_p[k]], atol=1e-5)

    def test_capacity_must_divide_mesh(self, model_vars):
        from mimamo_tpu import parallel
        model, variables = model_vars
        with pytest.raises(ValueError, match="divisible"):
            StreamingSession(model, variables, capacity=6,
                             mesh=parallel.make_mesh())

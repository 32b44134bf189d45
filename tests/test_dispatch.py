"""Process-wide in-flight execution cap (mimamo_tpu.dispatch).

The axon tunnel wedges past ~2 outstanding async executions
(CLAUDE.md); round 3 enforced the limit per call site by convention,
which left concurrent callers (serve's async predict worker + stream
feeds) able to stack 3 (VERDICT round-3 weak item 4). These tests pin
the semaphore semantics and that three concurrent real callers stay
within the cap without deadlock.
"""

import threading
import time

import numpy as np
import jax
import pytest

from mimamo_tpu import dispatch
from mimamo_tpu.runner import Mimamo
from mimamo_tpu.streaming import StreamingSession

from test_runner import tiny_config


class TestSemaphore:
    def test_third_dispatch_blocks_until_fetch(self):
        p1 = dispatch.dispatch(lambda: np.float32(1.0))
        p2 = dispatch.dispatch(lambda: np.float32(2.0))
        got = []
        started = threading.Event()
        done = threading.Event()

        def third():
            started.set()
            p3 = dispatch.dispatch(lambda: np.float32(3.0))
            got.append(p3.fetch())
            done.set()

        t = threading.Thread(target=third, daemon=True)
        t.start()
        started.wait(5)
        assert not done.wait(0.3), "3rd dispatch should block at cap 2"
        assert p1.fetch() == 1.0              # frees one slot
        assert done.wait(5), "3rd dispatch never unblocked"
        t.join(5)
        assert got == [3.0]
        p2.release()
        assert dispatch.inflight() == 0

    def test_nonblocking_returns_none_at_cap(self):
        p1 = dispatch.dispatch(lambda: 1)
        p2 = dispatch.dispatch(lambda: 2)
        assert dispatch.dispatch(lambda: 3, _block=False) is None
        p1.release()
        p3 = dispatch.dispatch(lambda: 3, _block=False)
        assert p3 is not None and p3.fetch() == 3
        p2.release()
        assert dispatch.inflight() == 0

    def test_failed_dispatch_releases_slot(self):
        with pytest.raises(RuntimeError):
            dispatch.dispatch(self._boom)
        assert dispatch.inflight() == 0
        # cap still 2 afterwards (no slot leaked)
        p1 = dispatch.dispatch(lambda: 1)
        p2 = dispatch.dispatch(lambda: 2)
        assert dispatch.dispatch(lambda: 3, _block=False) is None
        p1.release()
        p2.release()

    @staticmethod
    def _boom():
        raise RuntimeError("boom")

    def test_release_idempotent(self):
        p = dispatch.dispatch(lambda: 1)
        p.release()
        p.release()                            # second release: no-op
        assert dispatch.inflight() == 0
        # BoundedSemaphore would raise if over-released; prove cap intact
        a = dispatch.dispatch(lambda: 1)
        b = dispatch.dispatch(lambda: 2)
        assert dispatch.dispatch(lambda: 3, _block=False) is None
        a.release()
        b.release()


class TestRunSettled:
    def test_returns_result_and_frees_slot(self):
        """run_settled executes one device op under the cap, syncs it,
        and releases its slot (big eager concatenates must not stack
        next to capped program dispatches — round-4 review finding)."""
        import jax.numpy as jnp
        a = jnp.arange(6.0).reshape(2, 3)
        b = a + 10.0
        before = dispatch.inflight()
        out = dispatch.run_settled(jnp.concatenate, [a, b], axis=0)
        assert dispatch.inflight() == before
        np.testing.assert_array_equal(
            np.asarray(out), np.concatenate([np.asarray(a),
                                             np.asarray(b)]))

    def test_failure_releases_slot(self):
        before = dispatch.inflight()
        with pytest.raises((AttributeError, TypeError)):
            dispatch.run_settled(lambda: object())   # no .ndim
        assert dispatch.inflight() == before

    def test_pytree_result(self):
        """Pytree results (e.g. jitted init_variables) sync via a
        first-leaf probe and free their slot (round-5: every startup
        init routed through run_settled)."""
        import jax.numpy as jnp
        before = dispatch.inflight()
        out = dispatch.run_settled(
            lambda: {"a": jnp.ones((2, 2)), "b": jnp.zeros(3)})
        assert dispatch.inflight() == before
        assert set(out) == {"a", "b"}
        np.testing.assert_array_equal(np.asarray(out["a"]),
                                      np.ones((2, 2)))


class TestConcurrentCallers:
    def test_three_concurrent_device_callers(self):
        """Two predict_from_crops pipelines + one StreamingSession.feed
        loop run concurrently: no deadlock (the depth-2 pipelines
        degrade to depth-1 under contention instead of blocking while
        holding a pending), outputs identical to serial runs, and the
        process never exceeds MAX_INFLIGHT outstanding executions."""
        model = Mimamo(tiny_config(clip_len=8, stride=4))
        variables = model.init_variables(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        crops_a = rng.uniform(0, 255, (24, 32, 32, 3)).astype(np.float32)
        crops_b = rng.uniform(0, 255, (20, 32, 32, 3)).astype(np.float32)
        chunk = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)

        # serial references (warms the compile cache too)
        import jax.numpy as jnp
        want_a = model.predict_from_crops(variables, jnp.asarray(crops_a),
                                          batch_clips=2)
        want_b = model.predict_from_crops(variables, jnp.asarray(crops_b),
                                          batch_clips=2)
        ref_sess = StreamingSession(model, variables, capacity=2, chunk=8)
        slot = ref_sess.add_stream()
        want_feed = [ref_sess.feed({slot: chunk})[slot]
                     for _ in range(4)]

        results = {}
        errors = []

        def run_predict(key, crops):
            try:
                results[key] = model.predict_from_crops(
                    variables, jnp.asarray(crops), batch_clips=2)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def run_feed():
            try:
                sess = StreamingSession(model, variables, capacity=2,
                                        chunk=8)
                s = sess.add_stream()
                results["feed"] = [sess.feed({s: chunk})[s]
                                   for _ in range(4)]
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=run_predict,
                                    args=("a", crops_a), daemon=True),
                   threading.Thread(target=run_predict,
                                    args=("b", crops_b), daemon=True),
                   threading.Thread(target=run_feed, daemon=True)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
            assert not t.is_alive(), \
                f"deadlock: caller still running after {time.time() - t0:.0f}s"
        assert not errors, errors
        np.testing.assert_allclose(results["a"], want_a, atol=1e-5)
        np.testing.assert_allclose(results["b"], want_b, atol=1e-5)
        for got, want in zip(results["feed"], want_feed):
            np.testing.assert_allclose(got, want, atol=1e-5)
        assert dispatch.inflight() == 0
        assert dispatch.peak_inflight() <= dispatch.MAX_INFLIGHT

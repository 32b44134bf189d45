"""Batch-of-streams serving: many concurrent videos, one compiled program.

The reference processes one video per script invocation (SURVEY.md §3.1);
its long-video story is chunking. The TPU-native scaling mechanism
(SURVEY.md §5 "long-context" row) is a *batch-of-streams* axis: a fixed
capacity of B independent video streams, each with its own GRU carry and
one frame of pair context, advancing together through one jitted
``predict_stream`` call per chunk — so a serving process keeps the MXU
busy across many low-fps sources without recompilation or per-stream
dispatch.

Slot lifecycle: ``add_stream`` claims a free slot (carry zeroed on
device), ``feed`` advances any subset of slots by one fixed-size chunk
(idle slots burn lanes but keep shapes static), ``remove_stream`` frees
the slot. A fresh stream's first chunk duplicates its first frame as
pair context AND zeroes that step's micro embedding (via the model's
``first_pair_invalid`` mask), so step 0 matches clip mode exactly.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .compile import tuned_jit
from .runner import Mimamo, Variables
from .temporal import init_carries


class StreamingSession:
    def __init__(self, model: Mimamo, variables: Variables,
                 capacity: int = 8, chunk: int = 16, mesh=None,
                 dtype=np.float32):
        """``mesh``: optional device mesh; the slot (stream) axis is
        sharded over it — the batch-of-streams axis IS the scaling axis
        for serving (SURVEY.md §5 "long-context" row), so a pod slice
        serves ``capacity`` streams with params replicated and the GSPMD
        partitioner keeping every carry/context shard device-resident.

        ``dtype=np.uint8`` ships chunks to the device as uint8 (4x less
        transfer; the model casts on device — outputs are identical for
        integral pixel values)."""
        self.model = model
        self.capacity = capacity
        self.chunk = chunk
        self.dtype = np.dtype(dtype)
        cfg = model.config
        s = cfg.clip.crop_size
        self._gru = init_carries(cfg.temporal, capacity)
        self._context = jnp.zeros((capacity, 1, s, s, 3), self.dtype)
        self._free = list(range(capacity))
        self._fresh = np.zeros(capacity, bool)
        self._slot_axis = 0 if cfg.temporal.gru_layers == 1 else 1
        self.mesh = mesh
        self._x_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from . import parallel
            n = mesh.devices.size
            if capacity % n:
                raise ValueError(f"capacity {capacity} must be divisible "
                                 f"by the mesh size {n}")
            axis = mesh.axis_names[0]
            slot = (P(axis) if self._slot_axis == 0
                    else P(None, axis))
            self._gru = jax.tree_util.tree_map(
                lambda c: jax.device_put(c, NamedSharding(mesh, slot)),
                self._gru)
            self._x_sharding = NamedSharding(mesh, P(axis))
            self._context = jax.device_put(self._context,
                                           self._x_sharding)
            variables = parallel.replicate(variables, mesh)
        self.variables = variables

    # -- slot management -----------------------------------------------------

    def add_stream(self) -> int:
        """Claim a slot for a new stream; returns its id."""
        if not self._free:
            raise RuntimeError(
                f"all {self.capacity} stream slots in use")
        slot = self._free.pop(0)
        # One capped, probe-synced program (see _zero_slot docstring).
        from . import dispatch as _dp
        p = _dp.dispatch(_zero_slot, self._gru, jnp.int32(slot),
                         self._slot_axis)
        gru = p.value
        try:
            leaf = jax.tree_util.tree_leaves(gru)[0]
            jax.device_get(
                leaf[tuple(slice(0, 1) for _ in range(leaf.ndim))])
        finally:
            p.release()
        self._gru = gru
        self._fresh[slot] = True
        return slot

    def remove_stream(self, slot: int) -> None:
        if (not isinstance(slot, (int, np.integer))
                or slot in self._free or not 0 <= slot < self.capacity):
            raise ValueError(f"slot {slot} is not active")
        self._free.append(slot)

    @property
    def active_slots(self):
        return [i for i in range(self.capacity) if i not in self._free]

    @property
    def free_slots(self) -> int:
        """Unclaimed slot count (public admission query — callers must
        not reach into ``_free``)."""
        return len(self._free)

    # -- inference -----------------------------------------------------------

    def feed(self, frames_by_slot: Dict[int, np.ndarray]
             ) -> Dict[int, np.ndarray]:
        """Advance streams by one chunk.

        Args:
          frames_by_slot: slot -> [chunk, S, S, 3] float 0..255 aligned
            crops (every value must have exactly ``self.chunk`` frames;
            slots not present simply don't advance this call... but their
            lanes still execute, so group arrivals when possible).

        Returns:
          slot -> [chunk, 2] per-frame (valence, arousal).
        """
        if not frames_by_slot:
            return {}
        cfg = self.model.config.clip
        s = cfg.crop_size
        batch = np.zeros((self.capacity, self.chunk, s, s, 3), self.dtype)
        for slot, f in frames_by_slot.items():
            if (not isinstance(slot, (int, np.integer))
                    or not 0 <= slot < self.capacity
                    or slot in self._free):
                raise ValueError(f"slot {slot} is not active")
            if f.shape != (self.chunk, s, s, 3):
                raise ValueError(
                    f"slot {slot}: expected {(self.chunk, s, s, 3)}, "
                    f"got {f.shape}")
            batch[slot] = f
        x = (jnp.asarray(batch) if self._x_sharding is None
             else jax.device_put(batch, self._x_sharding))

        # Fresh streams: own first frame as pair context AND the model
        # zeroes their step-0 micro embedding (clip-mode equivalence).
        fed = np.asarray(sorted(frames_by_slot))
        fresh_now = jnp.asarray(self._fresh.copy())
        fed_mask = np.zeros(self.capacity, bool)
        fed_mask[fed] = True

        # One slot from the process-wide in-flight budget
        # (mimamo_tpu.dispatch) covers the WHOLE feed — the advance and
        # the slot-masked state commit run as ONE jitted program (the
        # commit used to be separate eager jnp.where executions, which
        # escaped the in-flight cap and cost extra tunnel round trips;
        # round-4 review finding). The slot is released by the host
        # fetch below, so a concurrent predict_from_crops pipeline plus
        # this feed can never stack a 3rd outstanding execution.
        from . import dispatch as _dp
        p = _dp.dispatch(self._advance, self.variables, x,
                         self._context, self._gru, fresh_now,
                         jnp.asarray(fed_mask))
        out, self._gru, self._context = p.value
        for slot in fed:
            self._fresh[slot] = False

        out_np = p.fetch(out)
        return {slot: out_np[slot] for slot in frames_by_slot}

    @functools.partial(tuned_jit, static_argnums=0)
    def _advance(self, variables, x, context, gru, fresh, fed_mask):
        # Fresh slots use their own first frame as pair context.
        ctx_in = jnp.where(fresh[:, None, None, None, None],
                           x[:, :1], context)
        out, new_gru, _last = self.model._predict_stream(
            variables, ctx_in, x, gru, first_pair_invalid=fresh)
        # Commit state only for slots that were actually fed.
        new_gru = _select_slots(new_gru, gru, fed_mask, self._slot_axis)
        new_context = jnp.where(fed_mask[:, None, None, None, None],
                                x[:, -1:], context)
        return out, new_gru, new_context


@functools.partial(jax.jit, static_argnums=(2,))
def _zero_slot(carries, slot, axis):
    """Zero one slot's carries as ONE jitted program (slot traced, so
    every add_stream reuses a single compile). Eager per-leaf
    .at[].set executions here would bypass the process-wide in-flight
    cap next to a concurrent caller's capped dispatches (round-4
    second-pass review finding); the call site runs this under
    dispatch and probe-syncs it."""
    def z(c):
        idx = (slice(None),) * axis + (slot,)
        return c.at[idx].set(0.0)
    return jax.tree_util.tree_map(z, carries)


def _select_slots(new, old, mask, axis):
    def sel(n, o):
        if axis == 1:                       # [L, B, H] layout
            m = mask[None, :, None]
        else:                               # [B, H]
            m = mask[:, None]
        return jnp.where(m, n, o)
    return jax.tree_util.tree_map(sel, new, old)

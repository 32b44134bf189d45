"""Two-stream temporal model: micro (phase CNN + GRU) and macro (ResNet
feature GRU) streams fused into per-frame (valence, arousal).

Reference behavior (SURVEY.md §2 "Two-stream temporal model", Appendix A.4;
mount empty — shape from the MIMAMO paper + survey defaults): micro stream
encodes stacked phase-diff maps with a small CNN, macro stream projects the
2048-d appearance embedding; each feeds a GRU; hidden states are fused by
concatenation through an FC head, outputs in [-1, 1].

TPU-first design:
  * The GRU is a hand-rolled cell under ``jax.lax.scan`` — fused (3H)-wide
    matmuls per step, torch gate order/conventions (r, z, n; reset gate
    applied to the hidden projection *including its bias*) so reference
    ``state_dict`` weights import 1:1.
  * Streaming: ``__call__`` accepts and returns GRU carries, so full-length
    videos run chunk-by-chunk in O(chunk) memory with the hidden state
    threaded across jit calls (SURVEY.md §5 "long-context" row).
  * Micro CNN runs on NHWC layout with time folded into the batch axis so
    conv sees one large batch (MXU-friendly).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import TemporalSpec


def _gru_cell(h_prev: jnp.ndarray, x_g: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray) -> jnp.ndarray:
    """One torch-convention GRU step given precomputed input gates."""
    h_proj = h_prev @ w_hh.T + b_hh
    xr, xz, xn = jnp.split(x_g, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h_prev


def _input_proj(xs: jnp.ndarray, w_ih: jnp.ndarray,
                b_ih: jnp.ndarray) -> jnp.ndarray:
    # Input projections for all steps at once: one big [B*T, D]x[D, 3H]
    # matmul keeps the MXU busy; only the recurrent matmul is sequential.
    return jnp.einsum("btd,gd->btg", xs, w_ih) + b_ih


class GRU(nn.Module):
    """GRU over the time axis, torch ``nn.GRU`` conventions.

    Weight layout matches torch: ``w_ih``/``w_hh`` are [3H, D]/[3H, H] with
    gate blocks stacked in (reset, update, new) order, so a reference
    checkpoint's ``weight_ih_l0`` etc. can be loaded verbatim. With
    ``layers > 1`` extra layers' params are prefixed ``l<i>_`` (layer 0
    keeps the flat names for checkpoint compatibility) and the carry is
    stacked [L, B, H] (torch ``h_n`` layout).

    With ``in_dim`` set, parameters are declared in ``setup`` so a parent
    module can fetch them via :meth:`layer_weights` and run its own fused
    scan (see ``TwoStreamRNN``); without it, ``__call__`` declares them
    lazily from the input shape (same names either way).
    """

    hidden: int
    layers: int = 1
    in_dim: Optional[int] = None
    # lax.scan unroll factor (identical math; see TemporalSpec.scan_unroll)
    unroll: int = 1

    def setup(self):
        if self.in_dim is None:
            self._weights = None
            return
        self._weights = tuple(
            self._declare(li, self.in_dim if li == 0 else self.hidden)
            for li in range(self.layers))

    def _uinit(self, key, shape):
        k = 1.0 / jnp.sqrt(self.hidden)
        return jax.random.uniform(key, shape, jnp.float32, -k, k)

    def _declare(self, li: int, d: int):
        h = self.hidden
        suffix = "" if li == 0 else f"l{li}_"
        return (self.param(f"{suffix}w_ih", self._uinit, (3 * h, d)),
                self.param(f"{suffix}w_hh", self._uinit, (3 * h, h)),
                self.param(f"{suffix}b_ih", self._uinit, (3 * h,)),
                self.param(f"{suffix}b_hh", self._uinit, (3 * h,)))

    def layer_weights(self, li: int):
        """(w_ih, w_hh, b_ih, b_hh) of layer ``li`` (requires in_dim)."""
        if self._weights is None:
            raise ValueError("layer_weights requires in_dim at "
                             "construction")
        return self._weights[li]

    def _layer(self, xs, h0, d, suffix):
        li = 0 if suffix == "" else int(suffix[1:-1])
        if self._weights is not None:
            w_ih, w_hh, b_ih, b_hh = self._weights[li]
        else:
            w_ih, w_hh, b_ih, b_hh = self._declare(li, d)
        x_proj = _input_proj(xs, w_ih, b_ih)

        def step(carry, x_g):
            h_new = _gru_cell(carry, x_g, w_hh, b_hh)
            return h_new, h_new

        h_final, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1),
                                   unroll=self.unroll)
        return jnp.swapaxes(ys, 0, 1), h_final

    @nn.compact
    def __call__(self, xs: jnp.ndarray,
                 h0: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs: [B, T, D] -> (ys: [B, T, H], h_final).

        ``h0``/``h_final`` are [B, H] for a single layer (back-compat) and
        [L, B, H] for stacked GRUs.
        """
        b, _t, d = xs.shape
        if self.layers == 1:
            h_init = (h0 if h0 is not None
                      else jnp.zeros((b, self.hidden), xs.dtype))
            return self._layer(xs, h_init, d, "")
        finals = []
        ys = xs
        for li in range(self.layers):
            h_init = (h0[li] if h0 is not None
                      else jnp.zeros((b, self.hidden), xs.dtype))
            suffix = "" if li == 0 else f"l{li}_"
            ys, h_f = self._layer(ys, h_init,
                                  d if li == 0 else self.hidden, suffix)
            finals.append(h_f)
        return ys, jnp.stack(finals)


class MicroCNN(nn.Module):
    """Small CNN encoding a stacked phase-diff map into an embedding.

    Layer names (``conv1``/``bn1``/... /``fc``) are the checkpoint
    contract: ``checkpoints.load_temporal_state_dict`` maps a reference
    two-stream ``.pth``'s micro-CNN tensors onto them 1:1 (the flatten
    before ``fc`` is NHWC here vs torch's NCHW — the importer permutes
    the fc kernel accordingly).
    """

    spec: TemporalSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [N, P, P, C] (NHWC) -> [N, micro_embed_dim]."""
        for i, feats in enumerate(self.spec.micro_cnn_features):
            x = nn.Conv(feats, (3, 3), padding="SAME", use_bias=False,
                        name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             name=f"bn{i + 1}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.spec.micro_embed_dim, name="fc")(x)


class TwoStreamRNN(nn.Module):
    """Micro + macro streams -> dual GRU -> fused (valence, arousal)."""

    spec: TemporalSpec

    @nn.compact
    def __call__(
        self,
        phase_stacks: Optional[jnp.ndarray],  # [B, T-1|T, C, P, P]
        rgb_feats: Optional[jnp.ndarray],     # [B, T, F] appearance
        carries: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        train: bool = False,
        first_pair_invalid: Optional[jnp.ndarray] = None,
        num_frames: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Returns ([B, T, num_outputs] per-frame predictions, new carries).

        When ``carries`` is None, both GRUs start from zeros (clip mode);
        passing the previous chunk's carries gives streaming over
        arbitrarily long videos (BASELINE.json config 3).
        ``first_pair_invalid`` ([B] bool) zeroes the step-0 micro
        embedding per batch row in streaming (tm1 == t) mode — used by
        StreamingSession so a fresh stream's first step exactly matches
        clip mode's zero-padded first pair.

        Stream ablations (``spec.streams``, the paper's micro-/macro-
        only baselines): the inactive stream's input may be None, its
        parameters are never created, and its carry passes through
        unchanged (zeros when starting fresh) so the streaming carry
        contract is identical across all three configurations.
        ``num_frames`` is required only for ``streams="micro"`` (no
        rgb_feats to infer T from) when the phase stacks hold T-1 pairs.
        """
        spec = self.spec
        use_micro = spec.streams in ("both", "micro")
        use_macro = spec.streams in ("both", "macro")
        if spec.streams not in ("both", "micro", "macro"):
            raise ValueError(f"unknown streams {spec.streams!r}")
        if use_micro and phase_stacks is None:
            raise ValueError(f"streams={spec.streams!r} needs phase_stacks")
        if use_macro and rgb_feats is None:
            raise ValueError(f"streams={spec.streams!r} needs rgb_feats")
        if use_macro:
            b, t = rgb_feats.shape[0], rgb_feats.shape[1]
        else:
            b, tm1 = phase_stacks.shape[0], phase_stacks.shape[1]
            t = num_frames if num_frames is not None else tm1 + 1

        ys_list, w = [], spec.snippet_len
        c_micro, c_macro = carries if carries is not None else (None, None)
        h_micro, h_macro = c_micro, c_macro

        def pool_snippets(x):
            if w <= 1:
                return x
            if t % w:
                raise ValueError(f"clip length {t} not divisible by "
                                 f"snippet_len {w}")
            return jnp.mean(x.reshape(b, t // w, w, -1), axis=2)

        micro = macro = None
        if use_micro:
            tm1 = phase_stacks.shape[1]
            # Micro: fold time into batch for the CNN, NCHW -> NHWC.
            pmaps = jnp.transpose(
                phase_stacks.reshape((b * tm1,) + phase_stacks.shape[2:]),
                (0, 2, 3, 1))
            micro = MicroCNN(spec, name="micro_cnn")(pmaps, train=train)
            micro = micro.reshape(b, tm1, -1)
            if tm1 == t - 1:
                # Align pair features to frames: frame 0 has no
                # predecessor.
                micro = jnp.pad(micro, ((0, 0), (1, 0), (0, 0)))
            elif tm1 != t:
                raise ValueError(f"phase stacks T-1={tm1} vs frames T={t}")
            if first_pair_invalid is not None:
                keep = 1.0 - first_pair_invalid.astype(micro.dtype)
                micro = micro.at[:, 0].multiply(keep[:, None])
            micro = pool_snippets(micro)
        if use_macro:
            macro = nn.Dense(spec.macro_embed_dim,
                             name="macro_proj")(rgb_feats)
            macro = pool_snippets(nn.relu(macro))

        if use_micro and use_macro:
            gru_micro = GRU(spec.gru_hidden, spec.gru_layers,
                            in_dim=micro.shape[-1],
                            unroll=spec.scan_unroll, name="gru_micro")
            gru_macro = GRU(spec.gru_hidden, spec.gru_layers,
                            in_dim=macro.shape[-1],
                            unroll=spec.scan_unroll, name="gru_macro")
            if spec.fused_gru:
                # One lax.scan advances BOTH streams per step: the two
                # recurrences are independent, so fusing them halves the
                # sequential-matmul chain length (GRU wall time is
                # latency-bound on TPU — tiny [B,H]x[H,3H] dots can't
                # fill the MXU).
                ys_micro, ys_macro, h_micro, h_macro = _dual_gru(
                    gru_micro, gru_macro, micro, macro, c_micro, c_macro,
                    spec.gru_layers, spec.gru_hidden,
                    unroll=spec.scan_unroll)
            else:
                ys_micro, h_micro = gru_micro(micro, c_micro)
                ys_macro, h_macro = gru_macro(macro, c_macro)
            ys_list = [ys_micro, ys_macro]
        elif use_micro:
            ys, h_micro = GRU(spec.gru_hidden, spec.gru_layers,
                              in_dim=micro.shape[-1],
                              unroll=spec.scan_unroll,
                              name="gru_micro")(micro, c_micro)
            ys_list = [ys]
        else:
            ys, h_macro = GRU(spec.gru_hidden, spec.gru_layers,
                              in_dim=macro.shape[-1],
                              unroll=spec.scan_unroll,
                              name="gru_macro")(macro, c_macro)
            ys_list = [ys]
        if h_micro is None:
            h_micro = init_carries(spec, b)[0]
        if h_macro is None:
            h_macro = init_carries(spec, b)[1]

        fused = (jnp.concatenate(ys_list, axis=-1) if len(ys_list) > 1
                 else ys_list[0])
        fused = nn.relu(nn.Dense(spec.fusion_hidden, name="fusion")(fused))
        out = nn.Dense(spec.num_outputs, name="head")(fused)
        if spec.output_activation == "tanh":
            out = jnp.tanh(out)
        if w > 1:
            # Broadcast snippet outputs back to per-frame predictions.
            out = jnp.repeat(out, w, axis=1)
        return out, (h_micro, h_macro)


def _dual_gru(ga: GRU, gb: GRU, xa: jnp.ndarray, xb: jnp.ndarray,
              h0a, h0b, layers: int, hidden: int, unroll: int = 1):
    """Run two independent stacked GRUs through shared scans.

    Same math (and parameters) as calling each GRU separately — verified
    bit-level in tests — but each time step's two recurrent matmuls are
    issued inside one scan body instead of two back-to-back scans.
    """
    b = xa.shape[0]

    def init_c(h0, li, like):
        if h0 is None:
            return jnp.zeros((b, hidden), like.dtype)
        return h0 if layers == 1 else h0[li]

    finals_a, finals_b = [], []
    for li in range(layers):
        wa_ih, wa_hh, wa_bih, wa_bhh = ga.layer_weights(li)
        wb_ih, wb_hh, wb_bih, wb_bhh = gb.layer_weights(li)
        pa = _input_proj(xa, wa_ih, wa_bih)
        pb = _input_proj(xb, wb_ih, wb_bih)

        def step(carry, x_g, _wa=(wa_hh, wa_bhh), _wb=(wb_hh, wb_bhh)):
            ha, hb = carry
            ha = _gru_cell(ha, x_g[0], *_wa)
            hb = _gru_cell(hb, x_g[1], *_wb)
            return (ha, hb), (ha, hb)

        (hfa, hfb), (ysa, ysb) = jax.lax.scan(
            step, (init_c(h0a, li, xa), init_c(h0b, li, xb)),
            (jnp.swapaxes(pa, 0, 1), jnp.swapaxes(pb, 0, 1)),
            unroll=unroll)
        xa = jnp.swapaxes(ysa, 0, 1)
        xb = jnp.swapaxes(ysb, 0, 1)
        finals_a.append(hfa)
        finals_b.append(hfb)
    hfa = finals_a[0] if layers == 1 else jnp.stack(finals_a)
    hfb = finals_b[0] if layers == 1 else jnp.stack(finals_b)
    return xa, xb, hfa, hfb


def init_carries(spec: TemporalSpec, batch: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = ((batch, spec.gru_hidden) if spec.gru_layers == 1
             else (spec.gru_layers, batch, spec.gru_hidden))
    z = jnp.zeros(shape, jnp.float32)
    return z, z

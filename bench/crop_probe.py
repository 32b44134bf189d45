"""Crop-stage probe: the last unprobed device stage (4.4-5.7 ms/384f).

The on-device crop (`preprocess.crop_and_resize`) is two t-batched
tiny GEMMs ([112,src]@[src,~350] per frame) built from per-frame hat
matrices. The stage-timing rows (BASELINE.md, `stages.py --chain 6`)
put it at 4.4-5.7 ms per 384-frame step from a 128x128 source — about
60 GB/s and 1.6 TFLOP/s, an order of magnitude under BOTH roofline
bounds (265 MB analytic -> 0.37 ms at the measured 712 GB/s; 8 GFLOP
-> 0.05 ms at the measured 169 TFLOP/s). Every other stage has either
a shipped optimization or a closing negative result; this probe
settles crop with measurements:

  1. `matmul_framesalt` — the shipped formulation, salt on frames only
     (the stages.py convention: hat-matrix construction CSEs across
     the chain, matching the historical 4.4 ms row).
  2. `matmul_fullsalt` — salt perturbs the boxes too, so construction
     is paid per application (the honest per-call cost on the predict
     path, where boxes change every chunk).
  3. `gemms_only` / `construct_only` — attribution split: precomputed
     hat matrices vs building them (elementwise over [T,112,src]).
  4. `gather4` — the SAME sampling positions via `warp_similarity`
     with axis-aligned inverse maps (4-tap vectorized gather, no
     GEMMs); bitwise-comparable math, so a direct swap candidate.
  5. `matmul_bf16` — both GEMMs with bf16 operands (default TPU matmul
     precision already rounds inputs to bf16; this additionally
     rounds the [T,P,W,C] intermediate and halves its traffic).
  6. `planar_tc` — channel-planar reformulation: x -> [T,H,C*W] so
     contraction 1 keeps the baseline shape but contraction 2's rhs
     [T,P*C,W] is contiguous in W (no pre-GEMM relayout; the output
     transpose [T,Q,P,C]->[T,P,Q,C] is counted, it is part of the
     formulation's cost).
  7. `gemm_ceiling` — one NON-batched GEMM of the identical FLOP count
     ([T*112,src]@[src,W*C]): what the MXU does when the work is not
     chopped into 384 per-frame batch elements. An upper bound no
     per-frame formulation can reach (the hat matrices differ per
     frame), printed to size the batching tax.

Parity: every numeric variant is checked against the shipped
formulation before timing (scale-relative; bf16 gets a bf16-class
tolerance). Verdict goes to BASELINE.md either way.

HARDWARE VERDICT (v5e, 2026-08-19 — full rows in BASELINE.md):
  * The matmul variants are indistinguishable at every chain length
    because NONE of them is the bound: measured ms/application ≈
    (28 ms dispatch floor)/chain at k = 6, 24 AND 96, so real crop
    compute is <=0.3 ms/384f (~its 0.37 ms roofline). The historical
    "crop 4.4-5.7 ms" stage rows were floor artifacts. Stage CLOSED.
  * gather4 (= the production `warp_similarity` align path) is REAL
    compute: ~190 ms/384f, chain-invariant, even with axis-aligned
    transforms — XLA's per-pixel 4-tap gather lowering, not rotation.
    If on-device alignment ever needs to beat ~2k f/s/chip, the
    candidate reformulations (untried; each trades exactness or
    bounded angle for gather-freedom): (a) 3-shear rotation where
    each shear's integer row-shift is materialized as ~2*tan(th/2)*S
    shifted image copies + per-row elementwise select, fractional
    part as a 2-tap lerp (O(angle) copies, exact geometry, slightly
    different reconstruction filter than direct bilinear); (b) shears
    as FFT phase ramps on the padded canvas (rides the existing
    DFT-matmul machinery; sinc reconstruction + wrap margins).
  * The probe's parity gate caught a REAL production bug: the align
    path's coordinate einsum bf16-rounds on TPU (0.26-1.75 px
    position error by source scale); fixed to elementwise FMAs in
    preprocess.warp_similarity — this gate is the regression test.

    python bench/crop_probe.py [--cpu] [--batch 8] [--clip-len 48]
                               [--src 128] [--iters 30] [--chain 6]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip-len", type=int, default=48)
    ap.add_argument("--src", type=int, default=128,
                    help="source frame H=W (128 matches the stages.py "
                         "row; try 256 for the corpus-like regime)")
    ap.add_argument("--out-size", type=int, default=112)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these variants (substring match); "
                         "long chains need this — the floor-resolving "
                         "chain 96 run would spend minutes re-timing "
                         "the 190 ms gather whose cost is already "
                         "chain-invariant")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from _timing import time_chained
    from mimamo_tpu import preprocess

    t = args.batch * args.clip_len
    h = w = args.src
    s = args.out_size
    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32)))
    # realistic per-frame boxes: jittered positions and sizes, all
    # in-bounds so no variant's clamping path dominates
    size = rng.uniform(0.55 * h, 0.85 * h, (t, 1)).astype(np.float32)
    y0x0 = rng.uniform(0.0, 1.0, (t, 2)).astype(np.float32) * (h - size)
    boxes = jax.device_put(jnp.asarray(
        np.concatenate([y0x0, size, size], axis=1)))

    def boxes_to_transforms(bx):
        """Axis-aligned [T,2,3] inverse maps with crop_and_resize's
        exact sampling convention: src = start + (i+0.5)*size/dst -
        0.5 + 0.5 (warp subtracts the 0.5 back)."""
        zeros = jnp.zeros_like(bx[:, 0])
        sy = bx[:, 2] / s
        sx = bx[:, 3] / s
        return jnp.stack([
            jnp.stack([sy, zeros, bx[:, 0]], axis=1),
            jnp.stack([zeros, sx, bx[:, 1]], axis=1)], axis=1)

    def matmul_crop(f, bx):
        return preprocess.crop_and_resize(f, bx, s)

    def gather4_crop(f, bx):
        return preprocess.warp_similarity(f, boxes_to_transforms(bx), s)

    def interp_mats(bx):
        ry = preprocess._interp_matrix(bx[:, 0], bx[:, 2], h, s)
        rx = preprocess._interp_matrix(bx[:, 1], bx[:, 3], w, s)
        return ry, rx

    def gemms(f, ry, rx):
        y = jnp.einsum("tph,thwc->tpwc", ry, f,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("tqw,tpwc->tpqc", rx, y,
                          preferred_element_type=jnp.float32)

    def matmul_bf16(f, bx):
        ry, rx = interp_mats(bx)
        y = jnp.einsum("tph,thwc->tpwc", ry.astype(jnp.bfloat16),
                       f.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.einsum("tqw,tpwc->tpqc", rx.astype(jnp.bfloat16),
                          y.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def _warp_coords(trs):
        """warp_similarity's exact (post-fix elementwise) coordinate
        math, shared by the alternative gather LOWERINGS below — same
        sampled positions, so parity vs gather4 is f32-tight."""
        gy, gx = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32) + 0.5,
                              jnp.arange(s, dtype=jnp.float32) + 0.5,
                              indexing="ij")
        a = trs.astype(jnp.float32)[:, None, None]
        src = (a[..., 0] * gy[None, :, :, None]
               + a[..., 1] * gx[None, :, :, None] + a[..., 2]) - 0.5
        sy = jnp.clip(src[..., 0], 0.0, h - 1.0)
        sx = jnp.clip(src[..., 1], 0.0, w - 1.0)
        y0f = jnp.floor(sy)
        x0f = jnp.floor(sx)
        return (y0f.astype(jnp.int32), x0f.astype(jnp.int32),
                sy - y0f, sx - x0f)

    def warp_taa(f, bx):
        """4-tap warp, each tap a take_along_axis on the flattened
        H*W axis (one linear index per output pixel) instead of
        warp_similarity's advanced-indexing batched gather."""
        y0, x0, fy, fx = _warp_coords(boxes_to_transforms(bx))
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        flat = f.astype(jnp.float32).reshape(t, h * w, 3)

        def g(yy, xx):
            idx = (yy * w + xx).reshape(t, s * s, 1)
            return jnp.take_along_axis(flat, idx,
                                       axis=1).reshape(t, s, s, 3)

        top = g(y0, x0) * (1 - fx)[..., None] + g(y0, x1) * fx[..., None]
        bot = g(y1, x0) * (1 - fx)[..., None] + g(y1, x1) * fx[..., None]
        return top * (1 - fy)[..., None] + bot * fy[..., None]

    def warp_taa_bf16(f, bx):
        """warp_taa with bf16 gather VALUES (f32 lerp): tests whether
        the gather cost is value-bytes-driven. Weights/coords stay f32
        so only the sampled pixels round (reference crops are uint8
        anyway)."""
        y0, x0, fy, fx = _warp_coords(boxes_to_transforms(bx))
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        flat = f.astype(jnp.bfloat16).reshape(t, h * w, 3)

        def g(yy, xx):
            idx = (yy * w + xx).reshape(t, s * s, 1)
            return jnp.take_along_axis(flat, idx, axis=1).reshape(
                t, s, s, 3).astype(jnp.float32)

        top = g(y0, x0) * (1 - fx)[..., None] + g(y0, x1) * fx[..., None]
        bot = g(y1, x0) * (1 - fx)[..., None] + g(y1, x1) * fx[..., None]
        return top * (1 - fy)[..., None] + bot * fy[..., None]

    def warp_patch(f, bx):
        """ONE lax.gather per frame fetching [2, 2, C] patches (the
        four taps are adjacent — a 48-byte contiguous-ish slice per
        output pixel instead of four scattered 12-byte reads). Edge
        starts are pre-clamped to h-2/w-2 and the tap weights routed
        to the correct patch row/col so clamping stays exact."""
        y0, x0, fy, fx = _warp_coords(boxes_to_transforms(bx))
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y0c = jnp.minimum(y0, h - 2)
        x0c = jnp.minimum(x0, w - 2)

        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))

        def per_frame(img, yy, xx):
            starts = jnp.stack([yy.ravel(), xx.ravel()], axis=1)
            patch = jax.lax.gather(
                img, starts, dnums, slice_sizes=(2, 2, 3),
                mode=jax.lax.GatherScatterMode.CLIP)
            return patch.reshape(s, s, 2, 2, 3)

        patches = jax.vmap(per_frame)(f.astype(jnp.float32), y0c, x0c)
        # weight per patch row r: the true taps are y0 (1-fy) and y1
        # (fy); route each onto whichever patch row matches (handles
        # both the y0==h-1 clamp and the y1 edge clamp exactly)
        def wts(t0, t1, f01, c0):
            w_r0 = (1 - f01) * (c0 == t0) + f01 * (c0 == t1)
            w_r1 = (1 - f01) * (c0 + 1 == t0) + f01 * (c0 + 1 == t1)
            return w_r0, w_r1

        wy0, wy1 = wts(y0, y1, fy, y0c)
        wx0, wx1 = wts(x0, x1, fx, x0c)
        top = (patches[..., 0, 0, :] * wx0[..., None]
               + patches[..., 0, 1, :] * wx1[..., None])
        bot = (patches[..., 1, 0, :] * wx0[..., None]
               + patches[..., 1, 1, :] * wx1[..., None])
        return top * wy0[..., None] + bot * wy1[..., None]

    def planar_tc(f, bx):
        ry, rx = interp_mats(bx)
        # [T,H,W,C] -> [T,H,C,W]: C is tiny so this relayout is the
        # formulation's entry fee; contraction 2 then needs none.
        xp = jnp.swapaxes(f, -1, -2)                      # [T,H,C,W]
        y = jax.lax.dot_general(                          # [T,P,C*W]
            ry, xp.reshape(t, h, 3 * w),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out = jax.lax.dot_general(                        # [T,Q,P*C]
            rx, y.reshape(t, s * 3, w),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.moveaxis(out.reshape(t, s, s, 3), 1, 2)

    # -- parity gates (unsalted, before any timing) ---------------------
    # Tolerances are bf16-class even for the f32 variants: on TPU the
    # SHIPPED matmul formulation itself rounds its GEMM inputs to bf16
    # (default matmul precision — no `precision=HIGHEST` in
    # crop_and_resize), so a pure-f32 gather differs from it by the
    # baseline's own rounding. That rounding is smaller than the
    # reference pipeline's own crop quantization (OpenFace writes
    # uint8 crop IMAGES: 0.5/255 ≈ 2e-3 relative), so it is not a
    # parity hazard; the gate here is for formulation bugs.
    ref = np.asarray(jax.jit(matmul_crop)(frames, boxes))
    scale = float(np.abs(ref).max())
    rows = []
    for name, fn, tol in [("gather4", gather4_crop, 2e-2),
                          ("matmul_bf16", matmul_bf16, 3e-2),
                          ("planar_tc", planar_tc, 2e-2)]:
        got = np.asarray(jax.jit(fn)(frames, boxes))
        rel = float(np.abs(got - ref).max()) / scale
        ok = rel <= tol
        rows.append({"parity": name, "rel": rel, "ok": ok})
        print(json.dumps(rows[-1]), flush=True)
        if not ok:
            raise SystemExit(f"parity FAILED for {name}: {rel}")
    # the alternative gather LOWERINGS sample the exact positions of
    # gather4 (shared coordinate helper) — f32-tight parity vs IT
    ref_g = np.asarray(jax.jit(gather4_crop)(frames, boxes))
    for name, fn in [("warp_taa", warp_taa), ("warp_patch", warp_patch)]:
        got = np.asarray(jax.jit(fn)(frames, boxes))
        rel = float(np.abs(got - ref_g).max()) / scale
        ok = rel <= 1e-5
        print(json.dumps({"parity": name + "_vs_gather4", "rel": rel,
                          "ok": ok}), flush=True)
        if not ok:
            raise SystemExit(f"parity FAILED for {name}: {rel}")

    # -- timing ---------------------------------------------------------
    k = args.chain

    def run(name, build):
        """build(salt_i) -> scalar contribution for application i."""
        if args.only is not None and not any(s in name
                                             for s in args.only):
            return None
        def chained(salt, *xs):
            return sum(build(salt + 17.0 * i, *xs) for i in range(k))
        dt = time_chained(jax.jit(chained), (frames, boxes),
                          args.iters, k)
        print(json.dumps({
            "variant": name, "ms_per_step": round(dt * 1e3, 3),
            "frames_per_sec": round(t / dt, 1)}), flush=True)
        return dt

    results = {}
    results["matmul_framesalt"] = run(
        "matmul_framesalt",
        lambda u, f, bx: jnp.sum(matmul_crop(f + u, bx)))
    results["matmul_fullsalt"] = run(
        "matmul_fullsalt",
        lambda u, f, bx: jnp.sum(matmul_crop(f + u, bx + 1e-3 * u)))
    results["gemms_only"] = run(
        "gemms_only",
        lambda u, f, bx: jnp.sum(gemms(f + u, *interp_mats(bx))))
    results["construct_only"] = run(
        "construct_only",
        lambda u, f, bx: sum(jnp.sum(m)
                             for m in interp_mats(bx + 1e-3 * u)))
    results["gather4_framesalt"] = run(
        "gather4_framesalt",
        lambda u, f, bx: jnp.sum(gather4_crop(f + u, bx)))
    results["gather4_fullsalt"] = run(
        "gather4_fullsalt",
        lambda u, f, bx: jnp.sum(gather4_crop(f + u, bx + 1e-3 * u)))
    results["warp_taa"] = run(
        "warp_taa",
        lambda u, f, bx: jnp.sum(warp_taa(f + u, bx)))
    results["warp_taa_bf16"] = run(
        "warp_taa_bf16",
        lambda u, f, bx: jnp.sum(warp_taa_bf16(f + u, bx)))
    # warp_patch: HARDWARE NEGATIVE RESULT 2026-08-19 — the [N,2,2,3]
    # gather output gets a T(8,128)-padded layout (42.7x expansion,
    # 9.19 GB per instance) and the chained program OOMs HBM at
    # compile. Patch-gathers are dead on this hardware generation;
    # variant kept for the record, not run by default.
    if args.only is not None and any(s in "warp_patch"
                                     for s in args.only):
        results["warp_patch"] = run(
            "warp_patch",
            lambda u, f, bx: jnp.sum(warp_patch(f + u, bx)))
    results["matmul_bf16"] = run(
        "matmul_bf16",
        lambda u, f, bx: jnp.sum(matmul_bf16(f + u, bx)))
    results["planar_tc"] = run(
        "planar_tc",
        lambda u, f, bx: jnp.sum(planar_tc(f + u, bx)))

    # FLOP-identical non-batched GEMM ceiling: [T*s, h] @ [h, 3w] and
    # [T*s, w] @ [w, 3s] stand in for the two batched contractions.
    a1 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (t * s, h)).astype(np.float32)))
    b1 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (h, 3 * w)).astype(np.float32)))
    a2 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (t * s, w)).astype(np.float32)))
    b2 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (w, 3 * s)).astype(np.float32)))

    if args.only is None or any(s in "gemm_ceiling" for s in args.only):
        def ceiling_chained(salt, a1, b1, a2, b2):
            return sum(jnp.sum(jnp.dot(a1 + (salt + 17.0 * i), b1)) +
                       jnp.sum(jnp.dot(a2 + (salt + 17.0 * i), b2))
                       for i in range(k))
        dt = time_chained(jax.jit(ceiling_chained), (a1, b1, a2, b2),
                          args.iters, k)
        print(json.dumps({"variant": "gemm_ceiling_flop_identical",
                          "ms_per_step": round(dt * 1e3, 3)}),
              flush=True)
        results["gemm_ceiling"] = dt

    results = {n: v for n, v in results.items() if v is not None}
    if "matmul_framesalt" not in results:
        return
    base = results["matmul_framesalt"]
    best = min((v, n) for n, v in results.items()
               if n not in ("construct_only", "gemm_ceiling"))
    print(json.dumps({
        "verdict": ("WIN " + best[1] if best[0] < 0.9 * base
                    else "negative: shipped matmul form within 10% "
                         "of every variant"),
        "baseline_ms": round(base * 1e3, 3),
        "best_ms": round(best[0] * 1e3, 3),
        "best_variant": best[1]}), flush=True)


if __name__ == "__main__":
    main()

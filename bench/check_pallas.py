"""On-hardware Pallas ↔ XLA parity check (Mosaic regression gate).

VERDICT round-3 missing item 4: both Pallas kernels are covered by
interpreter-mode tests only (tests/test_pallas.py); hardware parity was
measured manually in rounds 1–2 but nothing re-checks the actual Mosaic
lowering across JAX upgrades. This harness runs both kernels
NON-interpreted on the attached TPU against the XLA reference chains
and prints max |Δ| per check, failing over tolerance.

Run it alone (strictly one TPU client at a time — CLAUDE.md):

    python bench/check_pallas.py            # on the attached TPU
    python bench/check_pallas.py --cpu      # interpreter-mode smoke

Everything is jitted — eager ops through the axon tunnel each cost a
remote compile. Record the output in BASELINE.md after JAX upgrades.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

FAILED = []


def report(name, got, want, tol, scale_relative=False):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    diff = float(np.abs(got - want).max())
    bound = tol * (float(np.abs(want).max()) if scale_relative else 1.0)
    ok = diff <= bound
    print(json.dumps({"check": name, "max_abs_diff": diff,
                      "tol": bound, "ok": ok}), flush=True)
    if not ok:
        FAILED.append(name)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="interpreter-mode smoke run (no TPU)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mimamo_tpu import phase, preprocess
    from mimamo_tpu.config import BackboneSpec, PhaseSpec, PyramidSpec
    from mimamo_tpu.pallas import phase_kernel, stem_kernel

    interp = args.cpu
    rng = np.random.default_rng(0)

    # -- 1. blocked phase-diff+resize kernel vs the XLA chain ------------
    # Flagship scale-0 band shape: [B, T-1, K, 112, 112] complex.
    # Complex64 HOST<->DEVICE transfer is UNIMPLEMENTED on the axon
    # tunnel backend (probed 2026-08-17; device-resident complex — the
    # production FFT path — is fine): form the complex inputs on device
    # from f32 real/imag parts.
    shape = (2, 4, 4, 112, 112)
    mk_complex = jax.jit(lambda re, im: re + 1j * im)

    def device_complex(r):
        return mk_complex(
            jnp.asarray(r.standard_normal(shape).astype(np.float32)),
            jnp.asarray(r.standard_normal(shape).astype(np.float32)))

    c_t = device_complex(rng)
    c_p = device_complex(rng)
    want = jax.jit(lambda a, b: phase.resize_bilinear(
        phase.phase_diff(a, b), (48, 48)))(c_t, c_p)
    got = phase_kernel.phase_diff_resize_blocked(
        c_t, c_p, phase_size=48, interpret=interp)
    report("phase_diff_resize_blocked", got, want, tol=1e-4)

    got = phase_kernel.phase_diff_resize_blocked(
        c_t, c_p, phase_size=48, interpret=interp,
        amplitude_weighting=True)

    def xla_weighted(a, b):
        dphi = phase.phase_diff(a, b)
        amp = jnp.abs(a) * jnp.abs(b)
        denom = jnp.mean(amp, axis=(-2, -1), keepdims=True) + 1e-6
        return phase.resize_bilinear(dphi * (amp / denom), (48, 48))

    want = jax.jit(xla_weighted)(c_t, c_p)
    report("phase_diff_resize_blocked+ampweight", got, want,
           tol=1e-3, scale_relative=True)

    # -- 2. fused micro-motion path vs the unfused XLA path --------------
    pyr = PyramidSpec(height=3, orientations=4, input_size=(112, 112))
    ph = PhaseSpec(phase_size=48)
    frames = jnp.asarray(
        rng.uniform(0, 255, (1, 5, 112, 112)).astype(np.float32))
    want = jax.jit(lambda f: phase.micro_motion_features(f, pyr, ph))(
        frames)
    got = jax.jit(lambda f: phase_kernel.micro_motion_features_fused(
        f, pyr, ph, interpret=interp))(frames)
    report("micro_motion_features_fused", got, want, tol=1e-3)

    # -- 3. fused stem kernel vs the XLA chain ---------------------------
    import flax.linen as nn

    crops = jnp.asarray(
        rng.uniform(0, 255, (2, 112, 112, 3)).astype(np.float32))
    k7 = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64))
                     .astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
    spec = BackboneSpec(dtype="float32")

    def xla_stem(c):
        imgs = preprocess.for_backbone(c, spec)
        y = jax.lax.conv_general_dilated(
            imgs.astype(jnp.float32), k7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.max_pool(nn.relu(y + b), (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    want = jax.jit(xla_stem)(crops)
    for dtype, tol in ((jnp.float32, 1e-3), (jnp.bfloat16, 2e-2)):
        w2, b2 = stem_kernel.prepare_stem_weights(
            k7, b, channel_order=spec.channel_order, dtype=dtype)
        got = jax.jit(lambda c, w, bb, _d=dtype: stem_kernel.stem_fused(
            stem_kernel.prepare_stem_input(c, spec.mean_rgb), w, bb,
            dtype=_d, interpret=interp))(crops, w2, b2)
        report(f"stem_fused[{np.dtype(dtype).name}]", got, want,
               tol=tol, scale_relative=True)

    # -- 4. fused layer2 kernel vs the XLA bottleneck chain ---------------
    from mimamo_tpu import backbone as backbone_mod
    from mimamo_tpu.pallas import layer2_kernel

    spec2 = BackboneSpec(dtype="bfloat16")
    full = backbone_mod.ResNet50(spec2)
    variables = full.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))
    folded = backbone_mod.fold_batchnorm(variables)
    seg = backbone_mod.ResNet50(spec2, fused_bn=True, skip_stem=True,
                                stages=(1,), features_only=True)
    x2 = jnp.asarray(rng.standard_normal((2, 56, 56, 256))
                     .astype(np.float32)).astype(jnp.bfloat16)
    want = jax.jit(lambda v, a: seg.apply(v, a))(folded, x2)
    packed = layer2_kernel.pack_layer2_params(folded["params"])
    got = layer2_kernel.layer2_fused(x2, packed, interpret=interp)
    report("layer2_fused[bfloat16]", got, want, tol=2e-2,
           scale_relative=True)

    print(json.dumps({"pallas_parity": "FAIL" if FAILED else "ok",
                      "failed": FAILED}), flush=True)
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-stage roofline analysis of the ResNet conv stack (parity config).

VERDICT round 2 weak item 3: BASELINE.md measured the 224-square conv
stack at ~50% MFU and asserted that is the practical ceiling; this
script turns the assertion into a demonstration (or a refutation). For
each stage (stem, layer1..layer4) it computes

  * analytic FLOPs (2*N*Ho*Wo*KH*KW*Cin*Cout per conv),
  * analytic HBM bytes (bf16 read of every conv input + write of every
    conv output + weights; elementwise relu/add assumed fused — a
    LOWER bound on real traffic),
  * the roofline bound  max(flops/F_peak, bytes/B_peak)  against peaks
    MEASURED on this chip (big-GEMM for F_peak, big elementwise add
    for B_peak), not datasheet numbers,
  * the measured per-stage time via the salted-chain protocol
    (bench/stages.py): k salted applications inside one program,
    depth-2 dispatch pipeline (tunnel-safe).

A stage whose measured time ~= its roofline bound is hardware-bound —
no re-lowering can improve it; headroom = measured / bound.

Stages run on random inputs of each stage's true activation shape, so
they are independently timed; --check composes the raw-jax stages and
verifies the result against the flax backbone on the same input.

    python bench/roofline.py [--check] [--chain 6] [--iters 6]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

STAGE_SIZES = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)


def conv_cost(n, hi, wi, cin, cout, kh, kw, stride):
    ho, wo = hi // stride, wi // stride
    flops = 2.0 * n * ho * wo * kh * kw * cin * cout
    bytes_ = 2.0 * (n * hi * wi * cin + n * ho * wo * cout
                    + kh * kw * cin * cout)
    return flops, bytes_, ho, wo


def stage_cost(stage, n, hi, wi, cin):
    """(flops, bytes, h_out, w_out, c_out) for layer{stage+1}."""
    width = STAGE_WIDTHS[stage]
    out_w = width * 4
    fl = by = 0.0
    h, w, c = hi, wi, cin
    for block in range(STAGE_SIZES[stage]):
        stride = 2 if (stage > 0 and block == 0) else 1
        if c != out_w or stride != 1:   # projection shortcut
            f, b, _, _ = conv_cost(n, h, w, c, out_w, 1, 1, stride)
            fl += f
            by += b
        f, b, h1, w1 = conv_cost(n, h, w, c, width, 1, 1, stride)
        fl += f
        by += b
        f, b, _, _ = conv_cost(n, h1, w1, width, width, 3, 3, 1)
        fl += f
        by += b
        f, b, _, _ = conv_cost(n, h1, w1, width, out_w, 1, 1, 1)
        fl += f
        by += b
        h, w, c = h1, w1, out_w
    return fl, by, h, w, c


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-frames", type=int, default=384)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="verify raw-jax stages == flax backbone")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp
    from jax import lax

    from mimamo_tpu.backbone import fold_batchnorm
    from mimamo_tpu.config import BackboneSpec
    from mimamo_tpu.runner import Mimamo

    model = Mimamo()
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    fused = jax.jit(fold_batchnorm)(variables["backbone"])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), fused["params"])

    def conv(x, p, stride=1, pad=0):
        y = lax.conv_general_dilated(
            x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"]

    def stem(x):
        y = nn.relu(conv(x, params["conv1"], stride=2, pad=3))
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def bottleneck(x, p, stride):
        out_w = p["conv3"]["kernel"].shape[-1]
        residual = x
        if "downsample_conv" in p:
            residual = conv(x, p["downsample_conv"], stride)
        y = nn.relu(conv(x, p["conv1"], stride))   # stride_in_1x1
        y = nn.relu(conv(y, p["conv2"], 1, pad=1))
        y = conv(y, p["conv3"])
        return nn.relu(y + residual)

    def make_layer(stage):
        def f(x):
            for block in range(STAGE_SIZES[stage]):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = bottleneck(
                    x, params[f"layer{stage + 1}_{block}"], stride)
            return x
        return f

    n, s = args.batch_frames, args.size
    rng = np.random.default_rng(0)

    if args.check:
        x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)),
                        jnp.bfloat16)
        y = stem(x)
        for st in range(4):
            y = make_layer(st)(y)
        emb = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        want, _ = model.backbone_fused.apply(fused, x)
        err = float(jnp.abs(emb - want).max())
        print(json.dumps({"check_max_abs_err": err}))
        assert err < 0.05, "raw-jax stages diverge from flax backbone"

    from _timing import time_chained

    def timeit(name, fn, x, chain=None):
        k = chain or args.chain

        def chained(salt, x):
            return sum(jnp.sum(fn(x + (salt + 17 * i)
                                   .astype(x.dtype)).astype(jnp.float32))
                       for i in range(k))

        return time_chained(jax.jit(chained), (x,), args.iters, k)

    # -- measured peaks on THIS chip ------------------------------------
    # Inputs are generated ON DEVICE (host->device of GiB-scale arrays
    # through the tunnel is minutes).
    def dev_randn(shape):
        return jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(1), shape,
                                      jnp.float32).astype(jnp.bfloat16)
        )()

    gemm_m = 8192
    a = dev_randn((gemm_m, gemm_m))
    # x @ x (not a closed-over second operand: jit would inline a
    # device array closure as a constant, i.e. fetch 128 MiB to host)
    dt = timeit("gemm", lambda x: x @ x, a)
    f_peak = 2.0 * gemm_m ** 3 / dt
    # HBM probe: one fused read pass over 2 GiB (x + salt folds into the
    # reduction — read-only traffic). The array must be big enough that
    # chain applications dwarf the ~22 ms tunnel dispatch floor;
    # elementwise CHAINS fuse into one pass, so size (not chain count)
    # carries the bytes.
    # Each pass must DEPEND on the previous one's scalar: independent
    # salted reductions over the same array would multi-output-fuse
    # into one read pass and inflate the measured bandwidth k-fold.
    big = dev_randn((1024 * 1024 * 1024,))   # 1G elts = 2 GiB bf16
    k_bw = 24

    def bw_chained(salt, x):
        acc = salt
        for _ in range(k_bw):
            acc = (jnp.sum((x * (1.0 + acc * 1e-30))
                           .astype(jnp.float32)) * 1e-20 + acc)
        return acc

    dt = time_chained(jax.jit(bw_chained), (big,), args.iters, k_bw)
    b_peak = big.size * 2.0 / dt             # read-only, 2 B/elt
    del big
    print(json.dumps({"measured_peak_tflops": round(f_peak / 1e12, 1),
                      "measured_peak_gbps": round(b_peak / 1e9, 1)}))

    # -- stages ----------------------------------------------------------
    stem_fl, stem_by, _, _ = conv_cost(n, s, s, 3, 64, 7, 7, 2)
    pool_by = 2.0 * n * (s // 2) ** 2 * 64 + 2.0 * n * (s // 4) ** 2 * 64
    stages = [("stem(conv1+pool)", stem,
               (n, s, s, 3), stem_fl, stem_by + pool_by)]
    h = w = s // 4
    c = 64
    for st in range(4):
        fl, by, ho, wo, co = stage_cost(st, n, h, w, c)
        stages.append((f"layer{st + 1}", make_layer(st),
                       (n, h, w, c), fl, by))
        h, w, c = ho, wo, co

    total_ms = total_bound = 0.0
    for name, fn, shape, fl, by in stages:
        x = dev_randn(shape)
        dt = timeit(name, fn, x)
        t_flop, t_byte = fl / f_peak, by / b_peak
        bound = max(t_flop, t_byte)
        total_ms += dt * 1e3
        total_bound += bound * 1e3
        print(json.dumps({
            "stage": name, "ms": round(dt * 1e3, 2),
            "gflops": round(fl / 1e9, 1), "gbytes": round(by / 1e9, 3),
            "flop_bound_ms": round(t_flop * 1e3, 2),
            "byte_bound_ms": round(t_byte * 1e3, 2),
            "bound": "flops" if t_flop >= t_byte else "bytes",
            "mfu_pct": round(100 * fl / f_peak / dt, 1),
            "bw_pct": round(100 * by / b_peak / dt, 1),
            "headroom_x": round(dt / bound, 2)}))
    print(json.dumps({"stage": "conv_stack_total",
                      "ms": round(total_ms, 2),
                      "roofline_bound_ms": round(total_bound, 2),
                      "headroom_x": round(total_ms / total_bound, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""QConv roofline forensics: where the quantum U-Net training row's time
goes, and how far it sits from the chip's ceilings.

Collects every QConv2d call in the UNet (shape, wires, out_channels) by
tracing one forward, computes the analytic FLOP/HBM cost of the
patch-batched matmul route per training step (fwd + ~2x bwd), measures
the end-to-end training row (bench.bench_unet), and reports achieved
FLOP/s and bandwidth against the v5e peaks. Writes
results/qconv_roofline.json.

Run: python tools/bench_qconv_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

V5E_PEAK_BF16_FLOPS = 197e12
V5E_FP32_HIGHEST_MXU = V5E_PEAK_BF16_FLOPS / 6  # fp32 6-pass emulation
V5E_PEAK_HBM_BYTES = 819e9


def collect_qconv_shapes(batch: int):
    """Trace one UNet forward, recording every QConv2d invocation."""
    from qiddm_tpu import nn as qnn
    from qiddm_tpu.nn import qconv as qconv_mod

    calls = []
    orig = qconv_mod.QConv2d.__call__

    def spy(self, x, train=False):
        b, c, h, w = x.shape
        kh, kw = self.kernel_size
        ph, pw = self.padding
        h_out, w_out = h + 2 * ph - kh + 1, w + 2 * pw - kw + 1
        d = 2 ** self.wires
        calls.append({
            "in": (int(b), int(c), int(h), int(w)),
            "wires": self.wires, "d": d,
            "patches": int(b) * h_out * w_out,
            "feat": c * kh * kw,
            "n_rows": min(self.out_channels, d - d // 2),
            "out_channels": self.out_channels,
        })
        return orig(self, x, train=train)

    qconv_mod.QConv2d.__call__ = spy
    try:
        net = qnn.UNetUndirected(3, 8, 3, img_shape=(28, 28))
        x = jnp.zeros((batch, 1, 28, 28), jnp.float32)
        jax.eval_shape(
            lambda v, x: net.module.apply(
                v, x, train=True, mutable=net.mutable_collections),
            net.variables, x)
    finally:
        qconv_mod.QConv2d.__call__ = orig
    return calls


def analytic_cost(calls):
    """Per-forward FLOPs/bytes of the QConv route (route in nn/qconv.py):
    two real (P, d) @ (d, n_rows) matmuls + embed/normalize/postprocess
    elementwise passes over the (P, d) psi and (P, feat) patches."""
    mm_flops = emb_bytes = 0
    for c in calls:
        P, d, nr, feat = c["patches"], c["d"], c["n_rows"], c["feat"]
        mm_flops += 2 * (2 * P * d * nr)        # 2 real matmuls
        # patches read + psi write/read(s) + out write (f32)
        emb_bytes += 4 * (P * feat + 3 * P * d + P * nr)
    return mm_flops, emb_bytes


def main():
    import time

    import bench

    batch_tau = 8 * 10  # bench protocol: batch 8, tau 10 -> 80-row forwards
    calls = collect_qconv_shapes(batch_tau)
    mm_flops, emb_bytes = analytic_cost(calls)

    rec, detail = bench.bench_unet(qdepth=3, epochs=5)
    # steps/s from the row: images/s / images-per-step
    img_per_step = 8  # batch
    steps_per_s = rec["value"] / img_per_step
    # fwd + ~2x bwd per step
    flops = 3.0 * mm_flops * steps_per_s
    hbm = 3.0 * emb_bytes * steps_per_s

    out = {
        "row": rec, "detail": detail,
        "qconv_calls": calls,
        "per_fwd": {"matmul_gflops": round(mm_flops / 1e9, 3),
                    "elementwise_gbytes": round(emb_bytes / 1e9, 4)},
        "achieved": {
            "steps_per_s": round(steps_per_s, 1),
            "matmul_tflops": round(flops / 1e12, 3),
            "pct_of_fp32_highest_mxu": round(
                100 * flops / V5E_FP32_HIGHEST_MXU, 2),
            "hbm_gbps_lower_bound": round(hbm / 1e9, 2),
            "pct_of_hbm_peak": round(100 * hbm / V5E_PEAK_HBM_BYTES, 2),
        },
        "note": ("dead-output-eliminated real-matmul route: 2 real "
                 "(P, d) @ (d, Cout) matmuls per conv (was a full complex "
                 "(P, d) @ (d, d): 4 real matmuls at d columns) — the row "
                 "is neither MXU- nor HBM-bound; residual time is the "
                 "many small-layer dispatch/fusion chain (12 convs + "
                 "BN/ReLU/pool per fwd) across the tau-expanded batch"),
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "results"
    path.mkdir(exist_ok=True)
    (path / "qconv_roofline.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out["achieved"], indent=1))
    print(f"wrote results/qconv_roofline.json "
          f"({len(calls)} qconv calls per fwd)")


if __name__ == "__main__":
    main()

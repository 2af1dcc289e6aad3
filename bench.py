"""Benchmark: diffusion training throughput vs the reference baseline.

Primary metric (stdout, ONE JSON line — the driver contract): the
reference's only quantitative baseline (BASELINE.md), the tune_results
sweep config — QIDDM-A (differN family) on MNIST-28, label 4, ds_size=500
(~40 train images), tau=10, 30 epochs, batch 8 — which the reference trains
at ~2.3 images/s (~26 denoiser fwd+bwd steps/s) on a laptop CPU. Here the
whole 30-epoch run is one compiled TPU program.

  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N/2.3}

``--suite`` additionally benches the flagship driver default (QIDDM_LL_noise
784/6/14/2, the mnist_exm model, at its batch_size=1 driver config), batch
sampling throughput, the density-matrix noise-sweep path, a 16-wire
training run beyond the reference's 10-wire ceiling, and a roofline
utilization estimate for the dominant kernel; results go to
results/benchmarks.json and stderr.
"""

import json
import sys
import time

REFERENCE_IMAGES_PER_SEC = 2.3  # BASELINE.md derived throughput
# reference sampling: test() runs tau_test=15 denoise iterations over 10
# images in the same per-forward regime as training (~26 denoiser fwd/s on
# its CPU) -> ~26/15 ~= 1.7 images/s end-to-end sampling
REFERENCE_SAMPLE_IMAGES_PER_SEC = 1.7

# TPU v5e (1 chip) peaks for the roofline estimate
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def _sync(x):
    import numpy as np

    return np.asarray(x)  # axon: host fetch is the only reliable sync


def _sync_scalar(x):
    """Force completion of x while fetching only 4 bytes: a reduction
    that depends on x, materialized to host. Full-array _sync inside a
    timed region measures the axon TUNNEL (12.8 MB/fetch at batch 4096,
    observed 2x run-to-run jitter), not the chip."""
    return float(x.sum())


def _median_wall(fn, reps: int, trials: int = 3):
    """Median-of-trials pipelined wall per rep: queue ``reps`` calls,
    scalar-sync the LAST (the TPU executes enqueued programs in order, so
    the last finishing implies all finished), divide by reps.

    Measured on the axon tunnel: syncing EVERY rep adds a ~25-30 ms
    host round trip per rep (a batch-100 sampler "measured" 29.7 ms/rep
    when its device time is ~4 ms), while fetching the full output
    array measures tunnel bandwidth with 2x run-to-run jitter
    (batch-4096 serving swung 7.5k-16k img/s). Pipelining amortizes one
    round trip over all reps — the steady-state serving shape — and the
    median over trials absorbs the residual jitter."""
    import statistics

    walls = []
    for _ in range(trials):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        _sync_scalar(out)
        walls.append((time.time() - t0) / reps)
    return statistics.median(walls)


def _load_mnist28_with_provenance():
    """Load the bench dataset and REPORT whether it is real data or the
    offline fallback — throughput is shape-identical either way, but the
    bench output must say which it measured (VERDICT r2 weak #7)."""
    import warnings

    from qiddm_tpu import data

    with warnings.catch_warnings(record=True) as wrec:
        warnings.simplefilter("always")
        x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    fell_back = any("falling back" in str(r.message)
                    or "SYNTHETIC" in str(r.message) for r in wrec)
    provenance = ("offline-fallback(sklearn-digits-resampled-28x28); "
                  "same shapes/flops as real MNIST" if fell_back
                  else "real(mnist-28x28)")
    return (x, y, h, w), provenance


def _warm_session():
    """Absorb the axon SESSION-INIT wall before anything is timed.

    The first program execution of a fresh client process pays a
    90-980 s server-side handshake (measured trials: 89.7, 99.4, 219.9,
    304.1, 322.5, 981.7 s) that is INDEPENDENT of the program: a 33 KB
    ``x+1`` pays it identically while the full 8.5 MB train program
    loads in 0.5-12.6 s once the session is warm (measured round 5,
    tools/bench_session_init_probe.py, results/setup_wall_forensics.json
    — this is what BENCH_r03/r04 recorded as 51/250 s 'setup').
    Executing one trivial program first pins that shared infra cost to
    its own line item, so the reported setup measures the FRAMEWORK's
    program (trace + client compile + server program load), i.e. what a
    second model/config in the same session would actually pay cold.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    x = jnp.asarray(np.ones((8, 128), np.float32))
    np.asarray(jax.jit(lambda v: v + 1.0)(x))
    return time.time() - t0


def bench_qiddm_a(epochs: int = 30, batch_size: int = 8, tau: int = 10,
                  L: int = 9, N: int = 2):
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.diffusion import Diffusion
    session_init_s = _warm_session()
    (x, y, h, w), provenance = _load_mnist28_with_provenance()
    x = x[y == 4]
    n_train = int(len(x) * 0.8)
    x = x[:n_train]

    # QIDDM-A = differN family, L=9, N=2 (the tune_results config)
    net = nn.differN_noise(28, L, N, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))

    # explicit lower/compile/first-exec staging so a blown setup wall is
    # DIAGNOSABLE from the bench output alone: "compile" is the client-side
    # XLA+Mosaic wall (persistent-cache hit -> sub-second), "load" is the
    # first execution — on the axon backend this is where the server-side
    # program load/compile lands, and it is the stage that has historically
    # swung from 1 s to minutes for the SAME program (BENCH_r03/r04,
    # tools/bench_setup_probe.py).
    import jax.numpy as jnp
    import numpy as np
    import optax

    x_flat = jnp.asarray(np.asarray(x)).reshape(len(x), -1)
    optimizer = optax.adam(0.0459)
    params, extra = net.params, net.extra_variables
    opt_state = optimizer.init(params)
    run_j = diff.make_multi_epoch_fn(optimizer, tau, batch_size, epochs)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    lowered = run_j.lower(params, opt_state, extra, key, x_flat,
                          n_train=n_train)
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    code_mb = None
    try:
        code_mb = compiled.memory_analysis().generated_code_size_in_bytes / 1e6
    except Exception:
        pass
    t0 = time.time()
    out = compiled(params, opt_state, extra, key, x_flat)
    np.asarray(out[3])  # fetch == sync on the axon tunnel
    load_s = time.time() - t0  # first exec: server-side program load
    t0 = time.time()
    _, _, _, losses = compiled(params, opt_state, extra, key, x_flat)
    losses = np.asarray(losses)
    wall = time.time() - t0
    setup_s = trace_s + compile_s + load_s

    n_images = n_train * epochs
    img_per_s = n_images / wall
    # dropless padded batching runs ceil(n_train/bs) steps per epoch
    steps = epochs * (-(-len(x) // batch_size))
    prog = f"{code_mb:.1f}MB" if code_mb is not None else "n/a"
    detail = (f"{n_images} images ({n_train} x {epochs} epochs), "
              f"wall={wall:.4f}s, setup={setup_s:.1f}s (trace={trace_s:.1f} "
              f"compile={compile_s:.1f} first-exec-load={load_s:.1f}; "
              f"program={prog}; "
              f"shared-tunnel-session-init={session_init_s:.1f}s — infra "
              f"handshake a 33KB x+1 program pays identically, see "
              f"results/setup_wall_forensics.json), "
              f"denoiser-steps/s={n_images * tau / wall:.0f}, "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    # the denoiser runs on the PAIRED chain rows: tau+1 noise levels pair
    # t+1 -> t, so the per-step circuit batch is B*tau (not B*(tau+1))
    util = _reupload_roofline(
        batch=batch_size * tau, wires=net.module.hidden,
        L=net.module.L, k=net.module.k, N=net.module.N,
        steps_per_s=steps / wall)
    return {
        "metric": "train_images_per_sec_mnist28_qiddm_a",
        "value": round(img_per_s, 1),
        "unit": "images/s",
        "vs_baseline": round(img_per_s / REFERENCE_IMAGES_PER_SEC, 1),
        "data": provenance,
    }, detail, util


def _reupload_roofline(batch, wires, L, k, N, steps_per_s):
    """Roofline estimate for the dominant kernel (the fused gate-chain over
    the re-uploading circuit), per optimizer step.

    Gate-level math (sim/pallas_gate_kernel.py): per spectrum layer, one
    diagonal encode (6 flops/amp complex multiply) + k x [wires Rot gates
    (a 2x2 complex matmul per amplitude pair: ~16 flops/amp) + a diagonal
    CZ ring (2 flops/amp)]. Backward re-traverses the chain with the
    inverse unitaries (~2x forward work). The chain state is
    VMEM-resident; HBM traffic is O(batch * d) once per step plus weights.
    """
    d = 2 ** wires
    per_amp = L * (6 + k * (wires * 16 + 2))
    fwd_flops = N * batch * d * per_amp
    total = 3.0 * fwd_flops * steps_per_s  # fwd + ~2x bwd
    hbm = 3.0 * (batch * d * 8 * 2) * steps_per_s  # c64 state in+out
    return {
        "achieved_gflops": round(total / 1e9, 1),
        "pct_of_v5e_bf16_peak": round(100 * total / V5E_PEAK_BF16_FLOPS, 3),
        "achieved_hbm_gbps_lower_bound": round(hbm / 1e9, 2),
        "note": ("gate-equivalent flop count; at w>=config.wide_min_wires "
                 "the route is grouped-Kronecker MXU contractions "
                 "(sim/wide.py), below it fused elementwise Pallas chains "
                 "(VPU/VMEM-bound); see DESIGN.md roofline sections"),
    }


def bench_qiddm_ll_flagship(epochs: int = 50):
    """The mnist_exm driver's default model at its default config
    (QIDDM_LL_noise 784/6/14/2, batch_size=1, lr=0.0255, tau=10 — reference
    src/mnist_exm.py:46,120)."""
    import jax

    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.train import train_diffusion_scan
    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]

    net = nn.QIDDM_LL_noise(784, 6, 14, 2, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    losses, wall = train_diffusion_scan(
        diff, x, epochs=epochs, batch_size=1, lr=0.0255, T=10,
        key=jax.random.PRNGKey(42))
    n_images = len(x) * epochs
    return {
        "metric": "train_images_per_sec_mnist28_qiddm_ll_flagship_bs1",
        "value": round(n_images / wall, 1),
        "unit": "images/s",
        "vs_baseline": round(n_images / wall / REFERENCE_IMAGES_PER_SEC, 1),
    }, (f"{n_images} images, wall={wall:.3f}s, "
        f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")


def bench_qnn_flagship(epochs: int = 50):
    """The mnist_exm driver's SECOND default model (QNN_noise 784/8/14 —
    reference src/mnist_exm.py:48) at the driver defaults (batch_size=1,
    lr=0.01011 from --QNN_noise_lr, tau=10) — completes on-chip coverage
    of every model the reference driver trains by default."""
    import jax

    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.train import train_diffusion_scan
    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]

    net = nn.QNN_noise(784, 8, 14)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    losses, wall = train_diffusion_scan(
        diff, x, epochs=epochs, batch_size=1, lr=0.01011, T=10,
        key=jax.random.PRNGKey(42))
    n_images = len(x) * epochs
    return {
        "metric": "train_images_per_sec_mnist28_qnn_noise_bs1",
        "value": round(n_images / wall, 1),
        "unit": "images/s",
        "vs_baseline": round(n_images / wall / REFERENCE_IMAGES_PER_SEC, 1),
    }, (f"{n_images} images, wall={wall:.3f}s, "
        f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")


def bench_sampling(batch: int = 100, iters: int = 15, reps: int = 30,
                   tag: str = ""):
    """Batched sampling throughput on the flagship (serving path,
    cli/sample.py): images fully denoised per second, tau_test=15.

    At batch >= 2**wires the engine switches every quantum block from the
    gate-level kernel to composed unitaries — batched MXU matmuls — so the
    large-batch variant (the serving regime) measures the MXU route."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.diffusion import Diffusion

    net = nn.QIDDM_LL_noise(784, 6, 14, 2, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(28, 28))
    key = jax.random.PRNGKey(7)
    first_x = jax.random.uniform(key, (batch, 1, 28, 28)) * 0.75 + 0.5
    _sync(diff.sample(first_x=first_x, n_iters=iters, only_last=True))
    wall = _median_wall(
        lambda: diff.sample(first_x=first_x, n_iters=iters, only_last=True),
        reps)
    v = batch / wall
    rec = {
        "metric": f"sample_images_per_sec_qiddm_ll_tau15{tag}",
        "value": round(v, 1),
        "unit": "images/s",
        "vs_baseline": round(v / REFERENCE_SAMPLE_IMAGES_PER_SEC, 1),
    }
    if batch >= 2 ** 6:  # composed-unitary (MXU) regime: attach roofline
        rec["roofline"] = _serving_mxu_roofline(
            batch=batch, wires=6, L=14, N=2, k=2, pixels=784, iters=iters,
            images_per_sec=v)
    return rec, (f"batch={batch}, {iters} denoise iters, "
                 f"wall/rep={wall * 1e3:.1f}ms")


def bench_aot_serving(batch: int = 1024, iters: int = 15, reps: int = 30):
    """Serving from an AOT export artifact (qiddm_tpu/export.py): the
    flagship sampler serialized to StableHLO, reloaded with no model
    code, jit-wrapped, timed — proves the deployment path carries the
    live path's throughput (same program, constants baked in)."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.export import export_sampler, load_sampler

    net = nn.QIDDM_LL_noise(784, 6, 14, 2, 0)
    diff = Diffusion(net=net, prediction_goal="data",
                     shape=(28, 28)).eval()
    blob = export_sampler(diff, batch=batch, n_iters=iters)
    serve = load_sampler(blob)  # already jitted, weights as runtime args
    key = jax.random.PRNGKey(9)
    first_x = jax.random.uniform(key, (batch, 1, 28, 28)) * 0.75 + 0.5
    _sync(serve(first_x))
    wall = _median_wall(lambda: serve(first_x), reps)
    v = batch / wall
    return {
        "metric": "aot_serving_images_per_sec_qiddm_ll_tau15",
        "value": round(v, 1),
        "unit": "images/s",
        "vs_baseline": round(v / REFERENCE_SAMPLE_IMAGES_PER_SEC, 1),
    }, (f"batch={batch}, {iters} iters, artifact {len(blob)/1e6:.2f} MB, "
        f"wall/rep={wall * 1e3:.1f}ms")


def _serving_mxu_roofline(batch, wires, L, N, k, pixels, iters,
                          images_per_sec):
    """Roofline for the composed-unitary serving path (batch >= 2^wires):
    the ONE regime where the MXU carries the run. Per denoise iter the
    net runs linear_down (2*B*pixels*w flops), N re-uploading blocks —
    each composes its k sublayers into L (d, d) unitaries (8*L*k*d^3
    complex-compose flops, batch-independent) and applies them as L
    batched (B, d) @ (d, d) complex matmuls (8*B*d^2 each) — and
    linear_up (2*B*d*pixels). Denominators: raw bf16 peak AND the
    fp32-'highest' MXU ceiling (peak/6 — complex64 contractions run as
    6-pass-emulated fp32 passes, DESIGN.md §4), the honest
    speed-of-light for this dtype."""
    d = 2 ** wires
    per_iter = (2 * batch * pixels * wires          # linear_down
                + N * L * k * 8 * d ** 3            # unitary composition
                + N * L * 8 * batch * d ** 2        # composed-unitary apply
                + 2 * batch * d * pixels)           # linear_up
    flops = per_iter * iters * (images_per_sec / batch)
    return {
        "achieved_tflops": round(flops / 1e12, 2),
        "pct_of_v5e_bf16_peak": round(100 * flops / V5E_PEAK_BF16_FLOPS, 2),
        "pct_of_fp32_highest_mxu_ceiling": round(
            100 * flops / (V5E_PEAK_BF16_FLOPS / 6), 1),
        "note": ("composed-unitary route: batched complex (B,d)@(d,d) "
                 "matmuls at d=2^%d; ceiling = bf16 peak / 6-pass "
                 "complex-highest emulation" % wires),
    }


def bench_noise_dm_sampling(batch: int = 10, iters: int = 15, reps: int = 3,
                            size: int = 28, hidden: int = 8, L: int = 6,
                            N: int = 2):
    """Density-matrix test-time path: the *_noise drivers' sweep workload
    (train clean, test with channels injected — reference
    src/mnist_noise.py:214-230). QIDDM_PL_noise (8 wires) with amplitude
    damping at intensity 0.05: every denoise step simulates the full
    2^16-element density matrix per sample."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.cli.common import with_noise
    from qiddm_tpu.diffusion import Diffusion

    net = with_noise(nn.QIDDM_PL_noise(size * size, hidden, L, N, 0), 2, 0.05)
    diff = Diffusion(net=net, prediction_goal="data", shape=(size, size))
    first_x = jax.random.uniform(
        jax.random.PRNGKey(3), (batch, 1, size, size)) * 0.75 + 0.5
    _sync(diff.sample(first_x=first_x, n_iters=iters, only_last=True))
    wall = _median_wall(
        lambda: diff.sample(first_x=first_x, n_iters=iters, only_last=True),
        reps)
    v = batch / wall
    # the reference's noisy test path (default.mixed, per-sample Python
    # loops) is strictly slower than its clean sampling; 1.7 img/s is a
    # conservative upper bound on its throughput here
    return {
        "metric": "sample_images_per_sec_dm_amplitude_damping",
        "value": round(v, 1),
        "unit": "images/s",
        "vs_baseline": round(v / REFERENCE_SAMPLE_IMAGES_PER_SEC, 1),
    }, (f"batch={batch}, {iters} denoise iters on the density-matrix "
        f"backend (8 wires), wall/rep={wall * 1e3:.1f}ms")


def bench_wide_reupload(wires: int = 16, L: int = 14, k: int = 2,
                        batch: int = 8, steps: int = 50):
    """Training-step throughput for a re-uploading block at 16+ wires —
    beyond the reference's 10-wire ceiling (SURVEY §5.7: its widest
    circuit is 10 wires; PennyLane warns above that). One chip, full
    fwd+bwd per step, on the grouped-Kronecker-contraction route with
    the ADJOINT-mode backward (sim/wide.py — auto on TPU for wires >
    config.pallas_max_wires(); DESIGN.md wide-regime roofline section).
    The 20-wire variant exists ONLY because of adjoint mode: plain
    autodiff would save L*k*wires intermediate (batch, 2^20) states
    (~37 GB) per step — over twice the chip's HBM."""
    import jax
    import jax.numpy as jnp

    from qiddm_tpu.sim.engine import reupload_block

    kw = jax.random.PRNGKey(0)
    w0 = jax.random.normal(kw, (L, k, wires, 3), jnp.float32) * 0.4
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, wires))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (batch, wires))

    def loss_fn(w):
        out = reupload_block(x, w, encode="rz", imprimitive="cz",
                             readout="expvalz")
        return jnp.mean((out - tgt) ** 2)

    def step(w, _):
        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.01 * g, loss

    # <=16 wires: ONE lax.scan program over all steps. The 4 MB state
    # planes leave the ~15 ms device step dominated by the serial
    # per-step dispatch through the axon tunnel when host-looped —
    # measured 28.6 -> 68.6 steps/s scanned (results/wide_scan_ab_w16.json,
    # tools/bench_wide_scan_ab.py). At 20 wires the scan compiles fine
    # since the grouped-Kronecker route shrank the program (125 s — the
    # old per-gate adjoint scan never finished) but gains nothing
    # (speedup 0.99: 294 ms device steps amortize dispatch), so the
    # host loop stays and keeps compile short.
    if wires <= 16:
        import numpy as np

        run = jax.jit(lambda w: jax.lax.scan(step, w, None, length=steps))
        _sync(run(w0)[1])        # compile + warmup
        t0 = time.time()
        w, losses = run(w0)
        losses = [float(l) for l in np.asarray(losses)]  # fetch == sync
        wall = time.time() - t0
    else:
        step_j = jax.jit(lambda w: step(w, None))
        w, first_loss = step_j(w0)     # compile + warmup
        _sync(first_loss)
        t0 = time.time()
        losses = []
        for _ in range(steps):
            w, loss = step_j(w)
            losses.append(loss)
        losses = [float(_sync(l)) for l in losses]
        wall = time.time() - t0
    v = steps / wall
    return {
        "metric": f"train_steps_per_sec_reupload_{wires}wires",
        "value": round(v, 1),
        "unit": "steps/s",
        "vs_baseline": None,
    }, (f"{steps} fwd+bwd steps at wires={wires} (d=2^{wires}), L={L}, "
        f"k={k}, batch={batch}; loss {losses[0]:.4f} -> {losses[-1]:.4f}; "
        f"no reference baseline — beyond its 10-wire ceiling")


def _unet_conv_sites(batch: int):
    """Every conv site of the UNetUndirected(3, 8) geometry on 28x28 input
    — (patches, feat=cin*kh*kw, cout, wires) per call — collected by
    shape-tracing one forward with a QConv2d spy (no device work)."""
    import jax

    import jax.numpy as jnp

    from qiddm_tpu import nn as qnn
    from qiddm_tpu.nn import qconv as qconv_mod

    calls = []
    orig = qconv_mod.QConv2d.__call__

    def spy(self, x, train=False):
        b, c, h, w = x.shape
        kh, kw = self.kernel_size
        ph, pw = self.padding
        d = 2 ** self.wires
        calls.append({
            "patches": int(b) * (h + 2 * ph - kh + 1) * (w + 2 * pw - kw + 1),
            "feat": c * kh * kw, "cout": self.out_channels,
            "d": d, "n_rows": min(self.out_channels, d - d // 2)})
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


def _unet_roofline(qdepth: int, steps_per_s: float, batch_tau: int):
    """Roofline field for the U-Net rows (conv-site enumeration shared
    between the classical and quantum variants — same geometry). Quantum
    route: 2 real (P, d) @ (d, n_rows) matmuls + embed/readout elementwise
    over (P, d) psi (nn/qconv.py, dead-output-eliminated); classical:
    one real (P, feat) @ (feat, cout) contraction per site. fwd + ~2x bwd
    per training step. Full forensics: tools/bench_qconv_probe.py ->
    results/qconv_roofline.json."""
    sites = _unet_conv_sites(batch_tau)
    if qdepth > 0:
        mm = sum(2 * (2 * c["patches"] * c["d"] * c["n_rows"])
                 for c in sites)
        hbm = sum(4 * (c["patches"] * c["feat"] + 3 * c["patches"] * c["d"]
                       + c["patches"] * c["n_rows"]) for c in sites)
        note = ("QConv route: matmul work is ~3%% of the MXU ceiling — the "
                "row is bound by the embed/readout bandwidth and the "
                "%d-conv dispatch chain, not FLOPs" % len(sites))
    else:
        mm = sum(2 * c["patches"] * c["feat"] * c["cout"] for c in sites)
        hbm = sum(4 * (c["patches"] * c["feat"] + c["patches"] * c["cout"])
                  for c in sites)
        note = "classical conv sites at the same geometry"
    flops = 3.0 * mm * steps_per_s
    bw = 3.0 * hbm * steps_per_s
    return {
        "matmul_tflops": round(flops / 1e12, 3),
        "pct_of_fp32_highest_mxu_ceiling": round(
            100 * flops / (V5E_PEAK_BF16_FLOPS / 6), 2),
        "hbm_gbps_lower_bound": round(bw / 1e9, 2),
        "pct_of_hbm_peak": round(100 * bw / V5E_PEAK_HBM_BYTES, 2),
        "note": note,
    }


def bench_unet(qdepth: int = 0, epochs: int = 10, batch_size: int = 8):
    """U-Net diffusion training throughput. qdepth=0 is the reference's
    strongest classical baseline (``UNetUndirected 3/8/0``, commented-in
    driver default at src/mnist_exm.py:42, lr=0.01 from its
    --UNetUndirected_lr flag); qdepth>0 routes every Conv2d through the
    quantum convolution (nn/qconv.py QConv2d — unfolded patches encoded
    into 2^q-dim statevectors, the live-circuit behavior). Same data
    protocol as the primary row (MNIST-28 label 4, 80% of ds_size=500)."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.train import train_diffusion_scan
    (x, y, h, w), _ = _load_mnist28_with_provenance()
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]

    net = nn.UNetUndirected(3, 8, qdepth, img_shape=(h, w))
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    losses, wall = train_diffusion_scan(
        diff, x, epochs=epochs, batch_size=batch_size, lr=0.01, T=10,
        key=jax.random.PRNGKey(42))
    n_images = len(x) * epochs
    v = n_images / wall
    kind = "classical baseline" if qdepth == 0 else "QConv2d quantum convs"
    # the reference never published a U-Net throughput; its per-image
    # training cost is bounded below by the 2.3 img/s quantum-model rate
    # for the classical net (strictly faster there) — report vs_baseline
    # against the same 2.3 so the rows stay comparable, labeled as such
    return {
        "metric": f"train_images_per_sec_unet_d3_s8_q{qdepth}",
        "value": round(v, 1),
        "unit": "images/s",
        "vs_baseline": round(v / REFERENCE_IMAGES_PER_SEC, 1),
        "roofline": _unet_roofline(qdepth, v / batch_size, batch_size * 10),
    }, (f"{n_images} images ({len(x)} x {epochs} epochs), wall={wall:.3f}s, "
        f"{kind}, loss {losses[0]:.4f} -> {losses[-1]:.4f}; vs_baseline is "
        f"vs the 2.3 img/s quantum-row reference rate (no published U-Net "
        f"baseline)")


def bench_traj_noisy_sampling(wires: int = 12, batch: int = 10,
                              n_traj: int = 100, iters: int = 15,
                              reps: int = 3, L: int = 6, N: int = 2):
    """Noisy sampling BEYOND the density-matrix ceiling: a 12-wire noisy
    model on the Monte-Carlo trajectory backend (sim/trajectories.py).
    Neither the reference (default.mixed) nor our own dm backend can
    represent this circuit's channel — rho would be 2^24 amplitudes per
    sample; trajectories run it as n_traj statevector chains."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.cli.common import with_noise
    from qiddm_tpu.diffusion import Diffusion

    net = with_noise(nn.QIDDM_LL_noise(784, wires, L, N, 0), 2, 0.05,
                     noise_trajectories=n_traj)
    diff = Diffusion(net=net, prediction_goal="data", shape=(28, 28))
    first_x = jax.random.uniform(
        jax.random.PRNGKey(3), (batch, 1, 28, 28)) * 0.75 + 0.5
    rng = jax.random.PRNGKey(5)
    _sync(diff.sample(first_x=first_x, n_iters=iters, only_last=True,
                      traj_rng=rng))
    wall = _median_wall(
        lambda: diff.sample(first_x=first_x, n_iters=iters, only_last=True,
                            traj_rng=rng), reps)
    v = batch / wall
    return {
        "metric": f"sample_images_per_sec_traj_noise_{wires}wires",
        "value": round(v, 1),
        "unit": "images/s",
        "vs_baseline": None,
    }, (f"batch={batch}, {iters} denoise iters, n_traj={n_traj} at "
        f"wires={wires} (amplitude damping 0.05) — beyond every "
        f"density-matrix backend's ceiling; no reference baseline")


def _probe_backend_or_pin_cpu(timeout_s: int = 150) -> str:
    """Bounded TPU reachability probe. The axon plugin HANGS (no error)
    when the tunnel is down, which would leave the round with no bench
    number at all — probe device init in a subprocess first and pin this
    process to CPU (loudly labeled in the output) if it never comes up."""
    import os
    import subprocess
    import sys as _sys

    plats = [p.strip() for p in
             os.environ.get("JAX_PLATFORMS", "").split(",") if p.strip()]
    if plats and plats[0] == "cpu":
        # an explicit CPU-first request ("cpu", "cpu,axon"); a TPU-first
        # list like "tpu,cpu" must still probe
        return "cpu(requested)"
    probed = ""
    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        probed = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode == 0 and probed in ("axon", "tpu"):
            return probed
    except subprocess.TimeoutExpired:
        pass
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:  # backend already initialized — too late to pin
        pass
    if probed:  # probe succeeded but found no TPU: no plugin on this host
        return f"cpu(no-tpu-backend:{probed})"
    return "cpu-fallback(tpu-unreachable)"


def _provenance():
    """Routing/config fingerprint stamped into every suite row, so a row
    produced under one routing config cannot be silently cited after the
    config changed (r4 carried a wide16 row from a superseded route for a
    full round). Records the knobs that change which code path a row
    measures, plus the git rev and a timestamp."""
    import datetime
    import subprocess

    from qiddm_tpu import config as _cfg

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10).stdout.strip() or None
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True,
            text=True, timeout=10).stdout.strip())
    except Exception:
        rev, dirty = None, None
    return {
        "git": (f"{rev}-dirty" if rev and dirty else rev),
        "time": datetime.datetime.now().isoformat(timespec="seconds"),
        "routing": {
            "use_pallas": _cfg.use_pallas(),
            "pallas_max_wires": _cfg.pallas_max_wires(),
            "traj_pallas_max_wires": _cfg.traj_pallas_max_wires(),
            "adjoint_mode": _cfg.adjoint_mode(),
            "wide_mode": _cfg.wide_mode(),
            "wide_kernel_mode": _cfg.wide_kernel_mode(),
            "wide_kernel_variant": _cfg.wide_kernel_variant(),
            "dm_channel_mode": _cfg.dm_channel_mode(),
            "dm_unitary_mode": _cfg.dm_unitary_mode(),
            "matmul_precision": _cfg.matmul_precision(),
        },
    }


def main(argv=None):
    import argparse
    import pathlib

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--suite", action="store_true",
                    help="run the full bench suite (writes "
                         "results/benchmarks.json)")
    args = ap.parse_args(argv)

    # persistent compile cache: qiddm_tpu.config points it at the
    # host-fingerprinted default on import (config._setup_compilation_cache)

    backend = _probe_backend_or_pin_cpu()
    if backend.startswith("cpu"):
        print(f"# WARNING: benching on {backend} — throughput numbers "
              f"are NOT the TPU capability (see results/benchmarks.json "
              f"for the last on-chip suite)", file=sys.stderr)

    primary, detail, util = bench_qiddm_a()
    primary["device"] = backend
    print(json.dumps(primary))
    print(f"# {detail}", file=sys.stderr)
    print(f"# roofline: {json.dumps(util)}", file=sys.stderr)

    if args.suite:
        import jax

        suite = [dict(primary, roofline=util, provenance=_provenance())]
        serving = lambda: bench_sampling(batch=4096, reps=20,
                                         tag="_batch4096_serving")
        wide20 = lambda: bench_wide_reupload(wires=20, steps=20)
        out = pathlib.Path("results/benchmarks.json")
        out.parent.mkdir(parents=True, exist_ok=True)

        def write():  # after every row: a late-row crash keeps the rest
            out.write_text(json.dumps({
                "device": jax.devices()[0].platform,
                "suite": suite,
            }, indent=2))

        write()
        unet_q = lambda: bench_unet(qdepth=3, epochs=5)
        for fn in (bench_qiddm_ll_flagship, bench_qnn_flagship,
                   bench_sampling, serving,
                   bench_aot_serving, bench_unet, unet_q,
                   bench_noise_dm_sampling, bench_traj_noisy_sampling,
                   bench_wide_reupload, wide20):
            rec = fn()
            suite.append(dict(rec[0], detail=rec[1],
                              provenance=_provenance()))
            print(f"# {rec[0]['metric']}: {rec[0]['value']} "
                  f"{rec[0]['unit']} ({rec[1]})", file=sys.stderr)
            write()
        print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

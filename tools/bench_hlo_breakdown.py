"""Dump the primary training program's optimized HLO and report the
largest computations/fusions by instruction count — forensics for the
generated-code bloat (tools/bench_program_size_probe.py).

Run: python tools/bench_hlo_breakdown.py [--epochs 30] [--dump FILE]
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--dump", default="")
    args = ap.parse_args()

    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    import optax

    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]
    x_train = jnp.asarray(np.asarray(x)).reshape(len(x), -1)
    n_train = int(x_train.shape[0])
    optimizer = optax.adam(0.0459)
    net = nn.differN_noise(28, 9, 2, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    params = net.params
    extra = net.extra_variables
    opt_state = optimizer.init(params)
    run_j = diff.make_multi_epoch_fn(optimizer, 10, 8, args.epochs)
    key = jax.random.PRNGKey(42)
    lowered = run_j.lower(params, opt_state, extra, key, x_train,
                          n_train=n_train)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO text: {len(txt)/1e6:.1f} MB")
    if args.dump:
        pathlib.Path(args.dump).write_text(txt)

    # per-computation line counts
    comp = None
    counts = collections.Counter()
    chars = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"^(%?[\w\.\-]+)\s.*{$", line)
        if m and ("{" in line) and not line.lstrip().startswith("ROOT"):
            comp = m.group(1)
        if comp:
            counts[comp] += 1
            chars[comp] += len(line)
    print("\ntop computations by text size:")
    for name, c in chars.most_common(25):
        print(f"  {c/1e3:10.1f} kB  {counts[name]:6d} lines  {name}")

    # opcode histogram over the whole module
    ops = collections.Counter()
    for m in re.finditer(r"= [\w\[\]{},:\/ ]*? (\w+)\(", txt):
        ops[m.group(1)] += 1
    print("\ntop opcodes:")
    for name, c in ops.most_common(25):
        print(f"  {c:7d}  {name}")


if __name__ == "__main__":
    main()

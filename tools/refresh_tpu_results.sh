#!/bin/bash
# Refresh every on-chip measurement artifact in one pass (run on the real
# TPU after the axon tunnel is up). Each step is independently bounded and
# failures don't block the rest; artifacts land in results/.
set -u
cd "$(dirname "$0")/.."

probe=$(timeout 120 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null)
if [ "$probe" != "axon" ] && [ "$probe" != "tpu" ]; then
    echo "TPU not reachable (got: '$probe') — aborting" >&2
    exit 1
fi
echo "== TPU up: $probe"

echo "== adjoint A/B (memory + fwd/bwd timings at 12/14/16 wires)"
timeout 3000 python tools/bench_adjoint.py 11 14 2 30 12 14 16 \
    || echo "bench_adjoint FAILED" >&2

echo "== RY-kernel A/B (fixed per-arm jit)"
timeout 1200 python tools/bench_ry_kernel.py \
    || echo "bench_ry_kernel FAILED" >&2

echo "== dm unitary-mode A/B"
timeout 2400 python tools/bench_dm_unitary_modes.py \
    || echo "bench_dm_unitary_modes FAILED" >&2

echo "== on-chip Mosaic-vs-XLA parity (every fused Pallas route; fails loudly)"
timeout 3600 python tools/parity_onchip.py \
    || echo "parity_onchip FAILED — Mosaic lowering disagrees with XLA" >&2

echo "== primary + full bench suite (writes results/benchmarks.json)"
timeout 4800 python bench.py --suite \
    || echo "bench suite FAILED" >&2

echo "== done; artifacts:"
ls -la results/*.json

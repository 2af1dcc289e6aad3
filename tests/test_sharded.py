"""Distributed statevector vs the dense simulator, on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu.parallel import make_mesh
from qiddm_tpu.sim import sel_apply_direct, zero_state, expval_z, probs
from qiddm_tpu.sim.sharded import (
    ShardedState,
    expval_z_sharded,
    make_sel_program,
    probs_sharded,
    zero_state_sharded,
)

RNG = np.random.default_rng(51)


@pytest.mark.parametrize("wires,layers,imprimitive", [
    (5, 3, "cnot"), (5, 3, "cz"), (6, 4, "cnot"), (4, 2, "cz"),
])
def test_sharded_sel_matches_dense(wires, layers, imprimitive):
    mesh = make_mesh(8, ("data",))
    spec = ShardedState(wires, mesh)
    assert spec.shard_bits == 3
    w = jnp.asarray(RNG.normal(size=(layers, wires, 3)) * 0.4, jnp.float32)

    state = zero_state_sharded(spec)
    run = make_sel_program(spec, layers, imprimitive)
    out = run(state, w)

    dense = sel_apply_direct(zero_state(1, wires), w,
                             imprimitive=imprimitive)[0]
    got = np.asarray(out).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(dense), atol=1e-5)

    # sharded measurements
    p = np.asarray(probs_sharded(spec, out)).reshape(-1)
    np.testing.assert_allclose(p, np.asarray(probs(dense[None]))[0],
                               atol=1e-5)
    ev = np.asarray(expval_z_sharded(spec, out))
    np.testing.assert_allclose(ev, np.asarray(expval_z(dense[None]))[0],
                               atol=1e-5)


def test_sharded_norm_preserved():
    mesh = make_mesh(8, ("data",))
    spec = ShardedState(6, mesh)
    w = jnp.asarray(RNG.normal(size=(5, 6, 3)) * 0.4, jnp.float32)
    out = make_sel_program(spec, 5, "cnot")(zero_state_sharded(spec), w)
    p = np.asarray(probs_sharded(spec, out))
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)


def test_sharded_gradients_flow():
    mesh = make_mesh(8, ("data",))
    spec = ShardedState(5, mesh)
    w = jnp.asarray(RNG.normal(size=(2, 5, 3)) * 0.4, jnp.float32)
    run = make_sel_program(spec, 2, "cz")
    init = zero_state_sharded(spec)

    def loss(w):
        out = run(init, w)
        ev = expval_z_sharded(spec, out)
        return jnp.sum(ev ** 2)

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_sharded_large_wire_smoke():
    """16 wires (65k amplitudes across 8 shards) — beyond the reference's
    10-wire ceiling; norm must be preserved through a deep circuit."""
    mesh = make_mesh(8, ("data",))
    spec = ShardedState(16, mesh)
    w = jnp.asarray(RNG.normal(size=(3, 16, 3)) * 0.4, jnp.float32)
    out = make_sel_program(spec, 3, "cnot")(zero_state_sharded(spec), w)
    p = np.asarray(probs_sharded(spec, out))
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-4)
    ev = np.asarray(expval_z_sharded(spec, out))
    assert ev.shape == (16,) and np.all(np.abs(ev) <= 1 + 1e-5)

"""Model-zoo construction/shape/gradient tests for all 27 public names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import nn

RNG = np.random.default_rng(3)


def _img(b=4, s=8):
    return jnp.asarray(RNG.uniform(size=(b, 1, s, s)), jnp.float32)


# (ctor, args, expected save_name) — small 8x8 configs for speed
ZOO = [
    (nn.QDenseUndirected_old, (3, 8), "QDenseUndirected_old3_w8_h8"),
    (nn.QDenseUndirected_old_noise, (3, 8, 2), "QDenseUndirected_old_noise3_w8_h8_noise2"),
    (nn.QNN_A, (3, 8, 0), "QNN_A3_w8_h8_noise0"),
    (nn.QNN_noise, (64, 4, 3, 1), "QNN_linear_features=4_qdepth=3_add_noise=1"),
    (nn.QNN, (64, 4, 3), "QNN_linear_features=4_qdepth=3"),
    (nn.differN_noise, (8, 2, 2, 0), "differN_old_pca=2_N=2_w8_h8_noise0"),
    (nn.differN_noise_befor, (8, 2, 2, 0), "differN_noise=2_N=2_w8_h8"),
    (nn.differN_old_pca, (8, 2, 2), "differN_old_pca=2_N=2_w8_h8"),
    (nn.differN_new_pca, (8, 2, 2), "differN_new_pca=2_N=2_w8_h8"),
    (nn.differN_new_conv, (8, 2, 2), "differN_new_conv=2_N=2_w8_h8"),
    (nn.differN_old_conv, (8, 2, 2), "differN_old_conv=2_N=2_w8_h8"),
    (nn.QIDDM_A_sameN, (8, 2, 2), "QIDDM_A_sameN=2_N=2_w8_h8"),
    (nn.QIDDM_A_differN_basePL, (8, 2, 2), "QIDDM_pca_features=6_L=2_N=2"),
    (nn.QIDDM_A_differN_NEW, (8, 2, 2), "QIDDM_pca_new=6_L=2_N=2"),
    (nn.QIDDM_PL, (64, 4, 2, 2), "QIDDM_PL=4_L=2_N=2"),
    (nn.QIDDM_PL_old, (64, 4, 2, 2), "QIDDM_PL_old_q=4_L=2_N=2"),
    (nn.QIDDM_PL_noise, (64, 4, 2, 2, 1), "QIDDM_PL_noise=4_L=2_N=2"),
    (nn.QIDDM_PL_noise1, (64, 4, 2, 2, 0), "QIDDM_PL_noise=4_L=2_N=2"),
    (nn.QIDDM_LL_noise, (64, 4, 2, 2, 0), "QIDDM_LL_noise=4_L=2_N=2"),
    (nn.QIDDM_LL_relu_noise, (64, 4, 2, 2, 0), "QIDDM_LL_noise=4_L=2_N=2"),
    (nn.QIDDM_LL_old, (64, 4, 2, 2), "QIDDM_linear_features=4_L=2_N=2"),
    (nn.QIDDM_L, (64, 4, 2, 2), "QIDDM_linear_features=4_L=2_N=2"),
    (nn.QIDDM_bias_false, (64, 4, 2, 2), "QIDDM_linear_features=4_L=2_N=2"),
    (nn.QIDDM_L_B, (64, 4, 2, 2), "QIDDM_linear_batch_features=4_L=2_N=2"),
    (nn.QIDDM_CL_new, (64, 4, 2, 2), "QIDDM_CL_new_q=4_L=2_N=2"),
    (nn.QIDDM_CL_old, (64, 4, 2, 2), "QIDDM_CL_old_q=4_L=2_N=2"),
    (nn.QIDDM_PP_noise, (64, 4, 2, 2, 0), "QIDDM_PP_noise=4_L=2_N=2"),
    (nn.QIDDM_PP_old, (64, 4, 2, 2), "QIDDM_PP_features=4_L=2_N=2"),
]


@pytest.mark.parametrize("ctor,args,save", ZOO,
                         ids=[c.__name__ + ("'" if s.endswith("'") else "")
                              for c, a, s in ZOO][:len(ZOO)])
def test_model_forward_shape_and_name(ctor, args, save):
    net = ctor(*args)
    assert net.save_name() == save
    x = _img()
    y = net(x)
    assert y.shape == x.shape, f"{ctor.__name__}: {y.shape}"
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("ctor,args", [
    (nn.QDenseUndirected_old, (3, 8)),
    (nn.differN_noise, (8, 2, 2, 0)),
    (nn.QIDDM_LL_noise, (64, 4, 2, 2, 0)),
    (nn.QIDDM_PP_old, (64, 4, 2, 2)),
    (nn.QIDDM_L_B, (64, 4, 2, 2)),
])
def test_model_gradients_flow_to_qweights(ctor, args):
    _assert_qweight_grads_flow(ctor(*args), _img())


def _assert_qweight_grads_flow(net, x):
    """Shared body of the fast 5-model and the slow all-zoo gradient-flow
    tests: d(loss)/d(qweights) exists, is finite, and is nonzero."""

    def loss(params):
        variables = {"params": params, **net.extra_variables}
        mutable = net.mutable_collections
        out = net.module.apply(variables, x, train=True, mutable=mutable)
        y = out[0] if mutable else out
        return jnp.mean((y - 0.5) ** 2)

    g = jax.grad(loss)(net.params)
    leaves = {p: np.abs(np.asarray(v)).max()
              for p, v in jax.tree_util.tree_leaves_with_path(g)}
    qleaf = [v for p, v in leaves.items() if "qweights" in str(p)]
    assert qleaf and all(np.isfinite(v) for v in qleaf)
    assert max(qleaf) > 0, "quantum weights got zero gradient"


def test_string_int_args_accepted():
    net = nn.QNN("8 * 8", "4", "3")
    assert net.save_name() == "QNN_linear_features=4_qdepth=3"


def test_param_counts_match_reference_formulas():
    # QIDDM_LL: linear down (D*h + h) + linear up (h*D + D) + qweights N*L*2*h*3
    net = nn.QIDDM_LL_noise(64, 4, 2, 2, 0)
    want = (64 * 4 + 4) + (4 * 64 + 64) + 2 * 2 * 2 * 4 * 3
    assert net.num_params() == want
    # Qdense: only SEL weights qdepth*wires*3
    net = nn.QDenseUndirected_old(5, 8)
    assert net.num_params() == 5 * 6 * 3


def test_differn_full_chain_vs_oracle():
    """The differN flagship end to end vs the numpy oracle: PCA down, N
    blocks with probs fed back as the next block's first-`wires` encoding
    angles (reference nn/qdense.py:450-472), final pixel post-processing."""
    import oracle
    from qiddm_tpu import pca as pca_mod

    side, L, N = 4, 2, 2  # pixels=16 -> wires=4
    net = nn.differN_old_pca(side, L, N)
    b = 8
    x = np.asarray(RNG.uniform(size=(b, 1, side, side)), np.float32)
    got = np.asarray(net(jnp.asarray(x)))

    w = np.asarray(net.params["qweights"])  # (N, L, 2, wires, 3)
    wires, pixels = 4, side * side
    st, enc = pca_mod.pca_fit_transform(
        jnp.asarray(x.reshape(b, -1)), wires)
    enc = np.asarray(enc)
    for n in range(N):
        outs = []
        for i in range(b):
            state = np.zeros(2**wires, complex)
            state[0] = 1.0
            for l in range(L):
                state = oracle.rz_encode_state(state, enc[i, :wires], wires)
                state = oracle.sel_matrix(w[n, l], wires, "cz") @ state
            outs.append(oracle.probs(state))
        enc = np.stack(outs)  # (b, 2**wires) probs feed the next block
    want = np.clip(enc[:, :pixels] * pixels, 0, 1).reshape(b, 1, side, side)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_qiddm_ll_full_chain_vs_oracle():
    """QIDDM_LL end to end vs the numpy oracle: Linear(pixels->hidden) ->
    N blocks of L x (RZ reupload -> SEL(k, CZ)) -> <Z> readout -> Linear
    back to pixels (reference nn/qdense.py:1567-1660, circuit :1299-1330)."""
    import oracle

    side, hidden, L, N, k = 4, 3, 2, 2, 2
    pixels = side * side
    net = nn.QIDDM_LL_noise(pixels, hidden, L, N, 0)
    b = 5
    x = np.asarray(RNG.uniform(size=(b, 1, side, side)), np.float32)
    got = np.asarray(net(jnp.asarray(x)))

    p = net.params
    wd, bd = np.asarray(p["linear_down"]["kernel"]), np.asarray(
        p["linear_down"]["bias"])
    wu, bu = np.asarray(p["linear_up"]["kernel"]), np.asarray(
        p["linear_up"]["bias"])
    w = np.asarray(p["qweights"])  # (N, L, k, hidden, 3)
    assert w.shape == (N, L, k, hidden, 3)

    cur = x.reshape(b, -1) @ wd + bd
    for n in range(N):
        outs = []
        for i in range(b):
            state = np.zeros(2 ** hidden, complex)
            state[0] = 1.0
            for l in range(L):
                state = oracle.rz_encode_state(state, cur[i, :hidden], hidden)
                state = oracle.sel_matrix(w[n, l], hidden, "cz") @ state
            outs.append(oracle.expval_z(state, hidden))
        cur = np.stack(outs)
    want = (cur @ wu + bu).reshape(b, 1, side, side)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_qdense_full_chain_vs_oracle():
    """Qdense end to end vs the numpy oracle: amplitude embed (pad 0.1) ->
    SEL(qw_tanh(w), CNOT ring, ranges cycling over the full depth) -> probs
    -> truncate/scale/clamp (reference nn/qdense.py:15-68)."""
    import oracle

    side, qdepth = 4, 3
    pixels = side * side
    wires = 4  # ceil(log2(16))
    net = nn.QDenseUndirected_old(qdepth, side)
    b = 5
    x = np.asarray(RNG.uniform(size=(b, 1, side, side)), np.float32)
    got = np.asarray(net(jnp.asarray(x)))

    w = np.pi * np.tanh(np.asarray(net.params["qweights"]))
    u = oracle.sel_matrix(w, wires, "cnot")
    outs = []
    for i in range(b):
        v = oracle.amplitude_embed(x[i].reshape(-1), wires, 0.1)
        outs.append(oracle.probs(u @ v))
    p = np.stack(outs)
    want = np.clip(p[:, :pixels] * pixels, 0.0, 1.0).reshape(
        b, 1, side, side)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_qconv_full_chain_vs_oracle():
    """QConv2d's intended (live-circuit) path vs the numpy oracle:
    torch-Unfold patches +0.1 -> amplitude embed (pad 0.5) ->
    SEL(qw_tanh(w), CNOT) -> probs -> scale/clamp, stride-2 slice, channel
    truncation (reference nn/qconv.py:51-126)."""
    import oracle

    from qiddm_tpu.nn.qconv import QConv2d

    b, h_in, w_in, cout, qdepth = 3, 5, 5, 4, 2
    m = QConv2d(in_channels=1, out_channels=cout, kernel_size=(3, 3),
                padding=(1, 1), qdepth=qdepth)
    x = np.asarray(RNG.uniform(size=(b, 1, h_in, w_in)), np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(jax.jit(m.apply)(variables, jnp.asarray(x)))

    wires = 4  # ceil(log2(3*3*1)) = 4
    w = np.pi * np.tanh(np.asarray(variables["params"]["qweights"]))
    u = oracle.sel_matrix(w, wires, "cnot")
    xp = np.pad(x[:, 0], ((0, 0), (1, 1), (1, 1)))
    want = np.zeros((b, cout, h_in, w_in), np.float64)
    dim = 2 ** wires
    for i in range(b):
        for r in range(h_in):
            for c in range(w_in):
                feat = xp[i, r:r + 3, c:c + 3].reshape(-1) + 0.1
                v = oracle.amplitude_embed(feat, wires, 0.5)
                p = oracle.probs(u @ v)
                q = np.clip(p * dim * 0.5, 0.0, 1.0)[::2][:cout]
                want[i, :, r, c] = q
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_qnn_full_chain_vs_oracle():
    """QNN end to end vs the numpy oracle: Linear(pixels->hidden) ->
    [RZ encode on |0..0> (global phase only) -> SEL(depth, CZ) -> <Z>] ->
    Linear back to pixels (reference nn/qdense.py:310-386; the circuit's
    input-independence is the reference's own quirk, nn/qdense.py:338-344).
    """
    import oracle

    side, hidden, qdepth = 4, 3, 2
    pixels = side * side
    net = nn.QNN(pixels, hidden, qdepth)
    b = 5
    x = np.asarray(RNG.uniform(size=(b, 1, side, side)), np.float32)
    got = np.asarray(net(jnp.asarray(x)))

    p = net.params
    wu, bu = np.asarray(p["linear_up"]["kernel"]), np.asarray(
        p["linear_up"]["bias"])
    w = np.asarray(p["qweights"])  # (qdepth, hidden, 3)

    state = np.zeros(2 ** hidden, complex)
    state[0] = 1.0  # RZ encode is a global phase on |0..0>
    state = oracle.sel_matrix(w, hidden, "cz") @ state
    q = oracle.expval_z(state, hidden)  # (hidden,), identical for every row
    want = (np.tile(q, (b, 1)) @ wu + bu).reshape(b, 1, side, side)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_batchnorm_models_train_mode_updates_stats():
    """The torch-like surface must work in train mode for BatchNorm models
    (regression: mutable=False crashed flax) and fold updated running
    stats back into the shim, like torch's in-place stats."""
    m = nn.QIDDM_L_B(16, 3, 2, 2)
    x = jnp.asarray(RNG.uniform(size=(2, 1, 4, 4)), jnp.float32)
    before = np.asarray(
        jax.tree_util.tree_leaves(m.variables["batch_stats"])[0]).copy()
    out = m(x, train=True)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    after = np.asarray(
        jax.tree_util.tree_leaves(m.variables["batch_stats"])[0])
    assert not np.allclose(before, after)  # running stats moved
    m(x, train=False)  # eval path still fine


def test_dm_wire_cap_enforced_on_noise_route():
    """qdense noise route with wires beyond MAX_DM_WIRES must raise the
    documented cap error, not build a multi-GB density matrix."""
    import pytest

    from qiddm_tpu import sim

    x = jnp.asarray(RNG.uniform(size=(2, 6000)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(2, 13, 3)) * 0.4, jnp.float32)
    with pytest.raises(ValueError, match="capped at 12 wires"):
        sim.qdense_circuit(x, w, wires=13,
                           noise=sim.NoiseModel("amplitude_damping", 0.1))


@pytest.mark.slow
@pytest.mark.parametrize("ctor,args,_save", ZOO,
                         ids=[c.__name__ for c, a, s in ZOO])
def test_every_zoo_member_trains(ctor, args, _save):
    """Gradient flow to the quantum weights for ALL 28 public classes —
    including the ones whose reference releases sever gradients
    (torch.tensor wraps at nn/qdense.py:278-281,1065,2409; this framework
    builds the intended behavior, COMPAT.md)."""
    _assert_qweight_grads_flow(ctor(*args), _img())

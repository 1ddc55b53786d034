"""Composed-linear-filter DIA inference path (ConvBitwise.refine_fast)."""

import jax
import jax.numpy as jnp
import numpy as np

from short_ldpc_decoding_osd_tpu.models import make_dia


def _numpy_conv_chain(params, traj):
    """Reference composition in float64: valid 1-D convs + dense head."""
    p = params["params"]
    b, t1, n = traj.shape
    x = np.transpose(np.asarray(traj, np.float64), (0, 2, 1)).reshape(b * n, t1, 1)
    for name in ("conv1", "conv2", "conv3"):
        w = np.asarray(p[name]["kernel"], np.float64)  # (k, cin, cout)
        k, cin, cout = w.shape
        length = x.shape[1] - k + 1
        y = np.zeros((x.shape[0], length, cout))
        for i in range(length):
            y[:, i] = np.einsum("bkc,kco->bo", x[:, i : i + k], w)
        x = y
    flat = x.reshape(x.shape[0], -1)
    head = p["head"]
    out = flat @ np.asarray(head["kernel"], np.float64) + np.asarray(
        head["bias"], np.float64
    )
    return out.reshape(b, n)


def test_refine_fast_matches_conv_chain():
    n, t1 = 32, 13
    model = make_dia("model_cnn", n, t1)
    rng = np.random.default_rng(3)
    traj = jnp.asarray(rng.normal(0.4, 1.2, (6, t1, n)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((n, t1, 1)))
    want = _numpy_conv_chain(params, traj)
    got_slow = np.asarray(model.refine(params, traj))
    got_fast = np.asarray(jax.jit(model.refine_fast)(params, traj))
    scale = max(np.abs(want).max(), 1e-9)
    assert np.abs(got_slow - want).max() / scale < 1e-4
    assert np.abs(got_fast - want).max() / scale < 1e-4


def test_effective_filter_shapes():
    model = make_dia("model_cnn", 128, 13)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((128, 13, 1)))
    taps, bias = model.effective_filter(params)
    assert taps.shape == (13,)
    assert bias.shape == ()


def test_rnn_refine_fast_aliases_refine():
    for kind in ("model_rnn1", "model_rnn2"):
        model = make_dia(kind, 16, 5)
        params = model.init(jax.random.PRNGKey(2), jnp.zeros((2, 5, 16)))
        traj = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 16)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(model.refine_fast(params, traj)),
            np.asarray(model.refine(params, traj)),
        )

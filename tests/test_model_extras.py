"""Forward-shape + behavior tests for the experimental model variants
(reference nn_net.py dead code; see models/extras.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.models import extras


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_transformer_layer_shapes():
    x = jnp.ones((4, 10, 64))
    layer = extras.TransformerLayer(units=64, num_heads=8)
    params = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(params, x)
    assert out.shape == (4, 10, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_temperature_layer_scales():
    x = jnp.arange(6.0).reshape(2, 3)
    layer = extras.TemperatureLayer()
    params = layer.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(layer.apply(params, x), x)  # init 1.0
    params = jax.tree_util.tree_map(lambda p: p * 2.0, params)
    np.testing.assert_allclose(layer.apply(params, x), 2.0 * x)


def test_predict_outlier_softmax():
    x = jnp.ones((8, 6))
    model = extras.PredictOutlier(input_width=6)
    params = model.init(jax.random.PRNGKey(0), x)
    probs = model.apply(params, x)
    assert probs.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=-1)), 1.0, rtol=1e-5)
    assert float(extras.predict_outlier_l2(params)) >= 0.0


@pytest.mark.parametrize("version", [0, 1, 2, 3])
def test_predict_phase_versions(version):
    L, cap = 30, 31
    x = jnp.ones((5, 2 * L - 1))
    model = extras.PredictPhase(decoding_length=L, capacity=cap, version=version)
    params = model.init(jax.random.PRNGKey(version), x)
    probs = model.apply(params, x)
    assert probs.shape == (5, cap)
    np.testing.assert_allclose(np.asarray(probs.sum(axis=-1)), 1.0, rtol=1e-5)


def test_neighborhood_trajectories(code):
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(2, 4, code.n)).astype(np.float32)
    neigh = np.asarray(extras.neighborhood_trajectories(code.h, traj))
    dv = int(code.h.sum(axis=0).max())
    dc = int(code.h.sum(axis=1).max())
    assert neigh.shape == (2, code.n, dv, 4, dc)
    # own column first: slot 0 is the variable's own trajectory wherever the
    # variable actually has that many checks
    v = 0
    rows = np.nonzero(code.h[:, v])[0]
    for slot in range(len(rows)):
        np.testing.assert_allclose(neigh[0, v, slot, :, 0], traj[0, :, v])


def test_rnn_three_and_cnv_nn(code):
    rng = np.random.default_rng(1)
    traj = jnp.asarray(rng.normal(size=(2, 5, code.n)), jnp.float32)
    neigh = extras.neighborhood_trajectories(code.h, traj)
    for cls in (extras.RnnThree, extras.CnvNn):
        model = cls(n=code.n, list_length=5)
        params = model.init(jax.random.PRNGKey(2), neigh)
        out = model.apply(params, neigh)
        assert out.shape == (2, code.n)
        assert bool(jnp.all(jnp.isfinite(out)))

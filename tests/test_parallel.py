import jax
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.parallel import (
    make_mesh,
    sharded_nms_mc_step,
    sharded_nms_train_step,
)


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_mc_step_counts(code):
    mesh = make_mesh(8)
    spec = ChannelSpec.awgn(4.0, code.rate)
    params = nms.init_params("NMS-1")
    with mesh:
        step = sharded_nms_mc_step(code, "NMS-1", 6, spec, 8, mesh)
        counters = np.asarray(step(params, jax.random.PRNGKey(0)))
    assert counters[0] == 64
    assert 0 <= counters[1] <= 64
    # detected + undetected partition of errors is consistent
    assert counters[4] <= counters[1]


def test_sharded_train_step_updates_params(code):
    mesh = make_mesh(4)
    spec = ChannelSpec.awgn(2.7, code.rate)
    params = nms.init_params("NMS-1")
    with mesh:
        tx, step = sharded_nms_train_step(code, "NMS-1", 4, spec, 4, mesh)
        opt_state = tx.init(params)
        new_params, _, loss = step(params, opt_state, jax.random.PRNGKey(0))
    assert float(loss) > 0
    assert float(new_params["check"][0]) != float(params["check"][0])


def test_graft_entry_single_chip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (13, 32, 128)


def test_graft_entry_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)

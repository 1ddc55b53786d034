import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.ops.nms_pallas import decode_final_pallas


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


@pytest.mark.parametrize("variant", ["NMS-1", "NMS-3"])
def test_pallas_matches_xla(code, variant):
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(1.0, 0.8, (16, code.n)), jnp.float32)
    params = nms.init_params(variant, code.h)
    h = jnp.asarray(code.h)
    want = nms.decode_final(params, h, llr, 8, variant)
    got = decode_final_pallas(
        params, h, llr, 8, variant, block_frames=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pallas_duplicate_min_semantics(code):
    # craft inputs with exact duplicate magnitudes inside a check row
    rng = np.random.default_rng(1)
    llr = rng.normal(1.0, 0.5, (8, code.n)).astype(np.float32)
    llr = np.round(llr, 1)  # force many ties
    params = nms.init_params("NMS-1")
    h = jnp.asarray(code.h)
    want = nms.decode_final(params, h, jnp.asarray(llr), 6, "NMS-1")
    got = decode_final_pallas(
        params, h, jnp.asarray(llr), 6, "NMS-1", block_frames=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

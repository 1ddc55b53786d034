import jax.numpy as jnp
import numpy as np

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import gf2ops
from short_ldpc_decoding_osd_tpu.ops.gf2_pallas import batched_row_reduce_pallas


def test_pallas_ge_matches_xla():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(0)
    batch = np.stack(
        [code.h[:, rng.permutation(code.n)] for _ in range(8)]
    ).astype(np.uint8)
    want_mat, want_ord = gf2ops.batched_row_reduce(jnp.asarray(batch))
    got_mat, got_ord = batched_row_reduce_pallas(
        jnp.asarray(batch), block_frames=4, interpret=True
    )
    assert np.array_equal(np.asarray(got_mat), np.asarray(want_mat))
    assert np.array_equal(np.asarray(got_ord), np.asarray(want_ord))

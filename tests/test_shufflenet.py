"""The MXU interleave must reproduce the reference channel shuffle exactly.

The trunk forward replaces ``channel_shuffle(concat([l, b]), 2)`` with two
one-hot GEMMs (``_interleave_gemm``) for TPU speed (see shufflenet.py
docstring). Checkpoint parity with the reference
(``/root/reference/model/modules/shufflenetv2.py:29-39``) rests on the
permutation being bit-identical, so equality here is exact, not approx.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lip2speech_tpu.models.shufflenet import (
    ShuffleNetV2Trunk,
    _interleave_gemm,
    channel_shuffle,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("half", [29, 58, 116, 232])
def test_interleave_gemm_exact(dtype, half):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    left = jax.random.normal(k1, (2, 3, 3, half), dtype)
    right = jax.random.normal(k2, (2, 3, 3, half), dtype)
    got = _interleave_gemm(left, right)
    want = channel_shuffle(jnp.concatenate([left, right], axis=-1), 2)
    assert got.dtype == dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_trunk_forward_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 48, 48, 24))
    trunk = ShuffleNetV2Trunk(1.0)
    v = trunk.init(jax.random.PRNGKey(1), x, train=False)
    out = trunk.apply(v, x, train=False)
    assert out.shape == (3, 768)
    assert np.isfinite(np.asarray(out)).all()

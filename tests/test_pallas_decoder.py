"""Pallas AR-decode kernel vs the lax.scan decoder (interpret mode, CPU).

f32 weights in interpret mode must match the scan path closely; the bf16
production path is benchmarked on TPU (bench docs)."""

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models.decoder import Decoder
from lip2speech_tpu.ops.pallas_decoder import pallas_ar_decode

CFG = ModelConfig(
    ffn_hidden_dim=128,
    content_vocab_size=33,
    content_latent_dim=64,
    max_decoder_steps=16,
    postnet_embedding_dim=64,
)


def _setup():
    model = Decoder(CFG)
    B, T = 2, 9
    enc_in = jax.random.normal(jax.random.PRNGKey(0), (B, T, CFG.encoder_embedding_dim)) * 0.3
    face = jax.random.normal(jax.random.PRNGKey(1), (B, 256)) * 0.3
    rngs = {"gumbel": jax.random.PRNGKey(2)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, enc_in, face, None, 1.0, rngs, train=False
    )
    out = model.apply(
        variables, enc_in, face, None, 1.0, rngs, train=False,
        return_ar_inputs=True,
    )
    ar = out["ar_inputs"]
    return out, ar["p"], ar["enc"], ar["bos"]


def test_pallas_kernel_matches_scan_interpret():
    out_scan, p, enc, bos = _setup()
    mels, stops, attn = pallas_ar_decode(
        CFG, p, enc, bos, weight_dtype=jnp.float32, interpret=True
    )
    # scan outputs (B, n_mels, M) pre-postnet = out["mel"]
    got = jnp.transpose(mels, (1, 2, 0))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(out_scan["mel"]), atol=2e-4, rtol=1e-3
    )
    got_stop = jnp.transpose(stops, (1, 0, 2))
    np.testing.assert_allclose(
        np.asarray(got_stop), np.asarray(out_scan["gate"]), atol=2e-4, rtol=1e-3
    )
    got_attn = jnp.transpose(attn, (1, 0, 2))
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(out_scan["attention"]), atol=2e-4, rtol=1e-3
    )


def test_pallas_kernel_b1_padding_matches_scan():
    """B=1 serving path: the wrapper pads the batch to one sublane tile
    (real Mosaic rejects B<8) and slices back; outputs must equal the
    scan decoder's for the single live row."""
    model = Decoder(CFG)
    B, T = 1, 9
    enc_in = jax.random.normal(jax.random.PRNGKey(3), (B, T, CFG.encoder_embedding_dim)) * 0.3
    face = jax.random.normal(jax.random.PRNGKey(4), (B, 256)) * 0.3
    rngs = {"gumbel": jax.random.PRNGKey(5)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, enc_in, face, None, 1.0, rngs, train=False
    )
    out = model.apply(
        variables, enc_in, face, None, 1.0, rngs, train=False,
        return_ar_inputs=True,
    )
    ar = out["ar_inputs"]
    mels, stops, attn = pallas_ar_decode(
        CFG, ar["p"], ar["enc"], ar["bos"], weight_dtype=jnp.float32,
        interpret=True,
    )
    assert mels.shape == (CFG.max_decoder_steps, 1, CFG.n_mels)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(mels, (1, 2, 0))),
        np.asarray(out["mel"]), atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(attn, (1, 0, 2))),
        np.asarray(out["attention"]), atol=2e-4, rtol=1e-3,
    )

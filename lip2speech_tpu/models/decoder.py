"""Autoregressive mel decoder (flax + lax.scan).

TPU-native redesign of ``/root/reference/model/modules/decoder.py:274-444``
(Tacotron2-flavoured LSTM/attention decoder with PSine activations, a
face-conditioned BiLSTM encoder, multi-kernel conv K/V banks, and a
gumbel-quantized Content codebook).

Key departures from the reference's per-step Python loop (decoder.py:353):
  * the whole AR loop is ONE ``lax.scan`` — the 300-step unroll compiles to
    a single XLA while-op whose per-step work is four fused gate matmuls
    (2 LSTM cells) + attention einsums, all MXU-bound;
  * teacher-forcing randomness (torch.rand inside forward, decoder.py:355)
    is pre-sampled outside the scan and threaded as scan inputs, keeping the
    step function pure;
  * dropout uses explicit per-step keys split from one base key;
  * training and inference share one compiled program: inference is the
    same scan with an empty teacher budget, recording the first
    gate-threshold crossing per row instead of early exit
    (the reference inference loop also always runs 300 steps).

Layout: sequences (B, T, C); mels cross the API edge as (B, n_mels, M) to
match the reference contract, transposed internally.

Teacher-forcing semantics note (preserved exactly, decoder.py:355-357):
``tf_ratio`` is inverted relative to its name — a step consumes the
teacher frame only when ``rand > tf_ratio`` AND fewer than
``floor(tf_ratio * M)`` teacher frames were used, so tf_ratio=1 means
fully free-running (this is what evaluate.py measures) and small
tf_ratio front-loads a small teacher budget.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models.layers import (
    GAIN,
    LinearNorm,
    PSine,
    batch_norm,
    clip_grad_norm,
    lstm_cell_step,
    positional_encoding,
    xavier_uniform_gain,
    LSTM,
)


# ---------------------------------------------------------------------------
# Static helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def adaptive_avg_pool_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(in_len, out_len) averaging matrix reproducing torch
    ``adaptive_avg_pool1d`` bin boundaries. Static shapes -> the pooling
    becomes a matmul (Content.encode, decoder.py:247)."""
    m = np.zeros((in_len, out_len), np.float32)
    for j in range(out_len):
        lo = (j * in_len) // out_len
        hi = -(-((j + 1) * in_len) // out_len)  # ceil
        m[lo:hi, j] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """x: (B, T, C) -> (B, out_len, C)."""
    mat = jnp.asarray(adaptive_avg_pool_matrix(x.shape[1], out_len), x.dtype)
    return jnp.einsum("btc,ts->bsc", x, mat)


# ---------------------------------------------------------------------------
# Sub-modules that run OUTSIDE the AR scan
# ---------------------------------------------------------------------------


class MultiHopConv(nn.Module):
    """Multi-kernel conv bank k=1,3,7,11 + bottleneck (decoder.py:159-196).
    Operates on (B, T, C)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = [x]
        for k in (1, 3, 7, 11):
            h = nn.Conv(
                x.shape[-1], (k,), padding=[(k // 2, k // 2)], name=f"conv_k{k}"
            )(x)
            h = batch_norm(train, name=f"bn_k{k}")(h)
            feats.append(nn.silu(h))
        h = jnp.concatenate(feats, axis=-1)
        return nn.Conv(self.features, (1,), name="bottleneck")(h)


class Postnet(nn.Module):
    """5-conv residual mel refiner with PSine activations
    (decoder.py:107-156). Input/output (B, M, n_mels)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = True, dropout_key: jax.Array | None = None):
        c = self.cfg
        ksz = c.postnet_kernel_size
        pad = ((ksz - 1) // 2, (ksz - 1) // 2)

        def dropout(h, i):
            if not train or dropout_key is None:
                return h
            keep = 1.0 - c.postnet_dropout
            mask = jax.random.bernoulli(
                jax.random.fold_in(dropout_key, i), keep, h.shape
            )
            return jnp.where(mask, h / keep, 0.0)

        n = c.postnet_n_convolutions
        for i in range(n - 1):
            residual = x
            out_ch = c.postnet_embedding_dim
            h = nn.Conv(
                out_ch,
                (ksz,),
                padding=[pad],
                kernel_init=xavier_uniform_gain(GAIN["tanh"]),
                name=f"conv_{i}",
            )(x)
            h = batch_norm(train, name=f"bn_{i}")(h)
            h = PSine(out_ch, name=f"psine_{i}")(h)
            if i != 0:
                h = h + residual
            x = dropout(h, i)
        h = nn.Conv(
            c.n_mels,
            (ksz,),
            padding=[pad],
            kernel_init=xavier_uniform_gain(GAIN["linear"]),
            name=f"conv_{n - 1}",
        )(x)
        h = batch_norm(train, name=f"bn_{n - 1}")(h)
        return dropout(h, n - 1)


class ContentEncoder(nn.Module):
    """Multi-scale aggregation + gumbel codebook (decoder.py:199-260).

    Maps encoder features (B, T, C) to:
      key   (B, S, latent) — attention keys over S quantized slots,
      value (B, S, latent) — gumbel-softmax mixture of word embeddings,
      dist  (B*S, vocab)   — softmax distribution for the KLD loss.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, gumbel_key, train: bool = True):
        c = self.cfg
        in_c = x.shape[-1]
        vocab, latent = c.content_vocab_size, c.content_latent_dim

        word_embeddings = self.param(
            "word_embeddings",
            lambda k, s: jax.random.uniform(k, s),  # torch.rand init
            (vocab, latent),
        )

        feats = [x]
        min_t = x.shape[1]
        for k in (1, 3, 5, 7):
            # scales whose strided VALID conv would emit 0 frames are padded
            # up to one frame (the reference never sees T < 7; LRW T=29)
            h = x if x.shape[1] >= k else jnp.pad(x, ((0, 0), (0, k - x.shape[1]), (0, 0)))
            h = nn.Conv(in_c, (k,), strides=(k,), padding="VALID", name=f"agg_k{k}")(h)
            h = batch_norm(train, name=f"agg_bn_k{k}")(h)
            h = nn.silu(h)
            feats.append(h)
            min_t = min(min_t, h.shape[1])

        pooled = jnp.concatenate([adaptive_avg_pool(f, min_t) for f in feats], axis=-1)
        w = nn.Conv(latent, (1,), name="bottleneck")(pooled)  # (B, S, latent)

        key_out = nn.silu(nn.Dense(latent, name="K_0")(w))
        key_out = nn.silu(nn.Dense(latent, name="K_1")(key_out))

        h = nn.silu(nn.Dense(latent, name="loc_0")(w))
        h = nn.silu(nn.Dense(latent, name="loc_1")(h))
        logits = nn.silu(nn.Dense(vocab, name="loc_2")(h))  # (B, S, vocab)

        flat = logits.reshape(-1, vocab)
        if c.content_grad_clip > 0.0:
            # Long-run fixture campaigns (runs/overfit_r5a) showed the
            # content path is the OTHER explosion channel scan_grad_clip
            # does not cover: every grad blowup (1e8-1e16) was preceded by
            # the KLD term climbing 0.1 -> 1-4, i.e. the quantizer logits
            # sharpening — and the tau=0.1 gumbel-softmax multiplies
            # logits cotangents by 1/tau through 80 AR attention reads.
            # Identity forward; clips only the total cotangent reaching
            # the logits. Opt-in like scan_grad_clip (no reference
            # counterpart, decoder.py:199-260 trains unclipped).
            from lip2speech_tpu.models.layers import clip_grad_norm

            flat = clip_grad_norm(flat, c.content_grad_clip)
        # the reference samples gumbel noise unconditionally — train AND
        # eval (F.gumbel_softmax has no eval switch, decoder.py:257) — so
        # eval parity requires sampling here too; determinism is preserved
        # because the key is explicit
        # draw in f32 regardless of compute dtype: -log(-log(u)) quantizes
        # badly in bf16, and the same key must yield the same noise in
        # mixed- and full-precision runs
        g = jax.random.gumbel(gumbel_key, flat.shape, jnp.float32).astype(flat.dtype)
        z = jax.nn.softmax((flat + g) / c.gumbel_tau, axis=-1)
        value = (z @ word_embeddings).reshape(w.shape[0], min_t, latent)
        dist = jax.nn.softmax(flat, axis=-1)
        return key_out, value, dist


# ---------------------------------------------------------------------------
# Pure scan step
# ---------------------------------------------------------------------------


def _build_step(cfg: ModelConfig, p, enc, train, tf_ratio, tf_budget):
    """Build the pure AR step function.

    carry: (h (2,B,F), c (2,B,F), ys (B,n_mels), consumed ()).
    xs: (teacher_frame (B,n_mels), pos_i (F,), rand_i (), key_i).
    outputs: (mel_frame (B,n_mels), stop (B,1), attention (B,T)).
    """

    def dense(pp, x):
        out = jnp.dot(x, pp["kernel"], preferred_element_type=jnp.float32) + pp["bias"]
        return out.astype(x.dtype)  # f32 MXU accumulation, compute-dtype carry

    def dropout(key, x, rate):
        if not train or rate == 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    k_bank, v_bank = enc["k"], enc["v"]
    encoder_cell = enc["encoder_cell"]
    c_key, c_val = enc["content_key"], enc["content_value"]

    def step(carry, xs):
        h, cc, ys, consumed = carry
        teacher_frame, pos_i, rand_i, key_i = xs
        k1, k2, k3 = jax.random.split(key_i, 3)

        if cfg.scan_grad_clip > 0.0:
            # bound the backward gain per scan step (see
            # layers.clip_grad_norm); forward values pass through exactly
            h = clip_grad_norm(h, cfg.scan_grad_clip)
            cc = clip_grad_norm(cc, cfg.scan_grad_clip)
            ys = clip_grad_norm(ys, cfg.scan_grad_clip)

        # mixed teacher forcing (decoder.py:355-357)
        use_teacher = jnp.logical_and(rand_i > tf_ratio, consumed < tf_budget)
        consumed = consumed + use_teacher.astype(jnp.int32)
        ys_in = jnp.where(use_teacher, teacher_frame, ys)

        # prenet (decoder.py:305-311): Dense+PSine+Dropout(0.2)+Dense+PSine
        pre = jnp.sin(dense(p["prenet0"], ys_in)) * p["prenet0_w"]
        pre = dropout(k1, pre, cfg.prenet_dropout)
        pre = jnp.sin(dense(p["prenet1"], pre)) * p["prenet1_w"]

        # query from both decoder-LSTM hidden states + positional
        h_cat = jnp.concatenate([h[0], h[1]], axis=-1)  # (B, 2F)
        q = jnp.sin(dense(p["Q"], h_cat)) * p["Q_w"] + pos_i  # (B, F)

        # scaled dot-product attention over encoder K/V (decoder.py:360-367).
        # Score dropout + softmax run in f32: attention logits are the one
        # precision-critical op in the step (bf16 here NaNs the TPU
        # backward), standard mixed-precision practice.
        scores = jnp.einsum("bf,btf->bt", q * p["temperature"], k_bank)
        scores = scores.astype(jnp.float32)
        scores = dropout(k2, scores, cfg.attention_dropout)
        a = jax.nn.softmax(scores, axis=-1).astype(v_bank.dtype)
        o = dense(p["attention_proj"], jnp.einsum("bt,btf->bf", a, v_bank))

        ys_mid = pre + o  # (B, F/2)

        # Content attention over quantized slots (decoder.py:262-271),
        # queried by the current cell states
        c_cat = jnp.concatenate([cc[0], cc[1]], axis=-1)  # (B, 2F)
        cq = nn.silu(dense(p["content_Q"], c_cat))
        ca = jax.nn.softmax(
            jnp.einsum("bl,bsl->bs", cq * p["content_temp"], c_key), axis=-1
        )
        content_o = jnp.einsum("bs,bsl->bl", ca, c_val)  # (B, latent)

        rnn_in = jnp.concatenate([content_o, ys_mid], axis=-1)  # (B, F)

        # 2-layer LSTM step with inter-layer dropout 0.1 (decoder.py:312)
        h0, c0 = lstm_cell_step(p["lstm0"], rnn_in, h[0], cc[0])
        h0d = dropout(k3, h0, cfg.decoder_rnn_dropout)
        h1, c1 = lstm_cell_step(p["lstm1"], h0d, h[1], cc[1])

        ys_new = dense(p["fc_out"], h1)  # (B, n_mels)
        stop = dense(p["stop"], jnp.concatenate([h1, encoder_cell], axis=-1))

        new_carry = (jnp.stack([h0, h1]), jnp.stack([c0, c1]), ys_new, consumed)
        return new_carry, (ys_new, stop, a)

    return step


# ---------------------------------------------------------------------------
# The decoder
# ---------------------------------------------------------------------------


class Decoder(nn.Module):
    """Full decoder.

    Teacher-forced training forward when ``mels`` is given
    (decoder.py:320-379); free-running generation when ``mels is None``
    (decoder.py:382-444). One compiled scan serves both.
    """

    cfg: ModelConfig

    def _ar_params(self):
        """Parameters used inside the scan step, declared explicitly so the
        step function stays pure JAX."""
        c = self.cfg
        F = c.ffn_hidden_dim
        half = F // 2
        mels = c.n_mels
        xavier = xavier_uniform_gain(1.0)
        sig = xavier_uniform_gain(GAIN["sigmoid"])
        zeros = nn.initializers.zeros

        def dense_p(name, i, o, init=xavier):
            return {
                "kernel": self.param(f"{name}_kernel", init, (i, o)),
                "bias": self.param(f"{name}_bias", zeros, (o,)),
            }

        def lstm_p(name, i, h):
            s = 1.0 / np.sqrt(h)
            u = lambda k, sh: jax.random.uniform(k, sh, jnp.float32, -s, s)
            return {
                "wx": self.param(f"{name}_wx", u, (i, 4 * h)),
                "wh": self.param(f"{name}_wh", u, (h, 4 * h)),
                "b": self.param(f"{name}_b", u, (4 * h,)),
            }

        ones = lambda k, sh: jnp.ones(sh)
        return {
            "prenet0": dense_p("prenet0", mels, half),
            "prenet0_w": self.param("prenet0_psine_w", ones, (half,)),
            "prenet1": dense_p("prenet1", half, half),
            "prenet1_w": self.param("prenet1_psine_w", ones, (half,)),
            "Q": dense_p("Q", 2 * F, F),
            "Q_w": self.param("Q_psine_w", ones, (F,)),
            "attention_proj": dense_p("attention_proj", F, half),
            "content_Q": dense_p("content_Q", 2 * F, c.content_latent_dim),
            "content_temp": self.param(
                "content_temperature",
                lambda k, s: jnp.full(s, np.sqrt(c.content_latent_dim)),
                (1,),
            ),
            "temperature": self.param(
                "temperature", lambda k, s: jnp.full(s, np.sqrt(F)), (1,)
            ),
            "lstm0": lstm_p("decoder_rnn_l0", F, F),
            "lstm1": lstm_p("decoder_rnn_l1", F, F),
            "fc_out": dense_p("fc_out", F, mels),
            "stop": dense_p("stop_token", 2 * F, 1, init=sig),
        }

    def _encode(self, encoder_outputs, face_features, gumbel_key, train):
        """Shared pre-scan encoding (decoder.py:321-340 / 383-401)."""
        c = self.cfg
        F = c.ffn_hidden_dim
        T = encoder_outputs.shape[1]

        residual = nn.Dense(F, name="residual_bottleneck")(encoder_outputs)

        enc_site = LinearNorm(F, name="encoder_site")(face_features)
        enc_site = PSine(F, name="encoder_site_psine")(enc_site)
        att_site = LinearNorm(F, name="attention_site")(face_features)
        att_site = PSine(F, name="attention_site_psine")(att_site)

        h0 = jnp.stack([enc_site, enc_site])  # (2, B, F): both directions
        enc_out, (hidden, cell) = LSTM(
            F, num_layers=1, bidirectional=True, name="encoder_rnn"
        )(encoder_outputs, h0, h0)

        cell_cat = jnp.concatenate([cell[0], cell[1]], axis=-1)  # (B, 2F)
        encoder_cell = LinearNorm(F, w_init_gain="sigmoid", name="E_C")(cell_cat)

        enc_out = LinearNorm(F, name="encoder_proj")(enc_out)
        enc_out = enc_out + att_site[:, None, :] + residual

        pos = positional_encoding(c.max_encoder_positions, F)[:T][None]
        pos = pos.astype(enc_out.dtype)  # keep bf16 paths bf16
        k_bank = MultiHopConv(F, name="K_bank")(enc_out, train)
        k_bank = PSine(F, name="K_psine")(k_bank) + pos
        v_bank = MultiHopConv(F, name="V_bank")(enc_out, train)
        v_bank = PSine(F, name="V_psine")(v_bank) + pos

        content_key, content_value, content_dist = ContentEncoder(c, name="content")(
            enc_out, gumbel_key, train
        )

        return {
            "hidden": hidden,  # (2, B, F) BiLSTM finals, reused as AR init
            "encoder_cell": encoder_cell,  # (B, F)
            "k": k_bank,  # (B, T, F)
            "v": v_bank,  # (B, T, F)
            "content_key": content_key,
            "content_value": content_value,
            "content_dist": content_dist,
        }

    @nn.compact
    def __call__(
        self,
        encoder_outputs: jnp.ndarray,  # (B, T, encoder_dim)
        face_features: jnp.ndarray,  # (B, 256)
        mels: jnp.ndarray | None = None,  # (B, n_mels, M) teacher targets
        tf_ratio: jnp.ndarray | float = 1.0,
        rngs: dict[str, jax.Array] | None = None,
        train: bool = True,
        return_ar_inputs: bool = False,
    ) -> dict[str, Any]:
        c = self.cfg
        F = c.ffn_hidden_dim
        B = encoder_outputs.shape[0]
        inference = mels is None
        if inference:
            train = False
        if rngs is None:
            # deterministic fallback for every stream the forward may draw
            # from ('teacher' is read whenever mels are given — a gumbel-only
            # dict would KeyError on the teacher-forced path)
            rngs = {
                "gumbel": jax.random.PRNGKey(0),
                "teacher": jax.random.PRNGKey(1),
            }
        M = c.max_decoder_steps if inference else mels.shape[-1]

        enc = self._encode(encoder_outputs, face_features, rngs["gumbel"], train)
        p = self._ar_params()
        bos = self.param("BOS", lambda k, s: jax.random.normal(k, s), (1, c.n_mels))

        dtype = encoder_outputs.dtype
        if inference:
            teacher = jnp.zeros((B, M, c.n_mels), dtype)
            rand_draws = jnp.zeros((M,))
            tf_ratio_arr = jnp.float32(1.0)
            tf_budget = jnp.int32(0)
        else:
            mels_t = jnp.swapaxes(mels, 1, 2)  # (B, M, n_mels)
            # teacher_input[:, i] = frame i-1 (BOS at i=0) — decoder.py:345
            teacher = jnp.concatenate(
                [jnp.tile(bos[None], (B, 1, 1)), mels_t[:, : M - 1]], axis=1
            )
            rand_draws = jax.random.uniform(rngs["teacher"], (M,))
            tf_ratio_arr = jnp.asarray(tf_ratio, jnp.float32)
            tf_budget = jnp.floor(tf_ratio_arr * M).astype(jnp.int32)

        pos_dec = positional_encoding(max(c.max_decoder_steps, M), F)[:M].astype(dtype)
        step_keys = jax.random.split(rngs.get("dropout", jax.random.PRNGKey(0)), M)

        step = _build_step(c, p, enc, train, tf_ratio_arr, tf_budget)

        init = (
            enc["hidden"],  # (2, B, F)
            jnp.zeros_like(enc["hidden"]),  # cell.fill_(0), decoder.py:348
            jnp.tile(bos, (B, 1)),
            jnp.zeros((), jnp.int32),
        )
        xs = (jnp.swapaxes(teacher, 0, 1).astype(dtype), pos_dec, rand_draws, step_keys)
        _, (outputs, stops, attn) = jax.lax.scan(step, init, xs)

        outputs = jnp.transpose(outputs, (1, 2, 0))  # (B, n_mels, M)
        stops = jnp.transpose(stops, (1, 0, 2))  # (B, M, 1)
        attn = jnp.transpose(attn, (1, 0, 2))  # (B, M, T)

        post_in = jnp.swapaxes(outputs, 1, 2)
        post = Postnet(c, name="postnet")(post_in, train, rngs.get("postnet_dropout"))
        post_preds = jnp.swapaxes(post, 1, 2) + outputs

        # first step whose sigmoid(gate) crosses threshold; M if none fires
        # (decoder.py:430-435)
        fired = jax.nn.sigmoid(stops[..., 0]) > c.gate_threshold
        lengths = jnp.where(
            fired.any(axis=1), jnp.argmax(fired, axis=1) + 1, M
        )

        result = {
            "mel": outputs,
            "mel_postnet": post_preds,
            "gate": stops,
            "face_features": face_features,
            "attention": attn,
            "content_dist": enc["content_dist"],
            "lengths": lengths,
        }
        if return_ar_inputs:
            # hand the pallas AR kernel exactly what the scan consumed
            result["ar_inputs"] = {
                "p": p,
                "enc": enc,
                "bos": jnp.tile(bos, (B, 1)),
            }
        return result

"""Train-step tests on the 8-device virtual CPU mesh: loss decreases,
gradients flow only into trainable branches, and DP/TP shardings compile
and execute (SURVEY.md §4: multi-device tests via forced host platform).

A shrunken ModelConfig + the external-speaker-embedding path (which skips
the InceptionResnet face net) keep CPU compile times tractable; full-size
shapes are exercised on TPU by bench.py and __graft_entry__.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lip2speech_tpu.config import Config, ModelConfig
from lip2speech_tpu.models import Lip2Speech
from lip2speech_tpu.parallel import (
    batch_sharding,
    create_mesh,
    partition_params,
    shard_pytree,
)
from lip2speech_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)

TINY_MODEL = ModelConfig(
    ffn_hidden_dim=128,
    content_vocab_size=33,
    content_latent_dim=64,
    max_decoder_steps=24,
    postnet_embedding_dim=64,
    shufflenet_width=0.5,
)
CFG = Config(model=TINY_MODEL)


def tiny_batch(b=8, t=8, m=12, hw=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {
        "video": jax.random.normal(ks[0], (b, t, hw, hw, 3)) * 0.1,
        "speaker_embedding": jax.random.normal(ks[1], (b, 256)) * 0.1,
        "mel": jax.random.normal(ks[2], (b, 80, m)) - 5.0,
        "gate": jnp.zeros((b, m)).at[:, -1].set(1.0),
        "mel_mask": jnp.ones((b, m), bool),
    }


@pytest.fixture(scope="module")
def setup():
    model = Lip2Speech(CFG.model)
    batch = tiny_batch()
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["video"], None, batch["mel"], 0.5,
        batch["speaker_embedding"], rngs, train=False,
    )
    return model, variables, batch


def _fresh(variables):
    # deep-copy: jitted steps donate the state, invalidating shared buffers
    return jax.tree.map(jnp.array, variables)


def test_trainable_mask_and_freeze_semantics():
    # micro param tree standing in for the full model's top-level layout
    params = {
        "encoder": {"w": jnp.ones((3,))},
        "decoder": {"w": jnp.ones((3,))},
        "vgg_face": {"w": jnp.ones((3,))},
    }
    mask = trainable_mask(params)
    assert mask == {
        "encoder": {"w": True},
        "decoder": {"w": True},
        "vgg_face": {"w": False},
    }
    tx = make_optimizer(Config(), params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["vgg_face"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["decoder"]["w"]).max()) > 0.0
    # weight decay must not leak into frozen branches either
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["vgg_face"]["w"]), np.ones((3,))
    )


def test_train_step_loss_decreases_and_frozen_stable(setup):
    model, variables, batch = setup
    variables = _fresh(variables)
    # f32: this test asserts a deterministic monotone decrease over 6 tiny
    # steps, which bf16 rounding noise can mask (bf16 has its own test)
    cfg32 = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=False))
    tx = make_optimizer(cfg32, variables["params"])
    state = create_train_state(cfg32, variables)
    step_fn = make_train_step(cfg32, model, tx)

    old_enc = [
        np.asarray(x) for x in jax.tree.leaves(variables["params"]["encoder"])
    ]

    rng = jax.random.PRNGKey(42)
    state, m0 = step_fn(state, batch, jnp.float32(0.5), rng)
    first = float(m0["total"])
    for _ in range(5):
        state, metrics = step_fn(state, batch, jnp.float32(0.5), rng)
    last = float(metrics["total"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)
    assert float(metrics["grad_norm"]) > 0
    # step counter advanced; encoder params moved
    assert int(state.step) == 6
    diffs = [
        float(np.abs(a - np.asarray(b)).max())
        for a, b in zip(old_enc, jax.tree.leaves(state.params["encoder"]))
    ]
    assert max(diffs) > 0


def test_data_parallel_mesh(setup):
    model, variables, batch = setup
    variables = _fresh(variables)
    assert jax.device_count() == 8
    mesh = create_mesh(n_data=8, n_model=1)
    tx = make_optimizer(CFG, variables["params"])
    state = create_train_state(CFG, variables)

    state = jax.device_put(state, NamedSharding(mesh, P()))
    sbatch = jax.device_put(batch, batch_sharding(mesh))

    step_fn = make_train_step(CFG, model, tx)
    new_state, metrics = step_fn(
        state, sbatch, jnp.float32(0.5), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["total"]))
    # params remain replicated after the update
    leaf = jax.tree.leaves(new_state.params["decoder"])[0]
    assert leaf.sharding.is_fully_replicated


def test_tensor_parallel_shardings_compile(setup):
    model, variables, batch = setup
    mesh = create_mesh(n_data=4, n_model=2)
    specs = partition_params(variables["params"], mesh, tensor_parallel=True)
    spec_leaves = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert any(s != P() for s in spec_leaves), "no TP rule matched"

    params = shard_pytree(variables["params"], mesh, specs)
    stats = jax.device_put(variables["batch_stats"], NamedSharding(mesh, P()))
    sbatch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }

    @jax.jit
    def fwd(p, s, b):
        out, _ = model.apply(
            {"params": p, "batch_stats": s},
            b["video"], None, b["mel"], 0.5, b["speaker_embedding"], rngs,
            train=True, mutable=["batch_stats"],
        )
        return out["mel_postnet"]

    out = fwd(params, stats, sbatch)
    assert out.shape == (8, 80, 12)
    assert np.isfinite(np.asarray(out)).all()


def _step_outputs(model, variables, batch, mesh=None, tp=False):
    """One f32 train step under the given sharding; returns (loss,
    grad_norm, updated decoder params as a flat numpy list)."""
    cfg32 = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=False))
    variables = _fresh(variables)
    tx = make_optimizer(cfg32, variables["params"])
    state = create_train_state(cfg32, variables)
    if mesh is not None:
        specs = partition_params(state.params, mesh, tensor_parallel=tp)
        state = state._replace(
            params=shard_pytree(state.params, mesh, specs),
            batch_stats=jax.device_put(state.batch_stats, NamedSharding(mesh, P())),
            opt_state=jax.device_put(state.opt_state, NamedSharding(mesh, P())),
            step=jax.device_put(state.step, NamedSharding(mesh, P())),
        )
        batch = jax.device_put(batch, batch_sharding(mesh))
    step_fn = make_train_step(cfg32, model, tx)
    new_state, metrics = step_fn(
        state, batch, jnp.float32(0.5), jax.random.PRNGKey(7)
    )
    dec = [np.asarray(x) for x in jax.tree.leaves(new_state.params["decoder"])]
    enc = [np.asarray(x) for x in jax.tree.leaves(new_state.params["encoder"])]
    return float(metrics["total"]), float(metrics["grad_norm"]), dec, enc


def _param_diff_stats(ref, got):
    n_bad = total = 0
    worst = 0.0
    lr = CFG.train.learning_rate
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        d = np.abs(a - b)
        worst = max(worst, float(d.max()))
        n_bad += int((d > 0.05 * lr).sum())
        total += d.size
    return worst, n_bad, total


@pytest.mark.slow
def test_dp_tp_numerically_match_single_device(setup):
    """The sharded step must compute the SAME optimization step as the
    unsharded one. Catches sharded-wrong-but-finite bugs (e.g. a TP rule
    splitting a tensor XLA then mis-reduces).

    Tolerances are calibrated, not guessed: forward loss agrees to 1e-5.
    Decoder grads (short backward chain) agree to ~1e-4 absolute.
    Encoder grads flow backward through the 24-step AR scan whose Jacobian
    amplifies f32 reduction-reorder noise ~1.7e4x (measured: a 1e-6
    relative param perturbation moves encoder grads 1.7% relL2 on a single
    device), so encoder updates get a proportional straggler allowance;
    the tight collective-correctness check for the encoder is
    test_encoder_sharded_grads_tight below.
    """
    model, variables, batch = setup

    ref_loss, ref_gn, ref_dec, ref_enc = _step_outputs(model, variables, batch)

    dp_mesh = create_mesh(n_data=8, n_model=1)
    dp = _step_outputs(model, variables, batch, dp_mesh)

    tp_mesh = create_mesh(n_data=4, n_model=2)
    tp = _step_outputs(model, variables, batch, tp_mesh, tp=True)

    lr = CFG.train.learning_rate
    for name, (loss, gn, dec, enc) in (("dp", dp), ("tp", tp)):
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-5, err_msg=name)
        np.testing.assert_allclose(gn, ref_gn, rtol=1e-2, err_msg=name)
        # Decoder: AdamW's first step is ~sign(g)*lr, so entries whose
        # gradient sits at numerical zero may flip sign under reduction
        # reordering (diff 2*lr). Bulk must match tightly; stragglers capped.
        worst, n_bad, total = _param_diff_stats(ref_dec, dec)
        assert worst <= 2.5 * lr, (name, worst)
        # measured: 550 flips over 3.1M decoder entries (1.8e-4); cap at 3x
        assert n_bad <= max(10, total // 2_000), (name, n_bad, total)
        # Encoder: conditioning-limited (see docstring); allow up to 2% of
        # entries to sit in the noise-flip regime but require the bulk tight.
        worst, n_bad, total = _param_diff_stats(ref_enc, enc)
        assert worst <= 2.5 * lr, (name, worst)
        assert n_bad <= max(10, total // 50), (name, n_bad, total)


def test_encoder_sharded_grads_tight(setup):
    """Direct collective-correctness check: encoder-only grads (conv3d +
    BN + ShuffleNet trunk, no AR-scan amplification) under 8-way DP must
    match the f64 ground-truth grads closely.

    Self-calibrating tolerance: a fixed constant rotted once already —
    the round-3 calibration (DP8 1.1e-3 vs single-device f32 3.1e-2)
    broke when round 4's 5D->2D frontend fold changed f32 reduction
    orders (DP8 moved to ~6e-3, still 5x better than single-device f32).
    A *wrong* collective (missing/duplicated psum) is orders of magnitude
    off, so the honest invariant is: sharding must not degrade accuracy
    beyond a small factor of the same program's single-device f32 error,
    plus an absolute backstop.
    """
    model, variables, batch = setup
    probe_rng = jax.random.PRNGKey(9)

    from lip2speech_tpu.models.video import VideoExtractor

    enc = VideoExtractor(width_mult=CFG.model.shufflenet_width)
    video = batch["video"]
    ev = enc.init({"params": jax.random.PRNGKey(0)}, video, train=False)
    out_shape = jax.eval_shape(lambda v: enc.apply(v, video, train=False), ev)
    probe = jax.random.normal(probe_rng, out_shape.shape)

    def probe_loss(params, stats, v, pr):
        out, _ = enc.apply(
            {"params": params, "batch_stats": stats}, v,
            train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out * pr)

    flat = lambda g: np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in jax.tree.leaves(g)]
    )

    with jax.enable_x64(True):
        cast64 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        g_truth = flat(jax.jit(jax.grad(probe_loss))(
            cast64(ev["params"]), cast64(ev["batch_stats"]),
            video.astype(jnp.float64), probe.astype(jnp.float64),
        ))

    g_sd = flat(jax.jit(jax.grad(probe_loss))(
        ev["params"], ev["batch_stats"], video, probe,
    ))
    rel_sd = np.linalg.norm(g_sd - g_truth) / np.linalg.norm(g_truth)

    mesh = create_mesh(n_data=8, n_model=1)
    g_dp = flat(jax.jit(jax.grad(probe_loss))(
        jax.device_put(ev["params"], NamedSharding(mesh, P())),
        jax.device_put(ev["batch_stats"], NamedSharding(mesh, P())),
        jax.device_put(video, batch_sharding(mesh)),
        jax.device_put(probe, batch_sharding(mesh)),
    ))
    rel_dp = np.linalg.norm(g_dp - g_truth) / np.linalg.norm(g_truth)
    assert rel_dp < max(2.0 * rel_sd, 1e-3), (rel_dp, rel_sd)
    assert rel_dp < 3e-2, rel_dp  # absolute backstop vs f64 truth


def test_bf16_train_step(setup):
    import dataclasses

    model, variables, batch = setup
    variables = _fresh(variables)
    cfg16 = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=True))
    tx = make_optimizer(cfg16, variables["params"])
    state = create_train_state(cfg16, variables)
    step_fn = make_train_step(cfg16, model, tx)
    state, metrics = step_fn(state, batch, jnp.float32(0.5), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
    # master params remain f32 after the bf16 step
    leaf = jax.tree.leaves(state.params["decoder"])[0]
    assert leaf.dtype == jnp.float32
    # bf16 stats restored to f32
    sleaf = jax.tree.leaves(state.batch_stats)[0]
    assert sleaf.dtype == jnp.float32


def test_bf16_forward_close_to_f32(setup):
    from lip2speech_tpu.train.train_step import cast_floats

    model, variables, batch = setup
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }

    def fwd(v, b):
        return model.apply(
            v, b["video"], None, b["mel"], 1.0, b["speaker_embedding"], rngs,
            train=False,
        )["mel_postnet"]

    ref = np.asarray(fwd(variables, batch))
    v16 = cast_floats(dict(variables), jnp.bfloat16)
    b16 = cast_floats(dict(batch), jnp.bfloat16)
    got = np.asarray(fwd(v16, b16)).astype(np.float32)
    # bf16 has ~3 decimal digits; AR error compounds over steps, so compare
    # correlation rather than absolute closeness
    c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert c > 0.98, c


@pytest.mark.slow
def test_masked_loss_knob(setup):
    """train.masked_loss=True restricts mel/postnet MSE to valid frames
    (VERDICT r1 item 7): with padded frames the two configs must differ,
    and with an all-valid mask the masked loss must equal the parity
    (unmasked) loss exactly."""
    model, variables, batch = setup
    batch = dict(batch)
    b, m = batch["gate"].shape
    # mark the last 4 mel frames padding; poison them so masking matters
    mask = jnp.ones((b, m), bool).at[:, -4:].set(False)
    batch["mel"] = batch["mel"].at[:, :, -4:].set(-11.5129)
    batch["mel_mask"] = mask

    def run(masked, batch):
        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, bf16=False, masked_loss=masked)
        )
        fresh = _fresh(variables)
        tx = make_optimizer(cfg, fresh["params"])
        state = create_train_state(cfg, fresh)
        step = make_train_step(cfg, model, tx)
        _, metrics = step(
            state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(0)
        )
        return metrics

    unmasked = run(False, batch)
    masked = run(True, batch)
    assert not np.allclose(
        float(masked["mel_loss"]), float(unmasked["mel_loss"]), rtol=1e-4
    )

    batch_all_valid = dict(batch, mel_mask=jnp.ones((b, m), bool))
    m_all = run(True, batch_all_valid)
    u_all = run(False, batch_all_valid)
    np.testing.assert_allclose(
        float(m_all["mel_loss"]), float(u_all["mel_loss"]), rtol=1e-5
    )


def test_kld_weight_knob(setup):
    """train.kld_weight scales only the KLD contribution to the total;
    the logged KLD stays unweighted, and 1.0 is reference parity
    (train_utils/losses.py:72-79 sums the terms unweighted)."""
    model, variables, batch = setup

    def run(w):
        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, bf16=False, kld_weight=w)
        )
        fresh = _fresh(variables)
        tx = make_optimizer(cfg, fresh["params"])
        state = create_train_state(cfg, fresh)
        step = make_train_step(cfg, model, tx)
        _, metrics = step(
            state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(0)
        )
        return metrics

    m1 = run(1.0)
    m10 = run(10.0)
    # the logged KLD is identical (same params, same rng stream)
    np.testing.assert_allclose(float(m1["KLD"]), float(m10["KLD"]), rtol=1e-5)
    # and the totals differ by exactly (10-1) x KLD
    np.testing.assert_allclose(
        float(m10["total"]) - float(m1["total"]),
        9.0 * float(m1["KLD"]),
        rtol=1e-4,
    )


def test_bf16_step_keeps_f32_batch_stats(setup):
    """Regression: with bf16 on, updated batch_stats must come back f32 —
    the old cast_floats(..., float32) silently no-op'd on bf16 leaves, so
    running stats degraded to bf16 after the first step (and a lowered
    train step rejected its own output state on the next call)."""
    model, variables, batch = setup
    cfg = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=True))
    fresh = _fresh(variables)
    tx = make_optimizer(cfg, fresh["params"])
    state = create_train_state(cfg, fresh)
    step = make_train_step(cfg, model, tx)
    new_state, _ = step(state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(0))
    dtypes = {
        str(x.dtype) for x in jax.tree.leaves(new_state.batch_stats)
    }
    assert dtypes <= {"float32"}, dtypes
    # and the same compiled step must accept its own output
    new_state2, metrics = step(
        new_state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["total"]))


def test_nonfinite_grads_skip_update(setup):
    """A batch that produces NaN gradients must leave the params untouched
    (apex overflow-skip parity, reference train.py:188-196) and a
    following clean batch must still apply — observed failure mode: one
    NaN grad poisons clip_by_global_norm and corrupts params permanently."""
    model, variables, batch = setup
    cfg = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=False))
    fresh = _fresh(variables)
    tx = make_optimizer(cfg, fresh["params"])
    state = create_train_state(cfg, fresh)
    step = make_train_step(cfg, model, tx)

    bad = dict(batch)
    bad["mel"] = batch["mel"].at[0, 0, 0].set(jnp.nan)
    before = np.asarray(jax.tree.leaves(state.params["decoder"])[0]).copy()
    state, metrics = step(state, bad, jnp.float32(0.5), jax.random.PRNGKey(0))
    after = np.asarray(jax.tree.leaves(state.params["decoder"])[0])
    assert not np.isfinite(float(metrics["total"]))
    np.testing.assert_array_equal(before, after)
    assert int(metrics["notfinite_count"]) == 1

    state, metrics = step(state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert int(metrics["notfinite_count"]) == 0
    moved = np.abs(np.asarray(jax.tree.leaves(state.params["decoder"])[0]) - after)
    assert moved.max() > 0


def test_nonfinite_forward_skips_batch_stats(setup):
    """A batch whose *forward pass* is nonfinite must leave the running BN
    stats untouched: apply_if_finite guards params only, and the stats were
    written back unconditionally — one bad batch poisoned them permanently
    while every subsequent param update was rejected (observed on hardware:
    runs/overfit_r4c went irrecoverably NaN with notfinite_count climbing)."""
    model, variables, batch = setup
    cfg = dataclasses.replace(CFG, train=dataclasses.replace(CFG.train, bf16=False))
    fresh = _fresh(variables)
    tx = make_optimizer(cfg, fresh["params"])
    state = create_train_state(cfg, fresh)
    step = make_train_step(cfg, model, tx)

    bad = dict(batch)
    # NaN video poisons the encoder's BatchNorm batch means/vars directly
    bad["video"] = batch["video"].at[0, 0, 0, 0, 0].set(jnp.nan)
    stats_before = jax.tree.map(np.asarray, state.batch_stats)
    state, metrics = step(state, bad, jnp.float32(0.5), jax.random.PRNGKey(0))
    assert not np.isfinite(float(metrics["total"]))
    for old, new in zip(
        jax.tree.leaves(stats_before), jax.tree.leaves(state.batch_stats)
    ):
        np.testing.assert_array_equal(old, np.asarray(new))

    # a clean batch afterwards must both update params and advance stats
    state, metrics = step(state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree.leaves(state.batch_stats)
    )
    changed = any(
        np.abs(np.asarray(new) - old).max() > 0
        for old, new in zip(
            jax.tree.leaves(stats_before), jax.tree.leaves(state.batch_stats)
        )
    )
    assert changed


def test_reject_grad_norm_above_optimizer_level():
    """A huge-but-finite gradient is skipped exactly like a nonfinite one
    when train.reject_grad_norm_above is set (observed on hardware,
    runs/overfit_r4d/e: finite norm spikes of 1e5..5e8 pass apply_if_finite,
    get clipped to norm 1.0 and applied — and a handful of those
    garbage-direction steps collapses the content branch irrecoverably)."""
    cfg = dataclasses.replace(
        CFG, train=dataclasses.replace(CFG.train, reject_grad_norm_above=10.0)
    )
    params = {"encoder": {"w": jnp.zeros((4,))}}
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    from lip2speech_tpu.train.train_step import _find_notfinite_count

    huge = {"encoder": {"w": jnp.full((4,), 1e6)}}  # norm 2e6 > 10, finite
    updates, opt_state = tx.update(huge, opt_state, params)
    assert all(np.all(np.asarray(u) == 0) for u in jax.tree.leaves(updates))
    assert int(_find_notfinite_count(opt_state)) == 1

    ok = {"encoder": {"w": jnp.ones((4,))}}  # norm 2 <= 10
    updates, opt_state = tx.update(ok, opt_state, params)
    assert int(_find_notfinite_count(opt_state)) == 0
    assert max(np.abs(np.asarray(u)).max() for u in jax.tree.leaves(updates)) > 0


def test_reject_grad_norm_above_full_step(setup):
    """End-to-end: a batch engineered to produce finite-but-huge gradients
    must leave params AND batch_stats untouched, and a normal batch
    afterwards must train."""
    model, variables, batch = setup
    cfg = dataclasses.replace(
        CFG,
        train=dataclasses.replace(
            CFG.train, bf16=False, reject_grad_norm_above=1e4
        ),
    )
    fresh = _fresh(variables)
    tx = make_optimizer(cfg, fresh["params"])
    state = create_train_state(cfg, fresh)
    step = make_train_step(cfg, model, tx)

    bad = dict(batch)
    bad["mel"] = batch["mel"] * 1e4  # MSE grads blow up but stay finite
    before = jax.tree.map(np.asarray, state.params["decoder"])
    stats_before = jax.tree.map(np.asarray, state.batch_stats)
    state, metrics = step(state, bad, jnp.float32(0.5), jax.random.PRNGKey(0))
    gn = float(metrics["grad_norm"])
    assert np.isfinite(gn) and gn > 1e4, gn  # exercising the norm path
    assert int(metrics["notfinite_count"]) == 1
    for old, new in zip(
        jax.tree.leaves(before), jax.tree.leaves(state.params["decoder"])
    ):
        np.testing.assert_array_equal(old, np.asarray(new))
    for old, new in zip(
        jax.tree.leaves(stats_before), jax.tree.leaves(state.batch_stats)
    ):
        np.testing.assert_array_equal(old, np.asarray(new))

    state, metrics = step(state, dict(batch), jnp.float32(0.5), jax.random.PRNGKey(1))
    assert int(metrics["notfinite_count"]) == 0
    moved = max(
        np.abs(np.asarray(new) - old).max()
        for old, new in zip(
            jax.tree.leaves(before), jax.tree.leaves(state.params["decoder"])
        )
    )
    assert moved > 0


def test_skip_never_gives_up_past_consecutive_limit():
    """Regression (round-4 advisor, medium): optax.apply_if_finite APPLIES
    the update after max_consecutive_errors consecutive non-finite steps —
    an accepted all-NaN update permanently NaNs params and Adam moments.
    The replacement wrapper (skip_if_not_finite) must keep skipping forever:
    params and moments stay at last-good through an arbitrarily long stall,
    and a finite step afterwards still trains."""
    cfg = dataclasses.replace(
        CFG,
        train=dataclasses.replace(
            CFG.train, max_consecutive_nonfinite=5, reject_grad_norm_above=10.0
        ),
    )
    params = {"encoder": {"w": jnp.ones((4,))}}
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    from lip2speech_tpu.train.train_step import _find_notfinite_count

    nan_grads = {"encoder": {"w": jnp.full((4,), jnp.nan)}}
    huge = {"encoder": {"w": jnp.full((4,), 1e7)}}  # finite, norm > 10
    jitted = jax.jit(tx.update)
    for i in range(12):  # far past max_consecutive_nonfinite=5
        bad = nan_grads if i % 2 == 0 else huge
        updates, opt_state = jitted(bad, opt_state, params)
        assert all(
            np.all(np.asarray(u) == 0) for u in jax.tree.leaves(updates)
        ), f"step {i}: non-finite update leaked through"
        assert int(_find_notfinite_count(opt_state)) == i + 1
    # every opt-state leaf is still finite (Adam moments at last-good)
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree.leaves(opt_state)
        if np.issubdtype(np.asarray(leaf).dtype, np.floating)
    )
    ok = {"encoder": {"w": jnp.ones((4,))}}
    updates, opt_state = jitted(ok, opt_state, params)
    assert int(_find_notfinite_count(opt_state)) == 0
    upd = np.asarray(updates["encoder"]["w"])
    assert np.isfinite(upd).all() and np.abs(upd).max() > 0

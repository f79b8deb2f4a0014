"""Checkpoint converter tests: the torch<->flax map must be complete
(every param leaf covered) and exactly invertible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models import Lip2Speech
from lip2speech_tpu.train import checkpoint as ckpt

CFG = ModelConfig()


@pytest.fixture(scope="module")
def variables():
    model = Lip2Speech(CFG)
    video = jnp.zeros((1, 3, 96, 96, 3))
    faces = jnp.zeros((1, 2, 160, 160, 3))
    mels = jnp.zeros((1, 80, 8))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    return Lip2Speech(CFG).init(
        {"params": jax.random.PRNGKey(0)},
        video, faces, mels, 0.5, None, rngs, train=False,
    )


def _paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _paths(v, prefix + (k,))
        else:
            out.append(prefix + (k,))
    return out


def test_mapping_is_complete(variables):
    entries = ckpt.build_entries(CFG)
    mapped = {ckpt._normalize_fpath(p)[1:] for _, p, _ in entries}
    actual_params = set(map(tuple, _paths(jax.tree.map(np.asarray, dict(variables["params"])))))
    actual_stats = set(map(tuple, _paths(jax.tree.map(np.asarray, dict(variables["batch_stats"])))))

    unmapped_params = {p for p in actual_params if p not in mapped}
    unmapped_stats = {p for p in actual_stats if p not in mapped}
    assert not unmapped_params, sorted(unmapped_params)[:10]
    assert not unmapped_stats, sorted(unmapped_stats)[:10]

    ghost = {p for p in mapped if p not in actual_params and p not in actual_stats}
    assert not ghost, sorted(ghost)[:10]


def test_roundtrip_exact(variables):
    sd = ckpt.flax_to_torch(variables, CFG)
    # every torch tensor must have torch-conventional leading dims
    assert sd["decoder.fc_out.linear_layer.weight"].shape == (80, 512)
    assert sd["encoder.frontend3D.0.weight"].shape == (24, 3, 5, 7, 7)
    assert sd["decoder.BOS"].shape == (1, 1, 80)

    back = ckpt.torch_to_flax(sd, CFG)
    for path in _paths(back["params"]):
        a = np.asarray(ckpt._get(back["params"], path))
        b = np.asarray(ckpt._get(variables["params"], path))
        np.testing.assert_array_equal(a, b, err_msg=str(path))
    for path in _paths(back["batch_stats"]):
        a = np.asarray(ckpt._get(back["batch_stats"], path))
        b = np.asarray(ckpt._get(variables["batch_stats"], path))
        np.testing.assert_array_equal(a, b, err_msg=str(path))


def test_speaker_split():
    fake = {
        "speaker_encoder.lstm.weight_ih_l0": np.zeros((1024, 40)),
        "decoder.temperature": np.ones((1,)),
    }
    speaker = {k[len("speaker_encoder."):]: v for k, v in fake.items()
               if k.startswith("speaker_encoder.")}
    assert "lstm.weight_ih_l0" in speaker


def test_restore_across_nonfinite_schema(tmp_path):
    """ADVICE r2: train.skip_nonfinite_updates wraps opt_state in optax
    ApplyIfFiniteState, changing the checkpoint pytree. Restore must
    bridge both directions (old checkpoints after the default flip, and
    toggled runs), re-initializing only the wrapper counters."""
    import dataclasses

    import optax

    from lip2speech_tpu.config import Config
    from lip2speech_tpu.train.train_step import TrainState, make_optimizer

    params = {
        "encoder": {"w": np.arange(3, dtype=np.float32)},
        "decoder": {"w": np.full((2,), 2.0, np.float32)},
    }
    stats = {"bn": {"mean": np.zeros((1,), np.float32)}}
    base = Config()

    def make_state(skip: bool):
        cfg = dataclasses.replace(
            base,
            train=dataclasses.replace(base.train, skip_nonfinite_updates=skip),
        )
        tx = make_optimizer(cfg, params)
        return TrainState(
            step=jnp.asarray(5, jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=tx.init(params),
        )

    # saved WITHOUT the wrapper, restored into a wrapped template
    d1 = str(tmp_path / "off_to_on")
    ckpt.save_checkpoint(d1, 5, make_state(False), extra={"best_score": np.asarray(0.25)})
    from lip2speech_tpu.train.train_step import SkipIfNotFiniteState

    state, extra = ckpt.restore_checkpoint(d1, template=make_state(True))
    assert isinstance(state["opt_state"], SkipIfNotFiniteState)
    np.testing.assert_array_equal(state["params"]["encoder"]["w"], params["encoder"]["w"])
    assert float(extra["best_score"]) == 0.25
    assert int(state["opt_state"].notfinite_count) == 0

    # saved WITH the wrapper, restored into an unwrapped template
    d2 = str(tmp_path / "on_to_off")
    ckpt.save_checkpoint(d2, 5, make_state(True), extra={"best_score": np.asarray(0.5)})
    state, extra = ckpt.restore_checkpoint(d2, template=make_state(False))
    assert not isinstance(
        state["opt_state"], (SkipIfNotFiniteState, optax.ApplyIfFiniteState)
    )
    np.testing.assert_array_equal(state["params"]["decoder"]["w"], params["decoder"]["w"])

    # same-schema restore still exact
    state, _ = ckpt.restore_checkpoint(d2, template=make_state(True))
    assert isinstance(state["opt_state"], SkipIfNotFiniteState)
    assert int(state["step"]) == 5


def test_restore_ignores_interrupted_orbax_tmp_dirs(tmp_path):
    """A save killed mid-write leaves 'step_N.orbax-checkpoint-tmp-<ts>'
    behind; resume must skip it and restore the newest finalized step
    instead of crashing on the int() parse."""
    import os

    from typing import NamedTuple

    class S(NamedTuple):
        params: dict

    d = str(tmp_path / "ckpts")
    payload = S(params={"w": np.arange(4, dtype=np.float32)})
    ckpt.save_checkpoint(d, 7, payload, extra={"best_score": np.asarray(0.1)})
    # simulate an interrupted later save (orbax atomicity temp suffix)
    os.makedirs(os.path.join(d, "step_9.orbax-checkpoint-tmp-1712345678"))
    restored = ckpt.restore_checkpoint(d, template=None)
    assert restored is not None
    state, _ = restored
    np.testing.assert_array_equal(
        np.asarray(state["params"]["w"]), payload.params["w"]
    )


def test_load_model_rejects_bogus_path(tmp_path):
    """A typo'd --model_path must raise, not silently run on random init."""
    import pytest

    from lip2speech_tpu.cli.common import load_model
    from lip2speech_tpu.config import Config

    with pytest.raises(FileNotFoundError, match="neither"):
        load_model(Config(), str(tmp_path / "defualt"), batch_size=1)


def test_restore_legacy_apply_if_finite_checkpoint(tmp_path):
    """A checkpoint written before round 5 (optax ApplyIfFiniteState
    wrapper) restores into the new SkipIfNotFiniteState template with
    inner moments preserved and counters re-initialized."""
    import dataclasses

    import optax

    from lip2speech_tpu.config import Config
    from lip2speech_tpu.train.train_step import (
        SkipIfNotFiniteState,
        TrainState,
        make_optimizer,
    )

    params = {"encoder": {"w": np.arange(3, dtype=np.float32)}}
    stats = {"bn": {"mean": np.zeros((1,), np.float32)}}
    cfg = Config()
    tx_new = make_optimizer(cfg, params)  # skip_nonfinite on by default

    # fabricate the pre-round-5 schema: same inner chain, legacy wrapper
    inner_state = tx_new.init(params).inner_state
    legacy_opt = optax.ApplyIfFiniteState(
        notfinite_count=np.asarray(3, np.int32),
        last_finite=np.asarray(True),
        total_notfinite=np.asarray(7, np.int32),
        inner_state=inner_state,
    )
    legacy_state = TrainState(
        step=jnp.asarray(9, jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=legacy_opt,
    )
    d = str(tmp_path / "legacy")
    ckpt.save_checkpoint(d, 9, legacy_state, extra={"best_score": np.asarray(0.1)})

    template = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx_new.init(params),
    )
    state, extra = ckpt.restore_checkpoint(d, template=template)
    assert isinstance(state["opt_state"], SkipIfNotFiniteState)
    assert int(state["opt_state"].notfinite_count) == 0  # re-initialized
    assert int(state["step"]) == 9
    assert float(extra["best_score"]) == 0.1


def test_restore_missing_explicit_step_raises(tmp_path):
    """restore_checkpoint(step=N) with N absent raises a descriptive
    FileNotFoundError instead of returning None (round-4 advisor: the
    rewind path unpacked None into an opaque TypeError)."""
    import dataclasses

    import pytest as _pytest

    from lip2speech_tpu.config import Config
    from lip2speech_tpu.train.train_step import TrainState, make_optimizer

    params = {"encoder": {"w": np.arange(3, dtype=np.float32)}}
    cfg = Config()
    tx = make_optimizer(cfg, params)
    state = TrainState(
        step=jnp.asarray(2, jnp.int32),
        params=params,
        batch_stats={},
        opt_state=tx.init(params),
    )
    d = str(tmp_path / "ring")
    ckpt.save_checkpoint(d, 2, state, extra={"best_score": np.asarray(0.0)})
    with _pytest.raises(FileNotFoundError, match="available steps"):
        ckpt.restore_checkpoint(d, template=state, step=999)

"""Shared CLI plumbing: arg parsing (mirrors /root/reference/arg_parser.py),
model/variable initialization, checkpoint resolution."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from lip2speech_tpu.config import Config
from lip2speech_tpu.models import Lip2Speech
from lip2speech_tpu.utils.compile_cache import enable_compilation_cache

DATASETS = ("LRW", "GRID", "AVSpeech", "WILD")

# every CLI pays full-program compile costs otherwise (see compile_cache)
enable_compilation_cache()


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="LRW", choices=DATASETS)
    p.add_argument(
        "--root",
        default="/root/reference/Datasets/SAMPLE_LRW",
        help="corpus root (defaults to the bundled SAMPLE_LRW fixture)",
    )
    p.add_argument("--model_path", default=None,
                   help="orbax checkpoint dir or reference .pth")
    p.add_argument(
        "--override", action="append", default=[],
        help="config override key=value (e.g. model.gumbel_tau=0.5); a "
        "checkpoint trained with non-default knobs must be evaluated "
        "with the same ones — pass the MANIFEST's overrides here",
    )
    return p


def common_config(args) -> Config:
    """Config for a CLI invocation, honouring ``--override``."""
    from lip2speech_tpu.config import config_with_overrides

    if getattr(args, "override", None):
        return config_with_overrides(*args.override)
    return Config()


def init_variables(model: Lip2Speech, cfg: Config, batch_size: int = 1):
    """Initialize full-model variables at the configured static shapes.

    The init MUST run under jit: eagerly it executes hundreds of small
    ops one by one, each paying per-op compile + dispatch — through the
    axon tunnel (~30 ms RTT/op) that measured 20+ minutes of CLI startup.
    One jitted program compiles once (persistently cached) and runs in
    seconds everywhere.
    """
    import functools

    d = cfg.data
    video = jnp.zeros((batch_size, 3, *d.mouth_size, 3))
    faces = jnp.zeros((batch_size, d.n_face_crops, *d.face_size, 3))
    mels = jnp.zeros((batch_size, cfg.model.n_mels, 8))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    init_fn = jax.jit(functools.partial(model.init, train=False))
    return init_fn(
        {"params": jax.random.PRNGKey(cfg.train.seed)},
        video, faces, mels, 0.5, None, rngs,
    )


def load_model(cfg: Config, model_path: str | None, batch_size: int = 1):
    """Build the model and load weights from an Orbax dir, a reference
    .pth (converted on the fly), or random init when no path is given."""
    from lip2speech_tpu.train import checkpoint as ckpt

    model = Lip2Speech(cfg.model)
    variables = init_variables(model, cfg, batch_size)
    speaker_sd = None
    if model_path and model_path.endswith(".pth"):
        converted, speaker_sd = ckpt.load_reference_pth(model_path, cfg.model)
        variables = _merge(dict(variables), converted)
        print(f"loaded reference checkpoint {model_path}")
    elif model_path and os.path.isdir(model_path):
        restored = ckpt.restore_checkpoint(model_path, None)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {model_path}")
        state, _ = restored
        variables = {
            "params": state["params"],
            "batch_stats": state["batch_stats"],
        }
        print(f"restored orbax checkpoint from {model_path}")
    elif model_path:
        # a given-but-unusable path (typo'd dir, wrong extension) must not
        # silently fall through to random init — that would evaluate or
        # fine-tune garbage weights with no indication why
        raise FileNotFoundError(
            f"model_path {model_path!r} is neither a .pth file nor an "
            "existing orbax checkpoint directory"
        )
    return model, variables, speaker_sd


def _merge(base: dict, overlay: dict) -> dict:
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            base[k] = _merge(dict(base[k]), v)
        else:
            base[k] = v
    return base

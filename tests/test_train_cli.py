"""End-to-end train CLI smoke on synthetic fixtures (tiny model, CPU):
runs real steps, evaluates, saves an orbax checkpoint, and resumes."""

import os

import pytest

from lip2speech_tpu.config import Config, ModelConfig
from lip2speech_tpu.data import make_sample_lrw

TINY_MODEL = ModelConfig(
    ffn_hidden_dim=128,
    content_vocab_size=33,
    content_latent_dim=64,
    max_decoder_steps=24,
    postnet_embedding_dim=64,
    shufflenet_width=0.5,
)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lrw_train"))
    make_sample_lrw(root, split="train", n_clips=4)
    make_sample_lrw(root, split="test", n_clips=2)
    return root


def test_train_cli_end_to_end(roots, tmp_path):
    from lip2speech_tpu.cli import train as train_cli

    ckpt_dir = str(tmp_path / "ckpt")
    run_dir = str(tmp_path / "run")
    args = train_cli.parse_args(
        [
            "--root", roots,
            "--batch_size", "2",
            "--max_iters", "2",
            "--eval_interval", "2",
            "--log_interval", "1",
            "--run_dir", run_dir,
            "--ckpt_dir", ckpt_dir,
            "--eval_batches", "1",
        ]
    )
    cfg = Config(model=TINY_MODEL)
    result = train_cli.train(args, cfg)
    assert result["final_step"] == 2
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert any(d.startswith("step_") for d in os.listdir(ckpt_dir))

    # resume: second run starts from the saved step
    args2 = train_cli.parse_args(
        [
            "--root", roots,
            "--batch_size", "2",
            "--max_iters", "3",
            "--eval_interval", "100",
            "--log_interval", "1",
            "--run_dir", run_dir,
            "--ckpt_dir", ckpt_dir,
        ]
    )
    result2 = train_cli.train(args2, cfg)
    assert result2["final_step"] == 3

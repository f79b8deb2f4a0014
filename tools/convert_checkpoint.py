#!/usr/bin/env python
"""Checkpoint conversion CLI.

  # reference torch .pth -> flax msgpack (+ split speaker_encoder weights)
  python tools/convert_checkpoint.py to-flax lip2speech_final.pth out.msgpack

  # flax variables (msgpack) -> torch-layout state dict (.npz)
  python tools/convert_checkpoint.py to-torch vars.msgpack out.npz

The mapping is complete and exactly invertible (tests/test_checkpoint.py).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=("to-flax", "to-torch"))
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()

    import flax.serialization as ser

    from lip2speech_tpu.config import ModelConfig
    from lip2speech_tpu.train import checkpoint as ckpt

    cfg = ModelConfig()
    if args.mode == "to-flax":
        variables, speaker = ckpt.load_reference_pth(args.src, cfg)
        with open(args.dst, "wb") as f:
            f.write(ser.to_bytes(variables))
        if speaker:
            np.savez(args.dst + ".speaker.npz", **speaker)
            print(f"split {len(speaker)} speaker_encoder tensors")
        print(f"wrote {args.dst}")
    else:
        from lip2speech_tpu.cli.common import init_variables
        from lip2speech_tpu.config import Config
        from lip2speech_tpu.models import Lip2Speech

        template = init_variables(Lip2Speech(cfg), Config(), 1)
        template = {
            "params": dict(template["params"]),
            "batch_stats": dict(template["batch_stats"]),
        }
        with open(args.src, "rb") as f:
            variables = ser.from_bytes(template, f.read())
        sd = ckpt.flax_to_torch(variables, cfg)
        np.savez(args.dst, **sd)
        print(f"wrote {args.dst} with {len(sd)} tensors")


if __name__ == "__main__":
    main()

"""One-time conversion of the reference detector model graphs into
repo-local .npz artifacts (VERDICT r1 item 9).

Reads version-RFB-320.onnx and mobilefacenet.xml/.bin from the reference
checkout (or --model_dir), writes lip2speech_tpu/detect/weights/*.npz, and
verifies the round-trip produces identical runner outputs on a random
input before declaring success.

Run: python tools/convert_detector_weights.py
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from lip2speech_tpu.detect import artifacts
from lip2speech_tpu.detect.onnx_jax import run_graph
from lip2speech_tpu.detect.onnx_reader import load_onnx
from lip2speech_tpu.detect.openvino_jax import load_ir, run_ir

REF_DIR = "/root/reference/datasets/wild/fast_detector/models"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", default=REF_DIR)
    args = ap.parse_args()

    rng = np.random.RandomState(0)

    # RFB-320 ONNX
    graph = load_onnx(os.path.join(args.model_dir, "version-RFB-320.onnx"))
    artifacts.save_onnx_npz(graph, artifacts.RFB320_NPZ)
    graph2 = artifacts.load_onnx_npz(artifacts.RFB320_NPZ)
    x = rng.randn(1, 3, 240, 320).astype(np.float32)
    want = run_graph(graph, {graph.inputs[0]: x})
    got = run_graph(graph2, {graph2.inputs[0]: x})
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(got[k]))
    print(
        f"rfb320.npz OK ({os.path.getsize(artifacts.RFB320_NPZ) / 1e6:.2f} MB, "
        f"{len(graph.nodes)} nodes)"
    )

    # mobilefacenet IR
    layers, consts = load_ir(
        os.path.join(args.model_dir, "mobilefacenet.xml"),
        os.path.join(args.model_dir, "mobilefacenet.bin"),
    )
    artifacts.save_ir_npz(layers, consts, artifacts.MOBILEFACENET_NPZ)
    layers2, consts2 = artifacts.load_ir_npz(artifacts.MOBILEFACENET_NPZ)
    name = next(l.name for l in layers.values() if l.type == "Parameter")
    x = rng.randn(1, 3, 112, 112).astype(np.float32)
    want = np.asarray(run_ir(layers, consts, {name: x}))
    got = np.asarray(run_ir(layers2, consts2, {name: x}))
    np.testing.assert_array_equal(want, got)
    print(
        f"mobilefacenet.npz OK "
        f"({os.path.getsize(artifacts.MOBILEFACENET_NPZ) / 1e6:.2f} MB, "
        f"{len(layers)} layers)"
    )


if __name__ == "__main__":
    main()

"""Execute an OpenVINO IR (v10 xml+bin) natively in JAX.

Replaces the OpenVINO IECore CPU plugin the reference uses for its 68-pt
landmark regressor (``fast_detector/__init__.py:39-44,217-222``,
mobilefacenet.xml/.bin) with a direct JAX evaluation of the same graph:
parse the IR XML, mmap constants out of the .bin (fp16), execute the op
set {Convolution, GroupConvolution, Add, Multiply, PReLU, MatMul,
Reshape, Squeeze, Unsqueeze}.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DTYPES = {"f16": np.float16, "f32": np.float32, "i64": np.int64, "i32": np.int32}


@dataclass
class IRLayer:
    id: str
    name: str
    type: str
    data: dict
    inputs: list  # list of (layer_id, port_id) in port order
    out_ports: list


def load_ir(xml_path: str, bin_path: str):
    tree = ET.parse(xml_path)
    root = tree.getroot()
    blob = np.fromfile(bin_path, np.uint8)

    layers: dict[str, IRLayer] = {}
    for layer in root.find("layers"):
        data = dict(layer.find("data").attrib) if layer.find("data") is not None else {}
        out_ports = []
        out = layer.find("output")
        if out is not None:
            for port in out:
                out_ports.append(port.attrib["id"])
        layers[layer.attrib["id"]] = IRLayer(
            layer.attrib["id"], layer.attrib.get("name", ""),
            layer.attrib["type"], data, [], out_ports,
        )

    # edges: from-layer/from-port -> to-layer/to-port
    edges: dict[tuple[str, str], tuple[str, str]] = {}
    for edge in root.find("edges"):
        a = edge.attrib
        edges[(a["to-layer"], a["to-port"])] = (a["from-layer"], a["from-port"])

    for layer in root.find("layers"):
        lid = layer.attrib["id"]
        inp = layer.find("input")
        if inp is None:
            continue
        for port in inp:
            pid = port.attrib["id"]
            layers[lid].inputs.append(edges[(lid, pid)])

    consts: dict[str, np.ndarray] = {}
    for l in layers.values():
        if l.type == "Const":
            off = int(l.data["offset"])
            size = int(l.data["size"])
            dt = DTYPES[l.data["element_type"]]
            shape = [int(s) for s in l.data["shape"].split(",")] if l.data["shape"] else []
            arr = blob[off : off + size].view(dt).reshape(shape)
            consts[l.id] = arr.astype(np.float32) if dt == np.float16 else arr
    return layers, consts


def _conv(data, x, w, groups=1):
    strides = [int(s) for s in data["strides"].split(",")]
    pb = [int(s) for s in data["pads_begin"].split(",")]
    pe = [int(s) for s in data["pads_end"].split(",")]
    dil = [int(s) for s in data.get("dilations", "1,1").split(",")]
    if groups == -1:  # GroupConvolution: weights (G, O/G, I/G, kh, kw)
        g, o, i, kh, kw = w.shape
        w = w.reshape(g * o, i, kh, kw)
        groups = g
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), strides, [(pb[0], pe[0]), (pb[1], pe[1])],
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def run_ir(layers: dict, consts: dict, feeds: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Execute; ``feeds`` maps Parameter layer names to arrays. Returns the
    Result input tensor."""
    env: dict[str, object] = {}

    def get(src):
        lid, _ = src
        return env[lid]

    result = None
    for l in layers.values():
        t = l.type
        if t == "Const":
            env[l.id] = consts[l.id]
        elif t == "Parameter":
            env[l.id] = jnp.asarray(feeds[l.name], jnp.float32)
        elif t == "Convolution":
            env[l.id] = _conv(l.data, get(l.inputs[0]), get(l.inputs[1]), 1)
        elif t == "GroupConvolution":
            env[l.id] = _conv(l.data, get(l.inputs[0]), get(l.inputs[1]), -1)
        elif t == "Add":
            env[l.id] = jnp.asarray(get(l.inputs[0])) + jnp.asarray(get(l.inputs[1]))
        elif t == "Multiply":
            env[l.id] = jnp.asarray(get(l.inputs[0])) * jnp.asarray(get(l.inputs[1]))
        elif t == "PReLU":
            x = jnp.asarray(get(l.inputs[0]))
            a = np.asarray(get(l.inputs[1])).reshape(1, -1, 1, 1) if x.ndim == 4 else np.asarray(get(l.inputs[1]))
            env[l.id] = jnp.maximum(x, 0) + a * jnp.minimum(x, 0)
        elif t == "MatMul":
            a = jnp.asarray(get(l.inputs[0]))
            b = jnp.asarray(get(l.inputs[1]))
            if l.data.get("transpose_b") in ("true", "True", "1"):
                b = b.T
            env[l.id] = a @ b
        elif t in ("Reshape", "Squeeze", "Unsqueeze"):
            x = get(l.inputs[0])
            tgt = np.asarray(get(l.inputs[1]), np.int64).reshape(-1).tolist()
            if t == "Reshape":
                env[l.id] = jnp.reshape(x, [int(v) for v in tgt])
            elif t == "Squeeze":
                env[l.id] = jnp.squeeze(x, tuple(int(v) for v in tgt))
            else:
                out = x
                for ax in sorted(int(v) for v in tgt):
                    out = jnp.expand_dims(out, ax)
                env[l.id] = out
        elif t == "Result":
            result = get(l.inputs[0])
        else:  # pragma: no cover
            raise NotImplementedError(f"IR op {t}")
    return result


def make_ir_runner(xml_path: str, bin_path: str):
    layers, consts = load_ir(xml_path, bin_path)
    input_name = next(l.name for l in layers.values() if l.type == "Parameter")

    def run(x):
        return run_ir(layers, consts, {input_name: x})

    return jax.jit(run), input_name

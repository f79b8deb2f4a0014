"""Execute a (small) ONNX graph natively in JAX.

This replaces the ONNX Runtime C++ engine the reference uses for its
RFB-320 face detector (``fast_detector/__init__.py:48,75``) with a direct
JAX evaluation of the same graph + weights: jittable, batchable, and
TPU-compilable. Supports the op set used by version-RFB-320.onnx (Conv,
BatchNormalization, Relu, element-wise, Softmax, Reshape/Transpose/Slice/
Concat and the shape-arithmetic ops).

Shape arithmetic (Shape -> Gather -> Unsqueeze -> Concat -> Reshape) is
evaluated *concretely* with numpy at trace time — inputs are static-shape,
so reshape targets are compile-time constants and the whole graph stays
jit-safe.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.detect.onnx_reader import OnnxGraph, OnnxNode


def _is_concrete(*xs) -> bool:
    return all(isinstance(x, (np.ndarray, np.generic, int, float, list)) for x in xs)


def _conv(node: OnnxNode, x, w, b=None):
    groups = node.attrs.get("group", 1)
    strides = node.attrs.get("strides", [1, 1])
    pads = node.attrs.get("pads", [0, 0, 0, 0])
    dil = node.attrs.get("dilations", [1, 1])
    # ONNX NCHW / OIHW
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(w),
        window_strides=strides,
        padding=[(pads[0], pads[2]), (pads[1], pads[3])],
        rhs_dilation=dil,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None, None]
    return out


def _batchnorm(node: OnnxNode, x, scale, bias, mean, var):
    eps = node.attrs.get("epsilon", 1e-5)
    inv = 1.0 / np.sqrt(np.asarray(var) + eps)
    return jnp.asarray(x) * (np.asarray(scale) * inv)[None, :, None, None] + (
        np.asarray(bias) - np.asarray(mean) * np.asarray(scale) * inv
    )[None, :, None, None]


def _slice(node: OnnxNode, data, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset<10 attribute form
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes")
    starts = np.asarray(starts).tolist()
    ends = np.asarray(ends).tolist()
    axes = list(range(len(starts))) if axes is None else np.asarray(axes).tolist()
    steps = [1] * len(starts) if steps is None else np.asarray(steps).tolist()
    idx = [slice(None)] * np.ndim(data)
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        idx[ax] = slice(st, None if en > 2**31 else en, sp)
    return data[tuple(idx)]


def run_graph(graph: OnnxGraph, feeds: dict[str, jnp.ndarray]) -> dict:
    """Evaluate the graph; returns {output_name: array}."""
    env: dict[str, object] = dict(graph.initializers)
    env.update(feeds)

    for node in graph.nodes:
        i = [env[n] if n else None for n in node.inputs]
        op = node.op_type
        if op == "Conv":
            out = _conv(node, *i)
        elif op == "BatchNormalization":
            out = _batchnorm(node, *i)
        elif op == "Relu":
            out = jnp.maximum(i[0], 0) if not _is_concrete(i[0]) else np.maximum(i[0], 0)
        elif op == "Constant":
            out = node.attrs["value"]
        elif op == "Shape":
            out = np.asarray(np.shape(i[0]), np.int64)
        elif op == "Gather":
            axis = node.attrs.get("axis", 0)
            if _is_concrete(*i):
                out = np.take(i[0], np.asarray(i[1]), axis=axis)
            else:
                out = jnp.take(i[0], jnp.asarray(i[1]), axis=axis)
        elif op == "Unsqueeze":
            axes = node.attrs.get("axes") or np.asarray(i[1]).tolist()
            out = i[0]
            for ax in sorted(np.atleast_1d(axes)):
                out = np.expand_dims(out, ax) if _is_concrete(out) else jnp.expand_dims(out, ax)
        elif op == "Squeeze":
            axes = node.attrs.get("axes")
            out = np.squeeze(i[0], tuple(axes)) if _is_concrete(i[0]) else jnp.squeeze(i[0], tuple(axes))
        elif op == "Concat":
            axis = node.attrs.get("axis", 0)
            if _is_concrete(*i):
                out = np.concatenate([np.atleast_1d(x) for x in i], axis)
            else:
                out = jnp.concatenate([jnp.atleast_1d(jnp.asarray(x)) for x in i], axis)
        elif op == "Reshape":
            shape = [int(s) for s in np.asarray(i[1], dtype=np.int64).reshape(-1)]
            out = jnp.reshape(i[0], shape)
        elif op == "Transpose":
            out = jnp.transpose(i[0], node.attrs["perm"])
        elif op == "Slice":
            out = _slice(node, *i)
        elif op in ("Mul", "Add", "Sub", "Div"):
            f = {"Mul": jnp.multiply, "Add": jnp.add, "Sub": jnp.subtract, "Div": jnp.divide}[op]
            fn_np = {"Mul": np.multiply, "Add": np.add, "Sub": np.subtract, "Div": np.divide}[op]
            out = fn_np(i[0], i[1]) if _is_concrete(*i) else f(jnp.asarray(i[0]), jnp.asarray(i[1]))
        elif op == "Exp":
            out = jnp.exp(i[0])
        elif op == "Softmax":
            out = jax.nn.softmax(jnp.asarray(i[0]), axis=node.attrs.get("axis", -1))
        elif op == "MaxPool":
            k = node.attrs["kernel_shape"]
            s = node.attrs.get("strides", k)
            p = node.attrs.get("pads", [0, 0, 0, 0])
            out = jax.lax.reduce_window(
                jnp.asarray(i[0]), -jnp.inf, jax.lax.max,
                (1, 1, *k), (1, 1, *s),
                [(0, 0), (0, 0), (p[0], p[2]), (p[1], p[3])],
            )
        else:  # pragma: no cover
            raise NotImplementedError(f"ONNX op {op}")
        for name in node.outputs:
            env[name] = out

    return {o: env[o] for o in graph.outputs}


def make_runner(path: str) -> tuple[Callable, OnnxGraph]:
    """Load an .onnx file and return (jit-compiled runner, graph)."""
    from lip2speech_tpu.detect.onnx_reader import load_onnx

    graph = load_onnx(path)

    def run(x):
        return run_graph(graph, {graph.inputs[0]: x})

    return jax.jit(run), graph

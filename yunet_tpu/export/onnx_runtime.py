"""ONNX executor: run YuNet-class ONNX graphs as compiled JAX programs.

The reference ships ONNXRuntime as its deployment engine
(tools/compare_inference.py). Here the ONNX graph itself becomes a traced
JAX function: every op in the (small) supported set lowers to jax/XLA, so
a .onnx file executes as ONE compiled TPU program — effectively an
ONNX-on-TPU runtime for this model family. Also used as the oracle in the
export round-trip tests (on CPU).

Supported ops: Conv (grouped), Relu, Sigmoid, MaxPool(2x2/2),
Resize(nearest 2x), Add, Transpose, Reshape, Identity, Concat, plus the
shape-computation subgraphs torch emits for dynamic-axes exports
(Shape, Gather, Unsqueeze — reference onnx/yunet_n_dynamic.onnx). Under
jit, shapes are static per compiled program, so Shape lowers to a host
constant and the whole subgraph folds away at trace time.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .onnx_reader import OnnxGraph, read_onnx


def run_graph(g: OnnxGraph, feeds: Dict[str, jnp.ndarray]
              ) -> Dict[str, jnp.ndarray]:
    """Execute the graph; traceable under jax.jit (feeds may be tracers)."""
    env: Dict[str, jnp.ndarray] = {k: np.asarray(v)
                                   for k, v in g.initializers.items()}
    env.update(feeds)
    for node in g.nodes:
        ins = [env[i] for i in node.inputs if i != ""]
        op = node.op_type
        if op == "Conv":
            x, w = ins[0], ins[1]
            b = ins[2] if len(ins) > 2 else None
            groups = node.attrs.get("group", 1)
            strides = node.attrs.get("strides", [1, 1])
            pads = node.attrs.get("pads", [0, 0, 0, 0])
            y = jax.lax.conv_general_dilated(
                jnp.asarray(x), jnp.asarray(w, x.dtype
                                            if hasattr(x, "dtype")
                                            else jnp.float32),
                window_strides=tuple(strides),
                padding=((pads[0], pads[2]), (pads[1], pads[3])),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=groups)
            if b is not None:
                y = y + jnp.asarray(b)[None, :, None, None]
            out = y
        elif op == "Relu":
            out = jnp.maximum(ins[0], 0)
        elif op == "Sigmoid":
            out = jax.nn.sigmoid(jnp.asarray(ins[0]))
        elif op == "MaxPool":
            out = jax.lax.reduce_window(
                jnp.asarray(ins[0]), -jnp.inf, jax.lax.max,
                (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        elif op == "Resize":
            x = jnp.asarray(ins[0])
            scales = np.asarray(ins[-1])
            assert list(scales[2:]) == [2.0, 2.0], scales
            out = x.repeat(2, axis=2).repeat(2, axis=3)
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Transpose":
            out = jnp.transpose(jnp.asarray(ins[0]), node.attrs["perm"])
        elif op == "Reshape":
            shape = [int(v) for v in np.asarray(ins[1])]
            shape = [ins[0].shape[i] if v == 0 else v
                     for i, v in enumerate(shape)]
            out = jnp.reshape(jnp.asarray(ins[0]), shape)
        elif op == "Identity":
            out = ins[0]
        elif op == "Shape":
            out = np.asarray(jnp.shape(ins[0]), np.int64)
        elif op == "Gather":
            # np.generic covers the 0-d-scalar results of shape gathers —
            # they must stay host-side so Reshape targets remain static
            # under jit (a jnp op here would stage a tracer).
            axis = node.attrs.get("axis", 0)
            data, idx = ins[0], np.asarray(ins[1])
            out = (np.take(data, idx, axis=axis)
                   if isinstance(data, (np.ndarray, np.generic))
                   else jnp.take(data, jnp.asarray(idx), axis=axis))
        elif op == "Unsqueeze":
            out = ins[0]
            for ax in sorted(node.attrs["axes"]):
                out = (np.expand_dims(out, ax)
                       if isinstance(out, (np.ndarray, np.generic))
                       else jnp.expand_dims(out, ax))
        elif op == "Concat":
            axis = node.attrs.get("axis", 0)
            out = (np.concatenate(ins, axis=axis)
                   if all(isinstance(v, (np.ndarray, np.generic))
                          for v in ins)
                   else jnp.concatenate([jnp.asarray(v) for v in ins],
                                        axis=axis))
        else:
            raise NotImplementedError(f"onnx op {op}")
        env[node.outputs[0]] = out
    return {o: env[o] for o in g.outputs}


class OnnxExecutor:
    """Compiled execution of an ONNX file with a per-shape program cache."""

    def __init__(self, path: str):
        self.graph = read_onnx(path)
        self._cache: Dict[tuple, object] = {}

    @property
    def input_shape(self):
        return self.graph.input_shapes[self.graph.inputs[0]]

    def __call__(self, x: np.ndarray) -> Dict[str, np.ndarray]:
        """x: (B, 3, H, W) float32 NCHW (the ONNX contract)."""
        key = tuple(x.shape)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                lambda inp: run_graph(self.graph, {"input": inp}))
        out = self._cache[key](jnp.asarray(x, jnp.float32))
        return {k: np.asarray(v) for k, v in out.items()}

"""Tiny ONNX graph interpreter (test oracle) — executes the op subset used
by the YuNet exports with numpy/jax on CPU."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from yunet_tpu.export.onnx_reader import OnnxGraph


def run_graph(g: OnnxGraph, feeds: Dict[str, np.ndarray]
              ) -> Dict[str, np.ndarray]:
    env: Dict[str, np.ndarray] = dict(g.initializers)
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
                jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
                window_strides=tuple(strides),
                padding=((pads[0], pads[2]), (pads[1], pads[3])),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=groups)
            if b is not None:
                y = y + jnp.asarray(b)[None, :, None, None]
            out = np.asarray(y)
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0].astype(np.float64)))
            out = out.astype(np.float32)
        elif op == "MaxPool":
            x = jnp.asarray(ins[0])
            out = np.asarray(jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID"))
        elif op == "Resize":
            x = ins[0]
            scales = ins[-1]
            assert list(scales[2:]) == [2.0, 2.0], scales
            out = x.repeat(2, axis=2).repeat(2, axis=3)
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Transpose":
            out = np.transpose(ins[0], node.attrs["perm"])
        elif op == "Reshape":
            shape = [int(v) for v in ins[1]]
            shape = [ins[0].shape[i] if v == 0 else v
                     for i, v in enumerate(shape)]
            out = ins[0].reshape(shape)
        elif op == "Identity":
            out = ins[0]
        else:
            raise NotImplementedError(f"op {op}")
        env[node.outputs[0]] = out
    return {o: env[o] for o in g.outputs}

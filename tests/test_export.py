"""Export layer tests.

The strongest gates in the suite: the shipped reference ONNX files are
golden models — we parse them with our own protobuf reader, execute them
with a minimal interpreter, and require our JAX model (fed by the .pth
importer) to match them numerically. This mirrors the reference's own
export verification (yunet2onnx.py:169-210) with the roles reversed.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from yunet_tpu.config import yunet_n, yunet_s
from yunet_tpu.models import YuNet
from yunet_tpu.utils import load_pth_params
from yunet_tpu.export import export_onnx, generate_cpp, read_onnx
from yunet_tpu.export.cpp_export import fold_conv_bn

from onnx_interp import run_graph

REF_ONNX = "/root/reference/onnx"


def _flat_ref_outputs(model, params, state, img):
    """Our model's outputs in the ONNX contract: (B, HW, C) per level with
    sigmoid on cls/obj."""
    outs, _ = model.forward(params, state, jnp.asarray(img), train=False)
    res = {}
    for key, sig in (("cls", True), ("obj", True), ("bbox", False),
                     ("kps", False)):
        for lvl, stride in enumerate((8, 16, 32)):
            m = np.asarray(outs[key][lvl])
            m = m.reshape(m.shape[0], -1, m.shape[-1])
            if sig:
                m = 1.0 / (1.0 + np.exp(-m.astype(np.float64)))
            res[f"{key}_{stride}"] = m.astype(np.float32)
    return res


@pytest.mark.parametrize("variant", ["n", "s"])
def test_reference_onnx_matches_jax_model(variant, yunet_n_pth,
                                          yunet_s_pth):
    """Golden-model gate: shipped ONNX == our model + .pth importer."""
    path = os.path.join(REF_ONNX, f"yunet_{variant}_320_320.onnx")
    if not os.path.exists(path):
        pytest.skip("reference onnx unavailable")
    cfg = yunet_n() if variant == "n" else yunet_s()
    pth = yunet_n_pth if variant == "n" else yunet_s_pth
    g = read_onnx(path)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, 3, 320, 320)).astype(np.float32)
    got = run_graph(g, {"input": img})

    model = YuNet(cfg.model)
    params, state = load_pth_params(
        pth, shared_stacked_convs=cfg.model.shared_stacked_convs)
    want = _flat_ref_outputs(model, params, state,
                             np.transpose(img, (0, 2, 3, 1)))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-2, atol=2e-4,
                                   err_msg=k)


def test_our_onnx_roundtrip_matches_model(yunet_n_pth):
    """export_onnx -> read_onnx -> interpret == JAX model outputs."""
    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    blob = export_onnx(params, state, cfg.model, input_shape=(160, 160))
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(blob)
        path = f.name
    g = read_onnx(path)
    assert g.outputs == [f"{k}_{s}" for k in ("cls", "obj", "bbox", "kps")
                         for s in (8, 16, 32)]
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (1, 3, 160, 160)).astype(np.float32)
    got = run_graph(g, {"input": img})
    want = _flat_ref_outputs(model, params, state,
                             np.transpose(img, (0, 2, 3, 1)))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-3, atol=1e-4,
                                   err_msg=k)
    os.unlink(path)


def test_reference_dynamic_onnx_matches_jax(yunet_n_pth):
    """The shipped dynamic-axes export (yunet2onnx.py:95-113) executes at
    two different input shapes through OnnxExecutor (incl. the torch
    Shape/Gather/Unsqueeze/Concat reshape subgraphs) and matches the JAX
    model at each shape."""
    from yunet_tpu.export.onnx_runtime import OnnxExecutor
    path = os.path.join(REF_ONNX, "yunet_n_dynamic.onnx")
    if not os.path.exists(path):
        pytest.skip("reference onnx unavailable")
    ex = OnnxExecutor(path)
    assert any(isinstance(d, str) for d in ex.input_shape)  # symbolic dims
    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    rng = np.random.RandomState(2)
    for h, w in ((160, 160), (256, 320)):
        img = rng.randint(0, 256, (1, 3, h, w)).astype(np.float32)
        got = ex(img)
        want = _flat_ref_outputs(model, params, state,
                                 np.transpose(img, (0, 2, 3, 1)))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-2,
                                       atol=2e-4, err_msg=f"{k}@{h}x{w}")


def test_our_dynamic_onnx_roundtrip_two_shapes(yunet_n_pth):
    """export_onnx(dynamic=True) -> one OnnxExecutor run at two shapes."""
    from yunet_tpu.export.onnx_runtime import OnnxExecutor
    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    blob = export_onnx(params, state, cfg.model, dynamic=True)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(blob)
        path = f.name
    ex = OnnxExecutor(path)
    assert ex.input_shape == ["batch", 3, "height", "width"]
    rng = np.random.RandomState(3)
    for h, w in ((160, 160), (96, 128)):
        img = rng.randint(0, 256, (1, 3, h, w)).astype(np.float32)
        got = ex(img)
        want = _flat_ref_outputs(model, params, state,
                                 np.transpose(img, (0, 2, 3, 1)))
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-3,
                                       atol=1e-4, err_msg=f"{k}@{h}x{w}")
    os.unlink(path)


def test_our_onnx_same_structure_as_reference(yunet_n_pth):
    """Same op histogram and output shapes as the shipped export."""
    from collections import Counter
    ref = read_onnx(os.path.join(REF_ONNX, "yunet_n_640_640.onnx"))
    cfg = yunet_n()
    params, state = load_pth_params(yunet_n_pth)
    blob = export_onnx(params, state, cfg.model, input_shape=(640, 640))
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".onnx") as f:
        f.write(blob)
        f.flush()
        ours = read_onnx(f.name)
    ref_ops = Counter(n.op_type for n in ref.nodes)
    our_ops = Counter(n.op_type for n in ours.nodes)
    for op in ("Conv", "Sigmoid", "MaxPool", "Resize", "Add",
               "Transpose", "Reshape"):
        assert our_ops[op] == ref_ops[op], (op, our_ops[op], ref_ops[op])
    assert ours.output_shapes == ref.output_shapes
    assert ours.input_shapes["input"] == ref.input_shapes["input"]


@pytest.mark.parametrize("variant", ["n", "s"])
def test_onnx_weight_import_matches_pth(variant, yunet_n_pth,
                                        yunet_s_pth):
    """init_detector from the shipped .onnx == from the .pth."""
    import jax.numpy as jnp
    from yunet_tpu.apis import init_detector

    path = os.path.join(REF_ONNX, f"yunet_{variant}_640_640.onnx")
    if not os.path.exists(path):
        pytest.skip("reference onnx unavailable")
    pth = yunet_n_pth if variant == "n" else yunet_s_pth
    da = init_detector(f"yunet_{variant}", path)
    db = init_detector(f"yunet_{variant}", pth)
    da.bf16 = db.bf16 = False
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, 96, 128, 3)).astype(np.float32))
    sa, ba, ka = da._raw_fn(96, 128)(da.params, da.state, x)
    sb, bb, kb = db._raw_fn(96, 128)(db.params, db.state, x)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ba), np.asarray(bb), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ka), np.asarray(kb), atol=1e-3)


def test_onnx_weight_import_our_export(yunet_n_pth):
    """Our own exported onnx (per-level head order) also round-trips."""
    import tempfile
    from yunet_tpu.export.onnx_import import load_onnx_params
    cfg = yunet_n()
    params, state = load_pth_params(yunet_n_pth)
    blob = export_onnx(params, state, cfg.model, input_shape=(160, 160))
    with tempfile.NamedTemporaryFile(suffix=".onnx") as f:
        f.write(blob)
        f.flush()
        folded = load_onnx_params(f.name, cfg.model)
    assert "stem_conv" in folded["backbone"]
    assert folded["head"]["0"]["kps"]["wd"].shape == (3, 3, 1, 10)


@pytest.mark.slow
def test_tflite_export_parity(yunet_n_pth):
    """export_tflite -> tf.lite.Interpreter == JAX model (reference
    tools/yunet2tflite.py parity, conversion via tf.lite instead of
    TinyNN). Uses a small input to keep conversion quick."""
    tf = pytest.importorskip("tensorflow")
    del tf
    from yunet_tpu.export.tflite_export import export_tflite, run_tflite

    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    blob = export_tflite(params, state, cfg.model, input_shape=(96, 128))
    assert len(blob) > 100_000  # real flatbuffer with weights
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, 3, 96, 128)).astype(np.float32)
    got = run_tflite(blob, img)
    want = _flat_ref_outputs(model, params, state,
                             np.transpose(img, (0, 2, 3, 1)))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-3, atol=1e-4,
                                   err_msg=k)


def test_fold_conv_bn_numerics():
    import jax
    from yunet_tpu.models.layers import (batch_norm, conv2d,
                                         conv_dp_unit_init)
    key = jax.random.PRNGKey(0)
    p, s = conv_dp_unit_init(key, 8, 8, with_bn=True)
    # give BN non-trivial running stats
    s = {"bn": {"mean": jnp.asarray(np.random.RandomState(0).randn(8),
                                    jnp.float32),
                "var": jnp.asarray(
                    np.random.RandomState(1).uniform(0.5, 2, 8),
                    jnp.float32)}}
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 8),
                    jnp.float32)
    y_ref = conv2d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1,
                   depthwise=True)
    y_ref, _ = batch_norm(y_ref, p["bn"], s["bn"], train=False)
    w2, b2 = fold_conv_bn(p["conv2"]["w"], p["conv2"]["b"], p["bn"],
                          s["bn"])
    y_fold = conv2d(x, jnp.asarray(w2), jnp.asarray(b2), padding=1,
                    depthwise=True)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_generate_cpp_structure(yunet_n_pth):
    cfg = yunet_n()
    params, state = load_pth_params(yunet_n_pth)
    src = generate_cpp(params, state, cfg.model)
    assert src.startswith("// Auto generated data file")
    assert '#include "facedetectcnn.h"' in src
    # 59 conv layers for yunet_n (one pw per ConvDPUnit + one dw + stem)
    n_entries = src.count("ConvInfoStruct param_pConvInfo[")
    assert n_entries == 1
    import re
    m = re.search(r"param_pConvInfo\[(\d+)\]", src)
    assert m and int(m.group(1)) == 59
    # stem row: 32-channel padded layout, pointwise, with bn
    assert "backbone__model0_pw_weight[16*32*1*1]" in src
    first_row = src.split("param_pConvInfo")[1].split("\n")[1]
    assert "{32, 16, false, true, true" in first_row
    # depthwise rows are flagged correctly
    assert re.search(r"\{64, 64, true, false, true, "
                     r"backbone__model2_dp1_dw_weight", src)
    # float formatting convention: bare ints get a trailing '.f'
    assert re.search(r"[,{]1\.f[,}]", src) or "0.f" in src


def test_cpp_param_count(yunet_n_pth):
    """Total serialized scalars == folded-model params (BN absorbed),
    with the stem weight padded 27->32 per output channel."""
    cfg = yunet_n()
    params, state = load_pth_params(yunet_n_pth)
    src = generate_cpp(params, state, cfg.model)
    import re
    total = 0
    for m in re.finditer(r"float \w+\[([\d*]+)\] = \{([^}]*)\};", src):
        n_vals = len(m.group(2).split(","))
        dims = np.prod([int(v) for v in m.group(1).split("*")])
        assert n_vals == dims
        total += n_vals
    # param count excluding BN (folded) = 75856 - 2*sum(bn channels)
    # + stem padding (16 out channels x 5 zeros)
    # BN channels: stem 16 + stem_dp 16 + 5 stages x (in+out) + neck 3x64
    # + head share 3x64 -> compute from the model directly:
    import jax
    from yunet_tpu.models import YuNet
    p, s = YuNet(cfg.model).init(jax.random.PRNGKey(0))
    bn_params = sum(
        np.prod(l.shape) for path, l in
        jax.tree_util.tree_flatten_with_path(p)[0]
        if "bn" in jax.tree_util.keystr(path))
    full = sum(np.prod(l.shape)
               for l in jax.tree_util.tree_leaves(p))
    assert total == full - bn_params + 16 * 5


def test_yunet2onnx_cli_smoke(yunet_n_pth, tmp_path, capsys):
    """tools/yunet2onnx.py main(): export + --verify round-trip
    (reference yunet2onnx.py:169-210 verification direction)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import yunet2onnx

    out = tmp_path / "y.onnx"
    yunet2onnx.main(["yunet_n", yunet_n_pth, "--output", str(out),
                     "--shape", "128", "96", "--verify"])
    printed = capsys.readouterr().out
    assert out.exists() and out.stat().st_size > 100_000
    assert "verify" in printed.lower() or "ok" in printed.lower()


@pytest.mark.slow
def test_tflite_int8_quantized_export(yunet_n_pth):
    """Full-integer PTQ export: converts, keeps the float32 I/O
    contract, and its outputs track the float model (correlation gate —
    int8 activations cannot meet the float parity tolerances). The
    reference's converter is float-only (tools/yunet2tflite.py:87-94
    only points at TinyNN quantization examples); this is a deployment
    capability beyond it."""
    pytest.importorskip("tensorflow")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_synth_wider import make_image
    from yunet_tpu.export.tflite_export import export_tflite, run_tflite

    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    rng = np.random.RandomState(11)
    reps = [np.transpose(make_image(rng, 128, 96)[0].astype(np.float32),
                         (2, 0, 1))[None] for _ in range(8)]
    blob = export_tflite(params, state, cfg.model, input_shape=(96, 128),
                         quantize="int8", rep_images=reps)
    face, _, _, _ = make_image(rng, 128, 96)
    img = np.transpose(face.astype(np.float32), (2, 0, 1))[None]
    got = run_tflite(blob, img)
    want = _flat_ref_outputs(model, params, state,
                             np.transpose(img, (0, 2, 3, 1)))
    assert set(got) == set(want)
    for key in ("cls", "obj", "bbox", "kps"):
        a = np.concatenate([got[k].ravel() for k in sorted(got)
                            if k.startswith(key)])
        b = np.concatenate([want[k].ravel() for k in sorted(want)
                            if k.startswith(key)])
        cc = float(np.corrcoef(a, b)[0, 1])
        assert cc > 0.95, f"{key}: corr {cc:.4f}"

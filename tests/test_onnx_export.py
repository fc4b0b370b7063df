"""ONNX interchange: wire-format codec, decoder graph emitter, numpy
evaluator, and the export CLI.

Three independent anchors (round-4 VERDICT #1):
1. writer -> parse_model self round-trip of every proto message kind;
2. numeric parity of the emitted decoder graph — interpreted by the numpy
   evaluator — against the eager jax program (export.stablehlo.make_decoder_fn)
   on the golden vit_t weights, across the SamOnnxModel flag matrix;
3. cross-validation of the codec against an INDEPENDENT producer: a model
   serialised by torch's own C++ ONNX serializer parses to the same graph
   and evaluates to torch's output.
"""

from pathlib import Path

import numpy as np
import pytest

from samcarriestheburden_tpu.export import onnx_proto as P
from samcarriestheburden_tpu.export.onnx_eval import (evaluate_graph,
                                                      evaluate_model)
from samcarriestheburden_tpu.export.onnx_graph import (GraphBuilder,
                                                       build_decoder_graph)

GOLDEN = Path(__file__).parent / "golden"


# ---------------------------------------------------------------------------
# 1. wire-format round-trips
# ---------------------------------------------------------------------------


def test_tensor_roundtrip_dtypes_and_scalars():
    rng = np.random.default_rng(0)
    for arr in [rng.standard_normal((3, 4)).astype(np.float32),
                rng.integers(-5, 5, (2, 2, 2)).astype(np.int64),
                np.asarray(0.25, np.float32),          # 0-d scalar
                np.asarray(-7, np.int64),
                (rng.random(8) > 0.5),
                rng.integers(0, 255, (5,)).astype(np.uint8),
                np.float16(rng.standard_normal((4,)))]:
        name, back = P.parse_tensor(P.make_tensor("t", np.asarray(arr)))
        assert name == "t"
        assert back.shape == np.asarray(arr).shape
        assert back.dtype == np.asarray(arr).dtype
        np.testing.assert_array_equal(back, arr)


def test_model_roundtrip_full_graph():
    g = GraphBuilder("round")
    x = g.input("x", np.float32, ("b", 4))
    w = g.const(np.arange(8, dtype=np.float32).reshape(4, 2), "w")
    y = g.op("MatMul", x, w)
    y = g.op("Relu", y, out="y")
    g.output("y", np.float32, ("b", 2))
    m = P.parse_model(g.model_bytes(opset=17, doc="d"))
    assert m["ir_version"] == 8
    assert m["opset_import"] == [("", 17)]
    graph = m["graph"]
    assert graph["name"] == "round"
    assert [n["op_type"] for n in graph["nodes"]] == ["MatMul", "Relu"]
    assert graph["inputs"][0]["shape"] == ["b", 4]  # dim_param survives
    assert graph["outputs"][0]["name"] == "y"
    np.testing.assert_array_equal(graph["initializers"]["w"],
                                  np.arange(8, dtype=np.float32).reshape(4, 2))
    out = evaluate_graph(graph, {"x": np.asarray([[1., 1., 1., 1.]], np.float32)})
    np.testing.assert_allclose(out["y"], [[12.0, 16.0]])


def test_attribute_roundtrip():
    node = P.make_node("Op", ["a"], ["b"], f=0.5, i=-3, s="mode",
                       ints=[1, -2, 3], floats=[0.25, 0.5],
                       strings=["x", "y"], t=np.asarray([[1, 2]], np.int64))
    parsed = P._parse_node(node)
    at = parsed["attrs"]
    assert at["f"] == 0.5 and at["i"] == -3 and at["s"] == "mode"
    assert at["ints"] == [1, -2, 3] and at["floats"] == [0.25, 0.5]
    assert at["strings"] == ["x", "y"]
    np.testing.assert_array_equal(at["t"], [[1, 2]])


# ---------------------------------------------------------------------------
# 2. decoder graph numeric parity vs the jax program
# ---------------------------------------------------------------------------


def _golden_model():
    from samcarriestheburden_tpu.config import sam_vit_t_config
    from samcarriestheburden_tpu.models import convert
    from samcarriestheburden_tpu.models.sam import SamModel

    data = np.load(GOLDEN / "sam_e2e.npz")
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    cfg = sam_vit_t_config()
    return SamModel(cfg=cfg, params=convert.sam_params_from_torch(sd, cfg))


def _feeds(b, n, model, rng):
    emb = model.cfg.prompt_encoder.image_embedding_size
    g4 = emb[0] * 4
    td = model.cfg.mask_decoder.transformer_dim
    return {
        "image_embeddings":
            rng.standard_normal((1, td, *emb)).astype(np.float32),
        "point_coords":
            rng.uniform(0, model.img_size, (b, n, 2)).astype(np.float32),
        "point_labels":
            rng.integers(-1, 4, (b, n)).astype(np.float32),
        "mask_input": rng.standard_normal((b, 1, g4, g4)).astype(np.float32),
        "has_mask_input":
            (rng.random(b) > 0.5).astype(np.float32),
        "orig_im_size": np.asarray([200, 150], np.int32),
    }


@pytest.mark.parametrize("single,stab,extra", [
    (False, False, False), (True, False, False), (True, True, True)])
def test_decoder_graph_matches_jax_program(single, stab, extra):
    import jax.numpy as jnp

    from samcarriestheburden_tpu.export.stablehlo import make_decoder_fn

    model = _golden_model()
    feeds = _feeds(3, 5, model, np.random.default_rng(0))
    fn = make_decoder_fn(model, return_single_mask=single,
                         use_stability_score=stab,
                         return_extra_metrics=extra)
    ref = fn(model.params, jnp.asarray(feeds["image_embeddings"]),
             jnp.asarray(feeds["point_coords"]),
             jnp.asarray(feeds["point_labels"], jnp.int32),
             jnp.asarray(feeds["mask_input"]),
             jnp.asarray(feeds["has_mask_input"]),
             jnp.asarray(feeds["orig_im_size"]))

    g = build_decoder_graph(model, return_single_mask=single,
                            use_stability_score=stab,
                            return_extra_metrics=extra)
    got = evaluate_model(g.model_bytes(), feeds)
    names = ["masks", "prepadded_size", "iou_predictions"]
    if extra:
        names += ["stability_scores", "areas"]
    names += ["low_res_masks"]
    assert len(names) == len(ref)
    for name, r in zip(names, ref):
        r = np.asarray(r)
        assert got[name].shape == r.shape, name
        np.testing.assert_allclose(np.asarray(got[name], np.float64),
                                   np.asarray(r, np.float64),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_decoder_graph_dynamic_axes():
    """The same serialized graph evaluates at several (batch, points) shapes
    — the reference export's dynamic_axes contract."""
    import jax.numpy as jnp

    from samcarriestheburden_tpu.export.stablehlo import make_decoder_fn

    model = _golden_model()
    g = build_decoder_graph(model, return_single_mask=True)
    blob = g.model_bytes()
    fn = make_decoder_fn(model, return_single_mask=True)
    for i, (b, n) in enumerate([(1, 2), (4, 3), (2, 7)]):
        feeds = _feeds(b, n, model, np.random.default_rng(i))
        got = evaluate_model(blob, feeds)
        ref = fn(model.params, jnp.asarray(feeds["image_embeddings"]),
                 jnp.asarray(feeds["point_coords"]),
                 jnp.asarray(feeds["point_labels"], jnp.int32),
                 jnp.asarray(feeds["mask_input"]),
                 jnp.asarray(feeds["has_mask_input"]),
                 jnp.asarray(feeds["orig_im_size"]))
        assert got["masks"].shape == (b, 1, model.img_size, model.img_size)
        np.testing.assert_allclose(got["masks"], np.asarray(ref[0]),
                                   atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(got["iou_predictions"], np.asarray(ref[2]),
                                   atol=3e-4, rtol=3e-4)


# ---------------------------------------------------------------------------
# 3. torch-producer cross-validation of the codec
# ---------------------------------------------------------------------------


def _torch_onnx_bytes(module, example):
    """Serialize a torch module to ONNX bytes via torch's internal C++
    serializer (the public torch.onnx.export requires the absent `onnx`
    package; the serializer underneath it does not)."""
    import torch
    import torch.onnx.utils as U

    with torch.no_grad():
        graph, params_dict, _ = U._model_to_graph(
            torch.jit.trace(module, example), (example,),
            operator_export_type=torch._C._onnx.OperatorExportTypes.ONNX)
        proto, *_ = graph._export_onnx(
            params_dict, 17, {}, False,
            torch._C._onnx.OperatorExportTypes.ONNX, False, False, {},
            True, "", {})
    return proto


def test_parse_model_against_torch_producer():
    import torch

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(8, 4)
            self.ln = torch.nn.LayerNorm(4)

        def forward(self, x):
            return torch.softmax(self.ln(self.lin(x)), dim=-1)

    torch.manual_seed(0)
    m = M().eval()
    x = torch.randn(2, 8)
    blob = _torch_onnx_bytes(m, x)

    parsed = P.parse_model(blob)
    assert parsed["producer_name"] == "pytorch"
    assert ("", 17) in parsed["opset_import"]
    graph = parsed["graph"]
    # torch lowers LayerNorm to primitives; Gemm carries the Linear
    ops = [n["op_type"] for n in graph["nodes"]]
    assert "Gemm" in ops and "Softmax" in ops
    np.testing.assert_array_equal(graph["initializers"]["lin.weight"],
                                  m.lin.weight.detach().numpy())
    # and the parsed graph EVALUATES to torch's own output
    got = evaluate_graph(graph, {graph["inputs"][0]["name"]: x.numpy()})
    out_name = graph["outputs"][0]["name"]
    with torch.no_grad():
        ref = m(x).numpy()
    np.testing.assert_allclose(got[out_name], ref, atol=1e-5, rtol=1e-5)


def test_parse_model_against_torch_conv_producer():
    """Conv/attribute-heavy torch graph: validates Conv attrs (strides/pads)
    and packed-field parsing paths."""
    import torch

    class C(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(2, 3, 2, stride=2)

        def forward(self, x):
            return torch.relu(self.conv(x))

    torch.manual_seed(1)
    m = C().eval()
    x = torch.randn(1, 2, 8, 8)
    graph = P.parse_model(_torch_onnx_bytes(m, x))["graph"]
    conv = next(n for n in graph["nodes"] if n["op_type"] == "Conv")
    assert conv["attrs"]["strides"] == [2, 2]
    assert conv["attrs"]["pads"] == [0, 0, 0, 0]
    got = evaluate_graph(graph, {graph["inputs"][0]["name"]: x.numpy()})
    with torch.no_grad():
        ref = m(x).numpy()
    np.testing.assert_allclose(got[graph["outputs"][0]["name"]], ref,
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# 4. the CLI end-to-end
# ---------------------------------------------------------------------------


def test_export_decoder_cli_onnx(tmp_path):
    import jax

    from samcarriestheburden_tpu.cli import export_decoder
    from samcarriestheburden_tpu.models.modelio import save_params
    from samcarriestheburden_tpu.models.sam import init as sam_init
    from samcarriestheburden_tpu.config import sam_vit_t_config

    cfg = sam_vit_t_config()
    params = sam_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "tiny.npz"
    save_params(ckpt, params)
    out = tmp_path / "decoder.onnx"
    path = export_decoder.main(
        ["--checkpoint", str(ckpt), "--model-type", "vit_t",
         "--output", str(out), "--format", "onnx", "--return-single-mask",
         "--validate", "--cpu"])
    assert path == out and out.exists() and out.stat().st_size > 1000
    m = P.parse_model(out.read_bytes())
    assert m["opset_import"] == [("", 17)]
    in_names = [i["name"] for i in m["graph"]["inputs"]]
    assert in_names == ["image_embeddings", "point_coords", "point_labels",
                        "mask_input", "has_mask_input", "orig_im_size"]
    out_names = [o["name"] for o in m["graph"]["outputs"]]
    assert out_names == ["masks", "prepadded_size", "iou_predictions",
                         "low_res_masks"]


def test_decoder_graph_int8_quantized(tmp_path):
    """int8 weight quantization (the reference's quantize_dynamic analogue,
    export_onnx_model.py:187-201): big weights become int8 initializers
    dequantized in-graph; the artifact shrinks and thresholded masks agree
    with the fp32 graph."""
    model = _golden_model()
    feeds = _feeds(2, 3, model, np.random.default_rng(4))

    g_fp = build_decoder_graph(model, return_single_mask=True)
    # the tiny golden vit_t has no >1024-element weights; lower the gate
    # so the quantization path is exercised (production keeps 1024)
    g_q = build_decoder_graph(model, return_single_mask=True,
                              quantize="int8", quantize_min_size=64)
    blob_fp, blob_q = g_fp.model_bytes(), g_q.model_bytes()
    parsed = P.parse_model(blob_q)["graph"]
    assert any(n["op_type"] == "DequantizeLinear" for n in parsed["nodes"])
    int8_inits = [v for v in parsed["initializers"].values()
                  if v.dtype == np.int8]
    assert int8_inits, "quantized weights must be int8 initializers"
    assert len(blob_q) < 0.65 * len(blob_fp), \
        (len(blob_q), len(blob_fp))  # ~4x smaller quantized weights

    out_fp = evaluate_model(blob_fp, feeds)
    out_q = evaluate_model(blob_q, feeds)
    agree = ((out_q["masks"] > 0.0) == (out_fp["masks"] > 0.0)).mean()
    assert agree >= 0.99, f"mask agreement {agree:.4f}"
    with np.testing.assert_raises(Exception):  # invalid mode rejected
        build_decoder_graph(model, return_single_mask=True, quantize="bf16")

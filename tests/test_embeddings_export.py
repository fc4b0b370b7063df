"""Embedding precompute pipeline + StableHLO export round-trip."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from samcarriestheburden_tpu.config import sam_vit_t_config
from samcarriestheburden_tpu.data.h5io import EmbeddingReader
from samcarriestheburden_tpu.engine.embeddings import precompute_embeddings
from samcarriestheburden_tpu.engine.predictor import SamPredictor
from samcarriestheburden_tpu.models import convert
from samcarriestheburden_tpu.models.sam import SamModel

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def model():
    data = np.load(GOLDEN / "sam_e2e.npz")
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    return SamModel(cfg=sam_vit_t_config(),
                    params=convert.sam_params_from_torch(sd, sam_vit_t_config()))


def _write_pngs(tmp_path, n=3):
    import cv2

    rng = np.random.default_rng(0)
    files = []
    for i in range(n):
        img = rng.integers(0, 255, (180 + 10 * i, 140)).astype(np.uint8)
        f = tmp_path / f"img{i}.png"
        cv2.imwrite(str(f), img)
        files.append(f)
    return files


def test_precompute_matches_predictor(model, tmp_path):
    files = _write_pngs(tmp_path)
    out = tmp_path / "emb.h5"
    precompute_embeddings(model, files, out, "tiny.pth", batch_size=2,
                          dtype=jnp.float32, progress=False)
    reader = EmbeddingReader(out)
    assert sorted(reader.stems()) == [f.stem for f in files]
    assert reader.checkpoint == "tiny.pth"
    assert reader.img_encoder_img_size == model.img_size

    import cv2

    img = cv2.cvtColor(cv2.imread(str(files[0]), cv2.IMREAD_GRAYSCALE),
                       cv2.COLOR_GRAY2RGB)
    pred = SamPredictor(model)
    pred.set_image(img)
    direct = np.asarray(pred.get_image_embedding())
    stored = reader.features(files[0].stem)
    np.testing.assert_allclose(stored, direct, atol=1e-4)

    orig, inp = reader.sizes(files[0].stem)
    assert tuple(orig) == (180, 140)
    assert tuple(inp) == pred.input_size


def test_unrolled_blocks_match_scanned(model):
    """``unroll_blocks=True`` (inline layers instead of lax.scan — the −4%
    serving option, BENCHMARKS.md round 5) must be a pure scheduling change:
    outputs bit-identical to the scanned default."""
    from samcarriestheburden_tpu.engine.embeddings import make_encode_batch

    rng = np.random.default_rng(3)
    size = model.img_size
    imgs = jnp.asarray(rng.integers(0, 255, (2, 3, size, size)), jnp.uint8)
    sizes = jnp.asarray([[size, size - 16], [size - 8, size]], jnp.int32)
    scanned = make_encode_batch(model, jnp.float32)(model.params, imgs, sizes)
    unrolled = make_encode_batch(model, jnp.float32, unroll_blocks=True)(
        model.params, imgs, sizes)
    np.testing.assert_array_equal(np.asarray(scanned), np.asarray(unrolled))


def test_precompute_sharded_on_mesh(model, tmp_path):
    from samcarriestheburden_tpu.parallel.mesh import make_mesh

    files = _write_pngs(tmp_path, n=4)
    out = tmp_path / "emb_mesh.h5"
    precompute_embeddings(model, files, out, "tiny.pth", batch_size=8,
                          dtype=jnp.float32, mesh=make_mesh(8), progress=False)
    reader = EmbeddingReader(out)
    assert len(reader.stems()) == 4


def test_export_roundtrip(model, tmp_path):
    from samcarriestheburden_tpu.export.stablehlo import (
        export_decoder, load_exported, make_decoder_fn)

    path = export_decoder(model, tmp_path / "dec.stablehlo",
                          return_single_mask=True, batch=1, num_points=2)
    assert path.stat().st_size > 1000
    exported = load_exported(path)
    rng = np.random.default_rng(0)
    args = (
        rng.standard_normal((1, 16, 8, 8)).astype(np.float32),
        rng.uniform(0, 128, (1, 2, 2)).astype(np.float32),
        np.ones((1, 2), np.int32),
        np.zeros((1, 1, 32, 32), np.float32),
        np.zeros((1,), np.float32),
        np.asarray([600, 800], np.int32),
    )
    outs = exported.call(*args)
    fn = make_decoder_fn(model, return_single_mask=True)
    ref = fn(model.params, *map(jnp.asarray, args))
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)
    upscaled, prepadded, scores, masks = [np.asarray(o) for o in outs]
    assert upscaled.shape == (1, 1, 128, 128)
    assert prepadded.tolist() == [96, 128]  # 600x800 -> longest side 128
    assert masks.shape == (1, 1, 32, 32)


def test_export_symbolic_shapes(model, tmp_path):
    from samcarriestheburden_tpu.export.stablehlo import export_decoder, load_exported

    path = export_decoder(model, tmp_path / "dec_sym.stablehlo",
                          return_single_mask=False)
    exported = load_exported(path)
    rng = np.random.default_rng(0)
    for b, n in [(1, 2), (3, 5)]:
        outs = exported.call(
            rng.standard_normal((1, 16, 8, 8)).astype(np.float32),
            rng.uniform(0, 128, (b, n, 2)).astype(np.float32),
            np.ones((b, n), np.int32),
            np.zeros((b, 1, 32, 32), np.float32),
            np.zeros((b,), np.float32),
            np.asarray([600, 800], np.int32))
        assert np.asarray(outs[0]).shape == (b, 4, 128, 128)


def test_precompute_resume(model, tmp_path):
    """An interrupted precompute resumes without recomputing existing stems."""
    files = _write_pngs(tmp_path, n=4)
    out = tmp_path / "emb_resume.h5"
    precompute_embeddings(model, files[:2], out, "tiny.pth", batch_size=2,
                          dtype=jnp.float32, progress=False)
    precompute_embeddings(model, files, out, "tiny.pth", batch_size=2,
                          dtype=jnp.float32, progress=False, resume=True)
    reader = EmbeddingReader(out)
    assert sorted(reader.stems()) == sorted(f.stem for f in files)
    reader.close()  # h5py refuses mixed-mode reopen of a held file
    with pytest.raises(AssertionError):
        precompute_embeddings(model, files, out, "other.pth", batch_size=2,
                              dtype=jnp.float32, progress=False, resume=True)


def test_export_quantized_variants(model, tmp_path):
    """bf16 / int8 weight-quantized exports (the reference's dynamic-uint8
    ONNX quantization analogue, export_onnx_model.py:187-201): artifacts
    shrink and thresholded masks agree with the fp32 program."""
    from samcarriestheburden_tpu.export.stablehlo import (
        export_decoder, load_exported)

    rng = np.random.default_rng(0)
    args = (
        rng.standard_normal((1, 16, 8, 8)).astype(np.float32),
        rng.uniform(0, 128, (1, 2, 2)).astype(np.float32),
        np.ones((1, 2), np.int32),
        np.zeros((1, 1, 32, 32), np.float32),
        np.zeros((1,), np.float32),
        np.asarray([600, 800], np.int32),
    )
    p_f32 = export_decoder(model, tmp_path / "f32.stablehlo",
                           return_single_mask=True, batch=1, num_points=2)
    ref = load_exported(p_f32).call(*args)
    for mode in ("bf16", "int8"):
        p_q = export_decoder(model, tmp_path / f"{mode}.stablehlo",
                             return_single_mask=True, batch=1, num_points=2,
                             quantize=mode)
        if mode == "bf16":  # vit_t weights are below the int8 size threshold
            assert p_q.stat().st_size < 0.75 * p_f32.stat().st_size, \
                f"artifact not smaller: {p_q.stat().st_size} vs {p_f32.stat().st_size}"
        outs = load_exported(p_q).call(*args)
        thr = model.mask_threshold
        agree = (np.asarray(outs[0]) > thr) == (np.asarray(ref[0]) > thr)
        assert agree.mean() >= 0.99, f"{mode}: mask agreement {agree.mean():.4f}"
        np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(ref[2]),
                                   atol=0.1)  # iou scores stay close


def test_int8_quantization_roundtrip_real_size_weights():
    """int8 weight quantization at real decoder-weight shapes: large 2-D
    leaves become {q: int8, s}, dequantization error is per-tensor-symmetric
    bounded, small leaves stay float."""
    from samcarriestheburden_tpu.export.stablehlo import (
        dequantize_params, quantize_params)

    rng = np.random.default_rng(0)
    tree = {"attn": {"w": rng.standard_normal((256, 256)).astype(np.float32)},
            "ln": {"scale": np.ones(256, np.float32)},
            "pe": rng.standard_normal((2, 128)).astype(np.float32)}
    q = quantize_params(tree, "int8")
    assert set(q["attn"]["w"]) == {"q", "s"} and q["attn"]["w"]["q"].dtype == jnp.int8
    assert q["ln"]["scale"].dtype == jnp.float32  # 1-D: untouched
    assert q["pe"].dtype == jnp.float32           # small: untouched
    deq = dequantize_params(q)
    w = tree["attn"]["w"]
    bound = float(np.abs(w).max()) / 127.0 / 2 + 1e-6
    assert np.abs(np.asarray(deq["attn"]["w"]) - w).max() <= bound

"""Generate golden parity fixtures from the reference PyTorch implementation.

Loads the reference's model files at /root/reference as an *oracle* (executed,
never copied), runs tiny seeded configurations forward, and stores
(state_dict, inputs, outputs) npz bundles under tests/golden/.  The test suite
then checks the JAX implementations against these fixtures without needing the
reference or torch-module loading at test time.

Run once:  python tools/make_goldens.py
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)


def load_ref_modeling():
    """Import reference modeling files as package 'refsam.modeling' without
    triggering segment_anything/__init__ (which needs torchvision)."""
    pkg = types.ModuleType("refsam")
    pkg.__path__ = []
    sys.modules["refsam"] = pkg
    modeling = types.ModuleType("refsam.modeling")
    modeling.__path__ = [str(REF / "segment_anything" / "modeling")]
    sys.modules["refsam.modeling"] = modeling
    mods = {}
    for name in ["common", "image_encoder", "prompt_encoder", "transformer",
                 "mask_decoder", "sam"]:
        spec = importlib.util.spec_from_file_location(
            f"refsam.modeling.{name}",
            REF / "segment_anything" / "modeling" / f"{name}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refsam.modeling.{name}"] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


def load_ref_unet():
    pkg = types.ModuleType("custom_arcitecture")
    pkg.__path__ = [str(REF / "custom_arcitecture")]
    sys.modules["custom_arcitecture"] = pkg
    mods = {}
    for name in ["modelio", "classic_u_net"]:
        spec = importlib.util.spec_from_file_location(
            f"custom_arcitecture.{name}", REF / "custom_arcitecture" / f"{name}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"custom_arcitecture.{name}"] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


def build_tiny_sam(mods):
    """Tiny SAM matching samcarriestheburden_tpu.config.sam_vit_t_config()."""
    from functools import partial

    img_size, embed, depth, heads = 128, 32, 2, 2
    prompt_dim, grid = 16, 8
    encoder = mods["image_encoder"].ImageEncoderViT(
        depth=depth, embed_dim=embed, img_size=img_size, mlp_ratio=4,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6), num_heads=heads,
        patch_size=16, qkv_bias=True, use_rel_pos=True,
        global_attn_indexes=(1,), window_size=5, out_chans=prompt_dim)
    prompt = mods["prompt_encoder"].PromptEncoder(
        embed_dim=prompt_dim, image_embedding_size=(grid, grid),
        input_image_size=(img_size, img_size), mask_in_chans=4)
    decoder = mods["mask_decoder"].MaskDecoder(
        num_multimask_outputs=3,
        transformer=mods["transformer"].TwoWayTransformer(
            depth=2, embedding_dim=prompt_dim, mlp_dim=32, num_heads=2),
        transformer_dim=prompt_dim, iou_head_depth=3, iou_head_hidden_dim=16)
    sam = mods["sam"].Sam(image_encoder=encoder, prompt_encoder=prompt,
                          mask_decoder=decoder)
    sam.eval()
    # non-trivial weights everywhere (default init leaves rel-pos/pos-embed zero)
    gen = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for p in sam.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for b in sam.buffers():
            if b.ndim == 2:  # pe gaussian matrix
                b.copy_(torch.randn(b.shape, generator=gen))
    return sam


def save_npz(path, state_dict, **arrays):
    payload = {f"sd/{k}": v.detach().numpy() for k, v in state_dict.items()}
    payload.update({
        k: (v.detach().numpy() if isinstance(v, torch.Tensor) else np.asarray(v))
        for k, v in arrays.items()})
    np.savez_compressed(path, **payload)
    print(f"wrote {path} ({len(payload)} arrays)")


def main():
    torch.manual_seed(0)
    mods = load_ref_modeling()
    sam = build_tiny_sam(mods)
    rng = np.random.default_rng(7)

    # ---- prompt encoder ---------------------------------------------------
    coords = rng.uniform(0, 128, (2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, -1], [1, 1, 0]], np.int64)
    boxes = rng.uniform(0, 128, (2, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2] * 0 + 1  # ensure valid-ish
    mask_in = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        sp_pts, dn_pts = sam.prompt_encoder(
            (torch.from_numpy(coords), torch.from_numpy(labels)), None, None)
        sp_box, dn_box = sam.prompt_encoder(None, torch.from_numpy(boxes), None)
        sp_all, dn_all = sam.prompt_encoder(
            (torch.from_numpy(coords), torch.from_numpy(labels)),
            torch.from_numpy(boxes), torch.from_numpy(mask_in))
        dense_pe = sam.prompt_encoder.get_dense_pe()
    save_npz(OUT / "prompt_encoder.npz", sam.prompt_encoder.state_dict(),
             coords=coords, labels=labels, boxes=boxes, mask_in=mask_in,
             sp_pts=sp_pts, dn_pts=dn_pts, sp_box=sp_box, dn_box=dn_box,
             sp_all=sp_all, dn_all=dn_all, dense_pe=dense_pe)

    # ---- mask decoder -----------------------------------------------------
    img_emb = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    img_pe = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    sparse = rng.standard_normal((2, 3, 16)).astype(np.float32)
    dense = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        masks_multi, iou_multi = sam.mask_decoder(
            torch.from_numpy(img_emb), torch.from_numpy(img_pe),
            torch.from_numpy(sparse), torch.from_numpy(dense), True)
        masks_single, iou_single = sam.mask_decoder(
            torch.from_numpy(img_emb), torch.from_numpy(img_pe),
            torch.from_numpy(sparse), torch.from_numpy(dense), False)
    save_npz(OUT / "mask_decoder.npz", sam.mask_decoder.state_dict(),
             img_emb=img_emb, img_pe=img_pe, sparse=sparse, dense=dense,
             masks_multi=masks_multi, iou_multi=iou_multi,
             masks_single=masks_single, iou_single=iou_single)

    # ---- image encoder ----------------------------------------------------
    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        enc_out = sam.image_encoder(torch.from_numpy(x))
    save_npz(OUT / "image_encoder.npz", sam.image_encoder.state_dict(),
             x=x, out=enc_out)

    # ---- end-to-end Sam ---------------------------------------------------
    image = (rng.uniform(0, 255, (3, 100, 128))).astype(np.float32)
    pt = np.array([[[40.0, 30.0]]], np.float32)
    lbl = np.array([[1]], np.int64)
    box = np.array([[20.0, 10.0, 90.0, 80.0]], np.float32)
    with torch.no_grad():
        out = sam([{ "image": torch.from_numpy(image),
                     "original_size": (200, 256),
                     "point_coords": torch.from_numpy(pt),
                     "point_labels": torch.from_numpy(lbl),
                     "boxes": torch.from_numpy(box)}], multimask_output=False)[0]
    save_npz(OUT / "sam_e2e.npz", sam.state_dict(),
             image=image, pt=pt, lbl=lbl, box=box,
             masks=out["masks"].numpy(), iou=out["iou_predictions"].numpy(),
             low_res=out["low_res_logits"].numpy())

    # ---- U-Net ------------------------------------------------------------
    umods = load_ref_unet()
    torch.manual_seed(99)
    unet = umods["classic_u_net"].UNet(1, 17, n_last_channel=64).eval()
    ux = rng.standard_normal((1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        uy = unet(torch.from_numpy(ux))
    save_npz(OUT / "unet.npz", unet.state_dict(), x=ux, y=uy)


if __name__ == "__main__":
    main()

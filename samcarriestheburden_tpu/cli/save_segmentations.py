"""Raw U-Net segmentation export (reference scripts/save_segmentations.py).

python -m samcarriestheburden_tpu.cli.save_segmentations --model_id <id>
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def select_unlabeled_files(data_root: str, n_files) -> list:
    """500-split CSV or all unannotated PNGs (reference :25-33)."""
    import pandas as pd

    from samcarriestheburden_tpu.data.cvat import CVATParser

    root = Path(data_root)
    if n_files == 500 or n_files == "500":
        return pd.read_csv(root / "500unlabeled_sample.csv",
                           index_col="filestem").index.tolist()
    stems = {f.stem for f in (root / "img_only_front_all_left").glob("*.png")}
    parser = CVATParser(sorted((root / "cvat_annotation_xml").glob("annotations_*.xml")),
                        True, False, True)
    return sorted(stems - set(parser.available_file_names))


def main(argv=None):
    p = argparse.ArgumentParser(description="Save raw U-Net segmentations")
    p.add_argument("--model_id", type=str, required=True)
    p.add_argument("--n_files", type=str, default="500", help="'500' or 'all'")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax
    import jax.numpy as jnp
    from tqdm import tqdm

    from samcarriestheburden_tpu.config import GRAZ_IMG_MEAN, GRAZ_IMG_STD, UNET_INPUT_HW
    from samcarriestheburden_tpu.data.h5io import MaskWriter
    from samcarriestheburden_tpu.models import unet
    from samcarriestheburden_tpu.models.modelio import ModelRegistry

    print(f"Using model: {args.model_id}")
    registry = ModelRegistry(f"{args.data_root}/model_registry")
    unet_cfg, params = registry.load(args.model_id)
    H, W = UNET_INPUT_HW

    @jax.jit
    def predict(x):
        x = (x - GRAZ_IMG_MEAN) / GRAZ_IMG_STD
        return jax.nn.sigmoid(unet.apply(params, unet_cfg, x)) > 0.5

    files = select_unlabeled_files(args.data_root, args.n_files)
    img_dir = Path(args.data_root) / "img_only_front_all_left"
    out = (Path(args.data_root) / "seg_masks" / args.model_id /
           f"raw_segmentations_{len(files) if args.n_files != '500' else 500}.h5")

    with MaskWriter(out, attrs={"model_id": args.model_id}) as writer:
        batch, names = [], []

        def flush():
            if not batch:
                return
            x = jnp.asarray(np.stack(batch))
            masks = np.asarray(predict(x))
            for name, m in zip(names, masks):
                writer.write(name, m.astype(np.uint8))
            batch.clear()
            names.clear()

        for name in tqdm(files, unit="img", desc="Predict segmentation"):
            img = cv2.imread(str(img_dir / f"{name}.png"), cv2.IMREAD_GRAYSCALE)
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)
            batch.append(img[None].astype(np.float32) / 255.0)
            names.append(name)
            if len(batch) == args.batch_size:
                flush()
        flush()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

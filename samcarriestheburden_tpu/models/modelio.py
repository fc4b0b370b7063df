"""Model serialisation with bundled architecture config, plus a local model
registry.

The reference bundles constructor args with weights so a file alone rebuilds
the model (``LoadableModel``/``store_config_args``, custom_arcitecture/
modelio.py:10-86), and uses ClearML model-ids for cross-stage handoff
(``InputModel(model_id).get_weights()``, scripts/save_segmentations.py:21-22).

Here: one ``.npz`` holds the flattened params pytree + a JSON config header;
:class:`ModelRegistry` provides content-addressed ids on the local filesystem
so every pipeline stage that the reference drives by ClearML id works offline.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from samcarriestheburden_tpu.config import SamConfig, UNetConfig

_CONFIG_CLASSES = {"UNetConfig": UNetConfig, "SamConfig": SamConfig}


# ---------------------------------------------------------------------------
# pytree <-> flat npz
# ---------------------------------------------------------------------------


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# ---------------------------------------------------------------------------
# save / load
# ---------------------------------------------------------------------------


def save_model(path, config, params) -> Path:
    """Write a config-bundled checkpoint (LoadableModel.save semantics,
    reference modelio.py:67-76)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = flatten_params(params)
    flat["__config__"] = np.frombuffer(
        json.dumps({"class": type(config).__name__,
                    "config": json.loads(config.to_json())}).encode(), dtype=np.uint8)
    np.savez(path, **flat)
    return path


def load_model(path) -> Tuple[Any, dict]:
    """Rebuild (config, params) from a bundle (LoadableModel.load semantics,
    reference modelio.py:78-86)."""
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__config__"].tobytes()).decode())
    cls = _CONFIG_CLASSES[header["class"]]
    config = cls.from_json(json.dumps(header["config"]))
    params = unflatten_params({k: data[k] for k in data.files if k != "__config__"})
    return config, params


def save_params(path, params) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flatten_params(params))
    return path


def load_params(path):
    data = np.load(path, allow_pickle=False)
    return unflatten_params({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# local model registry (replaces ClearML model ids)
# ---------------------------------------------------------------------------


class ModelRegistry:
    """Content-addressed model store: ``register`` returns a stable hex id,
    ``get_weights(model_id)`` returns the checkpoint path — the two operations
    the reference performs against ClearML."""

    def __init__(self, root="data/model_registry"):
        self.root = Path(root)

    def register(self, config, params, name: str = "model",
                 metadata: Optional[dict] = None) -> str:
        flat = flatten_params(params)
        h = hashlib.sha256()
        for k in sorted(flat):
            h.update(k.encode())
            h.update(np.ascontiguousarray(flat[k]).tobytes())
        model_id = h.hexdigest()[:32]
        mdir = self.root / model_id
        mdir.mkdir(parents=True, exist_ok=True)
        save_model(mdir / "model.npz", config, params)
        meta = {"name": name, "created": time.time(), **(metadata or {})}
        (mdir / "meta.json").write_text(json.dumps(meta, indent=2))
        return model_id

    def get_weights(self, model_id: str) -> Path:
        path = self.root / model_id / "model.npz"
        if not path.exists():
            raise KeyError(f"model id {model_id!r} not found under {self.root}")
        return path

    def load(self, model_id: str):
        return load_model(self.get_weights(model_id))

    def list(self):
        out = []
        for mdir in sorted(self.root.glob("*/meta.json")):
            meta = json.loads(mdir.read_text())
            out.append({"id": mdir.parent.name, **meta})
        return out

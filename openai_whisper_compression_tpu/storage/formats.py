"""Compressed on-disk model formats with verified reload.

Parity with the reference's `final_pruning_script` storage lab:
- sparse-zip: tensors >`sparse_threshold` sparse stored as (indices, values)
  npy pairs, dense ones npz-compressed, all in one ZIP_DEFLATED container
  with a JSON manifest (`pruning_and_storing_as_sparse.py:322-442`, loader
  :445-520)
- gzip: gzip-compressed serialized leaves (`gzip_storage.py:373-409`)
- npz: every tensor np.savez_compressed (`numpy_only_storing.py:287-430`)

All loaders rebuild the exact parameter pytree (QTensor leaves included) and
`verify_roundtrip` reproduces the reference's save→load→sparsity-match check
(`pruning_and_storing_as_sparse.py:680-707`).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import pickle
import zipfile
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..models.params import named_leaves
from ..ops.qtensor import QTensor

FORMAT_VERSION = 1


def _flatten(params: Any) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
    """-> ({storage_name: array}, manifest). QTensors expand into their
    array fields + a manifest entry reconstructing the dataclass."""
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, Any] = {"version": FORMAT_VERSION, "leaves": {}}
    for name, leaf in named_leaves(params):
        if isinstance(leaf, QTensor):
            fields = {}
            for f in ("data", "scale", "zero", "scale2", "offset2",
                      "act_scale"):
                v = getattr(leaf, f)
                if v is not None:
                    key = f"{name}::{f}"
                    arr = np.asarray(v)
                    if arr.dtype == jnp.float8_e4m3fn:
                        arr = arr.view(np.uint8)
                        fields[f + "__fp8"] = True
                    arrays[key] = arr
                    fields[f] = key
            manifest["leaves"][name] = {
                "type": "qtensor", "fields": fields, "kind": leaf.kind,
                "bits": leaf.bits, "shape": list(leaf.shape),
                "block_size": leaf.block_size, "act": leaf.act,
            }
        else:
            arr = np.asarray(leaf)
            info: dict[str, Any] = {"type": "array", "dtype": str(arr.dtype)}
            if arr.dtype.kind == "V" or arr.dtype.names or str(arr.dtype) not in (
                    "float64", "float32", "float16", "int64", "int32",
                    "int16", "int8", "uint8", "uint16", "uint32", "uint64",
                    "bool"):
                # non-native dtypes (bfloat16, fp8 ...) survive npz only as
                # raw bytes: store a flat uint8 view + shape for reconstruction
                info["viewdtype"] = str(leaf.dtype)
                info["shape"] = list(arr.shape)
                arr = np.ascontiguousarray(arr).view(np.uint8).reshape(-1)
                info["dtype"] = "uint8"
            arrays[name] = arr
            manifest["leaves"][name] = info
    return arrays, manifest


def _unflatten(arrays: dict[str, np.ndarray], manifest: dict[str, Any]) -> Any:
    params: dict = {}

    def ensure_path(name: str):
        parts = name.split(".")
        node = params
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if part.isdigit():
                part = int(part)
                while len(node) <= part:
                    node.append({})
                if not isinstance(node[part], (dict, list)) or not node[part]:
                    node[part] = [] if nxt.isdigit() else {}
                node = node[part]
            else:
                if part not in node or not isinstance(node.get(part), (dict, list)):
                    node[part] = [] if nxt.isdigit() else {}
                elif isinstance(node[part], list) != nxt.isdigit():
                    pass
                node = node[part]
        return node, parts[-1]

    for name, info in manifest["leaves"].items():
        if info["type"] == "qtensor":
            kw = {}
            for f in ("data", "scale", "zero", "scale2", "offset2",
                      "act_scale"):
                key = info["fields"].get(f)
                if key is not None:
                    arr = arrays[key]
                    if info["fields"].get(f + "__fp8"):
                        arr = arr.view(jnp.float8_e4m3fn)
                    kw[f] = jnp.asarray(arr)
            leaf = QTensor(kind=info["kind"], bits=info["bits"],
                           shape=tuple(info["shape"]),
                           block_size=info["block_size"],
                           act=info.get("act"), **kw)
        else:
            arr = arrays[name]
            if info.get("viewdtype"):
                dt = jnp.dtype(info["viewdtype"])
                arr = np.ascontiguousarray(arr, np.uint8).view(dt).reshape(
                    tuple(info["shape"]))
            leaf = jnp.asarray(arr)
        node, last = ensure_path(name)
        if isinstance(node, list):
            idx = int(last)
            while len(node) <= idx:
                node.append(None)
            node[idx] = leaf
        else:
            node[last] = leaf
    return params


def _sparsity(arr: np.ndarray) -> float:
    return float((arr == 0).mean()) if arr.size else 0.0


# ---------------------------------------------------------------------------
# sparse-zip
# ---------------------------------------------------------------------------

def save_sparse_zip(params: Any, path: str,
                    sparse_threshold: float = 0.7) -> dict[str, Any]:
    """ZIP container; per tensor: sparse (flat indices + values) when
    sparsity > threshold, else compressed npz. Returns a stats dict."""
    arrays, manifest = _flatten(params)
    stats = {"sparse_tensors": 0, "dense_tensors": 0}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as z:
        for key, arr in arrays.items():
            safe = key.replace("::", "__Q__")
            fl = arr.reshape(-1)
            is_float = arr.dtype.kind == "f" and arr.dtype.itemsize == 4
            if is_float and _sparsity(arr) > sparse_threshold:
                # threaded native nonzero extraction (runtime/owc_runtime.cpp)
                from ..runtime_native import sparse_encode

                nz, vals = sparse_encode(fl)
                entry = io.BytesIO()
                np.savez_compressed(entry, indices=nz, values=vals,
                                    shape=np.asarray(arr.shape),
                                    dtype=np.asarray(str(arr.dtype)))
                z.writestr(f"sparse/{safe}.npz", entry.getvalue())
                manifest["leaves_storage_" + key] = "sparse"
                stats["sparse_tensors"] += 1
            else:
                entry = io.BytesIO()
                np.savez_compressed(entry, arr=arr)
                z.writestr(f"dense/{safe}.npz", entry.getvalue())
                stats["dense_tensors"] += 1
        z.writestr("manifest.json", json.dumps(manifest))
    stats["file_mb"] = os.path.getsize(path) / (1024 ** 2)
    return stats


def load_sparse_zip(path: str) -> Any:
    arrays: dict[str, np.ndarray] = {}
    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read("manifest.json"))
        for info in z.namelist():
            if info == "manifest.json":
                continue
            kind, fname = info.split("/", 1)
            key = fname[:-4].replace("__Q__", "::")
            data = np.load(io.BytesIO(z.read(info)), allow_pickle=False)
            if kind == "sparse":
                from ..runtime_native import sparse_decode

                shape = tuple(data["shape"])
                dtype = np.dtype(str(data["dtype"]))
                arrays[key] = sparse_decode(
                    data["indices"], data["values"], shape).astype(dtype)
            else:
                arrays[key] = data["arr"]
    return _unflatten(arrays, manifest)


# ---------------------------------------------------------------------------
# gzip
# ---------------------------------------------------------------------------

def save_gzip(params: Any, path: str, level: int = 9) -> dict[str, Any]:
    arrays, manifest = _flatten(params)
    payload = pickle.dumps({"arrays": arrays, "manifest": manifest},
                           protocol=pickle.HIGHEST_PROTOCOL)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with gzip.open(path, "wb", compresslevel=level) as f:
        f.write(payload)
    return {"file_mb": os.path.getsize(path) / (1024 ** 2),
            "raw_mb": len(payload) / (1024 ** 2)}


def load_gzip(path: str) -> Any:
    with gzip.open(path, "rb") as f:
        blob = pickle.loads(f.read())
    return _unflatten(blob["arrays"], blob["manifest"])


# ---------------------------------------------------------------------------
# npz-only
# ---------------------------------------------------------------------------

def save_npz(params: Any, path: str) -> dict[str, Any]:
    arrays, manifest = _flatten(params)
    safe = {k.replace("::", "__Q__"): v for k, v in arrays.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, __manifest__=np.asarray(json.dumps(manifest)),
                        **safe)
    return {"file_mb": os.path.getsize(path) / (1024 ** 2)}


def load_npz(path: str) -> Any:
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(str(data["__manifest__"]))
    arrays = {k.replace("__Q__", "::"): data[k] for k in data.files
              if k != "__manifest__"}
    return _unflatten(arrays, manifest)


FORMATS = {
    "sparse_zip": (save_sparse_zip, load_sparse_zip),
    "gzip": (save_gzip, load_gzip),
    "npz": (save_npz, load_npz),
}


def verify_roundtrip(params: Any, path: str, fmt: str = "sparse_zip") -> dict:
    """save → load → exact-match + sparsity-match check (reference's ✅/❌
    verification, `pruning_and_storing_as_sparse.py:680-707`)."""
    save, load = FORMATS[fmt]
    stats = save(params, path)
    loaded = load(path)
    orig = dict(named_leaves(params))
    new = dict(named_leaves(loaded))
    assert set(orig) == set(new), "leaf sets differ"
    mismatches = []
    for name, leaf in orig.items():
        if isinstance(leaf, QTensor):
            ok = np.array_equal(np.asarray(leaf.data).view(np.uint8),
                                np.asarray(new[name].data).view(np.uint8))
        else:
            ok = np.array_equal(np.asarray(leaf), np.asarray(new[name]))
        if not ok:
            mismatches.append(name)
    return {"ok": not mismatches, "mismatches": mismatches, **stats}

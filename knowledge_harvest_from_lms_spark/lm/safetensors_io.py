"""Dependency-free safetensors reader/writer (numpy only).

The sandbox has neither ``torch`` nor the ``safetensors`` package, but
the on-disk format is deliberately trivial and publicly specified
(github.com/huggingface/safetensors README): an 8-byte little-endian
unsigned header length, a JSON header mapping tensor name →
``{"dtype", "shape", "data_offsets": [start, end]}`` (offsets relative
to the byte buffer that follows the header; optional ``__metadata__``
string map), then the raw little-endian tensor bytes, C-contiguous,
no padding. That is all ``lm/numpy_lm.py`` needs to load a real
exported DistilBERT checkpoint — and all tests need to round-trip a
tiny synthetic one.

The writer exists for tests and for the export path documented in
README (on any machine WITH torch: ``model.save_pretrained(dir,
safe_serialization=True)`` produces exactly this layout).
"""

from __future__ import annotations

import json
import struct

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}
_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def save_file(tensors: dict[str, np.ndarray], path: str,
              metadata: dict[str, str] | None = None) -> None:
    header: dict = {}
    if metadata:
        header["__metadata__"] = dict(metadata)
    offset = 0
    bufs: list[bytes] = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        key = _NAMES.get(arr.dtype)
        if key is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name!r}")
        raw = arr.tobytes()  # C order, native (little) endian
        header[name] = {
            "dtype": key,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        bufs.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in bufs:
            f.write(raw)


def load_file(path: str) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode())
        buf = f.read()
    out: dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        dt = _DTYPES.get(spec["dtype"])
        if dt is None:
            raise ValueError(f"unsupported dtype {spec['dtype']} for {name!r}")
        s, e = spec["data_offsets"]
        arr = np.frombuffer(buf[s:e], dtype=dt)
        out[name] = arr.reshape(spec["shape"]).copy()
    return out

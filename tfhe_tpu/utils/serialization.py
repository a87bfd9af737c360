"""Versioned serialization for keys and ciphertexts.

The reference has NO save/load anywhere (SURVEY.md section 5): keys and
ciphertexts are in-memory structs, even though the MK ceremony implies a wire
format (CloudKeyPart travels party -> server, examples/multikey.jl:19-23).
This module fills that gap with an explicit, versioned container:

* one `.npz` archive holding every array leaf (named by tree path) plus a
  JSON manifest (`__manifest__`) recording the format version, the object
  type tree, and all static metadata (SchemeParameters etc.);
* round-trips every public object: SecretKey, CloudKey, KeyswitchKey,
  BootstrapKey, LweSample, TLweSample, SharedKey, CloudKeyPart, MKCloudKey,
  MKBootstrapKey, MKLweSample, MKTGswUESample.

Deliberately dependency-free (NumPy container) so artifacts are portable
across hosts and frameworks.
"""

from __future__ import annotations

import dataclasses
import io
import json

import jax
import numpy as np

FORMAT_VERSION = 2  # v2: keyswitch table rows reordered (j, h, i) — keyswitch.py


def _type_table():
    from .. import api, bootstrap, compressed, keyswitch, lwe, public, tlwe
    from ..mk import api as mk_api
    from ..mk import internals as mk_internals
    from ..params import SchemeParameters

    return {
        "SchemeParameters": SchemeParameters,
        "SeededLweSample": compressed.SeededLweSample,
        "SeededKeyswitchKey": compressed.SeededKeyswitchKey,
        "SeededBootstrapKey": compressed.SeededBootstrapKey,
        "SeededCloudKey": compressed.SeededCloudKey,
        "SeededSharedKey": compressed.SeededSharedKey,
        "SeededCloudKeyPart": compressed.SeededCloudKeyPart,
        "CompressedLweSample": compressed.CompressedLweSample,
        "LwePublicKey": public.LwePublicKey,
        "SeededLwePublicKey": public.SeededLwePublicKey,
        "SecretKey": api.SecretKey,
        "CloudKey": api.CloudKey,
        "BootstrapKey": bootstrap.BootstrapKey,
        "KeyswitchKey": keyswitch.KeyswitchKey,
        "LweSample": lwe.LweSample,
        "TLweSample": tlwe.TLweSample,
        "SharedKey": mk_api.SharedKey,
        "CloudKeyPart": mk_api.CloudKeyPart,
        "MKCloudKey": mk_api.MKCloudKey,
        "MKBootstrapKey": mk_internals.MKBootstrapKey,
        "MKLweSample": mk_internals.MKLweSample,
        "MKTGswUESample": mk_internals.MKTGswUESample,
        "MKTGswExpSample": mk_internals.MKTGswExpSample,
    }


def _encode(obj, path, arrays, table_rev):
    """Recursively encode `obj` into a JSON-able spec + array dict."""
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"k": "scalar", "v": obj}
    if isinstance(obj, (jax.Array, np.ndarray)):
        name = "/".join(path)
        arrays[name] = np.asarray(obj)
        return {"k": "array", "v": name}
    cls_name = table_rev.get(type(obj))
    if cls_name is not None:
        if dataclasses.is_dataclass(obj):
            fields = {
                f.name: _encode(getattr(obj, f.name), path + (f.name,),
                                arrays, table_rev)
                for f in dataclasses.fields(obj)
            }
        else:  # NamedTuple
            fields = {
                name: _encode(getattr(obj, name), path + (name,),
                              arrays, table_rev)
                for name in obj._fields
            }
        return {"k": "obj", "t": cls_name, "v": fields}
    if isinstance(obj, (tuple, list)):
        return {
            "k": "tuple" if isinstance(obj, tuple) else "list",
            "v": [
                _encode(e, path + (str(i),), arrays, table_rev)
                for i, e in enumerate(obj)
            ],
        }
    raise TypeError(f"cannot serialize {type(obj)!r} at {'/'.join(path)}")


def _decode(spec, arrays, table):
    kind = spec["k"]
    if kind == "scalar":
        return spec["v"]
    if kind == "array":
        return arrays[spec["v"]]
    if kind == "obj":
        cls = table[spec["t"]]
        fields = {n: _decode(s, arrays, table) for n, s in spec["v"].items()}
        return cls(**fields)
    if kind == "tuple":
        return tuple(_decode(s, arrays, table) for s in spec["v"])
    if kind == "list":
        return [_decode(s, arrays, table) for s in spec["v"]]
    raise ValueError(f"unknown spec kind {kind!r}")


def dumps(obj) -> bytes:
    """Serialize a framework object to bytes (npz container)."""
    table = _type_table()
    table_rev = {v: k for k, v in table.items()}
    arrays: dict = {}
    spec = _encode(obj, (), arrays, table_rev)
    manifest = json.dumps({"version": FORMAT_VERSION, "spec": spec})
    buf = io.BytesIO()
    np.savez(buf, __manifest__=np.frombuffer(manifest.encode(), np.uint8),
             **arrays)
    return buf.getvalue()


def loads(data: bytes):
    """Reconstruct a framework object from bytes."""
    with np.load(io.BytesIO(data)) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        if manifest["version"] != FORMAT_VERSION:
            raise ValueError(
                f"unsupported format version {manifest['version']}"
            )
        arrays = {k: z[k] for k in z.files if k != "__manifest__"}
    return _decode(manifest["spec"], arrays, _type_table())


def save(obj, path: str) -> None:
    with open(path, "wb") as f:
        f.write(dumps(obj))


def load(path: str):
    with open(path, "rb") as f:
        return loads(f.read())

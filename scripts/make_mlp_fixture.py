#!/usr/bin/env python3
"""Generate the committed MLP encoder fixture used by
operators.multimodal.feature_embed(encoder="mlp"|"onnx"):

  edgar_finance_ontology_spark/models/mlp_embed_8.npz   (numpy weights)
  edgar_finance_ontology_spark/models/mlp_embed_8.onnx  (same weights)

The model is a deterministic 2-layer MLP over the 256-bin byte
histogram of a payload: X[N,256] -> Gemm(W1,B1) -> Relu -> Gemm(W2,B2)
-> Y[N,8]. Weights are seeded, so fixture bytes are reproducible.

The .onnx file is hand-encoded protobuf (ModelProto wire format per the
public onnx.proto3 schema) because this container has no `onnx`
package; `decode_onnx_sanity` re-parses the emitted bytes to verify the
structure (node ops, initializer dims, IO shapes) — and the gated test
in tests/test_streaming_multimodal.py checks onnxruntime agrees with
the numpy forward pass bit-for-bit (to float32 tolerance) wherever
onnxruntime is installed.
"""

from __future__ import annotations

import os
import struct

import numpy as np

HIDDEN = 64
IN_DIM = 256
OUT_DIM = 8


# ---------------- minimal protobuf wire-format writer -----------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def vint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def blob(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def s(field: int, text: str) -> bytes:
    return blob(field, text.encode("utf-8"))


# ---------------- onnx message builders -------------------------------

def tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims=1, data_type=2 (FLOAT=1), name=8, raw_data=9."""
    a = np.ascontiguousarray(arr, dtype="<f4")
    msg = b"".join(vint(1, d) for d in a.shape)
    msg += vint(2, 1)
    msg += s(8, name)
    msg += blob(9, a.tobytes())
    return msg


def value_info(name: str, dims) -> bytes:
    """ValueInfoProto{name=1, type=2:TypeProto{tensor_type=1:{
    elem_type=1, shape=2:TensorShapeProto{dim=1:{dim_value=1|
    dim_param=2}}}}}; dims entries: int for fixed, str for symbolic."""
    shape = b""
    for d in dims:
        dim = vint(1, d) if isinstance(d, int) else s(2, d)
        shape += blob(1, dim)
    tensor_type = vint(1, 1) + blob(2, shape)
    return s(1, name) + blob(2, blob(1, tensor_type))


def node(op: str, inputs, outputs) -> bytes:
    """NodeProto{input=1, output=2, name=3, op_type=4}."""
    msg = b"".join(s(1, i) for i in inputs)
    msg += b"".join(s(2, o) for o in outputs)
    msg += s(3, f"{op}_{outputs[0]}")
    msg += s(4, op)
    return msg


def build_onnx(w1, b1, w2, b2) -> bytes:
    graph = b"".join([
        blob(1, node("Gemm", ["X", "W1", "B1"], ["h1"])),
        blob(1, node("Relu", ["h1"], ["r1"])),
        blob(1, node("Gemm", ["r1", "W2", "B2"], ["Y"])),
        s(2, "efin_mlp_embed"),
        blob(5, tensor("W1", w1)),
        blob(5, tensor("B1", b1)),
        blob(5, tensor("W2", w2)),
        blob(5, tensor("B2", b2)),
        blob(11, value_info("X", ["N", IN_DIM])),
        blob(12, value_info("Y", ["N", OUT_DIM])),
    ])
    # ModelProto{ir_version=1, graph=7, opset_import=8:{version=2}}
    return vint(1, 8) + blob(7, graph) + blob(8, vint(2, 13))


# ---------------- sanity decoder (no onnx dependency) -----------------

def _read_varint(buf: bytes, pos: int):
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<I", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unexpected wire type {wire}")
        yield field, wire, val


def decode_onnx_sanity(model_bytes: bytes) -> dict:
    """Re-parse the wire format and return the structural facts a
    loader would rely on; raises on malformed bytes."""
    graph = None
    ir_version = opset = None
    for f, _w, v in _fields(model_bytes):
        if f == 1:
            ir_version = v
        elif f == 7:
            graph = v
        elif f == 8:
            opset = dict(
                (ff, vv) for ff, _ww, vv in _fields(v)
            ).get(2)
    ops, inits, ios = [], {}, {}
    for f, _w, v in _fields(graph):
        if f == 1:
            nf = {}
            for ff, _ww, vv in _fields(v):
                nf.setdefault(ff, []).append(vv)
            ops.append(nf[4][0].decode())
        elif f == 5:
            tf = {}
            for ff, _ww, vv in _fields(v):
                tf.setdefault(ff, []).append(vv)
            inits[tf[8][0].decode()] = (
                tuple(tf[1]), len(tf[9][0]) // 4
            )
        elif f in (11, 12):
            name = next(vv for ff, _ww, vv in _fields(v) if ff == 1)
            ios[f] = name.decode()
    return {"ir_version": ir_version, "opset": opset, "ops": ops,
            "initializers": inits, "input": ios[11], "output": ios[12]}


def weights():
    rng = np.random.RandomState(20240817)
    w1 = (rng.randn(IN_DIM, HIDDEN) / np.sqrt(IN_DIM)).astype(np.float32)
    b1 = (rng.randn(HIDDEN) * 0.01).astype(np.float32)
    w2 = (rng.randn(HIDDEN, OUT_DIM) / np.sqrt(HIDDEN)).astype(np.float32)
    b2 = (rng.randn(OUT_DIM) * 0.01).astype(np.float32)
    return w1, b1, w2, b2


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    models = os.path.join(repo, "edgar_finance_ontology_spark", "models")
    os.makedirs(models, exist_ok=True)
    w1, b1, w2, b2 = weights()
    np.savez(os.path.join(models, "mlp_embed_8.npz"),
             w1=w1, b1=b1, w2=w2, b2=b2)
    onnx_bytes = build_onnx(w1, b1, w2, b2)
    facts = decode_onnx_sanity(onnx_bytes)
    assert facts["ops"] == ["Gemm", "Relu", "Gemm"], facts
    assert facts["initializers"]["W1"] == ((IN_DIM, HIDDEN),
                                           IN_DIM * HIDDEN), facts
    assert facts["initializers"]["W2"] == ((HIDDEN, OUT_DIM),
                                           HIDDEN * OUT_DIM), facts
    assert facts["input"] == "X" and facts["output"] == "Y"
    path = os.path.join(models, "mlp_embed_8.onnx")
    with open(path, "wb") as f:
        f.write(onnx_bytes)
    print(f"wrote {path} ({len(onnx_bytes)} bytes) and mlp_embed_8.npz")


if __name__ == "__main__":
    main()

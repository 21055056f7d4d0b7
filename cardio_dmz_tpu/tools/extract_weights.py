"""Extract baked neural-net weights from the reference's generated C++ files.

The reference ships its five tiny models as generated C++ with weights baked
in as hex-dumped little-endian float32 byte arrays (see e.g.
models/generated/modelm_befe75da.cpp: `static uint8_t data_b3289e07[...] = {
0xD9, ... }; // hidden W`). This tool parses those *data* blobs (no code is
copied) and writes one .npz per model into cardio_dmz_tpu/models/params/,
including each model's baked golden test input/output vectors, which become
our model regression tests (mirroring the reference's pass*() self-checks,
models/TestGeneratedModels.mm:35-70).

Usage: python tools/extract_weights.py [--reference /root/reference]
"""

import argparse
import os
import re
import sys

import numpy as np

START_RE = re.compile(
    r"static uint8_t (data_\w+)\[(\d+)\][^=]*=\s*\{\s*//\s*(.+?)\s*$"
)
BYTE_RE = re.compile(r"0x([0-9A-Fa-f]{2})")


def parse_blobs(path):
    """Return list of (name, role, float32 array) in file order."""
    blobs = []
    name = role = None
    nbytes = 0
    buf = []
    with open(path, "r") as f:
        for line in f:
            if name is None:
                m = START_RE.search(line)
                if m:
                    name, nbytes, role = m.group(1), int(m.group(2)), m.group(3)
                    buf = []
                continue
            if line.lstrip().startswith("};"):
                raw = bytes(int(b, 16) for b in buf)
                assert len(raw) == nbytes, (name, len(raw), nbytes)
                blobs.append((name, role, np.frombuffer(raw, dtype="<f4").copy()))
                name = None
                continue
            buf.extend(BYTE_RE.findall(line))
    return blobs


def role_map(blobs):
    """Map role-comment -> list of arrays (file order)."""
    out = {}
    for _, role, arr in blobs:
        out.setdefault(role, []).append(arr)
    return out


def extract_mlp(path, n_in, n_hidden, n_out):
    r = role_map(parse_blobs(path))
    return {
        "hidden_w": r["hidden W"][0].reshape(n_hidden, n_in),
        "hidden_b": r["hidden b"][0].reshape(n_hidden),
        "logistic_w": r["logistic W"][0].reshape(n_out, n_hidden),
        "logistic_b": r["logistic b"][0].reshape(n_out),
        "test_input": r["test input"][0].reshape(n_in),
        "test_output": r["test output"][0].reshape(n_out),
    }


def extract_pan_conv(path):
    r = role_map(parse_blobs(path))
    return {
        "conv_w": r["conv W"][0].reshape(8, 3, 3),
        "conv_b": r["conv b"][0].reshape(8),
        "hidden_w": r["hidden W"][0].reshape(32, 320),
        "hidden_b": r["hidden b"][0].reshape(32),
        "logistic_w": r["logistic W"][0].reshape(10, 32),
        "logistic_b": r["logistic b"][0].reshape(10),
        "test_input": r["test input"][0].reshape(27, 19),
        "test_output": r["test output"][0].reshape(10),
    }


def extract_expiry_conv(path):
    r = role_map(parse_blobs(path))
    conv_ws = r["conv W"]
    conv_bs = r["conv b"]
    out = {
        "conv1_w": conv_ws[0].reshape(50, 5, 5),
        "conv1_b": conv_bs[0].reshape(50),
        "conv2_w": conv_ws[1].reshape(40, 50, 5, 5),
        "conv2_b": conv_bs[1].reshape(40),
        "hidden_w": r["hidden W"][0].reshape(176, 120),
        "hidden_b": r["hidden b"][0].reshape(176),
        "logistic_w": r["logistic W"][0].reshape(10, 176),
        "logistic_b": r["logistic b"][0].reshape(10),
        "test_input": r["test input"][0].reshape(16, 11),
        "test_output": r["test output"][0].reshape(10),
    }
    # intermediate goldens (modelc_bf4dd6c8.cpp:13466-13489)
    if "test output layer 1" in r:
        out["test_conv1_out"] = r["test output layer 1"][0].reshape(50, 70)
    if "test output layer 2" in r:
        out["test_conv2_out"] = r["test output layer 2"][0].reshape(40, 3)
    if "test output layer 3" in r:
        out["test_hidden_out"] = r["test output layer 3"][0].reshape(176)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "models", "params"),
    )
    args = ap.parse_args()
    ref = args.reference
    out_dir = os.path.abspath(args.out)
    os.makedirs(out_dir, exist_ok=True)

    jobs = {
        # vseg strip MLP: 204 -> 50 tanh -> 3 softmax (modelm_befe75da.cpp:1764-1786)
        "vseg_mlp": (extract_mlp,
                     (os.path.join(ref, "models/generated/modelm_befe75da.cpp"),
                      204, 50, 3)),
        # slash MLP: 176 -> 80 tanh -> 2 softmax (modelm_730c4cbd.cpp:2386-2429)
        "slash_mlp": (extract_mlp,
                      (os.path.join(ref, "models/expiry/modelm_730c4cbd.cpp"),
                       176, 80, 2)),
        # PAN digit conv ensemble (modelc_*.cpp:1824-1938)
        "pan_conv_a": (extract_pan_conv,
                       (os.path.join(ref, "models/generated/modelc_5c241121.cpp"),)),
        "pan_conv_b": (extract_pan_conv,
                       (os.path.join(ref, "models/generated/modelc_01266c1b.cpp"),)),
        "pan_conv_c": (extract_pan_conv,
                       (os.path.join(ref, "models/generated/modelc_b00bf70c.cpp"),)),
        # expiry digit conv net (modelc_bf4dd6c8.cpp)
        "expiry_conv": (extract_expiry_conv,
                        (os.path.join(ref, "models/expiry/modelc_bf4dd6c8.cpp"),)),
    }

    for name, (fn, fn_args) in jobs.items():
        params = fn(*fn_args)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **params)
        sizes = {k: v.shape for k, v in params.items()}
        print(f"{name}: {path}")
        for k, s in sizes.items():
            print(f"    {k}: {s}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

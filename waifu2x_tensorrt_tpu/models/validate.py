"""Validate + convert a real ONNX artifact against the flax models.

Usage:
    python -m waifu2x_tensorrt_tpu.models.validate MODEL.onnx \
        --family swin_unet/art --scale 4 --noise 3 \
        [--tile 64] [--save-npz models/swin_unet/art/noise3_scale4x.npz]

Steps:
  1. parse the graph (models/onnx_graph.py) and print its topology summary
     (op histogram) for an architecture diff against the reconstruction;
  2. convert the initializers to a flax param tree (models/convert.py);
  3. execute the graph with the numpy executor and compare against the
     flax forward on a random tile (the SURVEY.md §7 step 2 check:
     max abs error must be <= 1e-3 in fp32);
  4. optionally save the converted weights where the registry loads them
     (main.cpp:201-204 path convention, .npz instead of .onnx).

This is the rebuild's replacement for handing the artifact to
nvonnxparser/TensorRT (img2img_build.cpp:88): the graph is both executable
(ground truth) and convertible (deployment weights).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Validate/convert an ONNX waifu2x artifact")
    p.add_argument("onnx_path")
    p.add_argument("--family", required=True)
    p.add_argument("--scale", type=int, required=True)
    p.add_argument("--noise", type=int, default=-1)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--tolerance", type=float, default=1e-3)
    p.add_argument("--save-npz", default=None,
                   help="write the converted flax weights here on success")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.convert import (
        cunet_from_onnx,
        swin_from_torch,
    )
    from waifu2x_tensorrt_tpu.models.onnx_graph import (
        read_graph,
        run_graph,
        summarize,
    )
    from waifu2x_tensorrt_tpu.models.registry import create_model, save_params

    graph = read_graph(args.onnx_path)
    print(json.dumps(summarize(graph), indent=2))

    module, spec = create_model(args.family, args.scale, args.noise)
    if args.family.startswith("cunet"):
        params = cunet_from_onnx(args.onnx_path, args.scale)
    else:
        params = swin_from_torch(graph.initializers, args.scale)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, args.tile, args.tile)).astype(np.float32)
    got = run_graph(graph, {graph.inputs[0]: x})[graph.outputs[0]]
    flax_out = np.asarray(
        module.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    if got.shape != flax_out.shape:
        print(f"FAIL: shape mismatch onnx={got.shape} flax={flax_out.shape}")
        return 1
    err = float(np.abs(got - flax_out).max())
    print(f"max |onnx - flax| = {err:.3e} (tolerance {args.tolerance:g})")
    if err > args.tolerance:
        print("FAIL: flax forward diverges from the executed graph")
        return 1
    print("OK: per-tile forward matches the executed ONNX graph")
    if args.save_npz:
        save_params(args.save_npz, params)
        print(f"converted weights written to {args.save_npz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Validate + convert a real ONNX artifact against the flax models.

Usage:
    python -m waifu2x_tensorrt_tpu.models.validate MODEL.onnx \
        --family swin_unet/art --scale 4 --noise 3 \
        [--tile 64] [--rename-json table.json] \
        [--save-npz models/swin_unet/art/noise3_scale4x.npz]

Steps:
  1. parse the graph (models/onnx_graph.py), print its topology summary
     (op histogram) AND the derived architecture (models/onnx_backend.py
     ``derive_arch``) diffed against the flax reconstruction's expected
     hyperparameters — a real export whose structure deviates is reported
     as a structural diff, not a mystery KeyError;
  2. convert the initializers to a flax param tree. Both families use the
     NAME-INDEPENDENT positional converters (onnx_backend.
     swin_params_from_graph / cunet_params_from_graph); ``--rename-json``
     (a {src: canonical} exact-name table) plus convert.swin_from_torch /
     cunet_from_torch is the escape hatch for exports the positional walk
     cannot parse;
  3. execute the graph with the numpy executor (ground truth) AND the
     jitted jax executor (the serving path, run_graph_jax) and compare
     both against the flax forward on a random tile (SURVEY.md §7 step 2:
     max abs error <= 1e-3 in fp32);
  4. optionally save the converted weights where the registry loads them
     (main.cpp:201-204 path convention, .npz instead of .onnx).

This is the rebuild's replacement for handing the artifact to
nvonnxparser/TensorRT (img2img_build.cpp:88): the graph is executable on
the accelerator (ground truth AND serving) and convertible (fast-path
deployment weights). Even without conversion, dropping the .onnx under
models/<family>/ serves it directly (engine/upscaler.py graph backend).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _expected_arch(family: str, scale: int):
    """The reconstruction's hyperparameters (models/swin_unet.py,
    models/registry.py get_spec)."""
    if family.startswith("cunet"):
        return {"arch": "cunet", "scale": scale,
                "offset": {1: 28, 2: 36}[scale]}
    return {"arch": "swin_unet", "scale": scale, "offset": 0, "window": 8,
            "base_dim": 96, "stage_dims": (96, 192, 96),
            "stage_heads": (3, 6, 3), "stage_depths": (2, 6, 2)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Validate/convert an ONNX waifu2x artifact")
    p.add_argument("onnx_path")
    p.add_argument("--family", required=True)
    p.add_argument("--scale", type=int, required=True)
    p.add_argument("--noise", type=int, default=-1)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--tolerance", type=float, default=1e-3)
    p.add_argument("--rename-json", default=None,
                   help="JSON {upstream_name: canonical_mirror_name} table; "
                        "forces name-based conversion through it")
    p.add_argument("--save-npz", default=None,
                   help="write the converted flax weights here on success")
    args = p.parse_args(argv)
    try:
        # the registry's family/scale/noise rules (cunet has no 4x, ...)
        # — fail with its clear message, not a KeyError in _expected_arch
        from waifu2x_tensorrt_tpu.models.registry import validate as _vr

        _vr(args.family, args.scale, max(args.noise, 0) if args.scale == 1
            else args.noise)
    except ValueError as e:
        print(f"error: {e}")
        return 2

    import jax
    import jax.numpy as jnp

    from waifu2x_tensorrt_tpu.models.convert import (
        cunet_from_torch,
        swin_from_torch,
    )
    from waifu2x_tensorrt_tpu.models.onnx_backend import (
        cunet_params_from_graph,
        derive_arch,
        swin_params_from_graph,
    )
    from waifu2x_tensorrt_tpu.models.onnx_graph import (
        graph_params,
        read_graph,
        run_graph,
        run_graph_jax,
        summarize,
    )
    from waifu2x_tensorrt_tpu.models.registry import create_model, save_params

    from waifu2x_tensorrt_tpu.models.onnx_reader import OnnxExternalDataError

    try:
        graph = read_graph(args.onnx_path)
    except OnnxExternalDataError as e:
        # the .onnx itself parsed — its DATA sidecar is what's missing
        # (release artifacts with external data ship as a pair)
        print(f"error: {e}")
        print("triage: this artifact stores its weights in an external "
              "data file; copy that file into the same directory as the "
              ".onnx and re-run")
        return 2
    except ValueError as e:
        print(f"error: {e}")
        print("triage: the file is not a parseable ONNX ModelProto — "
              "re-download the artifact or check the path")
        return 2
    print(json.dumps(summarize(graph), indent=2))
    if graph.had_fp16:
        print("note: artifact stores fp16 weights/casts — upcast exactly "
              "to fp32 for conversion and ground-truth execution; serving "
              "precision remains governed by --precision")

    # -- step 1b: derived architecture vs the reconstruction ---------------
    derived = derive_arch(graph)
    expected = _expected_arch(args.family, args.scale)
    print("derived architecture:")
    print(json.dumps(derived.summary(), indent=2, default=str))
    diffs = []
    for key, want in expected.items():
        got = getattr(derived, key, None)
        got = tuple(got) if isinstance(got, (list, tuple)) else got
        want = tuple(want) if isinstance(want, (list, tuple)) else want
        if got != want:
            diffs.append(f"  {key}: derived={got!r} reconstruction={want!r}")
    if diffs:
        print("ARCH DIFF vs reconstruction:")
        print("\n".join(diffs))
    else:
        print("arch matches the reconstruction exactly")

    # -- step 2: conversion -------------------------------------------------
    # the flax mirror is built from the DERIVED hyperparameters, so an
    # artifact that structurally matches the swin_unet family validates
    # even when its width/depths differ from the flagship configuration
    if args.family.startswith("cunet"):
        module, _ = create_model(args.family, args.scale, args.noise)
        if args.rename_json:
            with open(args.rename_json) as fh:
                table = json.load(fh)
            renamed = {table.get(k, k): v
                       for k, v in graph.initializers.items()}
            params = cunet_from_torch(renamed, args.scale)
        else:
            params = cunet_params_from_graph(graph, scale=args.scale)
    else:
        from waifu2x_tensorrt_tpu.models.swin_unet import SwinUNet

        d = derived.stage_depths or (2, 6, 2)
        module = SwinUNet(
            scale=args.scale, base_dim=derived.base_dim or 96,
            depths=(d[0], d[0], d[1], d[2], d[2]), dtype=jnp.float32)
        if args.rename_json:
            with open(args.rename_json) as fh:
                table = json.load(fh)
            renamed = {table.get(k, k): v
                       for k, v in graph.initializers.items()}
            params = swin_from_torch(renamed, args.scale,
                                     depths=(d[0], d[0], d[1], d[2], d[2]))
        else:
            params = swin_params_from_graph(graph)

    # -- step 3: executed graph (numpy + jitted jax) vs flax forward -------
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
    print(f"max |onnx(numpy) - flax| = {err:.3e} "
          f"(tolerance {args.tolerance:g})")
    gp = graph_params(graph)
    jax_out = np.asarray(jax.jit(
        lambda pp, xx: run_graph_jax(
            graph, {graph.inputs[0]: xx}, params=pp)[graph.outputs[0]]
    )(gp, jnp.asarray(x)))
    jerr = float(np.abs(jax_out - got).max())
    print(f"max |onnx(jax serving path) - onnx(numpy)| = {jerr:.3e}")
    if err > args.tolerance or jerr > args.tolerance:
        print("FAIL: forward paths diverge from the executed graph")
        return 1
    print("OK: per-tile forward matches the executed ONNX graph on both "
          "the flax and the jax-serving paths")
    # informational: expected drift of the bf16 serving mode
    # (--precision fp16 with a bare .onnx — engine/upscaler.py graph
    # backend) for THIS artifact's weights. Not gated by --tolerance:
    # reduced precision is a user choice, this prints its cost.
    p16 = {k: v.astype(jnp.bfloat16) for k, v in gp.items()}
    bf16_out = np.asarray(jax.jit(
        lambda pp, xx: run_graph_jax(
            graph, {graph.inputs[0]: xx}, params=pp,
            compute_dtype=jnp.bfloat16)[graph.outputs[0]]
    )(p16, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
    berr = np.abs(bf16_out - got)
    print(f"bf16 serving drift (--precision fp16): "
          f"max {float(berr.max()):.3e}, "
          f"p99 {float(np.quantile(berr, 0.99)):.3e} "
          f"(u8 LSB = {1 / 255:.3e})")
    if args.save_npz:
        from waifu2x_tensorrt_tpu.models.onnx_backend import (
            _sha16,
            write_npz_verification,
        )

        save_params(args.save_npz, params)
        # record the passed gate next to the weights, keyed by their
        # content hash — Upscaler.load trusts it instead of warning that
        # converted-checkpoint fidelity is unverified
        sidecar = write_npz_verification(args.save_npz, {
            "source_onnx": str(args.onnx_path),
            "source_sha16": _sha16(args.onnx_path),
            "arch": derived.summary(),
            "max_err": err,
            "jax_serving_err": jerr,
        })
        print(f"converted weights written to {args.save_npz} "
              f"(verification recorded in {sidecar.name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Engine cache tests: hashing, sidecar roundtrip, selection semantics."""

import json
from pathlib import Path

import pytest

from waifu2x_tensorrt_tpu.engine.cache import (
    deserialize_config,
    engine_sidecar_path,
    find_engine,
    serialize_config,
    write_engine_sidecar,
)
from waifu2x_tensorrt_tpu.engine.config import (
    BuildConfig,
    Precision,
    RenderConfig,
    is_compatible,
    is_optimized,
)
from waifu2x_tensorrt_tpu.utils.hashing import config_hash, short_hash


def _build(opt_batch=4, opt_tile=256, prec=Precision.FP16, span=True):
    return BuildConfig(
        precision=prec,
        min_batch_size=1 if span else opt_batch,
        opt_batch_size=opt_batch,
        max_batch_size=8 if span else opt_batch,
        min_width=64 if span else opt_tile,
        opt_width=opt_tile,
        max_width=640 if span else opt_tile,
        min_height=64 if span else opt_tile,
        opt_height=opt_tile,
        max_height=640 if span else opt_tile,
    )


def _render(batch=4, tile=256, prec=Precision.FP16):
    return RenderConfig(precision=prec, batch_size=batch, height=tile,
                        width=tile)


class TestHash:
    def test_layout_and_stability(self):
        cfg = _build()
        h = config_hash(cfg, device_name="TPU v5 lite")
        # whitespace stripped from device name, like the reference
        assert h == config_hash(cfg, device_name="TPUv5lite")
        assert len(short_hash(cfg, "x")) == 16
        assert short_hash(cfg, "a") != short_hash(cfg, "b")
        cfg2 = _build(opt_batch=5)
        assert short_hash(cfg, "a") != short_hash(cfg2, "a")


class TestSidecar:
    def test_roundtrip(self, tmp_path):
        cfg = _build()
        stem = tmp_path / "noise1_scale2x.npz"
        path = write_engine_sidecar(stem, cfg, device_name="TestChip")
        assert path.name.startswith("noise1_scale2x_")
        assert path.name.endswith(".engine.json")
        back, dev = deserialize_config(path)
        assert dev == "TestChip"
        assert back.precision == cfg.precision
        assert back.opt_width == cfg.opt_width
        assert back.min_batch_size == cfg.min_batch_size
        # serialized field names match the reference sidecar format
        j = json.loads(path.read_text())
        assert set(j) == {
            "deviceName", "precision", "minBatchSize", "optBatchSize",
            "maxBatchSize", "minChannels", "optChannels", "maxChannels",
            "minWidth", "optWidth", "maxWidth", "minHeight", "optHeight",
            "maxHeight",
        }


class TestSelection:
    def test_compat_and_opt_predicates(self):
        b = _build(opt_batch=4, opt_tile=256)
        assert is_compatible(_render(4, 256), b)
        assert is_optimized(_render(4, 256), b)
        assert is_compatible(_render(2, 128), b)
        assert not is_optimized(_render(2, 128), b)
        assert not is_compatible(_render(16, 256), b)  # batch > max
        assert not is_compatible(_render(4, 1024), b)  # tile > max
        assert not is_compatible(
            _render(4, 256, prec=Precision.TF32), b)  # precision mismatch

    def test_optimized_beats_first_compatible(self, tmp_path):
        stem = tmp_path / "scale2x.npz"
        # compatible-range engine written first (alphabetically earlier too)
        write_engine_sidecar(stem, _build(opt_batch=1, opt_tile=64),
                             device_name="Chip")
        exact = write_engine_sidecar(stem, _build(opt_batch=4, opt_tile=256,
                                                  span=False),
                                     device_name="Chip")
        got = find_engine(stem, _render(4, 256), device_name="Chip")
        assert got is not None and got[0] == exact

    def test_falls_back_to_compatible_corner(self, tmp_path):
        stem = tmp_path / "scale2x.npz"
        # span engine: min=(1,64,64) opt=(1,64,64) max=(8,640,640)
        p = write_engine_sidecar(stem, _build(opt_batch=1, opt_tile=64),
                                 device_name="Chip")
        # the max corner was AOT-compiled by build() -> claimable
        got = find_engine(stem, _render(8, 640), device_name="Chip")
        assert got is not None and got[0] == p

    def test_in_range_but_uncompiled_not_claimed(self, tmp_path):
        # XLA honesty rule: a TensorRT profile executes any in-range shape,
        # but an XLA engine exists only for the compiled min/opt/max
        # corners — claiming (4, 256) here would promise a warm engine and
        # then compile from scratch at first render.
        stem = tmp_path / "scale2x.npz"
        write_engine_sidecar(stem, _build(opt_batch=1, opt_tile=64),
                             device_name="Chip")
        assert find_engine(stem, _render(4, 256), device_name="Chip") is None

    def test_compiled_shapes_dedup_and_warm(self):
        from waifu2x_tensorrt_tpu.engine.config import compiled_shapes, is_warm

        b = _build(opt_batch=4, opt_tile=256)  # min (1,64), max (8,640)
        assert compiled_shapes(b) == (
            (1, 64, 64), (4, 256, 256), (8, 640, 640))
        exact = _build(span=False)
        assert compiled_shapes(exact) == ((4, 256, 256),)
        assert is_warm(_render(8, 640), b)
        assert not is_warm(_render(2, 128), b)

    def test_device_id_does_not_block_match(self, tmp_path):
        # A sidecar built at --device 0 must match a render at --device 1:
        # device identity is keyed by the device-kind string, not the id
        # (a deserialized sidecar cannot know the original id).
        stem = tmp_path / "scale2x.npz"
        built = BuildConfig(device_id=0, min_batch_size=4, opt_batch_size=4,
                            max_batch_size=4, min_width=256, opt_width=256,
                            max_width=256, min_height=256, opt_height=256,
                            max_height=256)
        p = write_engine_sidecar(stem, built, device_name="Chip")
        render = RenderConfig(device_id=1, batch_size=4, height=256,
                              width=256)
        got = find_engine(stem, render, device_name="Chip")
        assert got is not None and got[0] == p

    def test_device_mismatch_rejected(self, tmp_path):
        stem = tmp_path / "scale2x.npz"
        write_engine_sidecar(stem, _build(), device_name="OtherChip")
        assert find_engine(stem, _render(), device_name="Chip") is None

    def test_ignores_other_stems_and_garbage(self, tmp_path):
        stem = tmp_path / "scale2x.npz"
        write_engine_sidecar(tmp_path / "noise1_scale2x.npz", _build(),
                             device_name="Chip")
        # note: "noise1_scale2x" does NOT start with "scale2x"... but
        # "scale2x_xxx" DOES start with "scale2x" — garbage sidecar:
        (tmp_path / "scale2x_garbage.engine.json").write_text("not json")
        assert find_engine(stem, _render(), device_name="Chip") is None


def test_is_warm_accounts_for_dp_multiplier():
    """A --dp N render dispatches batch*N-tile model chunks; is_warm must
    match THAT shape against the compiled corners, not the per-device
    batch (a false warm claim means 'Using engine ...' followed by a
    from-scratch compile of a never-built shape)."""
    from waifu2x_tensorrt_tpu.engine.config import (
        BuildConfig,
        Precision,
        RenderConfig,
        is_warm,
    )

    build = BuildConfig(precision=Precision.FP16,
                        min_batch_size=8, opt_batch_size=8,
                        max_batch_size=8,
                        min_height=256, opt_height=256, max_height=256,
                        min_width=256, opt_width=256, max_width=256)
    render = RenderConfig(precision=Precision.FP16, batch_size=8,
                          height=256, width=256, scaling=4)
    assert is_warm(render, build)            # unsharded: matches
    assert not is_warm(render, build, dp=4)  # dispatch shape is 32
    big = BuildConfig(precision=Precision.FP16,
                      min_batch_size=32, opt_batch_size=32,
                      max_batch_size=32,
                      min_height=256, opt_height=256, max_height=256,
                      min_width=256, opt_width=256, max_width=256)
    assert is_warm(render, big, dp=4)        # batch*dp pre-built: warm

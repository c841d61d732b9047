"""Per-device-kind advisor calibration (round-4 verdict item 3).

The advisor's constants were measured on v5e; the calibration layer
gates them by device kind (unknown kind => every advisor stays SILENT
rather than miscalibrated) and lets an on-device measurement recorded
beside the engine cache override the factory table. The reference has
no analogue (TensorRT auto-tunes tactics at build time but the CLI
gives no flag guidance, src/main.cpp:56-84).
"""

import dataclasses

from waifu2x_tensorrt_tpu.engine.advice import (
    batch_advice,
    precision_advice,
    tile_advice,
)
from waifu2x_tensorrt_tpu.engine.calibration import (
    FACTORY,
    Calibration,
    calibration_path,
    load_calibrations,
    resolve,
    save_calibration,
)
from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
from waifu2x_tensorrt_tpu.models.registry import get_spec

SWIN2 = get_spec("swin_unet/photo", 2, -1)
CUNET = get_spec("cunet/art", 2, 1)


def _cfg(tile, scale=2, tta=False, batch=4, precision=Precision.FP16):
    return RenderConfig(
        precision=precision, batch_size=batch, height=tile,
        width=tile, scaling=scale, overlap=(1 / 16, 1 / 16), tta=tta)


def test_factory_reproduces_v5e_piecewise_table():
    """tile_eff's nearest-edge lookup must reproduce the recorded v5e
    efficiency at every CLI tile choice (the pre-calibration constants)."""
    for edge, want in ((64, 0.75), (128, 1.0), (256, 1.0), (400, 0.85),
                       (512, 0.65), (640, 0.65), (768, 0.65)):
        assert FACTORY.tile_eff(edge) == want, edge
    # between measured points: nearest edge, ties to the larger
    assert FACTORY.tile_eff(300) == 1.0       # nearest is 256
    assert FACTORY.tile_eff(340) == 0.85      # nearest is 400


def test_roundtrip_through_json(tmp_path):
    path = save_calibration(FACTORY, tmp_path)
    assert path == calibration_path(tmp_path)
    back = load_calibrations(path)[FACTORY.device_kind]
    assert back == FACTORY  # frozen dataclass equality, int keys restored


def test_resolve_gating(tmp_path):
    # factory applies to the chip it was measured on + the CPU dev stand-in
    assert resolve("TPU v5 lite") is FACTORY
    assert resolve("cpu") is FACTORY
    assert resolve("TPU v4") is None
    assert resolve("TPU v6e") is None
    # a measured file for the exact kind beats factory AND unlocks
    # unknown kinds
    measured = dataclasses.replace(
        FACTORY, device_kind="TPU v4",
        source="measured: test",
        tile_efficiency={64: 0.5, 256: 1.0})
    save_calibration(measured, tmp_path)
    got = resolve("TPU v4", tmp_path)
    assert got is not None and got.tile_eff(64) == 0.5
    # exact-kind measurement also beats factory for the factory's kind
    measured2 = dataclasses.replace(FACTORY, device_kind="TPU v5 lite",
                                    source="measured: test")
    save_calibration(measured2, tmp_path)
    assert resolve("TPU v5 lite", tmp_path).source == "measured: test"


def test_corrupt_calibration_file_is_ignored(tmp_path):
    path = calibration_path(tmp_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("{not json")
    assert load_calibrations(path) == {}
    assert resolve("TPU v5 lite", tmp_path) is FACTORY


def test_unknown_device_kind_mutes_every_advisor(monkeypatch):
    """An uncalibrated warning threshold is worse than no warning: on a
    device kind with neither factory coverage nor a measured file, all
    three advisors return None for configs that WOULD warn on v5e."""
    from waifu2x_tensorrt_tpu.utils import hashing

    monkeypatch.setattr(hashing, "device_kind", lambda _i=0: "TPU v6e")
    assert tile_advice(SWIN2, _cfg(640), (2160, 3840)) is None
    assert batch_advice(CUNET, _cfg(256, batch=1)) is None
    assert precision_advice(
        CUNET, _cfg(256, precision=Precision.TF32)) is None
    # same configs DO warn with the factory calibration in hand
    assert tile_advice(SWIN2, _cfg(640), (2160, 3840),
                       calib=FACTORY) is not None
    assert batch_advice(CUNET, _cfg(256, batch=1),
                        calib=FACTORY) is not None


def test_measured_calibration_drives_advice(tmp_path):
    """A recorded on-device measurement changes what the advisor says:
    a hypothetical chip where batch 4 is only 10% off silences the
    cunet batch warning that fires on v5e."""
    flat = dataclasses.replace(
        FACTORY, device_kind="cpu", source="measured: test",
        batch_eff={"cunet": {4: 0.95, 16: 1.0}})
    save_calibration(flat, tmp_path)
    # v5e factory: warns ~2.2x
    adv = batch_advice(CUNET, _cfg(256, batch=4))
    assert adv is not None
    # measured flat scaling for this session's (cpu) kind: silent
    assert batch_advice(CUNET, _cfg(256, batch=4),
                        models_dir=tmp_path) is None


def test_batch_compile_fail_comes_from_calibration():
    nofail = dataclasses.replace(FACTORY, batch_compile_fail={})
    assert batch_advice(CUNET, _cfg(256, batch=32), calib=nofail) is None
    adv = batch_advice(CUNET, _cfg(256, batch=32), calib=FACTORY)
    assert adv is not None and "compile" in adv[2]


def test_measure_calibration_tiny_cpu_sweep():
    """The self-calibration campaign runs end-to-end on CPU with a tiny
    grid and produces a well-formed, normalized Calibration."""
    from waifu2x_tensorrt_tpu.engine.calibration import measure_calibration

    calib = measure_calibration(
        "cpu-test", tiles=(64, 128), batches=(1, 2),
        families=("swin_unet/art",), frame_hw=(96, 128),
        iters=2, rounds=1, log=lambda *_: None)
    assert calib.device_kind == "cpu-test"
    assert calib.tile_efficiency, "tile sweep produced no points"
    assert max(calib.tile_efficiency.values()) == 1.0
    assert calib.batch_cap == 2
    pts = calib.batch_eff.get("swin_unet")
    assert pts and max(pts.values()) == 1.0

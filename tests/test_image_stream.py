"""Cross-file image tile streaming (cli._ImageStreamBatcher).

A directory of same-size images renders through ONE TileStream so model
dispatches stay full-batch across file boundaries (the reference pads
every image's final batch with zero tiles, img2img_render.cpp:281).
Outputs must be byte-identical to independent per-image renders, written
in submission order, and survive a mid-stream failure via the per-image
salvage path.
"""

import argparse

import numpy as np
import pytest

from waifu2x_tensorrt_tpu import cli
from waifu2x_tensorrt_tpu.io.image import read_image, write_image
from waifu2x_tensorrt_tpu.utils.logging import Severity


def _pngs(indir, sizes, seed=0):
    indir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        p = indir / f"img{i}.png"
        write_image(p, img)
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# Unit tests: batcher logic against a fake engine/stream
# ---------------------------------------------------------------------------


class _FakeStream:
    """Lag-1 stream: each submit returns the PREVIOUS frame's output."""

    def __init__(self, fail_on_submit_n=None):
        self.q = []
        self.n = 0
        self.fail_on = fail_on_submit_n

    def warm(self):
        return 0

    def submit(self, frame):
        self.n += 1
        if self.fail_on is not None and self.n >= self.fail_on:
            raise RuntimeError("boom")
        self.q.append(frame)
        if len(self.q) > 1:
            return [255 - self.q.pop(0)]
        return []

    def flush(self):
        out = [255 - f for f in self.q]
        self.q.clear()
        return out


class _FakeEngine:
    can_stream = True

    def __init__(self, fail_on_submit_n=None):
        self.streams = []
        self.rendered = 0
        self._fail = fail_on_submit_n

    def open_stream(self, hw):
        s = _FakeStream(self._fail)
        self.streams.append((hw, s))
        return s

    def render(self, frame):
        self.rendered += 1
        return 255 - frame


def _batcher(tmp_path, engine, **over):
    base = dict(crf=23, continue_on_error=False)
    base.update(over)
    msgs = []
    b = cli._ImageStreamBatcher(argparse.Namespace(**base), engine,
                                lambda s, m: msgs.append((s, m)))
    return b, msgs


def test_batcher_writes_all_in_order_with_lag(tmp_path):
    engine = _FakeEngine()
    b, msgs = _batcher(tmp_path, engine)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (8, 10, 3), np.uint8) for _ in range(3)]
    outs = [tmp_path / f"o{i}.png" for i in range(3)]
    for img, out in zip(imgs, outs):
        assert b.submit(img, out) == 0
    # lag-1: the last output is still pending until drain
    assert not outs[2].exists() and outs[0].exists()
    assert b.drain() == 0
    for img, out in zip(imgs, outs):
        np.testing.assert_array_equal(read_image(out), 255 - img)
    assert engine.rendered == 0  # everything went through the stream
    assert len(engine.streams) == 1  # one stream for the whole run
    wrote = [m for s, m in msgs if m.startswith("Wrote ")]
    assert wrote == [f"Wrote {o}" for o in outs]  # submission order


def test_batcher_geometry_change_flushes_previous_run(tmp_path):
    engine = _FakeEngine()
    b, _ = _batcher(tmp_path, engine)
    a = np.zeros((8, 10, 3), np.uint8)
    c = np.zeros((6, 6, 3), np.uint8)
    assert b.submit(a, tmp_path / "a.png") == 0
    assert b.submit(c, tmp_path / "c.png") == 0  # new geometry
    # the A-run was flushed before the C stream opened
    assert (tmp_path / "a.png").exists()
    assert [hw for hw, _ in engine.streams] == [(8, 10), (6, 6)]
    assert b.drain() == 0
    assert (tmp_path / "c.png").exists()


def test_batcher_salvages_pending_images_on_stream_failure(tmp_path):
    engine = _FakeEngine(fail_on_submit_n=2)
    b, msgs = _batcher(tmp_path, engine)
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (8, 10, 3), np.uint8) for _ in range(2)]
    assert b.submit(imgs[0], tmp_path / "o0.png") == 0
    assert b.submit(imgs[1], tmp_path / "o1.png") == -1  # stream died
    # both pending images were re-rendered individually and written
    assert engine.rendered == 2
    for i in range(2):
        np.testing.assert_array_equal(
            read_image(tmp_path / f"o{i}.png"), 255 - imgs[i])
    assert any("Image stream failed" in m for s, m in msgs
               if s == Severity.error)
    assert b.drain() == 0  # batcher is reusable after salvage


def test_batcher_write_failure_keeps_outputs_aligned(tmp_path):
    """A failed write must still consume its batch's remaining outputs:
    stopping mid-batch would leave the pending deque misaligned, and a
    later drain would write the NEXT image's pixels to the dropped
    image's path."""

    class _Lag2Stream:
        """Returns outputs two submits late, two at a time."""

        def __init__(self):
            self.q = []

        def warm(self):
            return 0

        def submit(self, frame):
            self.q.append(frame)
            if len(self.q) == 3:
                return [255 - self.q.pop(0), 255 - self.q.pop(0)]
            return []

        def flush(self):
            out = [255 - f for f in self.q]
            self.q.clear()
            return out

    engine = _FakeEngine()
    engine.open_stream = lambda hw: _Lag2Stream()
    b, msgs = _batcher(tmp_path, engine)  # continue_on_error=False
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (8, 10, 3), np.uint8) for _ in range(3)]
    bad = tmp_path / "blocker" / "a.png"
    (tmp_path / "blocker").write_text("")  # a FILE where a dir must go
    assert b.submit(imgs[0], bad) == 0
    assert b.submit(imgs[1], tmp_path / "b.png") == 0
    # boundary chunk delivers [outA, outB]: A's write fails, B's output
    # must still be written (it is already computed), and C stays queued
    assert b.submit(imgs[2], tmp_path / "c.png") == -1
    np.testing.assert_array_equal(
        read_image(tmp_path / "b.png"), 255 - imgs[1])
    assert b.drain() == 0
    np.testing.assert_array_equal(
        read_image(tmp_path / "c.png"), 255 - imgs[2])
    assert not any("fewer outputs than inputs" in m for _, m in msgs)
    assert engine.rendered == 0  # no bogus salvage re-renders


def test_batcher_write_failure_is_reported(tmp_path):
    engine = _FakeEngine()
    b, msgs = _batcher(tmp_path, engine)
    img = np.zeros((8, 10, 3), np.uint8)
    (tmp_path / "blocker").write_text("")  # a FILE where a dir must go
    assert b.submit(img, tmp_path / "blocker" / "o.png") == 0
    assert b.drain() == -1
    assert any(s == Severity.error for s, m in msgs)


# ---------------------------------------------------------------------------
# End-to-end: CLI over a directory of PNGs == independent per-image renders
# ---------------------------------------------------------------------------


def test_cli_image_directory_streams_byte_identical(tmp_path, monkeypatch):
    # three same-size images (one cross-file stream run) + one odd size
    # (geometry change mid-run)
    sizes = [(96, 80), (96, 80), (96, 80), (72, 64)]
    indir = tmp_path / "in"
    paths = _pngs(indir, sizes)

    submitted = []
    orig = cli._ImageStreamBatcher.submit

    def spy(self, frame, out_path):
        submitted.append(str(out_path))
        return orig(self, frame, out_path)

    monkeypatch.setattr(cli._ImageStreamBatcher, "submit", spy)

    outdir = tmp_path / "out"
    outdir.mkdir()
    argv = [
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--models-dir", str(tmp_path / "models"), "--allow-random-weights",
        "render", "-i", str(indir), "-o", str(outdir),
    ]
    assert cli.main(argv) == 0
    assert len(submitted) == 4  # every image went through the batcher

    # independent per-image renders with the same (seed-0 deterministic)
    # random init must match byte-for-byte
    from waifu2x_tensorrt_tpu.engine.config import Precision, RenderConfig
    from waifu2x_tensorrt_tpu.engine.upscaler import Upscaler

    config = RenderConfig(
        precision=Precision.TF32, batch_size=2, height=64, width=64,
        scaling=2, overlap=(1 / 16, 1 / 16), tta=False,
    )
    engine = Upscaler(models_dir=tmp_path / "models", allow_random_init=True)
    engine.load("swin_unet/art", 2, -1, config)
    suffix = cli.output_suffix("swin_unet/art", -1, 2, False)
    for p in paths:
        out_path = cli.resolve_output_path(p, outdir, suffix, False,
                                           is_image=True)
        assert out_path.exists(), out_path
        want = np.asarray(engine.render(read_image(p)))
        np.testing.assert_array_equal(read_image(out_path), want)


def test_cli_single_image_keeps_inline_path(tmp_path, monkeypatch):
    """One image in the worklist: the leaner inline path renders it (no
    stream programs compiled for a single file)."""
    indir = tmp_path / "in"
    [p] = _pngs(indir, [(40, 40)])

    def banned(self, frame, out_path):  # pragma: no cover
        raise AssertionError("batcher must not engage for a single image")

    monkeypatch.setattr(cli._ImageStreamBatcher, "submit", banned)
    outdir = tmp_path / "out"
    outdir.mkdir()
    argv = [
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--models-dir", str(tmp_path / "models"), "--allow-random-weights",
        "render", "-i", str(p), "-o", str(outdir),
    ]
    assert cli.main(argv) == 0
    suffix = cli.output_suffix("swin_unet/art", -1, 2, False)
    assert cli.resolve_output_path(p, outdir, suffix, False,
                                   is_image=True).exists()

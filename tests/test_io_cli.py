"""I/O + CLI parity tests (no ffmpeg dependency; video pipe paths are
gated and covered by tests/test_video.py when ffmpeg exists)."""

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.cli import (
    build_parser,
    output_suffix,
    resolve_output_path,
)
from waifu2x_tensorrt_tpu.io.discover import find_files_by_extension
from waifu2x_tensorrt_tpu.io.image import read_image, write_image
from waifu2x_tensorrt_tpu.io.video import (
    VideoWriter,
    fraction_string_to_double,
    parse_key_value_string,
)
from pathlib import Path


class TestProbeParsing:
    def test_key_value(self):
        # capture.cpp:19-39 semantics
        text = "width=1920\nheight=1080\nr_frame_rate=30000/1001\nnb_frames=300\n"
        kv = parse_key_value_string(text)
        assert kv == {
            "width": "1920",
            "height": "1080",
            "r_frame_rate": "30000/1001",
            "nb_frames": "300",
        }
        assert parse_key_value_string("garbage\nno equals") == {}

    def test_fraction(self):
        assert fraction_string_to_double("30000/1001") == pytest.approx(29.97, 0.001)
        assert fraction_string_to_double("25/1") == 25.0
        with pytest.raises(ZeroDivisionError):
            fraction_string_to_double("0/0")
        with pytest.raises(ValueError):
            fraction_string_to_double("25")


class TestDiscovery:
    def test_files_and_dirs(self, tmp_path):
        (tmp_path / "a.png").touch()
        (tmp_path / "b.txt").touch()
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "c.JPG").touch()
        (tmp_path / "sub" / "d.mkv").touch()
        flat = find_files_by_extension([tmp_path])
        assert [p.name for p in flat] == ["a.png"]
        rec = find_files_by_extension([tmp_path], recursive=True)
        assert sorted(p.name for p in rec) == ["a.png", "c.JPG", "d.mkv"]
        # explicit file always considered (if matching)
        one = find_files_by_extension([tmp_path / "sub" / "d.mkv"])
        assert [p.name for p in one] == ["d.mkv"]


class TestImageIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (30, 40, 3), np.uint8)
        write_image(tmp_path / "x.png", img)
        back = read_image(tmp_path / "x.png")
        np.testing.assert_array_equal(img, back)


class TestWriterValidation:
    def test_fluent_validation(self):
        w = VideoWriter()
        with pytest.raises(ValueError):
            w.set_constant_rate_factor(52)  # crf <= 51, writer.cpp:96-103
        with pytest.raises(ValueError):
            w.set_quality(0)  # quality in [1,31], writer.cpp:105-113
        with pytest.raises(ValueError):
            w.set_frame_size(0, 10)
        w.set_constant_rate_factor(51).set_quality(31)

    def test_png_image_mode(self, tmp_path):
        # codec/pix_fmt empty + fps 1 => PNG path (src/main.cpp:248-252)
        w = (VideoWriter().set_codec("").set_pixel_format("")
             .set_frame_rate(1).set_frame_size(8, 6)
             .set_output_file(tmp_path / "out.png"))
        w.open()
        frame = np.full((6, 8, 3), 127, np.uint8)
        w.write(frame)
        w.release()
        np.testing.assert_array_equal(read_image(tmp_path / "out.png"), frame)

    def test_write_validates_frame(self, tmp_path):
        w = (VideoWriter().set_codec("").set_pixel_format("")
             .set_frame_size(8, 6).set_output_file(tmp_path / "o.png"))
        w.open()
        with pytest.raises(ValueError, match="size does not match"):
            w.write(np.zeros((5, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="dtype"):
            w.write(np.zeros((6, 8, 3), np.float32))
        w.write(np.zeros((6, 8, 3), np.uint8))  # release() checks >=1 write
        w.release()
        with pytest.raises(RuntimeError, match="not opened"):
            w.write(np.zeros((6, 8, 3), np.uint8))

    def test_no_changes_while_open(self, tmp_path):
        w = (VideoWriter().set_codec("").set_pixel_format("")
             .set_frame_size(8, 6).set_output_file(tmp_path / "o.png"))
        w.open()
        with pytest.raises(RuntimeError, match="while writer is open"):
            w.set_codec("libx264")
        w.write(np.zeros((6, 8, 3), np.uint8))  # release() checks >=1 write
        w.release()


class TestCLI:
    def _parse(self, extra):
        base = ["--model", "swin_unet/art", "--scale", "2", "--noise", "1",
                "--batchSize", "4", "--tileSize", "256"]
        return build_parser().parse_args(base + extra)

    def test_repeated_input_flags_append(self):
        # CLI11 vector options append across repeated -i flags
        # (src/main.cpp:95-97); argparse's default nargs="+" REPLACES,
        # which silently dropped all but the last -i (fixed round 4)
        args = self._parse(["render", "-i", "a.png", "b.png",
                            "-i", "c.png"])
        assert args.inputs == ["a.png", "b.png", "c.png"]

    def test_required_and_choices(self):
        args = self._parse(["render", "-i", "x.png"])
        assert args.model == "swin_unet/art"
        assert args.blend == pytest.approx(1 / 16)  # default, main.cpp:108
        assert args.codec == "libx264" and args.pix_fmt == "yuv420p"
        assert args.crf == 23
        with pytest.raises(SystemExit):
            self._parse([])  # missing subcommand
        with pytest.raises(SystemExit):
            build_parser().parse_args(
                ["--model", "bogus", "--scale", "2", "--noise", "1",
                 "--batchSize", "4", "--tileSize", "256", "build"])
        with pytest.raises(SystemExit):
            build_parser().parse_args(
                ["--model", "cunet/art", "--scale", "3", "--noise", "1",
                 "--batchSize", "4", "--tileSize", "256", "build"])

    def test_precision_numeric_aliases(self):
        # The reference's CLI11 enum accepts the names OR the numeric
        # values {fp16->1, tf32->0} (src/main.cpp:76-84); scripts written
        # for the reference binary must parse unchanged here.
        for flag, want in (("fp16", "fp16"), ("tf32", "tf32"),
                           ("1", "fp16"), ("0", "tf32")):
            args = self._parse(["--precision", flag, "render",
                                "-i", "x.png"])
            assert args.precision == want, flag
        assert self._parse(["render", "-i", "x.png"]).precision == "fp16"
        with pytest.raises(SystemExit):
            self._parse(["--precision", "fp32", "render", "-i", "x.png"])

    def test_semantic_validation_exit(self, capsys):
        from waifu2x_tensorrt_tpu.cli import main

        # cunet/art scale 4 forbidden (src/main.cpp:142-143)
        rc = main(["--model", "cunet/art", "--scale", "4", "--noise", "1",
                   "--batchSize", "1", "--tileSize", "64", "build"])
        assert rc == -1
        assert "cunet/art does not support" in capsys.readouterr().err
        # noise -1 + scale 1 forbidden (src/main.cpp:144-145)
        rc = main(["--model", "swin_unet/art", "--scale", "1", "--noise", "-1",
                   "--batchSize", "1", "--tileSize", "64", "build"])
        assert rc == -1

    def test_suffix_convention(self):
        # src/main.cpp:205-209
        assert output_suffix("swin_unet/art", 3, 4, True) == \
            "(swin_unet_art)(noise3)(scale4)(tta)"
        assert output_suffix("cunet/art", -1, 2, False) == "(cunet_art)(scale2)"
        assert output_suffix("cunet/art", 0, 1, False) == "(cunet_art)(noise0)"

    def test_output_path_rules(self):
        # src/main.cpp:240-255
        p = resolve_output_path(Path("/in/img.jpg"), None, "(m)(scale2)",
                                False, is_image=True)
        assert p == Path("/in/img(m)(scale2).png")
        p = resolve_output_path(Path("/in/vid.mkv"), Path("/out"), "(m)",
                                False, is_image=False)
        assert p == Path("/out/vid(m).mp4")
        p = resolve_output_path(Path("/in/img.jpg"), None, "(m)", True,
                                is_image=True)
        assert p == Path("/in/img.png")


class TestMultihost:
    def test_shard_files(self):
        from waifu2x_tensorrt_tpu.parallel import shard_files

        files = list("abcdefg")
        assert shard_files(files, 0, 3) == ["a", "d", "g"]
        assert shard_files(files, 1, 3) == ["b", "e"]
        assert shard_files(files, 2, 3) == ["c", "f"]

    def test_shard_frames(self):
        from waifu2x_tensorrt_tpu.parallel import shard_frame_ranges

        ranges = [shard_frame_ranges(100, i, 8) for i in range(8)]
        assert ranges[0][0] == 0 and ranges[-1][1] == 100
        total = sum(b - a for a, b in ranges)
        assert total == 100
        for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
            assert b1 == a2


class TestRenderLoopHelpers:
    def test_resume_skips_existing_output(self, tmp_path):
        """--resume: existing outputs are skipped before any model work."""
        import argparse
        from waifu2x_tensorrt_tpu.cli import _render_one, output_suffix
        from waifu2x_tensorrt_tpu.io.image import write_image
        from waifu2x_tensorrt_tpu.io.video import VideoCapture

        img = np.random.default_rng(0).integers(0, 256, (8, 8, 3), np.uint8)
        src = tmp_path / "a.png"
        write_image(src, img)
        suffix = output_suffix("swin_unet/art", 1, 2, False)
        out = tmp_path / f"a{suffix}.png"
        write_image(out, img)  # pre-existing output

        class ExplodingEngine:
            def render(self, frame):
                raise AssertionError("render must not be called on resume")

        args = argparse.Namespace(resume=True, scale=2, crf=23,
                                  pix_fmt="yuv420p", codec="libx264",
                                  nosuffix=False)
        messages = []
        state = {"frames": 0, "frame": 0}
        rc = _render_one(args, ExplodingEngine(), VideoCapture(), src, None,
                         suffix, state, lambda s, m: messages.append(m))
        assert rc == 0
        assert any("Skipping" in m for m in messages)

    def test_render_one_reports_failure(self, tmp_path):
        import argparse
        from waifu2x_tensorrt_tpu.cli import _render_one
        from waifu2x_tensorrt_tpu.io.image import write_image
        from waifu2x_tensorrt_tpu.io.video import VideoCapture

        img = np.random.default_rng(0).integers(0, 256, (8, 8, 3), np.uint8)
        src = tmp_path / "a.png"
        write_image(src, img)

        class FailingEngine:
            def render(self, frame):
                raise RuntimeError("boom")

        args = argparse.Namespace(resume=False, scale=2, crf=23,
                                  pix_fmt="yuv420p", codec="libx264",
                                  nosuffix=True)
        messages = []
        rc = _render_one(args, FailingEngine(), VideoCapture(), src, None,
                         "", {"frames": 0, "frame": 0},
                         lambda s, m: messages.append(m))
        assert rc == -1
        assert any("boom" in m for m in messages)


def test_metrics_json_report(tmp_path):
    """--metrics-json writes a per-file + totals render report (metrics
    export is an extension: SURVEY.md §5 notes the reference has none)."""
    import json

    import numpy as np

    from waifu2x_tensorrt_tpu.cli import main
    from waifu2x_tensorrt_tpu.io.image import write_image

    rng = np.random.default_rng(0)
    ins = []
    for i in range(2):
        p = tmp_path / f"in{i}.png"
        write_image(p, rng.integers(0, 256, (40, 52, 3), np.uint8))
        ins.append(str(p))
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    report = tmp_path / "metrics.json"

    rc = main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", *ins, "-o", str(out_dir),
        "--metrics-json", str(report),
    ])
    assert rc == 0
    rec = json.loads(report.read_text())
    assert rec["config"]["model"] == "swin_unet/art"
    assert rec["config"]["tile_size"] == 64
    assert [f["rc"] for f in rec["files"]] == [0, 0]
    assert [f["frames"] for f in rec["files"]] == [1, 1]
    assert all(f["seconds"] >= 0 for f in rec["files"])
    assert rec["totals"] == {
        "files": 2, "failed": 0,
        "wall_seconds": rec["totals"]["wall_seconds"], "exit_code": 0}
    assert rec["totals"]["wall_seconds"] > 0
    assert len(list(out_dir.glob("*.png"))) == 2

    # failure accounting: a missing input after a good one, continue-on-error
    report2 = tmp_path / "metrics2.json"
    bogus = tmp_path / "missing.png"
    bogus.write_bytes(b"not a png")
    rc = main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", ins[0], str(bogus), "-o", str(out_dir),
        "--continue-on-error", "--metrics-json", str(report2),
    ])
    assert rc != 0
    rec2 = json.loads(report2.read_text())
    assert rec2["totals"]["failed"] == 1
    assert rec2["totals"]["exit_code"] == rc


def test_metrics_json_marks_deferred_stream_failures(tmp_path, monkeypatch):
    """A failure surfacing at the final stream drain belongs to no
    per-file row (each submit already returned 0): the report must
    explain failed==0 + exit_code!=0 via totals.deferred_write_failures."""
    import json

    import numpy as np

    from waifu2x_tensorrt_tpu import cli
    from waifu2x_tensorrt_tpu.io.image import write_image

    rng = np.random.default_rng(1)
    ins = []
    for i in range(2):  # same size -> one cross-file stream, one final drain
        p = tmp_path / f"in{i}.png"
        write_image(p, rng.integers(0, 256, (40, 52, 3), np.uint8))
        ins.append(str(p))
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    report = tmp_path / "metrics.json"

    # fail only the drain of an ACTIVE stream: with same-size images that
    # is exactly the final drain (submit's empty pre-drain passes through)
    orig_drain = cli._ImageStreamBatcher.drain
    monkeypatch.setattr(
        cli._ImageStreamBatcher, "drain",
        lambda self: -1 if self._stream is not None else orig_drain(self))
    rc = cli.main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", *ins, "-o", str(out_dir),
        "--metrics-json", str(report),
    ])
    assert rc != 0
    rec = json.loads(report.read_text())
    assert [f["rc"] for f in rec["files"]] == [0, 0]
    assert rec["totals"]["failed"] == 0
    assert rec["totals"]["exit_code"] == rc
    assert rec["totals"]["deferred_write_failures"] is True


def test_unicode_paths_end_to_end(tmp_path):
    """Wide-char path support, listed as an unshipped TODO in the
    reference (README.md "Add wide char support" — its Windows build
    takes char* paths): here paths are Unicode-native end to end. A
    non-ASCII input directory AND filename render through the CLI into a
    non-ASCII output directory with the suffix convention intact, and
    recursive discovery walks Unicode trees."""
    from waifu2x_tensorrt_tpu.cli import main

    rng = np.random.default_rng(0)
    in_dir = tmp_path / "入力 フォルダ" / "ソース"
    in_dir.mkdir(parents=True)
    names = ["画像 テスト①.png", "imágé–✨.png"]
    for name in names:
        write_image(in_dir / name,
                    rng.integers(0, 256, (40, 52, 3), np.uint8))
    # recursive discovery over the Unicode tree (discover.py)
    found = find_files_by_extension(
        [str(tmp_path / "入力 フォルダ")], [".png"], recursive=True)
    assert sorted(Path(f).name for f in found) == sorted(names)

    out_dir = tmp_path / "出力先"
    out_dir.mkdir()
    rc = main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", str(in_dir / names[0]), str(in_dir / names[1]),
        "-o", str(out_dir),
    ])
    assert rc == 0
    for name in names:
        out = out_dir / f"{Path(name).stem}(swin_unet_art)(scale2).png"
        assert out.exists(), sorted(p.name for p in out_dir.iterdir())
        up = read_image(out)
        assert up.shape == (80, 104, 3)

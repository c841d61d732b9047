"""Native framepipe tests.

Drive the C++ ring-buffered pipe runtime without ffmpeg by using plain
shell commands (``cat``) as the frame source/sink — the machinery under
test is identical to the ffmpeg case (raw fixed-size frames over a child
process pipe).
"""

import numpy as np
import pytest

from waifu2x_tensorrt_tpu.io.native_pipe import (
    NativeFrameReader,
    NativeFrameWriter,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for framepipe"
)

H, W = 12, 17


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, H, W, 3), np.uint8)


def test_reader_streams_frames(tmp_path):
    frames = _frames(7)
    raw = tmp_path / "in.raw"
    raw.write_bytes(frames.tobytes())
    with NativeFrameReader(f"cat {raw}", H, W) as r:
        got = []
        while True:
            f = r.read()
            if f is None:
                break
            got.append(f)
    assert len(got) == 7
    np.testing.assert_array_equal(np.stack(got), frames)


def test_reader_zero_copy_mode(tmp_path):
    frames = _frames(3, seed=1)
    raw = tmp_path / "in.raw"
    raw.write_bytes(frames.tobytes())
    with NativeFrameReader(f"cat {raw}", H, W, depth=2) as r:
        for i in range(3):
            view = r.read(copy=False)
            np.testing.assert_array_equal(view, frames[i])
            r.release(view)
        assert r.read() is None


def test_writer_roundtrip(tmp_path):
    frames = _frames(5, seed=2)
    out = tmp_path / "out.raw"
    with NativeFrameWriter(f"cat > {out}", H, W) as w:
        for f in frames:
            w.write(f)
        rc = w.close()
    assert rc == 0
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(5, H, W, 3)
    np.testing.assert_array_equal(got, frames)


def test_writer_validates(tmp_path):
    with NativeFrameWriter(f"cat > {tmp_path/'x.raw'}", H, W) as w:
        with pytest.raises(ValueError):
            w.write(np.zeros((H, W + 1, 3), np.uint8))
        with pytest.raises(ValueError):
            w.write(np.zeros((H, W, 3), np.float32))


def test_full_pipe_roundtrip(tmp_path):
    """reader(cat) -> transform -> writer(cat) end-to-end."""
    frames = _frames(4, seed=3)
    src = tmp_path / "src.raw"
    dst = tmp_path / "dst.raw"
    src.write_bytes(frames.tobytes())
    with NativeFrameReader(f"cat {src}", H, W, depth=2) as r, \
         NativeFrameWriter(f"cat > {dst}", H, W, depth=2) as w:
        while True:
            f = r.read()
            if f is None:
                break
            w.write(255 - f)
    got = np.frombuffer(dst.read_bytes(), np.uint8).reshape(4, H, W, 3)
    np.testing.assert_array_equal(got, 255 - frames)

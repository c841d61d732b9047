"""Real 2-process jax.distributed multihost test (round-3 verdict item 5).

Two coordinated CPU processes (localhost coordinator, real
jax.distributed.initialize — no monkeypatched process_index) run the
--multihost CLI path end-to-end on ONE video: each renders its contiguous
frame range through the production engine, publishes part files
atomically, and the last finisher stitches. The stitched output must be
byte-identical to a single-process render of the same video.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from test_video import fake_ffmpeg  # noqa: F401  (fixture reuse)

_REPO = Path(__file__).resolve().parents[1]
_CHILD = Path(__file__).with_name("_distributed_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(fake_ffmpeg, tmp_path, monkeypatch, dp: int = 1):
    # Children inherit the conftest's 8-virtual-device XLA flag, matching
    # the in-process expectation's device count: XLA CPU numerics shift
    # by 1 ulp under a different virtual-device split, which flips u8
    # rounding vs the single-process render.
    monkeypatch.setenv("W2X_NO_NATIVE_PIPE", "1")
    video = fake_ffmpeg["video"]
    video.touch()

    # single-process expectation through the same CLI
    from waifu2x_tensorrt_tpu.cli import main as cli_main

    exp_dir = tmp_path / "exp"
    exp_dir.mkdir()
    rc = cli_main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights",
        "render", "-i", str(video), "-o", str(exp_dir),
    ])
    assert rc == 0
    expected = next(exp_dir.glob("*.mp4")).read_bytes()

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    port = _free_port()
    env = dict(os.environ)  # fixture PATH shims + conftest cache env ride in
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["PYTHONPATH"] = f"{_REPO}{os.pathsep}" + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(_CHILD), str(role), str(port), str(video),
             str(out_dir), str(dp)],
            env=env, cwd=str(_REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for role in (0, 1)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    produced = list(out_dir.glob("*.mp4"))
    assert len(produced) == 1, (produced, outputs[0][-1500:])
    assert produced[0].read_bytes() == expected
    # both hosts actually rendered (each logs its own segment range)
    joined = "\n".join(outputs)
    assert "Rendered segment [0, 3)" in joined, joined[-2000:]
    assert "Rendered segment [3, 6)" in joined, joined[-2000:]


@pytest.mark.timeout(900)
def test_two_process_multihost_video_stitch(fake_ffmpeg, tmp_path,  # noqa: F811
                                            monkeypatch):
    _run_two_process(fake_ffmpeg, tmp_path, monkeypatch)


@pytest.mark.timeout(900)
def test_two_process_multihost_with_dp(fake_ffmpeg, tmp_path,  # noqa: F811
                                       monkeypatch):
    """2-host jax.distributed x --dp 2 (VERDICT r3 item 5): each host
    shards its frame range's tile batches over a 2-device prefix of its
    own 8 local virtual devices (the CLI meshes jax.local_devices());
    stitched bytes must still equal the single-process render."""
    _run_two_process(fake_ffmpeg, tmp_path, monkeypatch, dp=2)
